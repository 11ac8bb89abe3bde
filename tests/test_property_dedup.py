"""Property-based tests for paragraph dedup and ANN recall: a python
oracle over arbitrary inputs must agree with the DataFrame plans."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st

from sumologic_aws_lambda_spark.operators.dedup import paragraph_dedup
from sumologic_aws_lambda_spark.operators.similarity import (
    ann_recall,
    brute_force_topk,
)

_texts = st.lists(
    st.text(alphabet="ab xy\t", min_size=0, max_size=40),
    min_size=1, max_size=5,
)


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower()).strip()


def py_paragraphs(s: str, k: int) -> list[str]:
    toks = _norm(s).split(" ")
    return [" ".join(toks[i:i + k]) for i in range(0, len(toks), k)]


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_texts)
def test_paragraph_dedup_matches_python_first_occurrence(spark, texts):
    k = 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    got = {r.doc_id: r for r in
           paragraph_dedup(df, tokens_per_para=k).collect()}

    seen: set[str] = set()
    for i, t in enumerate(texts):
        paras = py_paragraphs(t, k)
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        assert got[i].n_paras == len(paras), (t, got[i])
        assert got[i].n_kept == len(kept), (t, got[i])
        assert got[i].text_kept == " ".join(kept), (t, got[i])


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.lists(st.integers(min_value=-3, max_value=3), min_size=4, max_size=4),
    min_size=3, max_size=8))
def test_self_recall_is_one(spark, vecs):
    # recall of an ANN result against itself must be 1 for every query.
    rows = [(i, [float(x) or 0.5 for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    exact = brute_force_topk(df, df, k=2)
    out = ann_recall(exact, exact, k=2).collect()
    assert out, "recall output empty"
    for r in out:
        # queries with fewer than k neighbors still divide by k
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.hits * 0.5 == r.recall_at_k


def test_exact_dedup_handles_map_columns(spark):
    # min_by carries the row; a map column must not break orderability.
    from sumologic_aws_lambda_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(2, "same text", {"k": "v2"}), (1, "same text", {"k": "v1"}),
         (3, "other", {"k": "v3"})],
        "doc_id long, text string, attrs map<string,string>",
    )
    out = exact_dedup(df).collect()
    kept = {r.doc_id: r.attrs for r in out}
    assert set(kept) == {1, 3} and kept[1] == {"k": "v1"}
