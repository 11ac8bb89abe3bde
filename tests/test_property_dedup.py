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


# ----------------------------------------------------------- winnowing

def py_winnow(texts, k, w):
    """Pure-Python winnowing reference (Schleimer et al. 2003: per
    window of w gram-hashes keep the min, rightmost on ties)."""
    import hashlib
    import re as _re

    out = {}
    for doc_id, text in texts:
        toks = _re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        if len(toks) < k:
            continue
        hs = [
            int(hashlib.md5(
                " ".join(toks[i:i + k]).encode()).hexdigest()[:8], 16)
            for i in range(len(toks) - k + 1)
        ]
        sel = set()
        for j in range(max(len(hs) - w, 0) + 1):
            win = hs[j:j + w]
            m = min(win)
            p = j + max(i for i, h in enumerate(win) if h == m)
            sel.add((m, p))
        out[doc_id] = sel
    return out


def test_winnowing_matches_python_reference(spark):
    from sumologic_aws_lambda_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    texts = [
        (1, "the quick brown fox jumps over the lazy dog again"),
        (2, "a a a a a a a a"),            # all-equal hashes: tie rule
        (3, "short"),                       # < k tokens: no output
        (4, "quick brown fox jumps over the lazy dog elsewhere"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in winnowing_fingerprints(df, k=3, w=4).collect():
        got.setdefault(r["doc_id"], set()).add((r["h"], r["p"]))
    assert got == py_winnow(texts, 3, 4)


def test_winnowing_guarantee_shared_span_shares_fingerprint(spark):
    from sumologic_aws_lambda_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    k, w = 3, 4
    # Docs 1 and 2 share a (w + k - 1)-token span in different contexts:
    # winnowing GUARANTEES at least one common fingerprint hash.
    shared = "alpha beta gamma delta epsilon zeta"   # w + k - 1 = 6
    df = spark.createDataFrame(
        [(1, f"intro words here {shared}"),
         (2, f"{shared} trailing content words")],
        "doc_id long, text string",
    )
    by_doc = {}
    for r in winnowing_fingerprints(df, k=k, w=w).collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["h"])
    assert by_doc[1] & by_doc[2]


def test_winnowing_plan_is_shuffle_free(spark):
    from sumologic_aws_lambda_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    df = spark.createDataFrame([(1, "a b c d e f")],
                               "doc_id long, text string")
    plan = winnowing_fingerprints(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
