"""Property-based tests for the ExactSubstr span family: a pure-Python
reference over arbitrary small-alphabet corpora (maximizing repeated
windows) must agree with the DataFrame plans."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st

from sumologic_aws_lambda_spark.operators.dedup import (
    duplicate_span_stats,
    remove_duplicate_spans,
)

# 3-word alphabet + messy whitespace: short docs, dense span collisions
_texts = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12)
    .map(lambda ws: "  ".join(ws)),
    min_size=1, max_size=6,
)

K = 3


def _toks(s: str) -> list[str]:
    n = re.sub(r"\s+", " ", s.lower()).strip()
    return n.split(" ") if n else [""]


def py_occurrences(texts: list[str]) -> list[tuple[int, int, str]]:
    out = []
    for doc_id, t in enumerate(texts):
        toks = _toks(t)
        if len(toks) < K:
            continue
        for pos in range(len(toks) - K + 1):
            out.append((doc_id, pos, " ".join(toks[pos:pos + K])))
    return out


def py_span_stats(texts: list[str]) -> dict[str, tuple[int, int]]:
    occ = py_occurrences(texts)
    spans: dict[str, list[tuple[int, int]]] = {}
    for d, p, s in occ:
        spans.setdefault(s, []).append((d, p))
    return {
        s: (len({d for d, _ in v}), len(v))
        for s, v in spans.items()
        if len({d for d, _ in v}) >= 2
    }


def py_removal(texts: list[str], cross_doc_only: bool) -> list[tuple[str, int]]:
    occ = py_occurrences(texts)
    spans: dict[str, list[tuple[int, int]]] = {}
    for d, p, s in occ:
        spans.setdefault(s, []).append((d, p))
    cut: dict[int, set[int]] = {}
    for s, v in spans.items():
        if len(v) < 2:
            continue
        if cross_doc_only and len({d for d, _ in v}) < 2:
            continue
        winner = min(v)
        for d, p in v:
            if (d, p) != winner:
                cut.setdefault(d, set()).update(range(p, p + K))
    out = []
    for doc_id, t in enumerate(texts):
        toks = _toks(t)
        removed = cut.get(doc_id, set())
        kept = [tok for i, tok in enumerate(toks) if i not in removed]
        out.append((" ".join(kept), len(removed)))
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_texts)
def test_span_stats_match_python(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    got = {(r["n_docs"], r["n_occ"])
           for r in duplicate_span_stats(df, k=K).collect()}
    expect_multiset = sorted(py_span_stats(texts).values())
    got_rows = sorted(
        (r["n_docs"], r["n_occ"])
        for r in duplicate_span_stats(df, k=K).collect()
    )
    assert got_rows == expect_multiset
    assert all(nd >= 2 for nd, _ in got)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_texts, st.booleans())
def test_span_removal_matches_python(spark, texts, cross_only):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    got = {r["doc_id"]: (r["text"], r["n_tokens_removed"])
           for r in remove_duplicate_spans(
               df, k=K, cross_doc_only=cross_only).collect()}
    expect = py_removal(texts, cross_only)
    assert got == {i: e for i, e in enumerate(expect)}


# ------------------------------------------------- chunking (sliding win)

def py_chunks(text: str, chunk: int, overlap: int) -> list[tuple[int, int, str]]:
    toks = _toks(text)
    n, stride = len(toks), chunk - overlap
    n_chunks = 1 if n <= chunk else -((n - chunk) // -stride) + 1
    return [
        (ci, ci * stride, " ".join(toks[ci * stride:ci * stride + chunk]))
        for ci in range(n_chunks)
    ]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_texts, st.integers(2, 6), st.integers(0, 4))
def test_chunking_matches_python(spark, texts, chunk, overlap):
    from sumologic_aws_lambda_spark.operators.text import chunk_documents

    overlap = min(overlap, chunk - 1)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["start_tok"], r["chunk_text"])
        for r in chunk_documents(df, chunk, overlap).collect()
    }
    want = {
        (d, ci): (start, txt)
        for d, t in enumerate(texts)
        for ci, start, txt in py_chunks(t, chunk, overlap)
    }
    assert got == want
    # Reconstruction: stitching chunks at the stride boundary recovers
    # the normalized document exactly (no token lost or duplicated).
    stride = chunk - overlap
    for d, t in enumerate(texts):
        parts = [txt.split(" ")[:stride] if i < len(py_chunks(t, chunk, overlap)) - 1
                 else txt.split(" ")
                 for i, (_, _, txt) in enumerate(py_chunks(t, chunk, overlap))]
        flat = [tok for p in parts for tok in p]
        assert flat == _toks(t)
