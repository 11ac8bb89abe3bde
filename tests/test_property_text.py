"""Property-based tests for the curation operators: python oracles over
arbitrary text must agree with the Column-expression implementations."""

from __future__ import annotations

import math
import re

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.operators.text import (
    add_char_entropy,
    benchmark_ngram_hits,
)

_ALPHABET = "abcdefghijklmnopqrstuvwxyz "

_texts = st.lists(
    st.text(alphabet="abc xyz.QR7\n\t", min_size=0, max_size=60),
    min_size=1, max_size=6,
)


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower()).strip()


def py_entropy(s: str) -> float:
    s = _norm(s)
    counts = [s.count(c) for c in _ALPHABET]
    tot = sum(counts)
    if tot == 0:
        return 0.0
    h = 0.0
    for c in counts:
        if c > 0:
            p = c / tot
            h += -p * math.log(p)
    return h


def py_ngrams(s: str, n: int) -> set[str]:
    toks = _norm(s).split(" ")
    if len(toks) <= n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_texts)
def test_char_entropy_matches_python_oracle(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: r["entropy_nats"]
        for r in add_char_entropy(df).collect()
    }
    for i, t in enumerate(texts):
        expect = round(py_entropy(t), 4)
        assert abs(got[i] - expect) <= 1e-4, (t, got[i], expect)
        # bounds: 0 <= H <= ln(alphabet size)
        assert 0.0 <= got[i] <= math.log(len(_ALPHABET)) + 1e-9


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_texts, _texts)
def test_ngram_hits_match_python_set_intersection(spark, corpus, bench):
    n = 2
    cdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id int, text string"
    )
    bdf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(bench)],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["n_hit_grams"]
        for r in benchmark_ngram_hits(cdf, bdf, n=n).collect()
    }
    bench_grams = set().union(*(py_ngrams(t, n) for t in bench))
    for i, t in enumerate(corpus):
        expect = len(py_ngrams(t, n) & bench_grams)
        assert got.get(i, 0) == expect, (t, got.get(i, 0), expect)
