"""Product-quantization operator semantics (operators/similarity.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.operators.similarity import (
    pq_adc_topk,
    pq_encode,
    pq_train,
)


@pytest.fixture(scope="module")
def vecs(spark):
    # 8-dim vectors, m=2 subspaces of 4 dims; two tight clusters per
    # subspace so training has an obvious optimum.
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0, 9.0, 9.0, 9.0, 9.0]),
        (1, [9.0, 9.0, 9.0, 9.0, 0.0, 0.0, 0.0, 0.0]),
        (2, [0.1, 0.1, 0.1, 0.1, 9.1, 9.1, 9.1, 9.1]),
        (3, [9.1, 9.1, 9.1, 9.1, 0.1, 0.1, 0.1, 0.1]),
        (4, [0.2, 0.0, 0.1, 0.0, 8.9, 9.0, 9.2, 9.0]),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_pq_train_shapes_and_determinism(vecs):
    b1 = pq_train(vecs, m=2, k=2, iters=1)
    b2 = pq_train(vecs, m=2, k=2, iters=1)
    assert b1 == b2                       # deterministic end to end
    assert len(b1) == 2 and len(b1[0]) == 2 and len(b1[0][0]) == 4
    # After one round the sub-0 codebook separates the near-0 and near-9
    # clusters: one centroid < 1, one > 8 in every dimension.
    lo, hi = sorted(b1[0], key=lambda c: c[0])
    assert all(v < 1.0 for v in lo) and all(v > 8.0 for v in hi)


def test_pq_encode_is_narrow_and_correct(vecs):
    books = pq_train(vecs, m=2, k=2, iters=1)
    codes = pq_encode(vecs, books)
    got = {r.vec_id: list(r.codes) for r in codes.collect()}
    # Docs 0/2/4 share a sub-0 cluster and docs 1/3 the other.
    assert got[0][0] == got[2][0] == got[4][0] != got[1][0] == got[3][0]
    # Narrow projection: no exchange in the encode plan.
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pq_adc_topk_ranks_same_cluster_first(vecs):
    books = pq_train(vecs, m=2, k=2, iters=1)
    codes = pq_encode(vecs, books)
    out = pq_adc_topk(codes, books, vecs.filter(F.col("vec_id") == 0), k=4)
    rows = sorted((r.rank, r.neighbor_id) for r in out.collect())
    # Query 0's nearest PQ neighbors are its own cluster (2, 4) before
    # the opposite cluster (1, 3).
    assert {n for _, n in rows[:2]} == {2, 4}
    assert {n for _, n in rows[2:]} == {1, 3}
    # Distances are non-decreasing with rank.
    d = [r.adc_d2 for r in sorted(out.collect(), key=lambda r: r.rank)]
    assert d == sorted(d)


def test_pq_train_rejects_indivisible_dim(vecs):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(vecs, m=3, k=2)


# --- property tests: Python reference for encode + ADC -------------------

from hypothesis import HealthCheck, given, settings, strategies as st

_vec8 = st.lists(
    st.floats(min_value=-10, max_value=10,
              allow_nan=False, allow_infinity=False, width=32),
    min_size=8, max_size=8,
)


def _py_encode(vec, books):
    m, sub = len(books), len(books[0][0])
    codes = []
    for s in range(m):
        sl = vec[s * sub:(s + 1) * sub]
        d2s = [sum((x - y) * (x - y) for x, y in zip(sl, ce))
               for ce in books[s]]
        codes.append(d2s.index(min(d2s)))   # first min = lowest cid
    return codes


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_vec8, min_size=2, max_size=6))
def test_pq_encode_matches_python_argmin(spark, vecs):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    books = pq_train(df, m=2, k=2, iters=0)   # seed books, no training
    got = {r.vec_id: list(r.codes) for r in pq_encode(df, books).collect()}
    for i, v in enumerate(vecs):
        assert got[i] == _py_encode(v, books), (i, v, books)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_vec8, min_size=3, max_size=5))
def test_pq_adc_matches_python_distance(spark, vecs):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    books = pq_train(df, m=2, k=2, iters=0)
    codes = pq_encode(df, books)
    out = pq_adc_topk(codes, books, df.filter(F.col("vec_id") == 0),
                      k=len(vecs)).collect()
    py_codes = {i: _py_encode(v, books) for i, v in enumerate(vecs)}
    q = vecs[0]
    sub = len(books[0][0])
    for r in out:
        c = py_codes[r.neighbor_id]
        want = 0.0
        for s in range(len(books)):
            ce = books[s][c[s]]
            sl = q[s * sub:(s + 1) * sub]
            want += sum((x - y) * (x - y) for x, y in zip(sl, ce))
        assert abs(r.adc_d2 - round(want, 6)) < 1e-6, (r, want)


# ------------------------------------------------------------- IVF-PQ

@pytest.fixture(scope="module")
def ivf_corpus(spark):
    # Two well-separated direction clusters (cosine cells) with distinct
    # magnitudes inside each so ADC ranking is non-trivial.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),   # centroid A
        (1, [0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0]),   # centroid B
        (2, [2.0, 0.1, 0.0, 0.0, 2.0, 0.1, 0.0, 0.0]),   # near A
        (3, [2.1, 0.0, 0.1, 0.0, 2.1, 0.0, 0.1, 0.0]),   # near A
        (4, [0.1, 2.0, 0.0, 0.0, 0.1, 2.0, 0.0, 0.0]),   # near B
        (5, [0.0, 2.1, 0.0, 0.1, 0.0, 2.1, 0.0, 0.1]),   # near B
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_ivfpq_prunes_to_probed_cell_and_ranks(spark, ivf_corpus):
    from sumologic_aws_lambda_spark.operators.similarity import (
        ivfpq_adc_topk,
    )

    books = pq_train(ivf_corpus, m=2, k=2, iters=1)
    cents = ivf_corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    queries = ivf_corpus.filter(F.col("vec_id") == 2)
    out = ivfpq_adc_topk(ivf_corpus, books, cents, queries,
                         k=5, nprobe=1).collect()
    got = {r["neighbor_id"] for r in out}
    # nprobe=1 → only cell A members (0, 2, 3) are candidates; the
    # query itself is excluded, B-cell vectors are pruned out.
    assert got == {0, 3}
    assert all(r["query_id"] == 2 for r in out)
    ranks = {r["neighbor_id"]: r["rank"] for r in out}
    assert sorted(ranks.values()) == [1, 2]


def test_ivfpq_nprobe_widens_candidates(spark, ivf_corpus):
    from sumologic_aws_lambda_spark.operators.similarity import (
        ivfpq_adc_topk,
    )

    books = pq_train(ivf_corpus, m=2, k=2, iters=1)
    cents = ivf_corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    queries = ivf_corpus.filter(F.col("vec_id") == 2)
    n1 = ivfpq_adc_topk(ivf_corpus, books, cents, queries,
                        k=10, nprobe=1).count()
    n2 = ivfpq_adc_topk(ivf_corpus, books, cents, queries,
                        k=10, nprobe=2).count()
    assert n2 == 5 and n1 < n2     # all non-self vectors once both cells probed


def test_ivfpq_single_shuffle_no_smj(spark, ivf_corpus):
    from sumologic_aws_lambda_spark.operators.similarity import (
        ivfpq_adc_topk,
    )

    books = pq_train(ivf_corpus, m=2, k=2, iters=0)
    cents = ivf_corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    plan = ivfpq_adc_topk(
        ivf_corpus, books, cents,
        ivf_corpus.filter(F.col("vec_id") == 2),
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # The corpus side sees exactly ONE hash exchange: the top-k window.
    assert plan.count("Exchange hashpartitioning") == 1
