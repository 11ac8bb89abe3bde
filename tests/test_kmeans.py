"""Unit tests for kmeans_lite (operators/similarity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.operators.similarity import kmeans_lite


def _corpus(spark):
    # two tight blobs around (0,0) and (10,10)
    pts = [(i, [0.0 + i * 0.01, 0.1]) for i in range(5)]
    pts += [(10 + i, [10.0 + i * 0.01, 9.9]) for i in range(5)]
    return spark.createDataFrame(pts, "vec_id bigint, embedding array<double>")


def test_two_blobs_separate(spark):
    assign, final = kmeans_lite(_corpus(spark), k=2, iters=3)
    got = {r.vec_id: r.cid for r in assign.collect()}
    low = {got[i] for i in range(5)}
    high = {got[10 + i] for i in range(5)}
    assert len(low) == 1 and len(high) == 1 and low != high
    assert sorted(n for _, n, _ in final) == [5, 5]


def test_assignment_is_deterministic(spark):
    a1, f1 = kmeans_lite(_corpus(spark), k=2, iters=2)
    a2, f2 = kmeans_lite(_corpus(spark), k=2, iters=2)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    assert f1 == f2


def test_empty_cluster_keeps_centroid(spark):
    # k=3 over 2 distinct points: one centroid gets nothing assigned and
    # must survive the round without crashing or renumbering
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0])],
        "vec_id bigint, embedding array<double>",
    )
    assign, final = kmeans_lite(df, k=3, iters=2)
    assert assign.count() == 3
    assert sum(n for _, n, _ in final) == 3
