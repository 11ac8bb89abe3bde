"""Bucketed co-located joins: the 100 TB fact⋈fact strategy.

At scale, orders⋈lineitem on every query would shuffle both sides each
time.  Writing both tables bucketed by the join key makes the join
shuffle-free forever after — this test proves the engine produces that
plan (no Exchange feeding the SortMergeJoin) and that results match the
shuffled join.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buck LOCATION '{wh}'")
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        df = spark.read.parquet(f"{SF_DIR}/{name}.parquet")
        (df.write.mode("overwrite").format("parquet")
         .bucketBy(8, key).sortBy(key)
         .saveAsTable(f"buck.{name}"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS buck.orders")
    spark.sql("DROP TABLE IF EXISTS buck.lineitem")
    spark.sql("DROP DATABASE IF EXISTS buck")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    o = spark.table("buck.orders")
    li = spark.table("buck.lineitem")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
        "o_orderstatus"
    ).agg(F.count(F.lit(1)).alias("n"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_part = plan[plan.index("SortMergeJoin"):] if "SortMergeJoin" \
        in plan else plan
    # no exchange below the join: both sides read pre-bucketed
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, \
        join_part[:400]


def test_bucketed_join_matches_shuffled(bucketed):
    spark = bucketed
    o_raw = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li_raw = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    expected = sorted(
        tuple(r) for r in li_raw.join(
            o_raw, li_raw.l_orderkey == o_raw.o_orderkey
        ).groupBy("o_orderstatus").count().collect()
    )
    got = sorted(
        tuple(r) for r in spark.table("buck.lineitem").join(
            spark.table("buck.orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).groupBy("o_orderstatus").count().collect()
    )
    assert got == expected
