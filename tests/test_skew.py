"""Unit tests for skew-mitigation operators (operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.operators.skew import (
    replicated_join,
    salt_from,
    salted_agg,
)


def _skewed(spark):
    # one hot key (90%) + tail
    rows = [(i, "hot" if i % 10 else "cold", float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, "id int, k string, v double")


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["k"]): (r["n"], r["s"], round(r["m"], 6), r["lo"], r["hi"])
        for r in df.groupBy("k").agg(
            F.count("id").alias("n"), F.sum("v").alias("s"),
            F.avg("v").alias("m"), F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        ).collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"], round(r["m"], 6), r["lo"], r["hi"])
        for r in salted_agg(
            df, ["k"],
            {"n": "count(id)", "s": "sum(v)", "m": "avg(v)",
             "lo": "min(v)", "hi": "max(v)"},
            salt=salt_from("id", 8),
        ).collect()
    }
    assert salted == plain


def test_salted_agg_two_phase_plan(spark):
    df = _skewed(spark)
    out = salted_agg(df, ["k"], {"n": "count(id)"}, salt=salt_from("id", 8))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2


def test_replicated_join_matches_plain(spark):
    facts = _skewed(spark)
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold", "C")], "k string, label string"
    )
    plain = sorted(
        tuple(r) for r in facts.join(dim, "k", "left")
        .select("id", "label").collect()
    )
    salted = sorted(
        tuple(r) for r in replicated_join(
            facts, dim, "k", fan_out=8, fact_salt=salt_from("id", 8)
        ).select("id", "label").collect()
    )
    assert salted == plain


def test_salted_agg_count_star(spark):
    df = _skewed(spark)
    out = {r["k"]: r["n"] for r in salted_agg(
        df, ["k"], {"n": "count(*)"}, salt=salt_from("id", 8)).collect()}
    plain = {r["k"]: r["n"] for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert out == plain


def test_salt_from_is_never_negative(spark):
    """pmod, not abs(hash)%n: abs(Integer.MIN_VALUE) is negative and a
    negative salt silently misses every dim replica."""
    df = spark.createDataFrame([(i,) for i in range(5000)], "id long")
    mins = df.select(
        F.min(salt_from("id", 10)).alias("lo"),
        F.max(salt_from("id", 10)).alias("hi"),
    ).collect()[0]
    assert mins["lo"] >= 0 and mins["hi"] <= 9
    # the literal failure case: a value hashing to Integer.MIN_VALUE is
    # hard to construct, so assert the expression form directly
    expr = salt_from(F.lit(-2147483648).cast("int"), 10)
    got = spark.range(1).select(expr.alias("s")).collect()[0]["s"]
    assert 0 <= got <= 9
