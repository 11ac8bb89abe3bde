"""Unit tests for the as-of join operator (SURVEY §2.5 absent row)."""

import pytest

from sumologic_aws_lambda_spark.operators.asof import asof_join


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def test_asof_basic_and_tie(spark):
    left = spark.createDataFrame(
        [("a", 10, "l1"), ("a", 20, "l2"), ("b", 5, "l3")],
        "k string, ts long, lval string",
    )
    right = spark.createDataFrame(
        [("a", 10, "r10"), ("a", 15, "r15"), ("b", 9, "r9")],
        "k string, ts long, rval string",
    )
    out = asof_join(
        left, right.withColumnRenamed("ts", "rts"),
        on="k", left_ts="ts", right_ts="rts", right_cols=["rval"],
    ).select("k", "ts", "lval", "rval")
    assert _collect(out) == [
        ("a", 10, "l1", "r10"),  # equal ts matches (<= semantics)
        ("a", 20, "l2", "r15"),
        ("b", 5, "l3", None),    # no right row at-or-before → null
    ]


def test_asof_strict_excludes_equal_ts(spark):
    left = spark.createDataFrame([("a", 10, "l1")], "k string, ts long, lv string")
    right = spark.createDataFrame(
        [("a", 10, "r10"), ("a", 9, "r9")], "k string, rts long, rval string"
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_cols=["rval"], strict=True,
    )
    assert _collect(out.select("k", "rval")) == [("a", "r9")]


def test_asof_column_collision_rejected(spark):
    df = spark.createDataFrame([("a", 1, "x")], "k string, ts long, v string")
    with pytest.raises(ValueError, match="collides"):
        asof_join(df, df, on="k", left_ts="ts", right_ts="ts",
                  right_cols=["v"])


def test_asof_attaches_whole_row_not_mixed_columns(spark):
    """A legitimately-NULL right value must come through as NULL from
    the matched row — not be back-filled from an older right row."""
    from sumologic_aws_lambda_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 3)], "id string, lts long")
    right = spark.createDataFrame(
        [("k", 1, 1, 2), ("k", 2, None, 3)],
        "id string, rts long, a long, b long")
    out = asof_join(left, right, "id", "lts", "rts",
                    ["a", "b"]).collect()[0]
    assert out["a"] is None and out["b"] == 3   # the ts=2 row, atomically
