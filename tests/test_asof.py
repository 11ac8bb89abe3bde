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


# ---------------------------------------------------- interval overlap

def _iv(spark, rows, side):
    if side == "l":
        return spark.createDataFrame(rows, "k long, lid long, ls long, le long")
    return spark.createDataFrame(rows, "k long, rid long, rs long, re long")


def test_interval_overlap_basic_and_half_open(spark):
    from sumologic_aws_lambda_spark.operators.asof import (
        interval_overlap_join,
    )

    left = _iv(spark, [(1, 10, 0, 100), (1, 11, 200, 300)], "l")
    right = _iv(spark, [
        (1, 20, 50, 150),     # overlaps lid 10
        (1, 21, 100, 120),    # touches lid 10 at its end: half-open -> NO
        (1, 22, 299, 310),    # overlaps lid 11 by 1 unit
        (2, 23, 0, 1000),     # other key: never matches
    ], "r")
    out = sorted((r["lid"], r["rid"]) for r in interval_overlap_join(
        left, right, "ls", "le", "rs", "re", on="k", bucket=60).collect())
    assert out == [(10, 20), (11, 22)]


def test_interval_overlap_emits_each_pair_once_across_buckets(spark):
    from sumologic_aws_lambda_spark.operators.asof import (
        interval_overlap_join,
    )

    # Both intervals span many tiny buckets; the pair must appear once.
    left = _iv(spark, [(1, 10, 0, 1000)], "l")
    right = _iv(spark, [(1, 20, 500, 900)], "r")
    out = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", on="k", bucket=10).collect()
    assert len(out) == 1


def test_interval_overlap_drops_degenerate_and_rejects_clash(spark):
    import pytest as _pytest
    from sumologic_aws_lambda_spark.operators.asof import (
        interval_overlap_join,
    )

    left = _iv(spark, [(1, 10, 100, 100)], "l")    # empty interval
    right = _iv(spark, [(1, 20, 0, 1000)], "r")
    assert interval_overlap_join(
        left, right, "ls", "le", "rs", "re", on="k").count() == 0
    clashing = left.withColumnRenamed("lid", "rid")
    with _pytest.raises(ValueError):
        interval_overlap_join(clashing, right, "ls", "le", "rs", "re",
                              on="k")


def test_interval_overlap_plan_is_equi_join(spark):
    from sumologic_aws_lambda_spark.operators.asof import (
        interval_overlap_join,
    )

    left = _iv(spark, [(1, 10, 0, 100)], "l")
    right = _iv(spark, [(1, 20, 50, 150)], "r")
    plan = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", on="k",
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_overlap_matches_nested_loop(spark):
    """Property: the bucketized plan equals the O(n·m) reference for a
    grid of boundary-heavy intervals at several bucket widths."""
    from sumologic_aws_lambda_spark.operators.asof import (
        interval_overlap_join,
    )

    # Boundary-heavy deterministic grid: starts/ends on and off bucket
    # edges, multiple keys, degenerate and containing intervals.
    lrows = [(k, 100 + i, s, s + d)
             for i, (k, s, d) in enumerate(
                 [(1, 0, 10), (1, 10, 10), (1, 15, 1), (1, 19, 41),
                  (2, 0, 100), (2, 60, 0), (1, 30, 30)])]
    rrows = [(k, 200 + i, s, s + d)
             for i, (k, s, d) in enumerate(
                 [(1, 5, 10), (1, 20, 10), (1, 10, 0), (1, 59, 2),
                  (2, 99, 2), (2, 0, 1), (1, 0, 60)])]
    left = _iv(spark, lrows, "l")
    right = _iv(spark, rrows, "r")
    expect = sorted(
        (lk, lid, rid)
        for (lk, lid, ls, le) in lrows
        for (rk, rid, rs, re) in rrows
        if lk == rk and le > ls and re > rs and ls < re and rs < le)
    for bucket in (1, 7, 10, 64, 1000):
        got = sorted((r["k"], r["lid"], r["rid"])
                     for r in interval_overlap_join(
                         left, right, "ls", "le", "rs", "re",
                         on="k", bucket=bucket).collect())
        assert got == expect, f"bucket={bucket}"


def test_interval_overlap_fractional_bounds(spark):
    """ADVICE r6: fractional timestamps with end - start < 1 must not
    make the bucket sequence descend — every true pair is found exactly
    once, cross-checked against a brute-force pass."""
    from sumologic_aws_lambda_spark.operators.asof import (
        interval_overlap_join,
    )

    lrows = [(i, 0.3 * i, 0.3 * i + 0.25) for i in range(40)]
    rrows = [(j, 0.45 * j + 0.1, 0.45 * j + 0.4) for j in range(30)]
    left = spark.createDataFrame(
        lrows, "lid int, ls double, le double")
    right = spark.createDataFrame(
        rrows, "rid int, rs double, re double")
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket=2).collect())
    want = sorted(
        (li, rj)
        for (li, ls, le) in lrows for (rj, rs, re) in rrows
        if ls < re and rs < le)
    assert got == want and want          # non-empty and exact
