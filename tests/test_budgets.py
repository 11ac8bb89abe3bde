"""Ingest-budget operator tests (operators/budgets.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.operators.budgets import apply_ingest_budget


def _frame(spark):
    rows = [
        # hot key: 4 rows x 40 bytes = 160 > 100 budget
        (1, "hot", "a" * 40), (2, "hot", "b" * 40),
        (3, "hot", "c" * 40), (4, "hot", "d" * 40),
        # cold key: 2 rows x 30 = 60 <= 100
        (5, "cold", "e" * 30), (6, "cold", "f" * 30),
    ]
    return spark.createDataFrame(rows, "id int, key string, msg string")


def test_cutoff_flags_rows_past_budget(spark):
    out = apply_ingest_budget(
        _frame(spark), budget_bytes=100,
        key_cols=["key"], order_cols=["id"], size=F.length("msg"),
    )
    got = {r.id: r._over_budget for r in out.collect()}
    # hot: rows 1-2 reach 80, row 3 hits 120 > 100 → flagged from row 3
    assert got == {1: False, 2: False, 3: True, 4: True,
                   5: False, 6: False}


def test_under_budget_keys_avoid_the_window_branch(spark):
    out = apply_ingest_budget(
        _frame(spark), budget_bytes=100,
        key_cols=["key"], order_cols=["id"], size=F.length("msg"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # hot-key isolation is a broadcast anti/semi pair; exactly one
    # window subtree exists and it sits behind the semi join.
    assert "BroadcastHashJoin" in plan and plan.count("Window") == 1


def test_bad_params_raise(spark):
    df = _frame(spark)
    with pytest.raises(ValueError):
        apply_ingest_budget(df, 0, ["key"], ["id"], F.length("msg"))
    with pytest.raises(ValueError):
        apply_ingest_budget(df, 10, [], ["id"], F.length("msg"))


def test_null_keys_are_enforced(spark):
    rows = [(1, None, "a" * 40), (2, None, "b" * 40),
            (3, None, "c" * 40), (4, None, "d" * 40)]
    df = spark.createDataFrame(rows, "id int, key string, msg string")
    out = apply_ingest_budget(
        df, budget_bytes=100,
        key_cols=["key"], order_cols=["id"], size=F.length("msg"),
    )
    got = {r.id: r._over_budget for r in out.collect()}
    assert got == {1: False, 2: False, 3: True, 4: True}


def test_budget_cutoff_is_rows_accurate_under_ties(spark):
    """Rows tying on order_cols must not all inherit the peer-inclusive
    RANGE sum: with a 100-byte budget and two 60-byte rows at the same
    ts, exactly one flags."""
    from pyspark.sql import functions as F

    from sumologic_aws_lambda_spark.operators.budgets import (
        apply_ingest_budget,
    )

    df = spark.createDataFrame(
        [("k", 1, "x" * 60), ("k", 1, "y" * 60)],
        "key string, ts long, msg string")
    out = apply_ingest_budget(df, budget_bytes=100, key_cols=["key"],
                              order_cols=["ts"], size=F.length("msg"))
    flags = sorted(r["_over_budget"] for r in out.collect())
    assert flags == [False, True]
