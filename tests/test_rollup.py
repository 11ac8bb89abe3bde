"""Unit tests for the rollup hierarchy (operators/rollup.py)."""

from __future__ import annotations

import pytest

from sumologic_aws_lambda_spark.operators.rollup import (
    GRAIN_SECONDS,
    build_rollup,
    coarsen,
    read_rollup,
    route_grain,
)


def test_route_grain_picks_coarsest_useful():
    hour = 3600
    assert route_grain(0, 10 * 60, max_points=1000) == "1m"
    assert route_grain(0, 30 * 24 * hour, max_points=1000) == "1h"
    assert route_grain(0, 10 * 365 * 24 * hour, max_points=1000) == "1d"
    # nothing fits → coarsest available
    assert route_grain(0, 10**10, max_points=10) == "1d"


def test_grains_nest():
    secs = sorted(GRAIN_SECONDS.values())
    assert all(b % a == 0 for a, b in zip(secs, secs[1:]))


def test_coarsen_rejects_non_multiple():
    with pytest.raises(ValueError, match="not a multiple"):
        coarsen(None, "1d", "1h")


def test_rollup_and_read(spark):
    rows = [
        ("2024-01-01 00:10:00", "a", 1.0),
        ("2024-01-01 00:50:00", "a", 3.0),
        ("2024-01-01 01:10:00", "a", 5.0),
        ("2024-01-01 00:20:00", "b", 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "ts string, event_type string, value double"
    ).selectExpr("CAST(ts AS TIMESTAMP) ts", "event_type", "value")

    hourly = build_rollup(ev, "1h")
    start = 1704067200  # 2024-01-01T00:00Z
    got = {
        (r["bucket_start"], r["event_type"]): (r["n"], r["sum_value"],
                                               r["avg_value"])
        for r in read_rollup(hourly, start, start + 7200).collect()
    }
    assert got[(start, "a")] == (2, 4.0, 2.0)
    assert got[(start + 3600, "a")] == (1, 5.0, 5.0)
    assert got[(start, "b")] == (1, 7.0, 7.0)

    daily = coarsen(hourly, "1h", "1d")
    d = {r["event_type"]: (r["n"], r["sum_value"], r["min_value"],
                           r["max_value"])
         for r in daily.collect()}
    assert d["a"] == (3, 9.0, 1.0, 5.0)
