"""Property-based tests: the time-series stages must agree with
straight-line Python re-implementations on arbitrary series.

Same §5 strategy as test_property_folds.py — the Python oracles below
are deliberately naive loops; the Spark stages are windowed plans whose
ordering/frame subtleties (trailing frames, baseline-excludes-current,
group partitioning) are exactly what these pin down.
"""

from __future__ import annotations

import datetime
import math

from hypothesis import HealthCheck, given, settings, strategies as st

from sumologic_aws_lambda_spark.plans.sumoql import SumoSchema, compile_query
from pyspark.sql import functions as F

SCHEMA = SumoSchema(raw_col="msg", ts_col="ts")

_series_strategy = st.lists(
    st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=12
)


def _frame(spark, values):
    rows = [
        (datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i), v)
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "ts timestamp, v long").withColumn(
        "_timeslice", F.col("ts")
    )


def _collect(df, col):
    return [
        r[col] for r in df.orderBy("_timeslice").select("_timeslice", col)
        .collect()
    ]


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(values=_series_strategy)
def test_accum_equals_python_cumsum(spark, values):
    out = compile_query(_frame(spark, values), "* | accum v", SCHEMA)
    got = _collect(out, "_accum")
    run, expect = 0, []
    for v in values:
        run += v
        expect.append(float(run))
    assert got == expect


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(values=_series_strategy, n=st.integers(min_value=1, max_value=4))
def test_backshift_and_diff_equal_python(spark, values, n):
    out = compile_query(
        _frame(spark, values), f"* | backshift v, {n} | diff v", SCHEMA
    )
    assert _collect(out, "_backshift") == [
        values[i - n] if i >= n else None for i in range(len(values))
    ]
    assert _collect(out, "_diff") == [
        values[i] - values[i - 1] if i >= 1 else None
        for i in range(len(values))
    ]


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(values=_series_strategy, w=st.integers(min_value=1, max_value=5))
def test_smooth_equals_python_trailing_mean(spark, values, w):
    out = compile_query(
        _frame(spark, values), f"* | smooth v, {w}", SCHEMA
    )
    got = _collect(out, "_smooth")
    for i, g in enumerate(got):
        window = values[max(0, i - w + 1): i + 1]
        assert math.isclose(g, sum(window) / len(window), rel_tol=1e-12)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(values=_series_strategy)
def test_outlier_flags_match_python(spark, values):
    out = compile_query(
        _frame(spark, values), "* | outlier v window=4 threshold=2", SCHEMA
    )
    got = _collect(out, "_violation")
    for i, g in enumerate(got):
        base = values[max(0, i - 4): i]
        if len(base) < 2:
            assert g == 0
            continue
        mu = sum(base) / len(base)
        var = sum((x - mu) ** 2 for x in base) / (len(base) - 1)
        sigma = math.sqrt(max(var, 0.0))
        assert g == (1 if abs(values[i] - mu) > 2 * sigma else 0)
