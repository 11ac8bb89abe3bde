"""Unit tests for the metrics service (plans/metrics_service.py)."""

from __future__ import annotations

import pytest

from sumologic_aws_lambda_spark.plans.metrics_service import (
    MetricsQuery,
    metrics_results,
    quantize_interval,
    to_api_response,
)


def test_quantize_interval_honors_both_knobs():
    assert quantize_interval(0, 3600, 60) == 60
    assert quantize_interval(0, 3600, 1_000_000, max_datapoints=100) == 36
    assert quantize_interval(0, 10, 100) == 1          # floor at 1 s
    assert quantize_interval(0, 100, 7) == 15          # ceil division


@pytest.fixture(scope="module")
def metrics(spark):
    rows = [
        ("2024-01-01 00:00:10", "cpu", {"host": "web-1"}, 10.0),
        ("2024-01-01 00:00:50", "cpu", {"host": "web-2"}, 30.0),
        ("2024-01-01 00:01:10", "cpu", {"host": "db-1"}, 50.0),
        ("2024-01-01 00:01:30", "mem", {"host": "web-1"}, 70.0),
    ]
    df = spark.createDataFrame(
        rows, "ts string, metric string, dims map<string,string>, value double"
    )
    return df.selectExpr("CAST(ts AS TIMESTAMP) ts", "metric", "dims", "value")


def test_selector_and_buckets(metrics):
    start = 1704067200  # 2024-01-01T00:00:00Z
    out = metrics_results(
        metrics,
        [MetricsQuery("A", "metric=cpu host=web-*"),
         MetricsQuery("B", "metric=cpu")],
        start_epoch=start, end_epoch=start + 120,
        requested_datapoints=2,      # → 60 s buckets
    ).collect()
    a = {(r["bucket_start"], r["avg_value"])
         for r in out if r["row_id"] == "A"}
    assert a == {(start, 20.0)}                       # web-1+web-2 averaged
    b = {(r["bucket_start"], r["avg_value"])
         for r in out if r["row_id"] == "B"}
    assert b == {(start, 20.0), (start + 60, 50.0)}   # db-1 in bucket 2


def test_one_scan_for_all_rows(metrics):
    out = metrics_results(
        metrics,
        [MetricsQuery("A", "metric=cpu"), MetricsQuery("B", "metric=mem")],
        start_epoch=1704067200, end_epoch=1704067200 + 600,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1                   # tag+explode, no union


def test_api_response_shape(metrics):
    rows = metrics_results(
        metrics, [MetricsQuery("A", "metric=cpu")],
        start_epoch=1704067200, end_epoch=1704067200 + 600,
        requested_datapoints=10,
    ).collect()
    resp = to_api_response([r.asDict() for r in rows])
    assert resp["response"][0]["rowId"] == "A"
    dp = resp["response"][0]["results"][0]["datapoints"]
    assert len(dp["timestamps"]) == len(dp["values"]) > 0
    assert dp["timestamps"] == sorted(dp["timestamps"])


def test_bad_selector_raises(metrics):
    with pytest.raises(ValueError, match="bad selector"):
        metrics_results(metrics, [MetricsQuery("A", "cpu")],
                        start_epoch=0, end_epoch=10)


def test_bucket_count_never_exceeds_requested_points(spark):
    from pyspark.sql import functions as F

    """Unaligned start must not leak a maxDataPoints+1-th bucket: the
    classic off-by-one of epoch-zero-aligned bucketing."""
    from sumologic_aws_lambda_spark.plans.metrics_service import (
        MetricsQuery,
        metrics_results,
    )

    rows = [("m", {}, float(i), 35 + i * 10) for i in range(800)]
    df = spark.createDataFrame(
        rows, "metric string, dims map<string,string>, value double, es long"
    ).withColumn("ts", F.timestamp_seconds("es"))
    out = metrics_results(
        df, [MetricsQuery("A", "metric=m")],
        start_epoch=35, end_epoch=8035, requested_datapoints=800,
    )
    buckets = [r["bucket_start"] for r in out.collect()]
    assert len(set(buckets)) <= 800
    assert min(buckets) >= 35           # aligned to the range start
