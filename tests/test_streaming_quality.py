"""Tests for the streaming data-quality gate: single-pass rule
evaluation, deliver-vs-quarantine routing, the _violations.json
marker, and drain_quarantine's refusal to redeliver validation
failures."""

from __future__ import annotations

import json
import os

import pytest

from sumologic_aws_lambda_spark.streaming.quality import (
    QualityGateSink,
    in_range,
    in_set,
    not_null,
    unique,
)


@pytest.fixture()
def sink(tmp_path):
    checks = {
        "complete_user": not_null("user_id"),
        "unique_event": unique("event_id"),
        "value_in_range": in_range("value", 0.0, 1000.0),
        "type_in_domain": in_set("event_type", ["click", "view"]),
    }
    return QualityGateSink(
        checks, out_dir=str(tmp_path / "out"),
        quarantine_dir=str(tmp_path / "quarantine"))


def _clean(spark):
    return spark.createDataFrame(
        [(1, 10, "click", 5.0), (2, 11, "view", 7.5)],
        "event_id long, user_id long, event_type string, value double")


def _dirty(spark):
    return spark.createDataFrame(
        [(3, None, "click", 5.0),       # null user
         (4, 12, "purchase", 5.0),      # off-domain type
         (4, 13, "view", -2.0)],        # dup id + out-of-range value
        "event_id long, user_id long, event_type string, value double")


def test_clean_batch_delivered(spark, sink):
    sink(_clean(spark), 0)
    [r] = sink.reports
    assert r.passed and r.rows == 2 and r.violations == {}
    out = spark.read.parquet(f"{sink.out_dir}/batch_id=0")
    assert out.count() == 2
    assert not os.path.exists(sink.quarantine_dir)


def test_dirty_batch_quarantined_with_report(spark, sink):
    sink(_dirty(spark), 1)
    [r] = sink.reports
    assert not r.passed
    assert r.violations == {
        "complete_user": 1, "unique_event": 1,
        "value_in_range": 1, "type_in_domain": 1,
    }
    qdir = f"{sink.quarantine_dir}/batch_id=1"
    assert spark.read.parquet(qdir).count() == 3
    rep = json.load(open(f"{qdir}/_violations.json"))
    assert rep["violations"]["type_in_domain"] == 1
    assert not os.path.exists(f"{sink.out_dir}/batch_id=1")


def test_single_job_per_batch(spark, sink):
    """All rules score in ONE aggregate — the whole suite is a single
    collect regardless of rule count."""
    df = _clean(spark)
    rows, metrics = sink._metrics(df)
    assert rows == 2 and set(metrics) == set(sink.checks)


def test_drain_skips_quality_quarantine(spark, sink, tmp_path):
    from sumologic_aws_lambda_spark.streaming.pipeline import (
        drain_quarantine,
    )

    sink(_dirty(spark), 2)
    qdir = f"{sink.quarantine_dir}/batch_id=2"
    assert os.path.exists(f"{qdir}/_violations.json")
    reports = drain_quarantine(
        spark, sink.quarantine_dir, out_dir=str(tmp_path / "drained"))
    # the validation failure stays parked, nothing was delivered
    assert reports == []
    assert os.path.exists(qdir)
    assert not os.path.exists(str(tmp_path / "drained"))


def test_stream_stream_interval_join(spark, tmp_path):
    """Two file streams; purchases attribute to the LATEST same-user
    click at most 30 min earlier — one row per purchase even with two
    in-window clicks.  The last-touch aggregate only emits once the
    watermark passes the purchase time, so a second batch of later
    events (maxFilesPerTrigger=1 forces the batch boundary) advances
    the watermark and flushes the first batch's results — exactly the
    production behavior."""
    import json as _json
    import time as _time

    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    clicks_dir.mkdir()
    buys_dir.mkdir()
    (clicks_dir / "c0.json").write_text("\n".join(_json.dumps(r) for r in [
        {"user_id": 1, "ts": "2024-01-01T10:00:00"},   # in window
        {"user_id": 1, "ts": "2024-01-01T09:50:00"},   # earlier in-window
        {"user_id": 2, "ts": "2024-01-01T09:00:00"},   # 65 min early
        {"user_id": 3, "ts": "2024-01-01T10:20:00"},   # after purchase
    ]))
    (buys_dir / "p0.json").write_text("\n".join(_json.dumps(r) for r in [
        {"user_id": 1, "ts": "2024-01-01T10:05:00", "value": 9.5},
        {"user_id": 2, "ts": "2024-01-01T10:05:00", "value": 4.0},
        {"user_id": 3, "ts": "2024-01-01T10:05:00", "value": 2.5},
    ]))
    _time.sleep(1.1)   # file-source ordering is by modification time
    (clicks_dir / "c1.json").write_text(_json.dumps(
        {"user_id": 98, "ts": "2024-01-01T16:00:00"}))
    (buys_dir / "p1.json").write_text(_json.dumps(
        {"user_id": 99, "ts": "2024-01-01T16:00:00", "value": 1.0}))
    schema_c = "user_id long, ts timestamp"
    schema_p = "user_id long, ts timestamp, value double"
    from sumologic_aws_lambda_spark.streaming.pipeline import (
        streaming_interval_join,
    )

    joined = streaming_interval_join(
        spark.readStream.schema(schema_c)
        .option("maxFilesPerTrigger", 1).json(str(clicks_dir)),
        spark.readStream.schema(schema_p)
        .option("maxFilesPerTrigger", 1).json(str(buys_dir)),
    )
    out = tmp_path / "out"
    q = (joined.writeStream.format("parquet")
         .option("path", str(out))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.read.parquet(str(out)).collect()
    # user 1: ONE row, attributed to the LATEST in-window click
    assert {(r["user_id"], str(r["click_ts"]), r["purchase_value"])
            for r in rows} == {(1, "2024-01-01 10:00:00", 9.5)}
