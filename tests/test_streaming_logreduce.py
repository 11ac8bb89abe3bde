"""Streaming template-novelty monitor: cross-batch signature store and
first-seen alerting (streaming/logreduce.py)."""

from __future__ import annotations

import json

from sumologic_aws_lambda_spark.streaming.logreduce import (
    run_template_novelty,
)


def _write_batch(d, name, rows):
    (d / name).write_text(
        "\n".join(json.dumps({"line": r}) for r in rows) + "\n")


def _run(spark, base):
    q, sink = run_template_novelty(
        spark, str(base / "in"), str(base / "alerts"),
        str(base / "store"), str(base / "ckpt"))
    q.awaitTermination(120)
    return sink


def test_first_batch_alerts_every_template(spark, tmp_path):
    (tmp_path / "in").mkdir()
    _write_batch(tmp_path / "in", "b1.json", [
        "user 1 logged in", "user 2 logged in", "disk 90% full"])
    sink = _run(spark, tmp_path)
    assert sink.batch_stats[-1] == (0, 2, 2)   # 2 templates, both new
    alerts = {
        r["_signature"]: (r["_count"], r["first_seen_batch"])
        for r in spark.read.parquet(str(tmp_path / "alerts")).collect()
    }
    assert alerts == {"user * logged in": (2, 0), "disk *% full": (1, 0)}


def test_second_batch_alerts_only_novel_templates(spark, tmp_path):
    (tmp_path / "in").mkdir()
    _write_batch(tmp_path / "in", "b1.json", [
        "user 1 logged in", "disk 90% full"])
    _run(spark, tmp_path)
    _write_batch(tmp_path / "in", "b2.json", [
        "user 7 logged in",                    # known template: no alert
        "kernel panic code 5",                 # novel: alert
        "kernel panic code 9",                 # same novel template
    ])
    sink = _run(spark, tmp_path)
    assert sink.batch_stats[-1] == (1, 2, 1)
    alerts = spark.read.parquet(str(tmp_path / "alerts"))
    new = {r["_signature"]: r["_count"]
           for r in alerts.filter("first_seen_batch = 1").collect()}
    assert new == {"kernel panic code *": 2}
    # The known-template store now holds all three signatures.
    store = {r["_signature"] for r in
             spark.read.parquet(str(tmp_path / "store")).collect()}
    assert store == {"user * logged in", "disk *% full",
                     "kernel panic code *"}
