"""Streaming PSI drift monitor (streaming/drift.py) — the foreachBatch
twin of queries/drift.py::psi_drift_score."""

from __future__ import annotations

import json
import math

import pytest

from sumologic_aws_lambda_spark.streaming.drift import (
    PsiDriftMonitor,
    reference_shares,
)


def test_reference_shares_counts_categories(spark):
    ref = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "k string")
    assert reference_shares(ref, "k") == {"a": 2, "b": 1}


def test_psi_zero_on_identical_distribution(spark):
    mon = PsiDriftMonitor({"a": 50, "b": 50}, col="k")
    batch = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 50, "k string")
    mon(batch, batch_id=0)
    r = mon.reports[0]
    assert r.rows == 100 and r.psi == 0.0 and not r.drifted


def test_psi_flags_shifted_batch_and_handles_novel_category(spark):
    mon = PsiDriftMonitor({"a": 90, "b": 10}, col="k", threshold=0.2)
    # heavily shifted batch plus a category absent from the reference
    batch = spark.createDataFrame(
        [("b",)] * 80 + [("a",)] * 10 + [("c",)] * 10, "k string")
    mon(batch, batch_id=1)
    r = mon.reports[0]
    assert r.drifted and r.psi > 0.2
    # Laplace smoothing keeps the novel category's term finite
    assert math.isfinite(r.terms["c"]) and r.terms["c"] > 0
    assert mon.drifted_batches == [1]


def test_psi_monitor_over_file_stream(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "b.json").write_text(
        "\n".join(json.dumps({"k": k})
                  for k in ["a"] * 5 + ["b"] * 45))
    mon = PsiDriftMonitor({"a": 50, "b": 50}, col="k", threshold=0.2)
    stream = spark.readStream.schema("k string").json(str(src))
    q = stream.writeStream.foreachBatch(mon).trigger(
        availableNow=True).start()
    q.awaitTermination(120)
    assert len(mon.reports) == 1
    assert mon.reports[0].rows == 50
    assert mon.reports[0].drifted  # 50/50 -> 10/90 is significant


def test_empty_reference_rejected():
    with pytest.raises(ValueError):
        PsiDriftMonitor({}, col="k")


def test_null_category_uses_sentinel_not_crash(spark):
    mon = PsiDriftMonitor({"a": 10, "(null)": 10}, col="k")
    batch = spark.createDataFrame(
        [("a",), (None,), (None,)], "k string")
    mon(batch, batch_id=0)
    r = mon.reports[0]
    assert r.rows == 3 and "(null)" in r.terms
    ref = spark.createDataFrame([("a",), (None,)], "k string")
    assert reference_shares(ref, "k") == {"a": 1, "(null)": 1}
