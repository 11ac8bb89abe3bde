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


# ---------------------------------------------- centroid drift monitor


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "label string, e array<double>")


def test_centroid_monitor_accumulates_and_stays_quiet_on_same_dist(spark):
    from sumologic_aws_lambda_spark.streaming.drift import (
        CentroidDriftMonitor,
        reference_centroids,
    )

    ref = _vecs(spark, [("a", [1.0, 0.0]), ("a", [0.9, 0.1]),
                        ("b", [0.0, 1.0])])
    mon = CentroidDriftMonitor(reference_centroids(ref, "label", "e"),
                               "label", "e", threshold=0.98)
    mon(_vecs(spark, [("a", [1.0, 0.05]), ("b", [0.0, 2.0])]), 0)
    mon(_vecs(spark, [("a", [0.95, 0.05])]), 1)
    assert mon.drifted_batches == []
    # running state accumulated: label a has 2 rows after batch 1
    assert mon.reports[1].labels["a"][2] == 2
    # norm_ratio is MEAN-centroid based: 'b' at 2x magnitude reads ~2.0
    assert mon.reports[0].labels["b"][1] == pytest.approx(2.0, abs=0.01)


def test_centroid_monitor_alerts_on_semantic_shift_at_same_volume(spark):
    from sumologic_aws_lambda_spark.streaming.drift import (
        CentroidDriftMonitor,
        reference_centroids,
    )

    ref = _vecs(spark, [("a", [1.0, 0.0])] * 3 + [("b", [0.0, 1.0])] * 3)
    mon = CentroidDriftMonitor(reference_centroids(ref, "label", "e"),
                               "label", "e", threshold=0.98)
    # same volume, rotated direction for 'a' only
    mon(_vecs(spark, [("a", [0.0, 1.0])] * 3 + [("b", [0.0, 1.0])] * 3), 0)
    assert mon.reports[0].drifted_labels == ["a"]
    cos_a = mon.reports[0].labels["a"][0]
    assert cos_a == pytest.approx(0.0, abs=1e-6)


def test_centroid_monitor_novel_label_and_null_sentinel(spark):
    from sumologic_aws_lambda_spark.streaming.drift import (
        CentroidDriftMonitor,
        reference_centroids,
    )

    ref = _vecs(spark, [("a", [1.0, 0.0])])
    mon = CentroidDriftMonitor(reference_centroids(ref, "label", "e"),
                               "label", "e")
    mon(_vecs(spark, [("zz", [1.0, 0.0]), (None, [0.5, 0.5]),
                      ("a", [1.0, 0.0])]), 0)
    assert set(mon.reports[0].drifted_labels) == {"zz", "(null)"}
    # round-9 review fix: the stray labels stay VISIBLE in the report
    # but must not re-alert on later healthy batches — one unknown row
    # in batch 0 cannot flag every batch forever
    mon(_vecs(spark, [("a", [1.0, 0.0])]), 1)
    assert mon.reports[1].drifted_labels == []
    assert "zz" in mon.reports[1].labels  # still reported, not alerted
    assert mon.drifted_batches == [0]
    with pytest.raises(ValueError):
        CentroidDriftMonitor({}, "label", "e")


def test_centroid_monitor_over_file_stream(spark, tmp_path):
    from sumologic_aws_lambda_spark.streaming.drift import (
        CentroidDriftMonitor,
        reference_centroids,
    )

    src = tmp_path / "vec_in"
    src.mkdir()
    (src / "b.json").write_text("\n".join(
        [json.dumps({"label": "a", "e": [0.0, 1.0]})] * 4
        + [json.dumps({"label": "b", "e": [0.0, 1.0]})] * 4))
    ref = _vecs(spark, [("a", [1.0, 0.0])] * 4 + [("b", [0.0, 1.0])] * 4)
    mon = CentroidDriftMonitor(reference_centroids(ref, "label", "e"),
                               "label", "e", threshold=0.98)
    stream = spark.readStream.schema(
        "label string, e array<double>").json(str(src))
    q = stream.writeStream.foreachBatch(mon).trigger(
        availableNow=True).start()
    q.awaitTermination(120)
    assert len(mon.reports) == 1
    assert mon.reports[0].rows == 8
    # 'a' rotated 90 degrees -> alert; 'b' unchanged -> quiet
    assert mon.reports[0].drifted_labels == ["a"]
    assert mon.drifted_batches == [0]


def test_centroid_monitor_zero_vector_alert_is_event_not_state(spark):
    """Round-9 second-pass fix: an UNMEASURABLE cosine (zero-norm
    running sums from a zero vector) alerts only on the delivering
    batch; a MEASURED below-threshold cosine keeps re-alerting (the
    running direction is a standing condition)."""
    from sumologic_aws_lambda_spark.streaming.drift import (
        CentroidDriftMonitor,
        reference_centroids,
    )

    ref = _vecs(spark, [("a", [1.0, 0.0]), ("b", [0.0, 1.0])])
    mon = CentroidDriftMonitor(reference_centroids(ref, "label", "e"),
                               "label", "e", threshold=0.98)
    mon(_vecs(spark, [("a", [0.0, 0.0]), ("b", [0.0, 1.0])]), 0)
    assert mon.reports[0].drifted_labels == ["a"]  # zero-norm: event
    mon(_vecs(spark, [("b", [0.0, 1.0])]), 1)      # nothing for 'a'
    assert mon.reports[1].drifted_labels == []      # no re-alert
    # but a MEASURED drifted direction persists across quiet batches
    mon(_vecs(spark, [("a", [0.0, 5.0])]), 2)       # rotate 'a'
    assert mon.reports[2].drifted_labels == ["a"]
    mon(_vecs(spark, [("b", [0.0, 1.0])]), 3)
    assert mon.reports[3].drifted_labels == ["a"], \
        "measured below-threshold cosine is a standing condition"


def test_centroid_monitor_accumulates_across_engine_batches(spark, tmp_path):
    """Cross-batch state under REAL engine-driven micro-batches
    (maxFilesPerTrigger=1, two files → two foreachBatch calls): the
    running centroid accumulates across batches, so a label that looks
    drifted after batch 0 RECOVERS once batch 1's vectors pull the
    running mean back toward the reference — the monitor semantics the
    direct-call tests exercise, proven through the streaming engine."""
    from sumologic_aws_lambda_spark.streaming.drift import (
        CentroidDriftMonitor,
        reference_centroids,
    )

    src = tmp_path / "vec_in2"
    src.mkdir()
    # batch 0: one rotated vector for 'a' -> drifted; batch 1: four
    # aligned vectors -> running centroid swings back above threshold
    (src / "a_first.json").write_text(
        json.dumps({"label": "a", "e": [0.0, 1.0]}))
    (src / "b_second.json").write_text("\n".join(
        [json.dumps({"label": "a", "e": [1.0, 0.0]})] * 4))
    ref = _vecs(spark, [("a", [1.0, 0.0])] * 4)
    mon = CentroidDriftMonitor(reference_centroids(ref, "label", "e"),
                               "label", "e", threshold=0.9)
    stream = spark.readStream.schema(
        "label string, e array<double>").json(str(src))
    q = (stream.writeStream.foreachBatch(mon)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)
    # availableNow + default maxFilesPerTrigger folds both files into
    # batches in file order; assert on the FINAL state either way, and
    # on per-batch reports when the engine split them
    assert mon.state["a"][1] == 5  # all five rows accumulated
    final = mon.reports[-1]
    # running centroid = [4, 1]/5 -> cosine vs [1, 0] is 4/sqrt(17) ≈ .97
    assert final.labels["a"][0] > 0.9
    assert final.drifted_labels == []
    if len(mon.reports) == 2:  # engine delivered two micro-batches
        assert mon.reports[0].drifted_labels == ["a"]


def test_centroid_monitor_rejects_ragged_vectors(spark):
    """Round-10 advisor fix: _label_sums' per-label count is only
    well-defined for fixed-dimension vectors — ragged input raises
    loudly instead of silently undercounting the short dims."""
    from sumologic_aws_lambda_spark.streaming.drift import (
        CentroidDriftMonitor,
        reference_centroids,
    )

    ref = _vecs(spark, [("a", [1.0, 0.0])])
    mon = CentroidDriftMonitor(reference_centroids(ref, "label", "e"),
                               "label", "e")
    with pytest.raises(ValueError, match="ragged"):
        mon(_vecs(spark, [("a", [1.0, 0.0]), ("a", [1.0])]), 0)


def test_centroid_monitor_dim_change_mid_stream_raises(spark):
    """Round-10 advisor fix: a micro-batch delivering a different
    embedding dimension than the stored running state must raise, not
    zip-truncate the running centroid silently."""
    from sumologic_aws_lambda_spark.streaming.drift import (
        CentroidDriftMonitor,
        reference_centroids,
    )

    ref = _vecs(spark, [("a", [1.0, 0.0])])
    mon = CentroidDriftMonitor(reference_centroids(ref, "label", "e"),
                               "label", "e")
    mon(_vecs(spark, [("a", [1.0, 0.0])]), 0)
    bad = spark.createDataFrame(
        [("a", [1.0, 0.0, 0.0])], "label string, e array<double>")
    with pytest.raises(ValueError, match="dim"):
        mon(bad, 1)


def test_centroid_monitor_reference_dim_mismatch_alerts(spark):
    """A reference built at a different dimension than the stream can
    never heal — the label alerts on every batch instead of _cosine
    zip-truncating to the shorter vector."""
    from sumologic_aws_lambda_spark.streaming.drift import (
        CentroidDriftMonitor,
    )

    mon = CentroidDriftMonitor({"a": ([1.0, 0.0, 0.0], 1)},
                               "label", "e")
    mon(_vecs(spark, [("a", [1.0, 0.0])]), 0)
    assert mon.reports[0].drifted_labels == ["a"]
    assert math.isnan(mon.reports[0].labels["a"][0])
    # standing condition: still alerted on the next batch
    mon(_vecs(spark, [("a", [1.0, 0.0])]), 1)
    assert mon.reports[1].drifted_labels == ["a"]


def test_centroid_monitor_all_null_dim_coalesces_to_zero(spark):
    """Round-10 advisor fix: SUM over a (label, dim) cell whose every
    value is NULL returns NULL — the fold coalesces it to 0.0 instead
    of dying on float(None)."""
    from sumologic_aws_lambda_spark.streaming.drift import (
        CentroidDriftMonitor,
        reference_centroids,
    )

    ref = _vecs(spark, [("a", [1.0, 0.0])])
    mon = CentroidDriftMonitor(reference_centroids(ref, "label", "e"),
                               "label", "e")
    mon(_vecs(spark, [("a", [1.0, None])]), 0)
    assert mon.state["a"][0] == [1.0, 0.0]
    assert mon.reports[0].drifted_labels == []


def test_centroid_monitor_dim_check_precedes_any_fold(spark):
    """Round-10 second-pass fix: a batch mixing a valid label with a
    dimension-changed one must not fold ANY label before raising —
    otherwise the engine's retry of the same batch double-counts the
    valid labels silently."""
    from sumologic_aws_lambda_spark.streaming.drift import (
        CentroidDriftMonitor,
        reference_centroids,
    )

    ref = _vecs(spark, [("a", [1.0, 0.0]), ("z", [0.0, 1.0])])
    mon = CentroidDriftMonitor(reference_centroids(ref, "label", "e"),
                               "label", "e")
    mon(_vecs(spark, [("a", [1.0, 0.0]), ("z", [0.0, 1.0])]), 0)
    bad = spark.createDataFrame(
        [("a", [2.0, 0.0]), ("z", [0.0, 1.0, 1.0])],
        "label string, e array<double>")
    with pytest.raises(ValueError, match="dim"):
        mon(bad, 1)
    # 'a' must NOT have been folded by the failed batch
    assert mon.state["a"] == ([1.0, 0.0], 1)
    # the retry (fixed upstream) folds exactly once
    mon(_vecs(spark, [("a", [2.0, 0.0]), ("z", [0.0, 1.0])]), 1)
    assert mon.state["a"] == ([3.0, 0.0], 2)
