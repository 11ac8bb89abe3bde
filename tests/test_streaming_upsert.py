"""Streaming latest-wins snapshot upsert (streaming/upsert.py) — the
foreachBatch twin of queries/etl.py::cdc_snapshot_merge."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.streaming.upsert import SnapshotUpsertSink


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "k long, v string, ts timestamp, deleted boolean")


T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _snap(sink, spark):
    df = sink.snapshot(spark)
    return {r["k"]: (r["v"], r["_seq"]) for r in df.collect()}


def test_upsert_merges_batches_latest_wins(spark, tmp_path):
    sink = SnapshotUpsertSink(str(tmp_path / "snap"), key_cols=("k",),
                              ts_col="ts")
    sink(_batch(spark, [
        (1, "a1", T0, False),
        (2, "b1", T0, False),
    ]), batch_id=0)
    sink(_batch(spark, [
        (1, "a2", T0 + dt.timedelta(minutes=5), False),  # newer: wins
        (3, "c1", T0, False),                             # insert
    ]), batch_id=1)
    got = _snap(sink, spark)
    assert got == {1: ("a2", 1), 2: ("b1", 0), 3: ("c1", 1)}


def test_upsert_never_regresses_on_old_or_replayed_data(spark, tmp_path):
    sink = SnapshotUpsertSink(str(tmp_path / "snap"), key_cols=("k",),
                              ts_col="ts")
    sink(_batch(spark, [(1, "new", T0 + dt.timedelta(hours=1), False)]),
         batch_id=0)
    # a LATER batch carrying an OLDER event must not win
    sink(_batch(spark, [(1, "stale", T0, False)]), batch_id=1)
    assert _snap(sink, spark)[1][0] == "new"
    # replaying batch 0 verbatim is idempotent by value
    sink(_batch(spark, [(1, "new", T0 + dt.timedelta(hours=1), False)]),
         batch_id=0)
    assert _snap(sink, spark)[1][0] == "new"


def test_upsert_same_ts_resolves_by_batch_seq(spark, tmp_path):
    sink = SnapshotUpsertSink(str(tmp_path / "snap"), key_cols=("k",),
                              ts_col="ts")
    sink(_batch(spark, [(1, "first", T0, False)]), batch_id=0)
    sink(_batch(spark, [(1, "second", T0, False)]), batch_id=1)
    # equal event time: the later delivery (higher _seq) wins
    assert _snap(sink, spark)[1] == ("second", 1)


def test_tombstone_removes_key_and_old_update_cannot_resurrect(
        spark, tmp_path):
    sink = SnapshotUpsertSink(str(tmp_path / "snap"), key_cols=("k",),
                              ts_col="ts", delete_col="deleted")
    sink(_batch(spark, [(1, "a1", T0, False), (2, "b1", T0, False)]),
         batch_id=0)
    sink(_batch(spark, [(1, None, T0 + dt.timedelta(minutes=1), True)]),
         batch_id=1)
    assert set(_snap(sink, spark)) == {2}
    # an update OLDER than the tombstone arrives late: stays deleted
    sink(_batch(spark, [(1, "zombie", T0, False)]), batch_id=2)
    assert set(_snap(sink, spark)) == {2}


def test_prev_generation_kept_for_rollback(spark, tmp_path):
    base = tmp_path / "snap"
    sink = SnapshotUpsertSink(str(base), key_cols=("k",), ts_col="ts")
    sink(_batch(spark, [(1, "a1", T0, False)]), batch_id=0)
    sink(_batch(spark, [(1, "a2", T0 + dt.timedelta(minutes=1), False)]),
         batch_id=1)
    prev = spark.read.parquet(str(base / "_prev"))
    assert [r["v"] for r in prev.collect()] == ["a1"]


def test_upsert_over_file_stream(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "b.json").write_text("\n".join(
        json.dumps({"k": k, "v": v, "ts": ts, "deleted": False})
        for k, v, ts in [(1, "x", "2024-01-01 10:00:00"),
                         (1, "y", "2024-01-01 11:00:00"),
                         (2, "z", "2024-01-01 10:30:00")]))
    sink = SnapshotUpsertSink(str(tmp_path / "snap"), key_cols=("k",),
                              ts_col="ts")
    stream = (
        spark.readStream
        .schema("k long, v string, ts string, deleted boolean")
        .json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = stream.writeStream.foreachBatch(sink).trigger(
        availableNow=True).start()
    q.awaitTermination(120)
    got = {r["k"]: r["v"] for r in sink.snapshot(spark).collect()}
    assert got == {1: "y", 2: "z"}


def test_recovery_from_crash_between_swap_renames(spark, tmp_path):
    import os

    base = tmp_path / "snap"
    sink = SnapshotUpsertSink(str(base), key_cols=("k",), ts_col="ts")
    sink(_batch(spark, [(1, "a1", T0, False)]), batch_id=0)
    # simulate a crash between the two renames: current was moved to
    # _prev, the new current never landed
    os.rename(str(base / "current"), str(base / "_prev"))
    # plus an orphaned staging dir from the interrupted batch
    (base / "_staging_99").mkdir()
    # recovery: snapshot() heals _prev -> current; next batch sweeps
    assert _snap(sink, spark) == {1: ("a1", 0)}
    sink(_batch(spark, [(2, "b1", T0, False)]), batch_id=1)
    assert _snap(sink, spark) == {1: ("a1", 0), 2: ("b1", 1)}
    assert not (base / "_staging_99").exists()


def test_intra_batch_same_ts_conflict_is_deterministic(spark, tmp_path):
    # two updates to one key with EQUAL ts in ONE batch: the survivor
    # must be identical across replays (content-hash tiebreak), never
    # partition-order luck
    rows = [(1, "x", T0, False), (1, "y", T0, False)]
    winners = set()
    for trial in range(3):
        sink = SnapshotUpsertSink(str(tmp_path / f"s{trial}"),
                                  key_cols=("k",), ts_col="ts")
        sink(_batch(spark, rows).repartition(4), batch_id=0)
        winners.add(_snap(sink, spark)[1][0])
    assert len(winners) == 1


def test_rejects_object_store_paths(tmp_path):
    """Round-9 advisor fix: the two-rename swap is atomic only on a
    POSIX filesystem — object-store URIs must be rejected up front,
    not corrupt a snapshot at the first crash."""
    for uri in ("s3://bucket/snap", "s3a://bucket/snap",
                "gs://bucket/snap", "abfss://c@a.dfs.example/snap",
                "hdfs://nn/snap"):
        with pytest.raises(ValueError, match="local POSIX path"):
            SnapshotUpsertSink(uri, key_cols=("k",), ts_col="ts")
    # plain local paths and explicit file URIs (triple-slash, localhost
    # and single-slash forms) all resolve to the same absolute path
    SnapshotUpsertSink(str(tmp_path / "a"), key_cols=("k",), ts_col="ts")
    for uri in (f"file://{tmp_path}/b",          # file:///abs/path
                f"file://localhost{tmp_path}/b",
                f"file:{tmp_path}/b"):           # single-slash form
        sink = SnapshotUpsertSink(uri, key_cols=("k",), ts_col="ts")
        assert sink.path == f"{tmp_path}/b", uri
    # a file:// URI naming a REMOTE host is not this machine: rejected
    with pytest.raises(ValueError, match="remote host"):
        SnapshotUpsertSink("file://nas01/snap", key_cols=("k",),
                           ts_col="ts")


def test_rejects_single_slash_remote_uris(tmp_path):
    """Round-9 second-pass fix: single-slash remote forms (hdfs:/x,
    s3a:/x) must not be treated as literal local directories."""
    for uri in ("hdfs:/warehouse/snap", "s3a:/bucket/snap",
                "gs:/bucket/snap"):
        with pytest.raises(ValueError, match="local POSIX path"):
            SnapshotUpsertSink(uri, key_cols=("k",), ts_col="ts")


def test_reserved_snapshot_columns_are_rejected(spark, tmp_path):
    """Round-10 streaming review: a batch column named _seq would be
    silently replaced by the batch id (destroying the user's ordering
    signal) and _rn overwritten and dropped — refuse both, case-
    insensitively."""
    import pytest as _pytest

    from sumologic_aws_lambda_spark.streaming.upsert import (
        SnapshotUpsertSink,
    )

    sink = SnapshotUpsertSink(str(tmp_path / "snap"), key_cols=("k",),
                              ts_col="ts")
    bad = spark.createDataFrame(
        [("k1", 1, 999)], "k string, ts bigint, _SEQ bigint")
    with _pytest.raises(ValueError, match="_SEQ"):
        sink(bad, 0)
