"""Structured-Streaming ingestion shell (SURVEY §2.8, §3.1-§3.2).

Maps the reference's operational envelope onto streaming primitives:

- T1 micro-batch cadence: ``Trigger.ProcessingTime`` (DLQ drain 5 min,
  ``DLQLambdaCloudFormation.json:257``; Firehose 60 s buffers,
  ``KinesisFirehoseCWLogs.template.yaml:281``).
- T2 buffered delivery: ``maxFilesPerTrigger`` caps per-batch intake.
- T3 late-data cutoff: ``withWatermark(ts, 24 hours)`` — the sources'
  ``cutoffTimestamp = now − 24 h`` (``sumoresource.py:293-294``).
- T5 dead-letter loop: failed batches land in a quarantine prefix
  (see ``sinks.NdjsonDeliverySink``) and ``drain_quarantine`` re-runs the
  identical pipeline over it — the DLQProcessor pattern (§3.2), with
  checkpointing standing in for SQS receive/delete.
- T6 worker fan-out: executor parallelism; nothing to port.
- S11 polling source: path glob + ``maxFilesPerTrigger`` +
  ``modifiedAfter`` mirror bucket/pathExpression/scanInterval sources
  (``sumoresource.py:299-380``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.cwl import CwlConfig, cwl_pipeline
from .sinks import NdjsonDeliverySink

DEFAULT_TRIGGER_SECONDS = 60          # Firehose buffer interval (T2)
DLQ_DRAIN_SECONDS = 300               # DLQ drain cadence (T1)
WATERMARK = "24 hours"                # ingest cutoff (T3)


def read_payload_stream(spark: SparkSession, path: str,
                        max_files_per_trigger: int | None = 10) -> DataFrame:
    """Landing-prefix text stream: one base64(gzip(JSON)) envelope per
    line.  ``maxFilesPerTrigger`` plays the DLQ receive-batch size
    (10 messages/poll, ``DLQProcessor.js:24``)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path).withColumnRenamed("value", "payload")


def cwl_stream(spark: SparkSession, in_path: str,
               config: CwlConfig = CwlConfig(),
               watermark: str | None = WATERMARK) -> DataFrame:
    """Streaming CWL pipeline: identical plan to the batch path (§3.1) —
    the transformation code is shared, only the source differs."""
    df = cwl_pipeline(read_payload_stream(spark, in_path), config)
    if watermark:
        df = df.withWatermark("ts", watermark)
    return df


def run_cwl_ingest(spark: SparkSession, in_path: str, out_dir: str,
                   checkpoint_dir: str, config: CwlConfig = CwlConfig(),
                   quarantine_dir: str | None = None,
                   trigger_seconds: int | None = None,
                   available_now: bool = False):
    """Launch the ingest job: decode → transform → partitioned NDJSON
    delivery with retry/quarantine.  Returns (StreamingQuery, sink).

    ``available_now=True`` drains everything currently in the prefix and
    stops — the test/backfill mode; otherwise ``Trigger.ProcessingTime``
    at the Firehose-style cadence.
    """
    sink = NdjsonDeliverySink(out_dir, quarantine_dir=quarantine_dir)
    records = cwl_stream(spark, in_path, config)
    writer = (
        records.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        secs = trigger_seconds or DEFAULT_TRIGGER_SECONDS
        writer = writer.trigger(processingTime=f"{secs} seconds")
    return writer.start(), sink


def drain_quarantine(spark: SparkSession, quarantine_dir: str,
                     out_dir: str | None = None, sink=None) -> list:
    """T5/§3.2: re-deliver quarantined batches through the same sink —
    the scheduled DLQProcessor.  Batch identity is preserved so re-
    delivery overwrites (at-least-once → idempotent effect).

    ``sink`` is any ``foreachBatch``-shaped callable with a ``reports``
    list — pass the SAME sink type that quarantined the batches: an
    ``NdjsonDeliverySink`` quarantine re-delivers as NDJSON, a
    ``WebhookDeliverySink`` quarantine must be drained with a
    ``WebhookDeliverySink`` (draining it as NDJSON would write alert
    batches to files and never re-POST them).  With ``sink=None`` an
    ``NdjsonDeliverySink(out_dir)`` is built for compatibility with the
    file-delivery drain.  The drain sink must NOT quarantine into the
    same directory it is draining: a batch that fails again is kept by
    catching the sink's raise, not by re-writing it.

    Failure isolation matches the reference DLQProcessor: one batch
    whose redelivery exhausts its retries stays quarantined for the
    next drain while the remaining batches still go out (its failed
    attempt is in the returned reports), and a batch successfully
    redelivered is REMOVED from quarantine — the analog of deleting the
    SQS message — so the quarantine prefix cannot grow without bound or
    re-deliver history forever."""
    import pathlib
    import re
    import shutil

    from py4j.protocol import Py4JJavaError

    if sink is None:
        if out_dir is None:
            raise ValueError("drain_quarantine needs out_dir or sink")
        sink = NdjsonDeliverySink(out_dir, quarantine_dir=None)
    try:
        matches = [
            re.match(r"batch_id=(\d+)", p.name)
            for p in pathlib.Path(quarantine_dir).iterdir()
        ]
    except FileNotFoundError:
        return []
    dirs = [
        (int(m.group(1)), f"{quarantine_dir}/{m.group(0)}")
        for m in matches if m
    ]
    for batch_id, path in sorted(dirs):
        if pathlib.Path(f"{path}/_violations.json").exists():
            # A QualityGateSink quarantine: the batch failed VALIDATION,
            # not delivery — redelivering it would ship known-bad data.
            # An operator resolves it by fixing and re-ingesting, not by
            # draining (streaming/quality.py).
            continue
        try:
            df = spark.read.parquet(path)
        except Exception:  # noqa: BLE001 — isolation boundary
            # not just Py4JJavaError: an empty dir left by a crash
            # mid-quarantine-write raises AnalysisException, and ANY
            # unreadable entry must be skipped, or one poison dir
            # starves every other quarantined batch on every
            # subsequent drain — the documented DLQProcessor isolation
            # contract (round-10 streaming review)
            continue
        n_before = len(sink.reports)
        try:
            sink(df, batch_id)
        except RuntimeError:
            continue    # still failing: keep quarantined, drain the rest
        new = sink.reports[n_before:]
        # report field differs by sink: WebhookReport.ok,
        # DeliveryReport.success
        if new and not getattr(new[-1], "ok",
                               getattr(new[-1], "success", True)):
            # The sink swallowed the failure.  If the sink has its OWN
            # quarantine dir, it re-quarantined the batch there and now
            # owns it — keeping OUR copy too would deliver the batch
            # twice once it recovers (round-10 streaming review); a
            # sink without one did not persist anything, so we keep
            # ours.
            if getattr(sink, "quarantine_dir", None) is not None \
                    and sink.quarantine_dir != quarantine_dir:
                shutil.rmtree(path, ignore_errors=True)
            continue
        shutil.rmtree(path, ignore_errors=True)
    return sink.reports


def streaming_timeslice_counts(records: DataFrame,
                               slice_duration: str = "5 minutes") -> DataFrame:
    """T10: watermarked tumbling-window counts — the streaming twin of
    the batch ``timeslice`` queries; state is bounded by the watermark."""
    return records.groupBy(
        F.window("ts", slice_duration).alias("slice"),
        "source_category",
    ).agg(F.count(F.lit(1)).alias("n"))


def streaming_session_counts(records: DataFrame,
                             gap: str = "30 minutes",
                             ts_col: str = "ts",
                             key_col: str = "source_category") -> DataFrame:
    """T10: session-window aggregation — dynamic-gap sessions per key;
    state closes (and emits) once the watermark passes session end + gap.
    The streaming twin of the batch ``sessionize_events`` query."""
    return records.groupBy(
        F.session_window(ts_col, gap).alias("session"),
        key_col,
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
    )


def streaming_exact_dedup(records: DataFrame,
                          key_cols: tuple[str, ...] = ("fingerprint",),
                          ts_col: str = "ts") -> DataFrame:
    """Streaming exact dedup: drop redeliveries of the same record key
    within the watermark horizon.

    The reference's delivery model is at-least-once (T5 — a failed batch
    is retained in the DLQ and the whole envelope is re-sent,
    ``DLQProcessor.js:47-66``), so the downstream must tolerate
    duplicates; this is the engine-side twin that makes delivery
    *effectively once*: state keyed by ``key_cols`` (use the md5 content
    fingerprint, or the CWL event id), expired by the watermark so state
    is bounded — the exact streaming analog of ``operators.dedup
    .exact_dedup``.  Uses ``dropDuplicatesWithinWatermark`` so two
    occurrences count as duplicates whenever their event times fall
    inside the watermark delay, even across micro-batches.

    The caller must have applied ``withWatermark(ts_col, …)`` upstream
    (as ``cwl_stream`` does).
    """
    return records.dropDuplicatesWithinWatermark(list(key_cols))


def streaming_sliding_counts(records: DataFrame,
                             length: str = "10 minutes",
                             slide: str = "5 minutes",
                             ts_col: str = "ts",
                             key_col: str = "source_category") -> DataFrame:
    """T10: sliding-window counts (each event lands in length/slide
    windows) — the moving-average shape behind metric dashboards."""
    return records.groupBy(
        F.window(ts_col, length, slide).alias("slice"),
        key_col,
    ).agg(F.count(F.lit(1)).alias("n"))


def streaming_interval_join(clicks: DataFrame, purchases: DataFrame,
                            key: str = "user_id",
                            within_minutes: int = 30,
                            watermark_minutes: int = 60,
                            purchase_id_col: str | None = None) -> DataFrame:
    """Stream-stream inner join: each purchase attributed to the same
    user's click at most ``within_minutes`` earlier (last-touch
    attribution as a CONTINUOUS query — the streaming twin of
    ``operators/asof.py``'s batch as-of join).

    Both sides carry watermarks, so Spark bounds the join state: a
    buffered click is dropped once the purchase-side watermark passes
    ``click_ts + within`` and vice versa — state is
    O(traffic × window), never unbounded (the time-range condition in
    the join is what lets the state store evict; an equi-join alone
    would buffer both streams forever).  The join itself co-partitions
    both streams on the user key — one shuffle per side, the same
    partitioning a 1000-executor cluster would use.

    ``purchase_id_col``: a per-purchase identity column carried
    through the join and the last-touch collapse.  Without one, the
    collapse groups on (user, ts, value) — two DISTINCT purchases by
    one user with equal timestamp and value then merge into one
    attributed row, undercounting revenue (round-10 streaming review).
    Pass the purchase id whenever the stream has one.
    """
    c = (
        clicks.withWatermark("ts", f"{watermark_minutes} minutes")
        .select(F.col(key).alias("c_user"),
                F.col("ts").alias("click_ts"))
    )
    p_cols = [F.col(key).alias("p_user"),
              F.col("ts").alias("purchase_ts"),
              F.col("value").alias("purchase_value")]
    if purchase_id_col is not None:
        p_cols.append(F.col(purchase_id_col).alias("purchase_id"))
    p = (
        purchases.withWatermark("ts", f"{watermark_minutes} minutes")
        .select(*p_cols)
    )
    pairs = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >=
           F.col("purchase_ts") - F.expr(f"INTERVAL {within_minutes} MINUTES")),
        "inner",
    )
    # LAST-touch: a purchase preceded by N in-window clicks must emit
    # ONE row (the latest click), or downstream revenue sums count the
    # purchase N times.  The post-join streaming max groups on the
    # purchase identity; Spark chains the two stateful operators in
    # append mode because the join output carries the purchase-side
    # event time (watermarked), and the aggregate emits once the
    # watermark passes the purchase timestamp.
    group = ["p_user", "purchase_ts", "purchase_value"]
    out = ["click_ts", "purchase_ts", "purchase_value"]
    if purchase_id_col is not None:
        group.append("purchase_id")
        out.append("purchase_id")
    return (
        pairs.groupBy(*group)
        .agg(F.max("click_ts").alias("click_ts"))
        .select(F.col("p_user").alias("user_id"), *out)
    )
