"""End-to-end streaming ingest: landing prefix → CWL pipeline →
partitioned NDJSON delivery, plus retry/quarantine/DLQ-drain semantics."""

from __future__ import annotations

import glob
import gzip
import json

import pytest

from sumologic_aws_lambda_spark.sources.cwl import CwlConfig
from sumologic_aws_lambda_spark.streaming.pipeline import (
    drain_quarantine,
    run_cwl_ingest,
)
from sumologic_aws_lambda_spark.streaming.sinks import NdjsonDeliverySink
from sumologic_aws_lambda_spark.testing.fixtures import synthetic_cwl_payloads


@pytest.fixture()
def landing(tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    (d / "payloads.txt").write_text("\n".join(synthetic_cwl_payloads()) + "\n")
    return tmp_path


def _read_ndjson(out_dir: str) -> list[dict]:
    rows = []
    for path in glob.glob(f"{out_dir}/**/*.json*", recursive=True):
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as f:
            rows += [json.loads(line) for line in f if line.strip()]
    return rows


def test_stream_end_to_end(spark, landing):
    cfg = CwlConfig(include_log_info=True, source_category_override="cat/x")
    query, sink = run_cwl_ingest(
        spark,
        str(landing / "landing"),
        str(landing / "out"),
        str(landing / "ckpt"),
        cfg,
        available_now=True,
    )
    query.awaitTermination(120)
    assert sink.reports and all(r.success for r in sink.reports)
    rows = _read_ndjson(str(landing / "out"))
    # 13 exploded events minus 1 falsy-dropped = 12 delivered records
    assert len(rows) == 12
    msgs = {r["message"] for r in rows}
    assert "handling request" in msgs          # console prefix stripped
    assert any(r.get("request_id") for r in rows)  # carry-forward survived


def test_sink_retry_then_success(spark):
    df = spark.range(3).withColumnRenamed("id", "v")
    sink = NdjsonDeliverySink("/tmp/never-used", partition_cols=(),
                              backoff_seconds=0.0)
    calls = {"n": 0}
    real_write = sink._write

    def flaky(batch, path):
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient delivery failure")
        real_write(batch, path)

    sink._write = flaky
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        sink.out_dir = d
        sink(df, 7)
    assert calls["n"] == 3
    assert sink.reports[-1].success and sink.reports[-1].attempts == 3


def test_sink_quarantine_and_drain(spark, tmp_path):
    df = spark.range(4).withColumnRenamed("id", "v")
    sink = NdjsonDeliverySink(
        str(tmp_path / "out"), partition_cols=(), backoff_seconds=0.0,
        max_retries=2, quarantine_dir=str(tmp_path / "dlq"),
    )
    sink._write = lambda batch, path: (_ for _ in ()).throw(IOError("down"))
    sink(df, 3)
    assert not sink.reports[-1].success
    # batch retained for redelivery (T5)
    q = spark.read.parquet(str(tmp_path / "dlq" / "batch_id=3"))
    assert q.count() == 4

    reports = drain_quarantine(spark, str(tmp_path / "dlq"),
                               str(tmp_path / "out"))
    assert [r.batch_id for r in reports] == [3]
    assert all(r.success for r in reports)
    rows = _read_ndjson(str(tmp_path / "out"))
    assert {r["v"] for r in rows} == {0, 1, 2, 3}


def test_streaming_session_and_sliding_windows(spark, tmp_path):
    """Session + sliding windows over a bounded file stream (T10)."""
    import json
    from sumologic_aws_lambda_spark.streaming.pipeline import (
        streaming_session_counts,
        streaming_sliding_counts,
    )

    rows = [
        ("2024-01-01 10:00:00", "api"),
        ("2024-01-01 10:10:00", "api"),   # same session (gap 30m)
        ("2024-01-01 12:00:00", "api"),   # new session
        ("2024-01-01 10:02:00", "web"),
    ]
    src = tmp_path / "in"
    src.mkdir()
    (src / "events.json").write_text(
        "\n".join(json.dumps({"ts": ts, "source_category": c})
                  for ts, c in rows)
    )
    stream = (
        spark.readStream.schema("ts string, source_category string")
        .json(str(src))
        .selectExpr("CAST(ts AS TIMESTAMP) ts", "source_category")
        .withWatermark("ts", "1 hour")
    )

    out = streaming_session_counts(stream, gap="30 minutes")
    q = (
        out.writeStream.format("memory").queryName("sess")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cp1"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    sess = {(r["source_category"], r["n"])
            for r in spark.sql("select * from sess").collect()}
    assert sess == {("api", 2), ("api", 1), ("web", 1)}

    out2 = streaming_sliding_counts(stream)
    q2 = (
        out2.writeStream.format("memory").queryName("slide")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    slide = spark.sql("select * from slide").collect()
    # each event appears in length/slide = 2 windows
    assert sum(r["n"] for r in slide) == 2 * len(rows)


def test_streaming_exact_dedup_drops_redeliveries(spark, tmp_path):
    """At-least-once redelivery (T5) collapses to effectively-once via
    dropDuplicatesWithinWatermark keyed on the content fingerprint."""
    import json
    from sumologic_aws_lambda_spark.streaming.pipeline import (
        streaming_exact_dedup,
    )

    rows = [
        ("2024-01-01 10:00:00", "evt-1", "hello"),
        ("2024-01-01 10:00:00", "evt-1", "hello"),   # same-batch duplicate
        ("2024-01-01 10:05:00", "evt-1", "hello"),   # redelivery, later ts
        ("2024-01-01 10:01:00", "evt-2", "world"),
    ]
    src = tmp_path / "in"
    src.mkdir()
    (src / "events.json").write_text(
        "\n".join(json.dumps({"ts": ts, "event_id": e, "message": m})
                  for ts, e, m in rows)
    )
    stream = (
        spark.readStream.schema("ts string, event_id string, message string")
        .json(str(src))
        .selectExpr("CAST(ts AS TIMESTAMP) ts", "event_id", "message")
        .withWatermark("ts", "1 hour")
    )
    out = streaming_exact_dedup(stream, key_cols=("event_id",))
    q = (
        out.writeStream.format("memory").queryName("dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(r["event_id"]
                 for r in spark.sql("select * from dedup").collect())
    assert got == ["evt-1", "evt-2"]


def test_drain_removes_delivered_batches_and_isolates_failures(
        spark, tmp_path):
    """A drained batch leaves quarantine (the reference DLQProcessor
    deletes the SQS message); a batch that cannot be read is skipped
    without aborting the rest."""
    import os

    q = tmp_path / "dlq"
    df = spark.createDataFrame([(1,)], "v int")
    df.write.parquet(str(q / "batch_id=1"))
    df.write.parquet(str(q / "batch_id=2"))
    # an unreadable quarantined batch must not abort the drain
    (q / "batch_id=3").mkdir()
    (q / "batch_id=3" / "junk.parquet").write_text("not parquet")

    reports = drain_quarantine(spark, str(q), str(tmp_path / "out"))
    assert sorted(r.batch_id for r in reports) == [1, 2]
    assert all(r.success for r in reports)
    # delivered batches removed; the unreadable one stays for inspection
    assert sorted(os.listdir(q)) == ["batch_id=3"]


def test_firehose_garbage_base64_is_processing_failed(spark):
    """Spark's lenient unbase64 must not smuggle mojibake through as Ok:
    non-alphabet payloads route to ProcessingFailed like the reference's
    per-record try/catch."""
    import base64

    from sumologic_aws_lambda_spark.sources.firehose import (
        transform_records,
    )

    ok = base64.b64encode(b"real payload").decode()
    df = spark.createDataFrame(
        [(1, ok), (2, "!!!not base64!!!"), (3, None)],
        "id int, data string",
    )
    out = {r.id: r.result for r in transform_records(df).collect()}
    assert out == {1: "Ok", 2: "ProcessingFailed", 3: "ProcessingFailed"}


def test_streaming_funnel_advances_stages_across_batches(spark, tmp_path):
    """Custom stateful funnel (applyInPandasWithState): state survives
    micro-batches and stages only advance on strictly-later events."""
    import json
    from sumologic_aws_lambda_spark.streaming.stateful import (
        streaming_funnel,
    )

    src = tmp_path / "in"
    src.mkdir()
    # Batch 1: user 1 signs up then clicks; user 2 clicks with no
    # signup (must stay at stage 0).
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in [
        {"user_id": 1, "event_id": 1, "event_type": "signup",
         "epoch_s": 100},
        {"user_id": 1, "event_id": 2, "event_type": "click",
         "epoch_s": 200},
        {"user_id": 2, "event_id": 3, "event_type": "click",
         "epoch_s": 100},
    ]))
    stream = (
        spark.readStream
        .schema("user_id bigint, event_id bigint, event_type string, "
                "epoch_s bigint")
        .json(str(src))
    )
    collected: list = []

    def _collect(batch_df, _bid):
        collected.extend(batch_df.collect())

    q = (
        streaming_funnel(stream)
        .writeStream.foreachBatch(_collect)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r.user_id: r for r in collected}
    assert got[1].stage == 2 and got[1].signup_s == 100 \
        and got[1].click_s == 200
    assert got[2].stage == 0

    # Batch 2 (same checkpoint → state carries): user 1 purchases, but
    # the purchase at epoch 150 (before the click) must NOT count; the
    # one at 300 must.
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in [
        {"user_id": 1, "event_id": 4, "event_type": "purchase",
         "epoch_s": 150},
        {"user_id": 1, "event_id": 5, "event_type": "purchase",
         "epoch_s": 300},
    ]))
    collected.clear()
    q2 = (
        streaming_funnel(stream)
        .writeStream.foreachBatch(_collect)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    got2 = {r.user_id: r for r in collected}
    assert got2[1].stage == 3 and got2[1].purchase_s == 300


def test_streaming_funnel_orders_across_arrow_chunks(spark, tmp_path):
    """Events split across multiple Arrow chunks must still be replayed
    in (epoch_s, event_id) order — the signup arriving in a later chunk
    than the click must not lose the click."""
    import json
    from sumologic_aws_lambda_spark.streaming.stateful import (
        streaming_funnel,
    )

    src = tmp_path / "in"
    src.mkdir()
    # File order is reverse time order; with maxRecordsPerBatch=2 the
    # group spans 3 chunks.
    events = [
        {"user_id": 7, "event_id": i, "event_type": et, "epoch_s": es}
        for i, (et, es) in enumerate([
            ("purchase", 500), ("click", 400), ("purchase", 350),
            ("click", 200), ("signup", 100),
        ])
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in events))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        collected: list = []
        stream = (
            spark.readStream
            .schema("user_id bigint, event_id bigint, event_type string, "
                    "epoch_s bigint")
            .json(str(src))
        )
        q = (
            streaming_funnel(stream)
            .writeStream.foreachBatch(
                lambda df, _b: collected.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = {r.user_id: r for r in collected}
    assert got[7].stage == 3
    assert (got[7].signup_s, got[7].click_s, got[7].purchase_s) \
        == (100, 200, 350)


def test_decayed_counts_half_life_and_state_carry(spark, tmp_path):
    """Trending-keys state: mass halves per half-life of event time and
    carries across micro-batches."""
    import json
    import math
    from sumologic_aws_lambda_spark.streaming.stateful import decayed_counts

    src = tmp_path / "in"
    src.mkdir()
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in [
        {"key": "api", "epoch_s": 0},
        {"key": "api", "epoch_s": 0},
        {"key": "web", "epoch_s": 0},
    ]))

    def run(name):
        out: list = []
        stream = (
            spark.readStream.schema("key string, epoch_s bigint")
            .json(str(src))
        )
        q = (
            decayed_counts(stream, half_life_s=100.0)
            .writeStream.foreachBatch(lambda df, _b: out.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return {r.key: r for r in out}

    got = run("d1")
    assert got["api"].decayed_count == 2.0
    assert got["web"].decayed_count == 1.0

    # One half-life later: the carried 2.0 halves, plus one new event.
    (src / "b2.json").write_text(json.dumps({"key": "api", "epoch_s": 100}))
    got2 = run("d2")
    assert math.isclose(got2["api"].decayed_count, 2.0 * 0.5 + 1.0,
                        rel_tol=1e-9)
    assert got2["api"].last_epoch_s == 100


def test_sink_clears_stale_quarantine_copy_on_success(spark, tmp_path):
    """Round-10 hardening: a successful delivery removes any stale
    quarantine copy of the same batch (a crash mid-quarantine-write on
    an earlier attempt must not get redelivered over a complete
    delivery)."""
    stale = spark.createDataFrame([(99,)], "v int")
    stale.write.parquet(str(tmp_path / "dlq" / "batch_id=5"))
    sink = NdjsonDeliverySink(
        str(tmp_path / "out"), partition_cols=(), backoff_seconds=0.0,
        quarantine_dir=str(tmp_path / "dlq"))
    sink(spark.range(2).withColumnRenamed("id", "v"), 5)
    assert sink.reports[-1].success
    assert not (tmp_path / "dlq" / "batch_id=5").exists()


def test_sink_cleanup_failure_is_not_a_delivery_failure(spark, tmp_path):
    """Round-10 ADVICE: the stale-quarantine cleanup must never be
    misclassified as a delivery failure.  With a quarantine dir whose
    filesystem cannot be resolved, a successful write must still report
    exactly ONE success on attempt 1 — not retry, not re-quarantine."""
    sink = NdjsonDeliverySink(
        str(tmp_path / "out"), partition_cols=(), backoff_seconds=0.0,
        quarantine_dir="nosuchscheme://bucket/dlq")
    writes = {"n": 0}
    real_write = sink._write

    def counting(batch, path):
        writes["n"] += 1
        real_write(batch, path)

    sink._write = counting
    sink(spark.range(2).withColumnRenamed("id", "v"), 4)
    assert writes["n"] == 1                    # delivered once, no retry
    assert len(sink.reports) == 1              # one report, not per-retry
    assert sink.reports[0].success and sink.reports[0].attempts == 1
    rows = _read_ndjson(str(tmp_path / "out"))
    assert {r["v"] for r in rows} == {0, 1}


def test_batch_id_collision_rejected_by_older_sinks(spark, tmp_path):
    """Round-10 ADVICE: the batch_id partition-column collision guard
    (DomainCapSink precedent) must also cover the older per-batch-
    partition sinks — a user data column named batch_id would be
    silently shadowed on read-back of their out/store prefixes."""
    from sumologic_aws_lambda_spark.streaming.dedup import (
        IncrementalDedupSink,
        ParagraphDedupSink,
    )
    from sumologic_aws_lambda_spark.streaming.quality import (
        QualityGateSink,
        not_null,
    )

    bad = spark.createDataFrame(
        [(1, "t", 0)], "doc_id bigint, text string, BATCH_ID int")
    sinks = [
        NdjsonDeliverySink(str(tmp_path / "o1"),
                           quarantine_dir=str(tmp_path / "q1")),
        IncrementalDedupSink(spark, str(tmp_path / "s2"),
                             str(tmp_path / "o2")),
        ParagraphDedupSink(spark, str(tmp_path / "s3"),
                           str(tmp_path / "o3")),
        QualityGateSink({"c": not_null("text")}, str(tmp_path / "o4"),
                        str(tmp_path / "q4")),
    ]
    for sink in sinks:
        with pytest.raises(ValueError, match="batch_id"):
            sink(bad, 0)
        # guard fired BEFORE any persistent side effect
    for d in tmp_path.iterdir():
        assert not any(d.glob("batch_id=*")), d


def test_drain_quarantine_skips_poison_dirs(spark, tmp_path):
    """Round-10 streaming review: an unreadable quarantine entry (an
    empty dir left by a crash mid-write raises AnalysisException, not
    Py4JJavaError) must be skipped so the other batches still drain."""
    import pathlib

    from sumologic_aws_lambda_spark.streaming.pipeline import (
        drain_quarantine,
    )

    q = tmp_path / "dlq"
    (q / "batch_id=9").mkdir(parents=True)  # empty: schema inference fails
    good = spark.createDataFrame([(1, "hello")], "doc_id bigint, m string")
    good.write.parquet(str(q / "batch_id=20"))
    out = tmp_path / "out"
    reports = drain_quarantine(spark, str(q), out_dir=str(out))
    # the good batch went out despite the poison dir sorting first
    assert any(r.success for r in reports)
    assert (out / "batch_id=20").exists()
    assert not pathlib.Path(q / "batch_id=20").exists()  # drained
    assert pathlib.Path(q / "batch_id=9").exists()  # poison stays
