"""Streaming multiline assembly: entries must straddle micro-batches,
and the quiet-stream timeout must flush dangling buffers."""

from __future__ import annotations

import json

from sumologic_aws_lambda_spark.streaming.assembler import (
    assemble_multiline_stream,
)


def _run(spark, tmp_path, flush_after_ms):
    src = tmp_path / "src"
    src.mkdir()
    # Batch 1: stream A gets a boundary line + one continuation, then a
    # second entry whose continuation arrives in batch 2.
    (src / "b1.json").write_text("\n".join(
        json.dumps(r) for r in [
            {"stream_id": "A", "seq": 1,
             "line": "2026-01-01 10:00:00 ERROR boom"},
            {"stream_id": "A", "seq": 2, "line": "  at frame one"},
            {"stream_id": "A", "seq": 3,
             "line": "2026-01-01 10:00:01 WARN partial"},
        ]
    ))
    # Batch 2: continuation for A's dangling entry arrives, plus a new
    # boundary that closes it; stream B starts (and stays dangling).
    (src / "b2.json").write_text("\n".join(
        json.dumps(r) for r in [
            {"stream_id": "A", "seq": 4, "line": "  at frame two"},
            {"stream_id": "A", "seq": 5,
             "line": "2026-01-01 10:00:02 INFO done"},
            {"stream_id": "B", "seq": 1,
             "line": "2026-01-01 10:00:03 INFO lonely"},
        ]
    ))
    # Batch 3: unrelated stream keeps the query busy so processing-time
    # timers registered in earlier batches get a chance to fire.
    (src / "b3.json").write_text(json.dumps(
        {"stream_id": "C", "seq": 1,
         "line": "2026-01-01 10:00:04 INFO other"}
    ))

    stream = (
        spark.readStream.schema("stream_id string, seq bigint, line string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = assemble_multiline_stream(stream, flush_after_ms=flush_after_ms)

    emitted: list[dict] = []

    def capture(batch_df, batch_id):
        for r in batch_df.collect():
            emitted.append({"batch": batch_id, **r.asDict()})

    q = (
        out.writeStream.foreachBatch(capture)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # availableNow should self-terminate once the 3 files are drained;
    # don't let a lingering timer-driven query eat the full timeout.
    import time
    deadline = time.time() + 120
    while q.isActive and time.time() < deadline:
        p = q.lastProgress
        if p and p["numInputRows"] == 0 and p["batchId"] >= 3:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    return emitted


def test_entries_straddle_batches(spark, tmp_path):
    emitted = _run(spark, tmp_path, flush_after_ms=3_600_000)
    entries = {(e["stream_id"], e["first_seq"]): e for e in emitted}
    # entry 1 closed inside batch 1 by entry 2's boundary
    assert entries[("A", 1)]["n_lines"] == 2
    assert entries[("A", 1)]["entry"].endswith("at frame one")
    # entry 2 accumulated ACROSS batches: boundary in b1, frame in b2
    assert entries[("A", 3)]["n_lines"] == 2
    assert entries[("A", 3)]["entry"].endswith("at frame two")
    # with a huge flush timeout, dangling entries (A seq 5, B, C) are
    # still buffered, not emitted
    assert ("A", 5) not in entries and ("B", 1) not in entries


def test_timer_flushes_quiet_stream(spark, tmp_path):
    emitted = _run(spark, tmp_path, flush_after_ms=1)
    entries = {(e["stream_id"], e["first_seq"]): e for e in emitted}
    # the immediate-expiry timer flushes B's dangling entry when batch 3
    # (stream C only) runs — state O(active streams) stays bounded
    assert ("B", 1) in entries
    assert entries[("B", 1)]["entry"].endswith("lonely")
    # straddling assembly still intact under aggressive flushing: A's
    # dangling entry from b1 was flushed by timer OR closed by b2's
    # boundary; either way seq-3 entry exists
    assert ("A", 3) in entries
