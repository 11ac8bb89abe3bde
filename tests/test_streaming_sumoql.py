"""The SumoQL compiler under Structured Streaming: a saved search runs
per micro-batch inside ``foreachBatch`` — the streaming twin of the
Search-Job path (§3.3), i.e. a scheduled/live dashboard panel.

Stateless stages (scope, parse, where, timeslice, aggregation) are
batch/stream agnostic: ``compile_query`` builds the same plan on the
micro-batch frame as on a table.  Cross-batch continuity (cumulative
accum, streamed outlier baselines) belongs to the stateful layer
(``streaming/stateful.py``), not the per-batch search.
"""

from __future__ import annotations

import json

from sumologic_aws_lambda_spark.plans.sumoql import SumoSchema, compile_query

SCHEMA = SumoSchema(raw_col="message", ts_col="ts")


def test_saved_search_runs_per_microbatch(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    rows = [
        {"ts": f"2024-01-01T10:{m:02d}:00", "message": f"GET /api/x {st}"}
        for m, st in zip(range(10), [200, 200, 500, 200, 404, 500,
                                     200, 200, 500, 200])
    ]
    (landing / "events.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )

    stream = (
        spark.readStream.schema("ts timestamp, message string")
        .json(str(landing))
    )

    batches: list[dict] = []

    def run_saved_search(batch_df, batch_id):
        out = compile_query(
            batch_df,
            '* | parse "GET /api/x *" as status'
            " | where CAST(status AS INT) >= 400"
            " | timeslice 5m | count by _timeslice",
            SCHEMA,
        )
        for r in out.collect():
            batches.append(
                {"slice": r["_timeslice"].isoformat(), "n": r["_count"]}
            )

    q = (
        stream.writeStream.foreachBatch(run_saved_search)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {b["slice"]: b["n"] for b in batches}
    # errors at 10:02/10:04 (slice 10:00) and 10:05/10:08 (slice 10:05)
    assert got == {"2024-01-01T10:00:00": 2, "2024-01-01T10:05:00": 2}
