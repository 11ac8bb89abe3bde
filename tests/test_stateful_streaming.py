"""applyInPandasWithState: state must accumulate across micro-batches."""

from __future__ import annotations

import json

from sumologic_aws_lambda_spark.streaming.stateful import running_totals


def test_running_totals_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # two files → two micro-batches (maxFilesPerTrigger=1)
    (src / "b1.json").write_text("\n".join(
        json.dumps({"user_id": u, "value": float(v)})
        for u, v in [(1, 10.0), (1, 5.0), (2, 1.0)]
    ))
    (src / "b2.json").write_text("\n".join(
        json.dumps({"user_id": u, "value": float(v)})
        for u, v in [(1, 2.0), (3, 7.0)]
    ))

    stream = (
        spark.readStream.schema("user_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = running_totals(stream)

    emitted: list[dict] = []

    def capture(batch_df, batch_id):
        for r in batch_df.collect():
            emitted.append({"batch": batch_id, **r.asDict()})

    q = (
        out.writeStream.foreachBatch(capture)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    finals = {e["key"]: e for e in emitted}  # last emit per key wins
    # user 1 appears in both batches → state accumulated 10+5+2
    assert finals[1]["n_events"] == 3 and finals[1]["total_value"] == 17.0
    assert finals[2]["n_events"] == 1 and finals[2]["total_value"] == 1.0
    assert finals[3]["n_events"] == 1 and finals[3]["total_value"] == 7.0
    # user 1 was emitted twice (once per batch), cumulative both times
    u1 = [e for e in emitted if e["key"] == 1]
    assert len(u1) == 2 and u1[0]["n_events"] < u1[1]["n_events"]
