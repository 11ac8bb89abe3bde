"""Kinesis record explode (S2) + backlog listener (T7)."""

from __future__ import annotations

import json

from sumologic_aws_lambda_spark.sources.kinesis import (
    explode_kinesis_records,
    kinesis_pipeline,
)
from sumologic_aws_lambda_spark.streaming.monitor import (
    BacklogAlert,
    BacklogListener,
)
from sumologic_aws_lambda_spark.testing.fixtures import synthetic_cwl_payloads


def _kinesis_event() -> str:
    payloads = synthetic_cwl_payloads()[:3]
    return json.dumps({
        "Records": [
            {"eventID": f"shard-0:{i}",
             "kinesis": {"partitionKey": f"pk-{i}",
                         "sequenceNumber": str(1000 + i),
                         "data": p}}
            for i, p in enumerate(payloads)
        ]
    })


def test_explode_and_pipeline(spark):
    df = spark.createDataFrame([(_kinesis_event(),)], "event_json string")
    recs = explode_kinesis_records(df)
    assert recs.count() == 3
    assert {r.partition_key for r in recs.collect()} == {"pk-0", "pk-1", "pk-2"}

    out = kinesis_pipeline(df)
    # envelopes 1-3 of the fixture set: 6+2+3 events, minus 1 falsy drop
    assert out.count() == 10
    assert "metadata_key" in out.columns


def test_backlog_listener_thresholds():
    listener = BacklogListener(threshold=5)

    class P:  # minimal progress stub
        id = "q-1"
        batchId = 9
        numInputRows = 12
        durationMs = {"triggerExecution": 2500}

    class E:
        progress = P()

    listener.onQueryProgress(E())
    assert len(listener.alerts) == 1
    a: BacklogAlert = listener.alerts[0]
    assert a.num_input_rows == 12 and a.seconds_behind == 2.5

    P.numInputRows = 3
    listener.onQueryProgress(E())
    assert len(listener.alerts) == 1  # below threshold → no alert


def test_backlog_listener_lag_condition():
    """A batch slower than the trigger interval alerts even when row
    count is under the threshold."""
    from types import SimpleNamespace

    from sumologic_aws_lambda_spark.streaming.monitor import BacklogListener

    fired = []
    lst = BacklogListener(threshold=100_000, alert=fired.append,
                          trigger_interval_seconds=60)
    progress = SimpleNamespace(
        id="q-1", batchId=7, numInputRows=10,
        durationMs={"triggerExecution": 300_000},
    )
    lst.onQueryProgress(SimpleNamespace(progress=progress))
    assert len(fired) == 1
    assert fired[0].seconds_behind == 300.0
    # a fast batch with few rows stays quiet
    progress2 = SimpleNamespace(
        id="q-1", batchId=8, numInputRows=10,
        durationMs={"triggerExecution": 0},
    )
    lst.onQueryProgress(SimpleNamespace(progress=progress2))
    assert len(fired) == 1
    # a 0 ms duration is a legitimate value, not None
    lst2 = BacklogListener(threshold=5, alert=fired.append)
    lst2.onQueryProgress(SimpleNamespace(progress=progress2))
    assert fired[-1].seconds_behind == 0.0
