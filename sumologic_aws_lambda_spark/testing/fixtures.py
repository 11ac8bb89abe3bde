"""Deterministic synthetic CWL envelopes.

Shape mirrors the reference's golden fixtures
(``cloudwatchlogs-with-dlq/cwlfixtures.json`` /
``cloudwatchlogs/testevent.json``): base64(gzip(JSON)) envelopes with
DATA_MESSAGE/CONTROL_MESSAGE types, lambda console-format lines, explicit
``RequestId:`` lines, JSON messages, ``_sumo_metadata`` overrides,
trailing newlines and empty messages.  Used by both the pytest golden test
and the rows-only ``cwl_decode_pipeline`` driver query.
"""

from __future__ import annotations

import base64
import gzip
import json

_BASE_TS = 1706000000000  # 2024-01-23T08:53:20Z, epoch millis


def _envelope(log_group: str, log_stream: str, events: list[dict],
              message_type: str = "DATA_MESSAGE") -> str:
    env = {
        "messageType": message_type,
        "owner": "123456789010",
        "logGroup": log_group,
        "logStream": log_stream,
        "subscriptionFilters": ["sumo-filter"],
        "logEvents": events,
    }
    raw = json.dumps(env).encode("utf-8")
    return base64.b64encode(gzip.compress(raw, mtime=0)).decode("ascii")


def _event(i: int, message: str) -> dict:
    return {"id": f"evt-{i:04d}", "timestamp": _BASE_TS + i * 1000,
            "message": message}


def synthetic_cwl_payloads() -> list[str]:
    """Five envelopes exercising every createRecords branch."""
    lambda_events = [
        _event(0, "START RequestId: 11111111-aaaa-bbbb-cccc-222222222222 Version: $LATEST"),
        # console-format line: ts uuid LEVEL message (consoleFormatRegex)
        _event(1, "2024-01-23T09:33:21.000Z 11111111-aaaa-bbbb-cccc-222222222222 INFO handling request\n"),
        # no own requestId → inherits from the previous event (P4)
        _event(2, "plain continuation line"),
        _event(3, '{"level":"info","msg":"structured"}'),
        _event(4, ""),  # falsy → dropped (F3)
        _event(5, "END RequestId: 11111111-aaaa-bbbb-cccc-222222222222"),
    ]
    meta_events = [
        _event(0, '{"_sumo_metadata":{"category":"override/cat"},"payload":"x"}'),
        _event(1, "free text with trailing newline\n"),
    ]
    app_events = [_event(i, f"app log line {i}") for i in range(3)]
    return [
        _envelope("/aws/lambda/fn-a", "2024/01/23/[$LATEST]abc123", lambda_events),
        _envelope("/aws/app/service-b", "stream-b", meta_events),
        _envelope("/aws/app/service-c", "stream-c", app_events),
        # CONTROL_MESSAGE → dropped whole (F1)
        _envelope("/aws/app/service-c", "stream-c",
                  [_event(0, "CWL CONTROL MESSAGE: Checking health")],
                  "CONTROL_MESSAGE"),
        # second stream for prefix-filter tests (F2)
        _envelope("/aws/app/service-d", "other-d",
                  [_event(i, f"other line {i}") for i in range(2)]),
    ]
