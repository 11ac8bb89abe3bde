"""Streaming health monitor (SURVEY §2.8 T7).

Reference: a CloudWatch alarm fires when the DLQ backlog exceeds 100,000
visible messages over an hour and notifies SNS
(``DLQLambdaCloudFormation.json:322-349``).  Spark twin: a
``StreamingQueryListener`` watching per-batch input rows and processing
lag, invoking a pluggable alert callback past a threshold — the hook a
deployment wires to its paging system.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql.streaming import StreamingQueryListener

DEFAULT_BACKLOG_THRESHOLD = 100_000


@dataclass
class BacklogAlert:
    query_id: str
    batch_id: int
    num_input_rows: int
    seconds_behind: float | None


class BacklogListener(StreamingQueryListener):
    """Alerts when a micro-batch's input exceeds ``threshold`` rows (the
    backlog signal available without an external queue) or — when
    ``trigger_interval_seconds`` is supplied — a batch's execution time
    exceeds the trigger interval (sustained lag: every batch slower than
    the trigger means the stream falls further behind each tick).

    ``seconds_behind`` carries the batch's triggerExecution duration in
    seconds (the lag PER TICK, not total backlog — total backlog needs
    the source's own queue metrics, T7's Kinesis monitor)."""

    def __init__(self, threshold: int = DEFAULT_BACKLOG_THRESHOLD,
                 alert: Callable[[BacklogAlert], None] | None = None,
                 trigger_interval_seconds: float | None = None):
        self.threshold = threshold
        self.trigger_interval_seconds = trigger_interval_seconds
        self.alerts: list[BacklogAlert] = []
        self._alert_fn = alert

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rows = p.numInputRows or 0
        batch_duration = (p.durationMs or {}).get("triggerExecution")
        batch_seconds = (batch_duration / 1000.0
                         if batch_duration is not None else None)
        lagging = (
            self.trigger_interval_seconds is not None
            and batch_seconds is not None
            and batch_seconds > self.trigger_interval_seconds
        )
        if rows > self.threshold or lagging:
            alert = BacklogAlert(
                query_id=str(p.id),
                batch_id=p.batchId,
                num_input_rows=rows,
                seconds_behind=batch_seconds,
            )
            self.alerts.append(alert)
            if self._alert_fn is not None:
                self._alert_fn(alert)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass
