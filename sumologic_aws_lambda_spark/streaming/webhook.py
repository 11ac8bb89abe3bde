"""Webhook connections: payload-templated HTTP delivery of query results.

Mirrors the reference's ``Connections`` custom resource
(``sumologic-app-utils/src/sumoresource.py:161``): a named webhook
connection carrying a url, auth/region headers (accessKey / secretKey /
awsRegion / serviceName — ``:170-186``), a ``webhookType``, and a
``defaultPayload`` JSON template whose ``Rows`` value is a JSON *string*
embedding the result rows (``:188`` — the exact double-encoded shape the
S9 API-Gateway source parses back out, ``queries/extensions.py::
apigw_body_rows_parse``).

Spark-first: delivery is a ``foreachBatch`` hook.  A webhook notification
is a driver-side POST by nature (it carries an alert/search result, not a
corpus), so the batch is capped at ``result_cap`` rows before the one
``collect`` — same documented bound as the search-service paging surface.
The POST transport is injected (tests record it; production passes an
HTTP client), and retries follow the reference's linear backoff
(``count * seed``); on exhaustion the batch is QUARANTINED
(``quarantine_dir``, same ``batch_id=N`` parquet convention as
``NdjsonDeliverySink``; drain it with ``drain_quarantine(...,
sink=WebhookDeliverySink(...))`` so the batches are re-POSTed — an
NDJSON drain would write the alerts to files and never deliver them)
or, with no
quarantine configured, the sink raises so the streaming checkpoint does
not commit and the batch is redelivered — a notification is never
silently dropped.
"""

from __future__ import annotations

import json
import re
import time
from dataclasses import dataclass, field


@dataclass
class WebhookConnection:
    """One connection object (``sumoresource.py:166-190``)."""

    name: str
    url: str
    connection_type: str = "WebhookDefinition"
    webhook_type: str = "Webhook"
    description: str = ""
    headers: dict[str, str] = field(default_factory=dict)
    default_payload: str = '{"Rows":"{{Rows}}"}'
    connection_id: str = ""


_VAR = re.compile(r"\{\{(\w+)\}\}")


def render_payload(template: str, rows: list[dict],
                   variables: dict[str, object] | None = None) -> str:
    """Substitute ``{{Var}}`` placeholders into the payload template.

    ``{{Rows}}`` expands to the result rows as an embedded JSON *string*
    (double-encoded, like the reference's defaultPayload);
    ``{{NumRawResults}}`` to the row count; any other name resolves from
    ``variables`` (JSON-escaped for safe splicing inside string values).
    Unknown placeholders are left intact — a template may legitimately
    target a downstream templating pass.
    """
    variables = variables or {}

    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name == "Rows":
            # rows → JSON array → re-encoded as a JSON string body, with
            # the outer quotes stripped because the template supplies them
            return json.dumps(json.dumps(
                rows, sort_keys=True, separators=(",", ":")))[1:-1]
        if name == "NumRawResults":
            return str(len(rows))
        if name in variables:
            v = variables[name]
            if isinstance(v, str):
                return json.dumps(v)[1:-1]
            return json.dumps(v)
        return m.group(0)

    return _VAR.sub(sub, template)


@dataclass
class WebhookReport:
    batch_id: int
    attempts: int
    ok: bool
    rows: int
    error: str | None = None


class WebhookDeliverySink:
    """``foreachBatch`` callable: render the connection's payload template
    over the batch's rows and POST it via the injected transport.

    ``post(url, body, headers)`` must raise on delivery failure; the whole
    payload retries with the reference's linear backoff
    (``exponentialBackoff(seed) = count * seed``, utils.js:28-34).  Rows
    are ordered by their JSON encoding so the payload is deterministic
    regardless of partitioning.
    """

    def __init__(self, connection: WebhookConnection, post,
                 variables: dict[str, object] | None = None,
                 result_cap: int = 1000, max_retries: int = 3,
                 backoff_seconds: float = 5.0,
                 quarantine_dir: str | None = None, sleep=time.sleep):
        self.connection = connection
        self.post = post
        self.variables = variables or {}
        self.result_cap = result_cap
        self.max_retries = max_retries
        self.backoff_seconds = backoff_seconds
        self.quarantine_dir = quarantine_dir
        self.reports: list[WebhookReport] = []
        self._sleep = sleep

    def __call__(self, batch_df, batch_id: int) -> None:
        # Cap AFTER an ordering: a bare limit() keeps an arbitrary
        # partition-order-dependent subset when the batch exceeds the
        # cap, so two runs of the same stream would deliver different
        # rows.  Order by every ORDERABLE column (maps cannot be sort
        # keys — ordering on them throws; such columns still ride along
        # and are delivered).  TakeOrderedAndProject physically, no full
        # sort materialized.  A frame with no orderable column at all
        # falls back to the arbitrary cap — deterministic delivery then
        # needs an explicit key column upstream.
        order_cols = sorted(
            c for c, t in batch_df.dtypes if "map<" not in t
        )
        ordered = (batch_df.orderBy(*order_cols) if order_cols
                   else batch_df)
        encoded = sorted(
            ordered.limit(self.result_cap).toJSON().collect())
        rows = [json.loads(s) for s in encoded]
        if not rows:
            return
        body = render_payload(
            self.connection.default_payload, rows, self.variables)
        last_err: Exception | None = None
        for attempt in range(1, self.max_retries + 1):
            try:
                self.post(self.connection.url, body,
                          self.connection.headers)
                self.reports.append(
                    WebhookReport(batch_id, attempt, True, len(rows)))
                return
            except Exception as exc:  # delivery failure → retry
                last_err = exc
                if attempt < self.max_retries:
                    self._sleep(self.backoff_seconds * attempt)
        self.reports.append(
            WebhookReport(batch_id, self.max_retries, False, len(rows),
                          str(last_err)))
        # Never swallow an exhausted delivery: either quarantine the
        # batch for the DLQ drain (same batch_id=N convention as
        # NdjsonDeliverySink) or raise so the checkpoint does NOT
        # commit and the batch is redelivered — a silently-dropped
        # notification is the worst outcome for an alerting sink.
        if self.quarantine_dir is not None:
            batch_df.write.mode("overwrite").parquet(
                f"{self.quarantine_dir}/batch_id={batch_id}"
            )
        else:
            raise RuntimeError(
                f"webhook delivery failed after {self.max_retries} "
                f"attempts for batch {batch_id}: {last_err}"
            ) from last_err
