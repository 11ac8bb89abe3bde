"""Threshold alert monitors over compiled SumoQL results.

Re-expresses the reference's ``AlertsMonitor`` custom resource
(``sumologic-app-utils/src/sumoresource.py:1503``) as an analytics
surface.  The reference imports a monitor-folder JSON (fetched from S3,
``${var}``-substituted — ``sumoresource.py:1509-1527``) into the SaaS
backend, which then evaluates each monitor's log-search query on a
schedule and fires Critical/Warning triggers when the result crosses a
static threshold.  Here the same folder JSON compiles into Spark plans:
each monitor's query runs through the SumoQL compiler
(``plans/sumoql.py``), and each trigger becomes a filter over the
aggregated result emitting alert rows.

Monitor-folder shape (the public monitors export format the reference
imports): a ``MonitorsLibraryFolderExport`` with ``children`` of type
``MonitorsLibraryMonitorExport``, each carrying ``queries``
(``[{"rowId": "A", "query": "..."}]``) and ``triggers``
(``[{"triggerType": "Critical", "threshold": 10.0, "thresholdType":
"GreaterThan", "timeRange": "-15m", ...}]``).

100 TB design: a monitor evaluation is exactly its query's plan — one
timeslice groupBy (partial-agg, keyed by slice × group) — plus a narrow
threshold filter; N monitors over the same stream share the scan.
Triggers are evaluated independently (a window above Critical also
matches Warning), matching the reference's per-trigger semantics.  The
streaming form is the identical aggregation under a watermark in append
mode: alerts emit once per finalized window — no monitor state beyond
Spark's own window store.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sumoql import SumoQLError, SumoSchema, compile_query

_THRESHOLD_OPS = {
    "GreaterThan": Column.__gt__,
    "GreaterThanOrEqual": Column.__ge__,
    "LessThan": Column.__lt__,
    "LessThanOrEqual": Column.__le__,
}


@dataclass(frozen=True)
class TriggerCondition:
    """One static-condition trigger (``detectionMethod:
    StaticCondition`` in the export JSON)."""

    severity: str                       # Critical | Warning
    threshold: float
    threshold_type: str = "GreaterThan"
    time_range: str = "-15m"

    def compare(self, value: Column) -> Column:
        try:
            op = _THRESHOLD_OPS[self.threshold_type]
        except KeyError:
            raise SumoQLError(
                f"unknown thresholdType {self.threshold_type!r}; "
                f"have {sorted(_THRESHOLD_OPS)}"
            ) from None
        return op(value, F.lit(float(self.threshold)))


@dataclass(frozen=True)
class MonitorSpec:
    name: str
    query: str
    triggers: tuple[TriggerCondition, ...]
    monitor_type: str = "Logs"


def substitute_variables(text: str, variables: dict[str, str] | None) -> str:
    """``${k}`` → ``v``, the reference's template substitution
    (``sumoresource.py:1509-1516`` ``_replace_variables``)."""
    if variables:
        for k, v in variables.items():
            text = text.replace("${%s}" % k, v)
    return text


def parse_time_range(tr: str) -> int:
    """``-15m`` / ``15m`` / ``-1d`` → seconds."""
    m = re.match(r"^-?(\d+)([smhd])$", tr.strip())
    if not m:
        raise SumoQLError(f"bad timeRange {tr!r}")
    return int(m.group(1)) * {"s": 1, "m": 60, "h": 3600, "d": 86400}[
        m.group(2)]


def parse_monitor_folder(text: str,
                         variables: dict[str, str] | None = None
                         ) -> list[MonitorSpec]:
    """Parse a monitors-export folder JSON into specs (nested folders
    flatten, matching the import-into-root-folder behavior of
    ``sumoresource.py:1543-1563``)."""
    doc = json.loads(substitute_variables(text, variables))
    specs: list[MonitorSpec] = []

    def walk(node: dict) -> None:
        ntype = node.get("type", "")
        if "Folder" in ntype:
            for child in node.get("children", []):
                walk(child)
            return
        queries = node.get("queries", [])
        if not queries:
            raise SumoQLError(f"monitor {node.get('name')!r} has no queries")
        # Alert-condition triggers only: real exports pair every alert
        # trigger with its RESOLUTION twin (ResolvedCritical /
        # ResolvedWarning — recovery notifications, whose condition
        # holds on every HEALTHY window and must not become an alert
        # filter) and may carry MissingData triggers (no 'threshold'
        # key at all — a presence check, not a threshold).  Both are
        # skipped here; resolution/no-data notification wiring is sink
        # behavior, not query evaluation.
        triggers = tuple(
            TriggerCondition(
                severity=t["triggerType"],
                threshold=float(t["threshold"]),
                threshold_type=t.get("thresholdType", "GreaterThan"),
                time_range=t.get("timeRange", "-15m"),
            )
            for t in node.get("triggers", [])
            if not str(t.get("triggerType", "")).startswith("Resolved")
            and "MissingData" not in str(t.get("triggerType", ""))
            and "threshold" in t
        )
        specs.append(MonitorSpec(
            name=node["name"],
            query=queries[0]["query"],
            triggers=triggers,
            monitor_type=node.get("monitorType", "Logs"),
        ))

    walk(doc)
    return specs


def _value_column(res: DataFrame, value_col: str | None) -> str:
    """The aggregate to threshold on: explicit, else the last compiled
    aggregate column (SumoQL names them ``_count`` / ``_sum_x`` / …)."""
    if value_col is not None:
        return value_col
    aggs = [c for c in res.columns
            if c.startswith("_") and c != "_timeslice"]
    if not aggs:
        raise SumoQLError(
            f"monitor query produced no aggregate column: {res.columns}")
    return aggs[-1]


def evaluate_monitor(df: DataFrame, spec: MonitorSpec,
                     schema: SumoSchema = SumoSchema(),
                     value_col: str | None = None) -> DataFrame:
    """Alert rows for one monitor over a batch frame.

    Output: ``(monitor, severity, slice_epoch?, <group cols…>, value,
    threshold)`` — one row per (window × group × trigger) whose value
    crosses that trigger's threshold.  Triggers evaluate independently,
    so a Critical breach emits its Warning row too (reference semantics:
    each trigger is its own alerting condition).
    """
    if not spec.triggers:
        raise SumoQLError(
            f"monitor {spec.name!r} has no triggers — nothing to evaluate"
        )
    res = compile_query(df, spec.query, schema)
    vcol = _value_column(res, value_col)
    # Group columns are the NON-aggregate columns: a query with several
    # aggregates ('count, sum(bytes) by host') thresholds on one of them
    # and must not leak the others into the output schema — the
    # evaluate_monitors union requires every monitor to emit the same
    # (monitor, severity, slice_epoch?, groups…, value, threshold) shape.
    # The compiler names every aggregate with a leading underscore, the
    # same convention _value_column keys on.
    group_cols = [c for c in res.columns
                  if c not in (vcol, "_timeslice")
                  and not c.startswith("_")]
    frames = []
    for trig in spec.triggers:
        sel: list[Column] = [
            F.lit(spec.name).alias("monitor"),
            F.lit(trig.severity).alias("severity"),
        ]
        if "_timeslice" in res.columns:
            sel.append(F.unix_timestamp("_timeslice").cast("bigint")
                       .alias("slice_epoch"))
        sel.extend(F.col(c) for c in group_cols)
        sel.append(F.col(vcol).cast("double").alias("value"))
        sel.append(F.lit(float(trig.threshold)).alias("threshold"))
        frames.append(res.filter(trig.compare(F.col(vcol))).select(*sel))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def evaluate_monitors(df: DataFrame, specs: list[MonitorSpec],
                      schema: SumoSchema = SumoSchema(),
                      value_col: str | None = None) -> DataFrame:
    """Union of every monitor's alerts.  Monitors whose queries produce
    different group columns should be evaluated separately — this union
    requires schema-aligned results (same timeslice/group shape), the
    common case for a folder of monitors over one source."""
    if not specs:
        raise SumoQLError("no monitor specs to evaluate")
    out = evaluate_monitor(df, specs[0], schema, value_col)
    for spec in specs[1:]:
        out = out.unionByName(evaluate_monitor(df, spec, schema, value_col))
    return out


def streaming_threshold_monitor(records: DataFrame, spec: MonitorSpec,
                                ts_col: str = "ts",
                                group_cols: tuple[str, ...] = (),
                                window_seconds: int | None = None,
                                watermark: str = "1 hour",
                                schema: SumoSchema = SumoSchema()
                                ) -> DataFrame:
    """The streaming twin of :func:`evaluate_monitor` for count-based
    monitors: event-time tumbling windows under a watermark, append-mode
    safe — each alert row emits exactly once, when its window finalizes.

    The monitor query's SCOPE (everything before the first ``|``) is
    applied as a filter — an 'error'-scoped monitor must not count 'ok'
    records toward its threshold.  Pipe stages are NOT applied (the
    tumbling count here replaces the query's own timeslice/count); a
    query whose aggregation is not a plain count belongs in the batch
    evaluator.

    ``window_seconds`` defaults to the first trigger's ``timeRange`` (the
    reference evaluates each trigger over its lookback; a tumbling window
    of the same width is the streaming analog).  The aggregation is the
    same partial-aggregatable count the batch plan runs; no custom state.
    """
    from .sumoql import scope_predicate

    if not spec.triggers:
        raise SumoQLError(f"monitor {spec.name!r} has no triggers")
    if window_seconds is None:
        window_seconds = parse_time_range(spec.triggers[0].time_range)
    scope = spec.query.split("|", 1)[0].strip()
    if scope and scope != "*":
        records = records.filter(scope_predicate(scope, schema))
    win = F.window(F.col(ts_col), f"{window_seconds} seconds")
    agg = (
        records.withWatermark(ts_col, watermark)
        .groupBy(win.alias("_w"), *[F.col(c) for c in group_cols])
        .agg(F.count(F.lit(1)).alias("_count"))
    )
    frames = []
    for trig in spec.triggers:
        frames.append(
            agg.filter(trig.compare(F.col("_count")))
            .select(
                F.lit(spec.name).alias("monitor"),
                F.lit(trig.severity).alias("severity"),
                F.unix_timestamp(F.col("_w.start")).cast("bigint")
                .alias("slice_epoch"),
                *[F.col(c) for c in group_cols],
                F.col("_count").cast("double").alias("value"),
                F.lit(float(trig.threshold)).alias("threshold"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def run_monitor_stream(spark, in_path: str, out_dir: str,
                       checkpoint_dir: str, spec: MonitorSpec,
                       schema_ddl: str = "ts timestamp, event_type string",
                       group_cols: tuple[str, ...] = (),
                       window_seconds: int | None = None,
                       watermark: str = "1 hour",
                       available_now: bool = True,
                       schema: SumoSchema = SumoSchema()):
    """Wire a json-lines event stream through the streaming monitor to a
    parquet alert sink.  Returns the StreamingQuery."""
    stream = (
        spark.readStream.format("json").schema(schema_ddl).load(in_path)
    )
    alerts = streaming_threshold_monitor(
        stream, spec, group_cols=group_cols,
        window_seconds=window_seconds, watermark=watermark, schema=schema)
    writer = (
        alerts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def throttle_alerts(alerts: DataFrame, cooldown_seconds: int,
                    slice_col: str = "slice_epoch",
                    key_cols: tuple[str, ...] = ("monitor", "severity"),
                    mode: str = "burst") -> DataFrame:
    """Notification throttling (the reference provisions the monitor
    JSON; the backend throttles delivery).  Two deterministic policies:

    ``mode="burst"`` — suppress an alert whose *immediate predecessor*
    in the series (whether or not that predecessor itself notified) is
    closer than the cooldown.  Exactly one notification per burst: a
    breach that persists with gaps under the cooldown notifies once and
    stays silent until a quiet gap ≥ cooldown, however long it lasts.
    The "page once per incident" policy.

    ``mode="bucket"`` — at most one notification per epoch-aligned
    cooldown bucket: only the earliest alert inside each
    ``floor(slice/cooldown)`` bucket notifies.  A sustained breach
    re-notifies every cooldown period.  The "remind me periodically"
    policy.  (True re-notify-exactly-cooldown-after-last-notification
    is a running recurrence no window expresses; the bucket policy is
    the standard shuffle-friendly equivalent.)

    Returns the input plus ``suppressed`` (boolean).  Scale: both modes
    window over the monitor/severity(+bucket) key — the monitor fleet
    is config-sized and each series holds one row per breached
    timeslice, so no partition outgrows a series; raw events were
    already reduced by the monitor evaluation.
    """
    from pyspark.sql import Window

    if mode == "burst":
        w = Window.partitionBy(*key_cols).orderBy(slice_col)
        prev = F.lag(slice_col).over(w)
        suppressed = prev.isNotNull() & (
            (F.col(slice_col) - prev) < F.lit(cooldown_seconds)
        )
    elif mode == "bucket":
        bucket = F.floor(F.col(slice_col) / cooldown_seconds)
        w = Window.partitionBy(*key_cols, bucket)
        suppressed = F.col(slice_col) > F.min(slice_col).over(w)
    else:
        raise SumoQLError(f"unknown throttle mode {mode!r}")
    return alerts.withColumn("suppressed", suppressed)
