"""Monitors and org-fields-schema queries — the alerting / governance
surface of the reference (``sumologic-app-utils/src/sumoresource.py``
``AlertsMonitor`` :1503, ``SumoLogicUpdateFields`` :1041,
``SumoLogicFieldsSchema`` :1351) re-expressed as oracled analytics."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..plans.monitors import (
    evaluate_monitors,
    parse_monitor_folder,
    throttle_alerts,
)
from ..provisioning import CatalogStore
from . import query
from .sumoql_queries import EVENTS_SCHEMA

# A monitors-export folder in the public shape the reference imports
# (``sumoresource.py:1509-1527`` fetches JSON from S3, substitutes
# ``${var}`` templates, and imports into the monitors library).  The
# source categories are templated to exercise the substitution path.
_MONITOR_FOLDER = json.dumps({
    "type": "MonitorsLibraryFolderExport",
    "name": "Engine Health",
    "children": [
        {
            "type": "MonitorsLibraryMonitorExport",
            "name": "high_click_volume",
            "monitorType": "Logs",
            "queries": [{
                "rowId": "A",
                "query": "_sourceCategory=${click_category}"
                         " | timeslice 1d | count by _timeslice",
            }],
            "triggers": [
                {"detectionMethod": "StaticCondition",
                 "triggerType": "Critical", "threshold": 75,
                 "thresholdType": "GreaterThan", "timeRange": "-1d"},
                {"detectionMethod": "StaticCondition",
                 "triggerType": "Warning", "threshold": 65,
                 "thresholdType": "GreaterThan", "timeRange": "-1d"},
            ],
        },
        {
            "type": "MonitorsLibraryMonitorExport",
            "name": "purchase_volume_drop",
            "monitorType": "Logs",
            "queries": [{
                "rowId": "A",
                "query": "_sourceCategory=${purchase_category}"
                         " | timeslice 1d | count by _timeslice",
            }],
            "triggers": [
                {"detectionMethod": "StaticCondition",
                 "triggerType": "Critical", "threshold": 56,
                 "thresholdType": "LessThan", "timeRange": "-1d"},
                {"detectionMethod": "StaticCondition",
                 "triggerType": "Warning", "threshold": 60,
                 "thresholdType": "LessThanOrEqual", "timeRange": "-1d"},
            ],
        },
    ],
})


# Shared by monitor_threshold_alerts and monitor_alert_throttle: the
# four triggers' alert rows as plain SQL.
_ALERTS_ORACLE = """
    WITH click AS (
        SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)
                   AS slice_epoch,
               count(*) AS n
        FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    purch AS (
        SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)
                   AS slice_epoch,
               count(*) AS n
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT 'high_click_volume' AS monitor, 'Critical' AS severity,
           slice_epoch, CAST(n AS DOUBLE) AS value, 75.0 AS threshold
    FROM click WHERE n > 75
    UNION ALL
    SELECT 'high_click_volume', 'Warning',
           slice_epoch, CAST(n AS DOUBLE), 65.0
    FROM click WHERE n > 65
    UNION ALL
    SELECT 'purchase_volume_drop', 'Critical',
           slice_epoch, CAST(n AS DOUBLE), 56.0
    FROM purch WHERE n < 56
    UNION ALL
    SELECT 'purchase_volume_drop', 'Warning',
           slice_epoch, CAST(n AS DOUBLE), 60.0
    FROM purch WHERE n <= 60
"""


@query("monitor_threshold_alerts", oracle=_ALERTS_ORACLE)
def monitor_threshold_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold monitors over compiled SumoQL results: a monitors-export
    folder JSON (two monitors, four static triggers covering all four
    thresholdType comparators) parses into specs, each monitor's search
    compiles through the SumoQL compiler into a daily-timeslice count,
    and each trigger's comparator filters the aggregate into alert rows.
    Triggers evaluate independently — a Critical breach also emits its
    Warning row — matching the reference's per-trigger alerting."""
    specs = parse_monitor_folder(_MONITOR_FOLDER, {
        "click_category": "click",
        "purchase_category": "purchase",
    })
    ev = table(spark, sf_dir, "events")
    return evaluate_monitors(ev, specs, EVENTS_SCHEMA)


@query(
    "fields_schema_apply",
    oracle="""
    SELECT event_id,
           'k,user' AS kept_keys,
           json_extract_string(props, '$.k') AS k_val,
           CAST(CASE WHEN value > 100 THEN 2 ELSE 1 END AS BIGINT)
               AS n_dropped
    FROM events WHERE event_id % 97 = 0
    """,
)
def fields_schema_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Org-level fields schema applied at ingest: only map keys that are
    registered AND enabled in the org field registry survive; everything
    else is dropped (the backend's dropped-fields semantics for keys
    missing from the fields schema).  Here ``user`` and ``k`` are
    registered, ``etype`` is registered but disabled, and ``latency``
    (present only on high-value events) was never registered — so
    ``n_dropped`` is data-dependent.  The filter is a narrow
    ``map_filter`` against a literal allow-list (the schema is
    dimension-sized by construction) — no join, no UDF, no shuffle."""
    store = CatalogStore()
    store.create_field("user")
    store.create_field("k")
    etype = store.create_field("etype")
    store.set_field_enabled(etype.field_id, False)
    # "latency" intentionally never registered.

    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 97 == 0)
    attrs = F.map_filter(
        F.map_from_arrays(
            F.array(F.lit("user"), F.lit("k"),
                    F.lit("etype"), F.lit("latency")),
            F.array(
                F.col("user_id").cast("string"),
                F.get_json_object("props", "$.k"),
                F.col("event_type"),
                F.when(F.col("value") > 100,
                       F.col("value").cast("string")),
            ),
        ),
        lambda k, v: v.isNotNull(),
    )
    d = ev.withColumn("attrs", attrs)
    kept = store.fields_schema_filter("attrs")
    return d.select(
        "event_id",
        F.concat_ws(",", F.array_sort(F.map_keys(kept))).alias("kept_keys"),
        kept.getItem("k").alias("k_val"),
        (F.size("attrs") - F.size(kept)).cast("bigint").alias("n_dropped"),
    )


@query(
    "slo_error_budget",
    oracle="""
    WITH per AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS _timeslice,
               CAST(sum(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS good,
               CAST(count(*) AS BIGINT) AS total
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT *,
               sum(good)  OVER (ORDER BY _timeslice) AS cg,
               sum(total) OVER (ORDER BY _timeslice) AS ct
        FROM per
    )
    SELECT _timeslice, good, total,
           round(good / CAST(total AS DOUBLE), 6) AS sli,
           CAST(ct - cg AS BIGINT) AS cum_consumed,
           round(CAST(ct AS DOUBLE) * 0.25, 6) AS cum_budget,
           round(1.0 - (ct - cg) / (ct * 0.25), 6) AS budget_remaining,
           round((total - good) / (total * 0.25), 6) AS burn_rate
    FROM cum
    """,
)
def slo_error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget series (Sumo's SLO reliability surface on top of
    the monitors library): daily SLI for "events are not errors" at a
    75% target, cumulative budget consumption over the window, and the
    per-day burn rate that fast/slow-burn alert policies threshold.
    The oracle replays counting, cumulative sums, and budget math
    (``plans/slos.py::evaluate_slo``).

    Plan: ONE conditional-count groupBy on the day slice; all budget
    math runs on the ~30-row slice series."""
    from ..plans.slos import SloSpec, evaluate_slo

    ev = table(spark, sf_dir, "events")
    spec = SloSpec(name="non_error_slo",
                   good_condition="event_type <> 'error'",
                   target=0.75, slice_="1d")
    return evaluate_slo(ev, spec, EVENTS_SCHEMA)


@query(
    "monitor_alert_throttle",
    oracle="WITH alerts AS (" + _ALERTS_ORACLE + """)
    SELECT monitor, severity, slice_epoch, value, threshold,
           (lag(slice_epoch) OVER (
                PARTITION BY monitor, severity ORDER BY slice_epoch
            ) IS NOT NULL
            AND slice_epoch - lag(slice_epoch) OVER (
                PARTITION BY monitor, severity ORDER BY slice_epoch
            ) < 172800) AS suppressed
    FROM alerts
    """,
)
def monitor_alert_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Notification throttling over the monitor alert series
    (burst mode): with a 2-day cooldown, an alert is suppressed when
    its immediate predecessor in the series is closer than the
    cooldown — one notification per burst; re-notification requires a
    quiet gap ≥ cooldown (``plans/monitors.py::throttle_alerts``; the
    periodic-reminder variant is ``mode="bucket"``).  The window
    partitions on the config-sized (monitor, severity) key over the
    already-reduced alert series — raw events never reach the
    throttle."""
    specs = parse_monitor_folder(_MONITOR_FOLDER, {
        "click_category": "click",
        "purchase_category": "purchase",
    })
    ev = table(spark, sf_dir, "events")
    alerts = evaluate_monitors(ev, specs, EVENTS_SCHEMA)
    return throttle_alerts(alerts, cooldown_seconds=172800)


@query(
    "slo_burn_rate_windows",
    oracle="""
    WITH per AS (
        SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)
                   AS slice_epoch,
               CAST(sum(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS good,
               CAST(count(*) AS BIGINT) AS total
        FROM events GROUP BY 1
    ),
    rates AS (
        SELECT slice_epoch, good, total,
               round((total - good) / (total * 0.25), 6) AS burn_1h,
               round(CAST(sum(total - good) OVER w AS DOUBLE)
                     / (sum(total) OVER w * 0.25), 6) AS burn_long
        FROM per
        WINDOW w AS (ORDER BY slice_epoch
                     RANGE BETWEEN 21599 PRECEDING AND CURRENT ROW)
    )
    SELECT *, (burn_1h >= 0.9 AND burn_long >= 0.9) AS fast_burn
    FROM rates
    """,
)
def slo_burn_rate_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow burn-rate alert series (fast-burn policy: short AND
    long window both above threshold) for the non-error SLO at a 75%
    target — hourly slices, 6 h trailing long window over event-time
    RANGE so traffic gaps age out correctly, threshold 0.9.

    Plan: one conditional-count groupBy to the hourly series; both burn
    windows and the flag run over series rows only
    (``plans/slos.py::burn_rate_windows``)."""
    from ..plans.slos import SloSpec, burn_rate_windows

    ev = table(spark, sf_dir, "events")
    spec = SloSpec(name="non_error_slo",
                   good_condition="event_type <> 'error'",
                   target=0.75, slice_="1h")
    return burn_rate_windows(ev, spec, EVENTS_SCHEMA,
                             long_hours=6, threshold=0.9)


@query(
    "ewma_drift_alerts",
    oracle="""
    WITH series AS (
        SELECT event_type,
               CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)
                   AS slice_epoch,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    hist AS (
        SELECT event_type, slice_epoch, cnt,
               list(CAST(cnt AS DOUBLE)) OVER (
                   PARTITION BY event_type ORDER BY slice_epoch
                   ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING) AS a
        FROM series
    )
    SELECT event_type, slice_epoch, cnt,
           CAST(len(a) AS BIGINT) AS n_hist,
           round(
               list_sum(list_transform(generate_series(1, len(a)),
                        j -> a[j] * pow(0.7, len(a) - j)))
               / list_sum(list_transform(generate_series(1, len(a)),
                          j -> pow(0.7, len(a) - j))), 6) AS ewma_prev,
           (cnt > 1.5 * round(
               list_sum(list_transform(generate_series(1, len(a)),
                        j -> a[j] * pow(0.7, len(a) - j)))
               / list_sum(list_transform(generate_series(1, len(a)),
                          j -> pow(0.7, len(a) - j))), 6)) AS drift
    FROM hist WHERE len(a) >= 3
    """,
)
def ewma_drift_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA drift detection — the classic smoothed-baseline anomaly
    primitive (Sumo's ``outlier`` operator family, here as a registry
    query over per-type hourly volumes): each hour compares its count
    to the exponentially-weighted average of the TRAILING 12 closed
    hours (α = 0.3, weights renormalized over the available history so
    early hours are not biased toward zero), flagging hours more than
    1.5× above their own baseline.

    Plan: one conditional-count groupBy collapses the corpus to the
    (type × hour) series; the EWMA is a per-row fold over an ordered
    trailing collect_list window on SERIES rows (≤12 elements each) —
    identical sequential fold both engines, so the float compare is
    exact at round(6)."""
    ev = table(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("slice_epoch"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type").orderBy("slice_epoch")
        .rowsBetween(-12, -1)
    )
    hist = series.withColumn(
        "a", F.collect_list(F.col("cnt").cast("double")).over(w))
    n = F.size("a")
    idx = F.sequence(F.lit(1), n)
    arr = F.col("a")
    num = F.aggregate(
        idx, F.lit(0.0),
        lambda acc, j: acc + F.try_element_at(arr, j)
        * F.pow(F.lit(0.7), (n - j).cast("double")))
    den = F.aggregate(
        idx, F.lit(0.0),
        lambda acc, j: acc + F.pow(F.lit(0.7), (n - j).cast("double")))
    ewma = F.round(num / den, 6)
    return (
        hist.filter(n >= 3)
        .select(
            "event_type", "slice_epoch", "cnt",
            n.cast("bigint").alias("n_hist"),
            ewma.alias("ewma_prev"),
            (F.col("cnt") > 1.5 * ewma).alias("drift"),
        )
    )
