"""Time-series SumoQL stages + network/log-clustering queries, each with
a DuckDB oracle.

These drive the ``plans/sumoql_ts.py`` stages end-to-end through the
compiler (the operators behind Sumo's dashboard panels — the reference's
"benchmark" content packs, e.g. ``cloudtrailbenchmark/template.yaml:316``,
are built from saved searches that feed exactly these), plus the IPv4/CIDR
scalar family (reference precedent: CIDR prefix matching in
``cloudwatchlogs-with-dlq/vpcutils.js:31-48``) and a LogReduce-style
template-clustering pass.

Float discipline: every cross-engine double is derived from DECIMAL
sufficient statistics (exact, order-independent sums), so Spark and
DuckDB produce bit-identical doubles — no rounding in the compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.ip import (
    compare_cidr_prefix,
    get_cidr_prefix,
    mask_from_cidr,
)
from ..plans.sumoql import SumoSchema, compile_query
from . import query

EVENTS_SCHEMA = SumoSchema(
    raw_col="props", ts_col="ts",
    meta_cols={"_sourceCategory": "event_type"},
)


@query(
    "sumoql_accum_total",
    oracle="""
    WITH base AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS _timeslice,
               count(*) AS _count
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT _timeslice, _count,
           CAST(sum(CAST(_count AS DECIMAL(28,6))) OVER (
                ORDER BY _timeslice
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS _accum,
           CAST(sum(CAST(_count AS DECIMAL(28,6))) OVER () AS DOUBLE)
               AS _total
    FROM base
    """,
)
def sumoql_accum_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``accum`` (running total) + ``total`` (grand total) over a daily
    count series — Sumo's cumulative dashboard pair."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        "_sourceCategory=purchase | timeslice 1d | count by _timeslice"
        " | accum _count | total _count",
        EVENTS_SCHEMA,
    )


@query(
    "sumoql_trailing_windows",
    oracle="""
    WITH base AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS _timeslice,
               count(*) AS _count
        FROM events GROUP BY 1, 2
    ), win AS (
        SELECT event_type, _timeslice, _count,
               lag(_count) OVER seq AS _backshift,
               _count - lag(_count) OVER seq AS _diff,
               CAST(sum(CAST(_count AS DECIMAL(28,6))) OVER tw AS DOUBLE)
                   AS s,
               CAST(sum(CAST(_count AS DECIMAL(28,6))
                        * CAST(_count AS DECIMAL(28,6))) OVER tw AS DOUBLE)
                   AS sq,
               CAST(count(_count) OVER tw AS DOUBLE) AS n
        FROM base
        WINDOW seq AS (PARTITION BY event_type ORDER BY _timeslice),
               tw AS (PARTITION BY event_type ORDER BY _timeslice
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, _timeslice, _count, _backshift, _diff,
           s / n AS _smooth,
           CASE WHEN n >= 2 THEN
               sqrt(greatest((sq - s * s / n) / (n - 1), 0))
           END AS _rollingstd
    FROM win
    """,
)
def sumoql_trailing_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``backshift | diff | smooth | rollingstd`` per series — the full
    trailing-window family, grouped ``by event_type``.  Post-aggregation
    input, so the single window shuffle on the series key is cheap at any
    scale."""
    ev = table(spark, sf_dir, "events")
    out = compile_query(
        ev,
        "* | timeslice 1d | count by event_type, _timeslice"
        " | backshift _count by event_type"
        " | diff _count by event_type"
        " | smooth _count, 7 by event_type"
        " | rollingstd _count, 7 by event_type",
        EVENTS_SCHEMA,
    )
    return out


@query(
    "sumoql_fillmissing_zero",
    oracle="""
    WITH base AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS _timeslice,
               count(*) AS _count
        FROM events
        WHERE event_type = 'error' AND value > 180
        GROUP BY 1
    ), axis AS (
        SELECT unnest(generate_series(
                   (SELECT min(_timeslice) FROM base),
                   (SELECT max(_timeslice) FROM base),
                   INTERVAL 1 HOUR)) AS _timeslice
    )
    SELECT axis._timeslice AS _timeslice,
           coalesce(base._count, 0) AS _count
    FROM axis LEFT JOIN base ON axis._timeslice = base._timeslice
    """,
)
def sumoql_fillmissing_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``fillmissing timeslice(1h)`` — densify a sparse hourly series so
    downstream accum/smooth/outlier see a gap as zero, not as a skipped
    row.  The axis side is (slices) rows — broadcast-joined back."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        "_sourceCategory=error | where value > 180 | timeslice 1h"
        " | count by _timeslice | fillmissing timeslice(1h)",
        EVENTS_SCHEMA,
    )


@query(
    "sumoql_transpose_matrix",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS _timeslice,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY 1
    """,
)
def sumoql_transpose_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``transpose row _timeslice column event_type as …`` through the
    compiler — explicit pivot domain, so no distinct-discovery job."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        "* | timeslice 1d | count by _timeslice, event_type"
        " | transpose row _timeslice column event_type"
        " as click, error, purchase, signup, view",
        EVENTS_SCHEMA,
    )


@query(
    "sumoql_outlier_series",
    oracle="""
    WITH base AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS _timeslice,
               count(*) AS _count
        FROM events WHERE event_type = 'click' GROUP BY 1
    ), win AS (
        SELECT _timeslice, _count,
               CAST(sum(CAST(_count AS DECIMAL(28,6))) OVER tw AS DOUBLE)
                   AS s,
               CAST(sum(CAST(_count AS DECIMAL(28,6))
                        * CAST(_count AS DECIMAL(28,6))) OVER tw AS DOUBLE)
                   AS sq,
               CAST(count(_count) OVER tw AS DOUBLE) AS n
        FROM base
        WINDOW tw AS (ORDER BY _timeslice
                      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT _timeslice, _count,
           s / n AS _mu,
           CASE WHEN n >= 2 THEN
               sqrt(greatest((sq - s * s / n) / (n - 1), 0))
           END AS _sigma,
           CASE WHEN n >= 2
                     AND abs(_count - s / n) >
                         1.0 * sqrt(greatest((sq - s*s/n) / (n-1), 0))
                THEN 1 ELSE 0
           END AS _violation
    FROM win
    """,
)
def sumoql_outlier_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``outlier _count window=7 threshold=1`` via the compiler — the
    trailing baseline ends at 1 PRECEDING so a spike never suppresses its
    own detection."""
    ev = table(spark, sf_dir, "events")
    out = compile_query(
        ev,
        "_sourceCategory=click | timeslice 1d | count by _timeslice"
        " | outlier _count window=7 threshold=1",
        EVENTS_SCHEMA,
    )
    return out


@query(
    "sumoql_predict_linear",
    oracle="""
    WITH base AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS _timeslice,
               count(*) AS _count
        FROM events WHERE event_type = 'view' GROUP BY 1
    ), fit AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(epoch(_timeslice) AS DECIMAL(28,6)))
                    AS DOUBLE) AS sx,
               CAST(sum(CAST(_count AS DECIMAL(28,6))) AS DOUBLE) AS sy,
               CAST(sum(CAST(CAST(epoch(_timeslice) AS DECIMAL(28,6))
                             * CAST(_count AS DECIMAL(28,6))
                             AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
               CAST(sum(CAST(CAST(epoch(_timeslice) AS DECIMAL(28,6))
                             * CAST(epoch(_timeslice) AS DECIMAL(28,6))
                             AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
               CAST(max(epoch(_timeslice)) AS BIGINT) AS xmax,
               (max(epoch(_timeslice)) - min(epoch(_timeslice)))
                   / greatest(count(*) - 1, 1) AS step
        FROM base
    ), params AS (
        SELECT xmax, step,
               CASE WHEN n * sxx - sx * sx != 0
                    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                    ELSE 0.0 END AS slope,
               n, sy, sx
        FROM fit
    ), params2 AS (
        SELECT xmax, step, slope, (sy - slope * sx) / n AS icept
        FROM params
    )
    SELECT b._timeslice AS _timeslice, b._count AS _count,
           icept + slope * CAST(epoch(b._timeslice) AS DOUBLE)
               AS _predicted
    FROM base b CROSS JOIN params2
    UNION ALL
    SELECT CAST(to_timestamp(CAST(floor(
               xmax + i * greatest(step, 1.0)) AS BIGINT)) AS TIMESTAMP),
           CAST(NULL AS BIGINT),
           icept + slope * floor(xmax + i * greatest(step, 1.0))
    FROM params2 CROSS JOIN unnest(generate_series(1, 5)) AS t(i)
    """,
)
def sumoql_predict_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``predict _count, 5`` — OLS linear fit over the daily series plus
    a 5-slice forecast; slope/intercept from exact decimal sufficient
    stats (one tiny agg + a broadcast back, no iteration)."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        "_sourceCategory=view | timeslice 1d | count by _timeslice"
        " | predict _count, 5",
        EVENTS_SCHEMA,
    )


@query(
    "cidr_prefix_aggregation",
    oracle="""
    WITH flows AS (
        SELECT '10.' || (user_id % 64) || '.' || ((event_id // 256) % 256)
                   || '.' || (event_id % 256) AS src,
               '10.' || (user_id % 2) * 32 || '.0.' || (user_id % 200)
                   AS dst
        FROM events
    ), nums AS (
        SELECT src, dst,
               CAST(split_part(src, '.', 1) AS BIGINT) * 16777216
               + CAST(split_part(src, '.', 2) AS BIGINT) * 65536
               + CAST(split_part(src, '.', 3) AS BIGINT) * 256
               + CAST(split_part(src, '.', 4) AS BIGINT) AS src_num,
               CAST(split_part(dst, '.', 1) AS BIGINT) * 16777216
               + CAST(split_part(dst, '.', 2) AS BIGINT) * 65536
               + CAST(split_part(dst, '.', 3) AS BIGINT) * 256
               + CAST(split_part(dst, '.', 4) AS BIGINT) AS dst_num
        FROM flows
    )
    SELECT
        (CAST(src_num & 4294901760 AS BIGINT) // 16777216) || '.'
            || ((CAST(src_num & 4294901760 AS BIGINT) // 65536) % 256)
            || '.0.0/16' AS src_net,
        '255.255.0.0' AS netmask,
        count(*) AS flows,
        count(*) FILTER (
            WHERE (src_num & 4227858432) = (dst_num & 4227858432)
        ) AS same_slash6
    FROM nums
    GROUP BY 1, 2
    """,
)
def cidr_prefix_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CIDR scalar family (ipv4ToNumber / getCIDRPrefix / maskFromCIDR /
    compareCIDRPrefix) — flows grouped by /16 network with a same-/6
    co-network count.  All pure Column bit math inside codegen; the
    reference's equivalent is the string-prefix CIDR discard in
    ``vpcutils.js:31-48``."""
    ev = table(spark, sf_dir, "events")
    flows = ev.select(
        F.concat_ws(
            ".",
            F.lit("10"),
            (F.col("user_id") % 64).cast("string"),
            ((F.col("event_id") / F.lit(256)).cast("bigint") % 256)
            .cast("string"),
            (F.col("event_id") % 256).cast("string"),
        ).alias("src"),
        F.concat_ws(
            ".",
            F.lit("10"),
            ((F.col("user_id") % 2) * 32).cast("string"),
            F.lit("0"),
            (F.col("user_id") % 200).cast("string"),
        ).alias("dst"),
    )
    return (
        flows.groupBy(
            get_cidr_prefix("src", 16).alias("src_net"),
            mask_from_cidr(16).alias("netmask"),
        )
        .agg(
            F.count(F.lit(1)).alias("flows"),
            F.sum(
                F.when(compare_cidr_prefix("src", "dst", 6), 1).otherwise(0)
            ).alias("same_slash6"),
        )
    )


@query(
    "logreduce_signatures",
    oracle="""
    WITH lines AS (
        SELECT event_type || ' user=' || user_id
               || ' latency=' || CAST(floor(value) AS BIGINT)
               || 'ms req-' || event_id AS message,
               event_id
        FROM events
    ), sigs AS (
        SELECT regexp_replace(message, '[0-9]+', '<num>', 'g')
                   AS _signature,
               message, event_id
        FROM lines
    ), per AS (
        SELECT _signature, count(*) AS _count, min(event_id) AS eid
        FROM sigs GROUP BY 1
    )
    SELECT p._signature AS _signature, p._count AS _count,
           s.message AS _example
    FROM per p JOIN sigs s ON s.event_id = p.eid
    """,
)
def logreduce_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogReduce-style template clustering: mask the variable tokens
    (number runs) out of each raw line, then group by the residual
    signature — count + a deterministic exemplar per cluster.

    The exemplar is fetched in two steps on purpose: aggregating
    ``min(message)`` (or ``min_by``) directly would put a variable-width
    string in the aggregation buffer, which demotes the whole pass to
    SortAggregate — a sort on BOTH sides of the shuffle.  Aggregating
    the fixed-width key ``min(event_id)`` keeps HashAggregate, and the
    per-signature result (tiny) broadcast-joins back to fetch the text.
    Plan-asserted in tests/test_plan_shapes.py."""
    ev = table(spark, sf_dir, "events")
    lines = ev.select(
        F.concat(
            F.col("event_type"), F.lit(" user="), F.col("user_id"),
            F.lit(" latency="),
            F.floor(F.col("value")).cast("bigint"),
            F.lit("ms req-"), F.col("event_id"),
        ).alias("message"),
        "event_id",
    )
    sigs = lines.select(
        F.regexp_replace("message", "[0-9]+", "<num>").alias("_signature"),
        "message", "event_id",
    )
    per = sigs.groupBy("_signature").agg(
        F.count(F.lit(1)).alias("_count"),
        F.min("event_id").alias("eid"),
    )
    return (
        sigs.select("event_id", "message")
        .join(F.broadcast(per), F.col("event_id") == F.col("eid"))
        .select(
            "_signature", "_count", F.col("message").alias("_example")
        )
    )


@query(
    "logcompare_baseline_target",
    oracle="""
    WITH lines AS (
        SELECT event_type || ' user=' || (user_id % 5)
                   || ' req-' || event_id AS message,
               CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END
                   AS half
        FROM events
    ), sigs AS (
        SELECT regexp_replace(message, '[0-9]+', '<num>', 'g')
                   AS _signature,
               half
        FROM lines
    ), per AS (
        SELECT _signature,
               count(*) FILTER (WHERE half = 0) AS baseline_count,
               count(*) FILTER (WHERE half = 1) AS target_count
        FROM sigs GROUP BY 1
    ), tot AS (
        SELECT sum(baseline_count) AS bt, sum(target_count) AS tt FROM per
    )
    SELECT _signature, baseline_count, target_count,
           CAST(target_count AS DOUBLE) / tt
               - CAST(baseline_count AS DOUBLE) / bt AS share_delta
    FROM per CROSS JOIN tot
    """,
)
def logcompare_baseline_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogCompare: the signature distribution of a target time range
    against a baseline range — per-template counts plus the shift in
    relative share.  One grouped pass with conditional aggregation (no
    second scan of the fact table); the totals come from a broadcast of
    the tiny per-signature frame."""
    ev = table(spark, sf_dir, "events")
    lines = ev.select(
        F.concat(
            F.col("event_type"), F.lit(" user="), F.col("user_id") % 5,
            F.lit(" req-"), F.col("event_id"),
        ).alias("message"),
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 0)
        .otherwise(1)
        .alias("half"),
    )
    per = (
        lines.select(
            F.regexp_replace("message", "[0-9]+", "<num>")
            .alias("_signature"),
            "half",
        )
        .groupBy("_signature")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
            .alias("baseline_count"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
            .alias("target_count"),
        )
    )
    tot = per.agg(
        F.sum("baseline_count").alias("bt"),
        F.sum("target_count").alias("tt"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "_signature", "baseline_count", "target_count",
        (
            F.col("target_count").cast("double") / F.col("tt")
            - F.col("baseline_count").cast("double") / F.col("bt")
        ).alias("share_delta"),
    )


@query(
    "resample_interpolate",
    oracle="""
    WITH slots AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS slot,
               round(avg(value), 6) AS v
        FROM events
        GROUP BY event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT)
    ),
    bounds AS (
        SELECT event_type, min(slot) AS lo, max(slot) AS hi
        FROM slots GROUP BY event_type
    ),
    grid AS (
        SELECT b.event_type, g.slot
        FROM bounds b, LATERAL (
            SELECT unnest(generate_series(b.lo, b.hi)) AS slot
        ) g
    ),
    joined AS (
        SELECT g.event_type, g.slot, s.v,
               last_value(s.v IGNORE NULLS) OVER w_prev  AS pv,
               last_value(CASE WHEN s.v IS NOT NULL THEN g.slot END
                          IGNORE NULLS) OVER w_prev      AS ps,
               first_value(s.v IGNORE NULLS) OVER w_next AS nv,
               first_value(CASE WHEN s.v IS NOT NULL THEN g.slot END
                           IGNORE NULLS) OVER w_next     AS ns
        FROM grid g
        LEFT JOIN slots s ON s.event_type = g.event_type
                         AND s.slot = g.slot
        WINDOW
            w_prev AS (PARTITION BY g.event_type ORDER BY g.slot
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            w_next AS (PARTITION BY g.event_type ORDER BY g.slot
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type,
           slot * 3600 AS slot_epoch,
           CASE WHEN v IS NOT NULL THEN round(v + 1e-9, 4)
                WHEN pv IS NULL THEN round(nv + 1e-9, 4)
                WHEN nv IS NULL THEN round(pv + 1e-9, 4)
                ELSE round(pv + (nv - pv) * (slot - ps) / (ns - ps)
                           + 1e-9, 4)
           END AS value,
           CAST(v IS NULL AS BOOLEAN) AS interpolated
    FROM joined
    """,
)
def resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled resampling with linear interpolation (the metrics-
    engine primitive behind dashboard line charts — Sumo's
    ``fillmissing`` verb only zero/null-fills; this is the
    interpolation mode a metrics store applies between sparse points).

    Per event type: hourly averages → a dense slot grid (``sequence``
    per series, exploded — the grid is series-count × slots, never a
    cross join) → previous/next present points located with ONE pair of
    ``last/first(ignorenulls=True)`` windows over the series partition
    → linear value between them (edges carry the nearest present
    point).  Slot averages are rounded BEFORE interpolating, so the
    arithmetic is identical float-for-float across engines; the window
    partitions on the series key — no global window, and the per-series
    slot count is bounded by the retention span, so a 100 TB fleet
    still windows only days×24 rows per series.
    """
    ev = table(spark, sf_dir, "events")
    slots = (
        ev.groupBy(
            "event_type",
            F.floor(F.col("ts").cast("double") / 3600)
            .cast("bigint").alias("slot"),
        )
        .agg(F.round(F.avg("value"), 6).alias("v"))
    )
    grid = (
        slots.groupBy("event_type")
        .agg(F.min("slot").alias("lo"), F.max("slot").alias("hi"))
        .select("event_type",
                F.explode(F.sequence("lo", "hi")).alias("slot"))
    )
    j = grid.join(slots, ["event_type", "slot"], "left_outer")
    w_prev = (
        Window.partitionBy("event_type").orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type").orderBy("slot")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    present_slot = F.when(F.col("v").isNotNull(), F.col("slot"))
    j = j.select(
        "event_type", "slot", "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(present_slot, ignorenulls=True).over(w_prev).alias("ps"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(present_slot, ignorenulls=True).over(w_next).alias("ns"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) \
        * (F.col("slot") - F.col("ps")) / (F.col("ns") - F.col("ps"))
    # +1e-9 on BOTH engines before the 4-dp round: interpolation can
    # land exactly on a .00005 tie where sub-ulp evaluation-order noise
    # flips the rounded digit between engines; the shared nudge moves
    # every tie decisively off the boundary (noise ~1e-12 << 1e-9 <<
    # the 1e-4 quantum, and values are non-negative).
    value = (
        F.when(F.col("v").isNotNull(), F.round(F.col("v") + 1e-9, 4))
        .when(F.col("pv").isNull(), F.round(F.col("nv") + 1e-9, 4))
        .when(F.col("nv").isNull(), F.round(F.col("pv") + 1e-9, 4))
        .otherwise(F.round(interp + 1e-9, 4))
    )
    return j.select(
        "event_type",
        (F.col("slot") * 3600).alias("slot_epoch"),
        value.alias("value"),
        F.col("v").isNull().alias("interpolated"),
    )


@query(
    "value_percentile_bands",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.90), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99,
           count(*) AS n
    FROM events
    GROUP BY event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
    """,
)
def value_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p50/p90/p99 bands per series — the latency-chart staple.

    One grouped aggregate computes all three EXACT percentiles (Spark
    evaluates ``percentile(value, array(...))`` in a single pass per
    group — one shuffle, no window, no per-quantile re-scan); exact
    ``percentile`` matches DuckDB ``quantile_cont`` at round(6) (the
    grouped-median precedent).  At 100 TB swap to
    ``approx_percentile`` with the same call shape when groups grow
    beyond memory — the exact form holds while day×type groups are
    executor-sized.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
        )
        .agg(
            F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("_p"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type", "day",
            F.round(F.col("_p")[0], 6).alias("p50"),
            F.round(F.col("_p")[1], 6).alias("p90"),
            F.round(F.col("_p")[2], 6).alias("p99"),
            "n",
        )
    )


@query(
    "daily_autocorrelation",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY event_type, day
    ),
    lags AS (SELECT unnest([1, 2, 3]) AS lag)
    SELECT a.event_type, l.lag,
           round(corr(a.cnt, b.cnt), 4) AS acf,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM daily a
    CROSS JOIN lags l
    JOIN daily b ON b.event_type = a.event_type
                AND b.day = a.day + l.lag
    GROUP BY a.event_type, l.lag
    """,
)
def daily_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily event volume at lags 1-3 per series.

    The seasonality diagnostic behind Sumo's timeslice dashboards: the
    fact stream collapses to (type, day) counts in ONE partial-agg
    shuffle; the lagged pairing is a self-join of that collapsed frame
    on its own grouping key (types x days rows — dashboard-sized, so
    the join is broadcast-able and never touches facts again).  ACF at
    lag k is Pearson corr over the (x_t, x_{t+k}) pairs; missing days
    drop out of the join identically on both engines.  ``corr`` of
    exact integer counts rounds at 4 dp (regr_* precedent, rule 13).
    """
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.floor(F.col("ts").cast("double") / 86400)
            .cast("long").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lags = spark.range(1, 4).select(F.col("id").alias("lag"))
    a = daily.select(
        "event_type", F.col("day").alias("day_a"),
        F.col("cnt").alias("cnt_a"))
    b = daily.select(
        F.col("event_type").alias("et_b"), F.col("day").alias("day_b"),
        F.col("cnt").alias("cnt_b"))
    return (
        a.crossJoin(F.broadcast(lags))
        .join(b, (F.col("event_type") == F.col("et_b"))
              & (F.col("day_b") == F.col("day_a") + F.col("lag")))
        .drop("et_b")
        .groupBy("event_type", "lag")
        .agg(
            F.round(F.corr("cnt_a", "cnt_b"), 4).alias("acf"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )


@query(
    "cusum_changepoints",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY event_type, day
    ),
    mean_r AS (
        SELECT event_type, round(avg(cnt), 4) AS mu,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY event_type
    ),
    cusum AS (
        SELECT d.event_type, d.day, m.n_days,
               sum(d.cnt - m.mu) OVER (
                   PARTITION BY d.event_type ORDER BY d.day
               ) AS s
        FROM daily d JOIN mean_r m USING (event_type)
    ),
    ranked AS (
        SELECT event_type, day, n_days, round(s, 4) AS s_r,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY round(abs(s), 4) DESC, day
               ) AS rn
        FROM cusum
    )
    SELECT event_type, day AS cp_day, s_r AS peak_cusum, n_days
    FROM ranked WHERE rn = 1
    """,
)
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint per event series: the day where the cumulative
    deviation from the series mean peaks (Page 1954's classic shift
    detector, the batch twin of the streaming EWMA drift alarm in
    ``streaming/monitor.py``).

    Facts collapse to (type, day) counts in one shuffle; the mean is a
    second aggregate over the collapsed frame joined back (broadcast,
    one row per type), and the cumulative window runs per-type over
    ~days rows.  Both engines accumulate the ordered window sum
    left-to-right over identical operands, so the peak is compared on
    the 4 dp-rounded magnitude with the day as tiebreak (rules 2/16).
    """
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.floor(F.col("ts").cast("double") / 86400)
            .cast("long").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    mean_r = daily.groupBy("event_type").agg(
        F.round(F.avg("cnt"), 4).alias("mu"),
        F.count(F.lit(1)).alias("n_days"),
    )
    cw = Window.partitionBy("event_type").orderBy("day")
    cusum = (
        daily.join(F.broadcast(mean_r), "event_type")
        .withColumn("s", F.sum(F.col("cnt") - F.col("mu")).over(cw))
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.round(F.abs("s"), 4).desc(), "day")
    return (
        cusum.withColumn("rn", F.row_number().over(rk))
        .filter(F.col("rn") == 1)
        .select(
            "event_type", F.col("day").alias("cp_day"),
            F.round("s", 4).alias("peak_cusum"), "n_days",
        )
    )


@query(
    "holt_linear_forecast",
    oracle="""
    WITH RECURSIVE series AS (
        SELECT event_type,
               CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT)
                   AS day,
               CAST(count(*) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2
    ),
    numbered AS (
        SELECT event_type, y,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY day) AS rn
        FROM series
    ),
    holt AS (
        SELECT event_type, rn, y AS level,
               CAST(0.0 AS DOUBLE) AS trend
        FROM numbered WHERE rn = 1
        UNION ALL
        SELECT d.event_type, d.rn,
               0.5 * d.y + 0.5 * (h.level + h.trend),
               0.3 * ((0.5 * d.y + 0.5 * (h.level + h.trend)) - h.level)
                   + 0.7 * h.trend
        FROM holt h
        JOIN numbered d ON d.event_type = h.event_type
                       AND d.rn = h.rn + 1
    )
    SELECT event_type,
           CAST(max(rn) AS BIGINT) AS n_days,
           round(arg_max(level, rn), 4) AS level,
           round(arg_max(trend, rn), 4) AS trend,
           round(arg_max(level, rn) + 3 * arg_max(trend, rn), 4)
               AS forecast_3d
    FROM holt GROUP BY event_type
    """,
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + trend, alpha = 0.5,
    beta = 0.3) over per-type daily volumes, emitting the fitted state
    and the 3-day-ahead linear forecast — the capacity-planning verb
    one step past ``ewma_drift_alerts``'s single smoothing (Holt 1957,
    public).

    The recurrence is inherently sequential PER SERIES, so it runs as
    a fold over each series' ordered daily array: one corpus groupBy
    collapses facts to (type x day) counts, ``sort_array(collect_list
    (struct(day, y)))`` makes the per-type array order-deterministic
    under any partitioning, and ``F.aggregate`` folds (level, trend)
    through it with EXACTLY the oracle's expression shape — identical
    IEEE op order, so round(4) compares exactly (rule 12; the DuckDB
    twin unrolls via a recursive CTE).  Series arrays are
    days-per-type sized (bounded model state, the EWMA discipline);
    the corpus is touched once.
    """
    ev = table(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("day"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    arr = F.sort_array(F.collect_list(F.struct("day", "y")))
    per_type = series.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"), arr.alias("pts"))
    ys = F.expr("transform(pts, p -> p.y)")
    init = F.struct(
        F.try_element_at(ys, F.lit(1)).alias("level"),
        F.lit(0.0).alias("trend"))
    fold = F.aggregate(
        F.slice(ys, 2, F.greatest(F.size(ys) - 1, F.lit(0))),
        init,
        lambda acc, y: F.struct(
            (0.5 * y + 0.5 * (acc["level"] + acc["trend"]))
            .alias("level"),
            (0.3 * ((0.5 * y + 0.5 * (acc["level"] + acc["trend"]))
                    - acc["level"]) + 0.7 * acc["trend"]).alias("trend"),
        ),
    )
    return per_type.select(
        "event_type", "n_days",
        F.round(fold["level"], 4).alias("level"),
        F.round(fold["trend"], 4).alias("trend"),
        F.round(fold["level"] + 3 * fold["trend"], 4).alias("forecast_3d"),
    )
