"""Behavioral analytics over the events stream: funnel conversion,
retention cohorts, Markov transitions, PageRank, chi-square association,
and a TeraSort-style range-partition plan.

These are the dashboard/report queries a Sumo user runs over app events
(the App catalog ships funnel / "count by fromState, toState" panels);
here each is expressed as a Catalyst plan with an explicit 100 TB story:

* funnel / retention — every join is user-keyed, so all stages
  co-partition on one shuffle key; no window ever sees more than one
  user's rows.
* transitions / pagerank — the aggregate-then-iterate regime: raw events
  collapse to a node-count² edge list in one pass, then iteration is
  broadcast-only (see ``operators/graph.py``).
* chi² — two tiny marginal aggregates broadcast onto a 35-cell
  contingency table; the raw data is scanned once.
* range-partition plan — exact percentile boundaries (sampled at scale,
  exact here so the oracle can verify) drive ``repartitionByRange``-style
  bucketing; the plan proves buckets are contiguous and balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.behavior import (
    RANGE_FRACS,
    funnel_stage_times,
    path_ngram_counts,
    range_bucket_stats,
)
from ..operators.graph import pagerank, transition_edges, \
    transition_probabilities
from . import query


@query(
    "event_funnel_conversion",
    oracle="""
    WITH s AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s ON s.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > s.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    )
    SELECT s.user_id,
           CAST(floor(epoch(s.t1)) AS BIGINT) AS signup_s,
           coalesce(CAST(floor(epoch(c.t2)) AS BIGINT), -1) AS click_s,
           coalesce(CAST(floor(epoch(p.t3)) AS BIGINT), -1) AS purchase_s
    FROM s
    LEFT JOIN c ON c.user_id = s.user_id
    LEFT JOIN p ON p.user_id = s.user_id
    """,
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → click → purchase, strict event-time order.

    Each stage keeps only events strictly after the user's previous-stage
    completion, the standard ordered-funnel semantics.  Every join and
    groupBy keys on ``user_id`` — one co-partitioned shuffle key end to
    end, so at 100 TB this is three map-side-combinable aggregations over
    the same partitioning, no windows, no skew beyond per-user volume.
    Non-converting stages surface as -1 (not NULL) so downstream sorts
    are engine-agnostic.
    """
    ev = table(spark, sf_dir, "events")
    return funnel_stage_times(ev).select(
        "user_id",
        F.unix_timestamp("t1").alias("signup_s"),
        F.coalesce(F.unix_timestamp("t2"), F.lit(-1)).alias("click_s"),
        F.coalesce(F.unix_timestamp("t3"), F.lit(-1)).alias("purchase_s"),
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT e.user_id, f.cohort,
               date_trunc('week', e.ts) AS wk
        FROM events e JOIN first_seen f ON f.user_id = e.user_id
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
           CAST((floor(epoch(wk)) - floor(epoch(cohort))) / 604800
                AS BIGINT) AS offset_weeks,
           CAST(count(*) AS BIGINT) AS n_users
    FROM active
    GROUP BY cohort, wk
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: cohort = first-seen week, one row per
    (cohort, week-offset) with the distinct-user count still active.

    Two aggregations, both keyed on ``user_id`` / (cohort, week) — the
    first-seen frame is users-sized (small relative to events), and the
    join back is on the same user key the first groupBy shuffled on, so
    AQE coalesces it onto one exchange.  The distinct is absorbed into
    the groupBy (count of pre-distinct rows), never a global distinct
    over raw events.
    """
    ev = table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    active = (
        ev.join(first_seen, "user_id")
        .select("user_id", "cohort", F.date_trunc("week", "ts").alias("wk"))
        .distinct()
    )
    return active.groupBy("cohort", "wk").agg(
        F.count(F.lit(1)).alias("n_users")
    ).select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
        (
            (F.unix_timestamp("wk") - F.unix_timestamp("cohort")) / 604800
        ).cast("long").alias("offset_weeks"),
        "n_users",
    )


_SEQ_EDGES_SQL = """
    seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS src
        FROM events
    ),
    e AS (
        SELECT src, event_type AS dst, count(*) AS n
        FROM seq WHERE src IS NOT NULL GROUP BY src, event_type
    ),
    t AS (SELECT src, sum(n) AS tot FROM e GROUP BY src)
"""


@query(
    "event_markov_transitions",
    oracle="WITH " + _SEQ_EDGES_SQL + """
    SELECT e.src, e.dst, CAST(e.n AS BIGINT) AS n_transitions,
           round(e.n / t.tot, 6) AS p
    FROM e JOIN t ON t.src = e.src
    """,
)
def event_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-stochastic event-type transition matrix (the "count by
    fromState, toState" dashboard verb, generalized).

    One window lag on (user, ts, event_id), one groupBy — then the
    normalizer joins against the *collapsed* edges, never raw events.
    """
    ev = table(spark, sf_dir, "events")
    probs = transition_probabilities(transition_edges(ev))
    return probs.select(
        "src", "dst", "n_transitions", F.round("p", 6).alias("p")
    )


@query(
    "event_pagerank",
    oracle="WITH " + _SEQ_EDGES_SQL + """,
    pr AS (
        SELECT e.src, e.dst, e.n / t.tot AS p
        FROM e JOIN t ON t.src = e.src
    ),
    nodes AS (
        SELECT src AS node FROM e UNION SELECT dst FROM e
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    outn AS (SELECT DISTINCT src AS node FROM pr),
    r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn),
    d0 AS (
        SELECT coalesce(sum(rank), 0.0) AS m FROM r0
        WHERE node NOT IN (SELECT node FROM outn)
    ),
    i0 AS (
        SELECT pr.dst AS node, sum(r0.rank * pr.p) AS mass
        FROM pr JOIN r0 ON r0.node = pr.src GROUP BY pr.dst
    ),
    r1 AS (
        SELECT nodes.node,
               0.15 / nn.n + 0.85 * (coalesce(i0.mass, 0.0) + d0.m / nn.n)
                   AS rank
        FROM nodes CROSS JOIN nn CROSS JOIN d0
        LEFT JOIN i0 ON i0.node = nodes.node
    ),
    d1 AS (
        SELECT coalesce(sum(rank), 0.0) AS m FROM r1
        WHERE node NOT IN (SELECT node FROM outn)
    ),
    i1 AS (
        SELECT pr.dst AS node, sum(r1.rank * pr.p) AS mass
        FROM pr JOIN r1 ON r1.node = pr.src GROUP BY pr.dst
    ),
    r2 AS (
        SELECT nodes.node,
               0.15 / nn.n + 0.85 * (coalesce(i1.mass, 0.0) + d1.m / nn.n)
                   AS rank
        FROM nodes CROSS JOIN nn CROSS JOIN d1
        LEFT JOIN i1 ON i1.node = nodes.node
    ),
    d2 AS (
        SELECT coalesce(sum(rank), 0.0) AS m FROM r2
        WHERE node NOT IN (SELECT node FROM outn)
    ),
    i2 AS (
        SELECT pr.dst AS node, sum(r2.rank * pr.p) AS mass
        FROM pr JOIN r2 ON r2.node = pr.src GROUP BY pr.dst
    ),
    r3 AS (
        SELECT nodes.node,
               0.15 / nn.n + 0.85 * (coalesce(i2.mass, 0.0) + d2.m / nn.n)
                   AS rank
        FROM nodes CROSS JOIN nn CROSS JOIN d2
        LEFT JOIN i2 ON i2.node = nodes.node
    )
    SELECT node, round(rank, 6) AS rank FROM r3
    """,
)
def event_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph, 3 power iterations,
    d = 0.85, dangling mass redistributed uniformly.

    The aggregate-then-iterate regime (``operators/graph.py``): 100 TB of
    events collapse to a node-count² edge frame in one pass; iteration is
    broadcast joins over kilobytes.  The oracle unrolls the same three
    iterations as CTEs.
    """
    ev = table(spark, sf_dir, "events")
    ranks = pagerank(transition_edges(ev), iterations=3, damping=0.85)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


@query(
    "chi2_event_weekday",
    oracle="""
    WITH obs AS (
        SELECT event_type, isodow(ts) - 1 AS dow, count(*) AS o
        FROM events GROUP BY event_type, isodow(ts) - 1
    ),
    rt AS (SELECT event_type, sum(o) AS row_total FROM obs
           GROUP BY event_type),
    ct AS (SELECT dow, sum(o) AS col_total FROM obs GROUP BY dow),
    g AS (SELECT sum(o) AS grand FROM obs)
    SELECT obs.event_type, CAST(obs.dow AS INTEGER) AS dow,
           CAST(obs.o AS BIGINT) AS observed,
           round(rt.row_total * ct.col_total / CAST(g.grand AS DOUBLE), 4)
               AS expected,
           round(pow(obs.o - rt.row_total * ct.col_total
                               / CAST(g.grand AS DOUBLE), 2)
                 / (rt.row_total * ct.col_total / CAST(g.grand AS DOUBLE)),
                 4) AS chi2_cell
    FROM obs
    JOIN rt ON rt.event_type = obs.event_type
    JOIN ct ON ct.dow = obs.dow
    CROSS JOIN g
    """,
)
def chi2_event_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square association between event type and ISO weekday: the
    35-cell contingency table with expected counts and per-cell χ²
    contributions.

    Raw events are scanned once into the contingency counts; marginals
    and the grand total are re-aggregations of the 35-row table,
    broadcast back on — integer counts until the single final division,
    so the statistic is engine-exact before the round.
    """
    ev = table(spark, sf_dir, "events")
    obs = (
        ev.select("event_type", F.weekday("ts").alias("dow"))
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("row_total"))
    ct = obs.groupBy("dow").agg(F.sum("o").alias("col_total"))
    g = obs.agg(F.sum("o").alias("grand"))
    # Cast before multiplying: long*long marginal products overflow at
    # ~3e9 rows per marginal (ANSI throws, legacy wraps); double*long
    # stays exact to 2^53 and degrades gracefully past it.
    expected = (
        F.col("row_total").cast("double") * F.col("col_total")
        / F.col("grand").cast("double")
    )
    return (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(g))
        .select(
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            F.col("o").alias("observed"),
            F.round(expected, 4).alias("expected"),
            F.round(
                F.pow(F.col("o") - expected, 2) / expected, 4
            ).alias("chi2_cell"),
        )
    )


_FRACS = RANGE_FRACS


@query(
    "range_partition_plan",
    oracle="""
    WITH b AS (
        SELECT ["""
    + ", ".join(f"round(quantile_cont(value, {f}), 6)" for f in _FRACS)
    + """] AS bs
        FROM events
    ),
    assigned AS (
        SELECT e.value,
               CAST(len(list_filter(b.bs, x -> e.value >= x)) AS BIGINT)
                   AS bucket
        FROM events e CROSS JOIN b
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
           round(min(value), 6) AS lo, round(max(value), 6) AS hi
    FROM assigned GROUP BY bucket
    """,
)
def range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TeraSort-style range partitioning: exact septile boundaries over
    ``events.value`` assign each row to one of 8 contiguous buckets; the
    output proves the ranges are disjoint and balanced (count, lo, hi per
    bucket).

    At 100 TB the boundaries come from a driver-side sample (Spark's
    ``repartitionByRange`` sampler); here they are exact percentiles so
    DuckDB can verify bucket membership bit-for-bit.  The boundary array
    is a 1-row broadcast; assignment is a narrow projection (no shuffle),
    and the audit groupBy is 8 keys with map-side combine.
    """
    ev = table(spark, sf_dir, "events")
    return range_bucket_stats(ev, "value", round_digits=6).select(
        "bucket", "n_rows",
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
    )


@query(
    "event_path_trigrams",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type, 1) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS p1,
               lag(event_type, 2) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS p2
        FROM events
    )
    SELECT p2 || '>' || p1 || '>' || event_type AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE p2 IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT 20
    """,
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step event paths (path mining over per-user
    sequences) — the n-gram generalization of the transition matrix.

    Same single (user, ts, event_id) window shuffle as the transitions
    query — two lags share one sort — then a groupBy over at most
    |types|³ path keys and a TakeOrdered top-k.  Count ties at the
    cutoff are broken on the path string so the result is stable across
    engines.
    """
    ev = table(spark, sf_dir, "events")
    return (
        path_ngram_counts(ev, n=3)
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


@query(
    "trend_slopes_by_type",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(regr_slope(value, epoch(ts) / 86400.0), 6) AS slope_per_day,
           round(regr_intercept(value, epoch(ts) / 86400.0), 4)
               AS intercept,
           round(regr_r2(value, epoch(ts) / 86400.0), 6) AS r2
    FROM events
    GROUP BY event_type
    """,
)
def trend_slopes_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of value over time via the ANSI
    ``regr_*`` aggregate family — closed-form regression from running
    sums (n, Σx, Σy, Σxy, Σx²), so it is a single partial-aggregatable
    groupBy: map-side combine does the heavy math and only five
    accumulators per key cross the wire.  The per-series window-based
    ``predict`` verb (``plans/sumoql_ts.py``) fits one series at a
    time; this is the fleet-wide form that fits millions of keys in one
    shuffle.
    """
    ev = table(spark, sf_dir, "events")
    # Timestamp→double keeps the sub-second fraction, matching DuckDB's
    # epoch(ts) exactly (unix_timestamp would truncate to seconds).
    x = F.col("ts").cast("double") / F.lit(86400.0)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.regr_slope(F.col("value"), x), 6).alias("slope_per_day"),
        F.round(F.regr_intercept(F.col("value"), x), 4).alias("intercept"),
        F.round(F.regr_r2(F.col("value"), x), 6).alias("r2"),
    )


@query(
    "mad_outlier_counts",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m ON m.event_type = e.event_type
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           round(any_value(d.med), 6) AS med,
           round(any_value(m.mad), 6) AS mad,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN abs(d.value - d.med)
                              > 3 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    GROUP BY d.event_type
    """,
)
def mad_outlier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per event type: median absolute deviation
    with the standard 1.4826 normal-consistency factor and a 3σ-equivalent
    fence — the robust sibling of the stddev-based ``outlier`` verb
    (``plans/sumoql_ts.py``), immune to the outliers it hunts.

    Two grouped exact percentiles (Spark ``percentile``, a proper
    aggregate — no window, no sort of the full data) with the medians
    broadcast back onto the events; at 100 TB the exact median swaps
    for ``approx_percentile`` with the same plan shape.
    """
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    fence = F.lit(3 * 1.4826)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.any_value("med"), 6).alias("med"),
            F.round(F.any_value("mad"), 6).alias("mad"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > fence * F.col("mad"), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
    )


@query(
    "seasonal_residual_outliers",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)
                   AS slice_epoch,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, 2
    ),
    resid AS (
        SELECT d.event_type, d.slice_epoch, d.n,
               d.n - p.n AS r
        FROM daily d JOIN daily p
          ON p.event_type = d.event_type
         AND p.slice_epoch = d.slice_epoch - 604800
    ),
    spread AS (
        SELECT event_type,
               avg(r) AS mu, stddev_samp(r) AS sd
        FROM resid GROUP BY event_type
    )
    SELECT d.event_type, d.slice_epoch, d.n,
           CAST(d.r AS BIGINT) AS residual,
           (round(abs(d.r - s.mu) - 2 * s.sd, 6) > 0) AS is_outlier
    FROM resid d JOIN spread s ON s.event_type = d.event_type
    """,
)
def seasonal_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive anomaly detection: the week-over-week residual of
    the daily count per event type, flagged when it strays more than 2σ
    from that series' residual spread — the differencing step that makes
    the stddev-based ``outlier`` verb (``plans/sumoql_ts.py``) valid on
    weekly-seasonal traffic.

    One corpus groupBy to the (type, day) series; the week-ago join and
    the residual-spread aggregate both run on the series frame (days ×
    types rows), broadcast back — raw events are scanned once.  The
    week-ago datum comes from an equi-join on ``slice_epoch - 604800``
    (a row-offset lag would silently misalign onto a different weekday
    whenever a day is missing from a series), and the 2σ compare is
    rounded identically on both sides so the fence can't flip on
    engine ULP noise.
    """
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / 86400) * 86400)
            .cast("long").alias("slice_epoch"),
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    prior = daily.select(
        "event_type",
        (F.col("slice_epoch") + 604800).alias("slice_epoch"),
        F.col("n").alias("n_prior"),
    )
    resid = daily.join(prior, ["event_type", "slice_epoch"]).withColumn(
        "r", F.col("n") - F.col("n_prior")
    )
    spread = resid.groupBy("event_type").agg(
        F.avg("r").alias("mu"), F.stddev_samp("r").alias("sd")
    )
    return (
        resid.join(F.broadcast(spread), "event_type")
        .select(
            "event_type", "slice_epoch", "n",
            F.col("r").cast("long").alias("residual"),
            (F.round(F.abs(F.col("r") - F.col("mu")) - 2 * F.col("sd"), 6)
             > 0).alias("is_outlier"),
        )
    )


@query(
    "funnel_conversion_rates",
    oracle="""
    WITH s AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s ON s.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > s.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase,
           round((SELECT count(*) FROM c)
                 / CAST((SELECT count(*) FROM s) AS DOUBLE), 6)
               AS click_rate,
           round((SELECT count(*) FROM p)
                 / CAST((SELECT count(*) FROM s) AS DOUBLE), 6)
               AS purchase_rate
    """,
)
def funnel_conversion_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel's dashboard headline: per-stage completion counts and
    conversion rates off the signup base — one row, exact integer
    counts until the two final divisions.

    Same user-key staged plan as ``event_funnel_conversion``; the
    rollup is a single global aggregate over the users-sized stage
    frame (count + two conditional counts), so the 100 TB cost is the
    funnel itself, not the summary.
    """
    ev = table(spark, sf_dir, "events")
    stages = funnel_stage_times(ev)
    return stages.agg(
        F.count(F.lit(1)).alias("n_signup"),
        F.count("t2").alias("n_click"),
        F.count("t3").alias("n_purchase"),
        F.round(F.count("t2") / F.count(F.lit(1)).cast("double"), 6)
        .alias("click_rate"),
        F.round(F.count("t3") / F.count(F.lit(1)).cast("double"), 6)
        .alias("purchase_rate"),
    )


@query(
    "cohort_ltv",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort
        FROM events GROUP BY user_id
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
           CAST((floor(epoch(date_trunc('week', e.ts)))
                 - floor(epoch(f.cohort))) / 604800 AS BIGINT)
               AS offset_weeks,
           CAST(count(DISTINCT CASE WHEN e.event_type = 'purchase'
                                    THEN e.user_id END) AS BIGINT)
               AS n_buyers,
           round(sum(CASE WHEN e.event_type = 'purchase'
                          THEN e.value ELSE 0 END), 4) AS revenue
    FROM events e JOIN first_seen f ON f.user_id = e.user_id
    GROUP BY f.cohort, date_trunc('week', e.ts)
    """,
)
def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The revenue twin of the retention triangle: per (cohort,
    week-offset), distinct purchasing users and summed purchase value —
    cumulative rows give the classic LTV curve per acquisition cohort.

    Same two user-keyed aggregations as ``retention_cohorts``; the
    revenue sum is a conditional aggregate in the same groupBy, so LTV
    costs nothing beyond retention.  Float sums round(4) on both sides
    (the established multi-row double-sum precedent).
    """
    ev = table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    is_purchase = F.col("event_type") == "purchase"
    return (
        ev.join(first_seen, "user_id")
        .groupBy("cohort", F.date_trunc("week", "ts").alias("wk"))
        .agg(
            F.countDistinct(
                F.when(is_purchase, F.col("user_id"))
            ).alias("n_buyers"),
            F.round(
                F.sum(F.when(is_purchase, F.col("value")).otherwise(0.0)), 4
            ).alias("revenue"),
        )
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            ((F.unix_timestamp("wk") - F.unix_timestamp("cohort")) / 604800)
            .cast("long").alias("offset_weeks"),
            "n_buyers",
            "revenue",
        )
    )


@query(
    "triangle_communities",
    oracle="""
    WITH cells AS (
        SELECT DISTINCT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
               user_id
        FROM events
    ),
    sizes AS (
        SELECT event_type, h FROM cells
        GROUP BY event_type, h HAVING count(*) <= 60
    ),
    small AS (
        SELECT c.* FROM cells c JOIN sizes s USING (event_type, h)
    ),
    edges AS (
        SELECT a.user_id AS u, b.user_id AS v
        FROM small a JOIN small b USING (event_type, h)
        WHERE a.user_id < b.user_id
        GROUP BY a.user_id, b.user_id
        HAVING count(*) >= 3
    ),
    deg AS (
        SELECT node, count(*) AS d FROM (
            SELECT u AS node FROM edges
            UNION ALL SELECT v FROM edges
        ) t GROUP BY node
    ),
    oriented AS (
        SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                    THEN e.u ELSE e.v END AS src,
               CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                    THEN e.v ELSE e.u END AS dst
        FROM edges e
        JOIN deg du ON du.node = e.u
        JOIN deg dv ON dv.node = e.v
    ),
    tri AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM oriented e1
        JOIN oriented e2 ON e1.dst = e2.src
        JOIN oriented e3 ON e3.src = e1.src AND e3.dst = e2.dst
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (
        SELECT a AS user_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    ) m
    GROUP BY user_id
    """,
)
def triangle_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user triangle counts over the co-occurrence graph — the
    community-cohesion primitive (clustering coefficient's numerator).

    Edges: users sharing ≥3 (event_type, hour) cells, with hot cells
    df-cut at 60 users so pair fan-out is bounded under skew
    (the cap sits above the p99 cell size at the largest test SF — a
    production deployment picks the cell granularity, e.g. finer time
    slots, so typical cells stay under the cap and only degenerate hot
    cells are dropped).
    Triangles: degree-ordered orientation (operators/graph.py::
    triangle_counts) — wedges only fan out from LOW-rank endpoints, the
    closure check is a pure equi-join, each triangle found exactly once
    via its middle node.  Every join is an equi-join; the oracle
    replays the identical orientation rule.
    """
    from ..operators.graph import cooccurrence_edges, triangle_counts

    ev = table(spark, sf_dir, "events")
    edges = cooccurrence_edges(ev, min_weight=3, max_cell_users=60)
    return triangle_counts(edges)


@query(
    "clustering_coefficients",
    oracle="""
    WITH cells AS (
        SELECT DISTINCT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
               user_id
        FROM events
    ),
    sizes AS (
        SELECT event_type, h FROM cells
        GROUP BY event_type, h HAVING count(*) <= 60
    ),
    small AS (
        SELECT c.* FROM cells c JOIN sizes s USING (event_type, h)
    ),
    edges AS (
        SELECT a.user_id AS u, b.user_id AS v
        FROM small a JOIN small b USING (event_type, h)
        WHERE a.user_id < b.user_id
        GROUP BY a.user_id, b.user_id
        HAVING count(*) >= 3
    ),
    deg AS (
        SELECT node AS user_id, count(*) AS degree FROM (
            SELECT u AS node FROM edges
            UNION ALL SELECT v FROM edges
        ) t GROUP BY node
    ),
    oriented AS (
        SELECT CASE WHEN du.degree < dv.degree
                      OR (du.degree = dv.degree AND e.u < e.v)
                    THEN e.u ELSE e.v END AS src,
               CASE WHEN du.degree < dv.degree
                      OR (du.degree = dv.degree AND e.u < e.v)
                    THEN e.v ELSE e.u END AS dst
        FROM edges e
        JOIN deg du ON du.user_id = e.u
        JOIN deg dv ON dv.user_id = e.v
    ),
    tri AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM oriented e1
        JOIN oriented e2 ON e1.dst = e2.src
        JOIN oriented e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    tcount AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_triangles
        FROM (
            SELECT a AS user_id FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) m
        GROUP BY user_id
    )
    SELECT d.user_id, d.degree,
           COALESCE(t.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN round(2.0 * COALESCE(t.n_triangles, 0)
                           / (d.degree * (d.degree - 1)), 6)
                ELSE 0.0 END AS clustering_coeff
    FROM deg d
    LEFT JOIN tcount t ON t.user_id = d.user_id
    """,
)
def clustering_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per user over the co-occurrence
    graph — how tightly each user's neighborhood closes
    (operators/graph.py::clustering_coefficients; same edge definition
    and orientation as ``triangle_communities``)."""
    from ..operators.graph import (
        clustering_coefficients as _cc,
        cooccurrence_edges,
    )

    ev = table(spark, sf_dir, "events")
    return _cc(cooccurrence_edges(ev, min_weight=3, max_cell_users=60))


def _kcore_oracle(k: int = 3, rounds: int = 8) -> str:
    """Unrolled peel rounds as chained CTEs (the pagerank-oracle
    technique for iterative algorithms: fix the round count ABOVE the
    measured fixpoint depth — ≤4 at every fixture SF — so the unrolled
    chain provably converges; extra rounds are no-ops on a fixpoint).
    Every round CTE is MATERIALIZED: each level references the previous
    one three times, so DuckDB's default inline expansion would blow up
    3^rounds scans of the base table (observed as fd exhaustion)."""
    parts = ["""
    WITH cells AS (
        SELECT DISTINCT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
               user_id
        FROM events
    ),
    sizes AS (
        SELECT event_type, h FROM cells
        GROUP BY event_type, h HAVING count(*) <= 60
    ),
    small AS (
        SELECT c.* FROM cells c JOIN sizes s USING (event_type, h)
    ),
    r0 AS MATERIALIZED (
        SELECT a.user_id AS u, b.user_id AS v
        FROM small a JOIN small b USING (event_type, h)
        WHERE a.user_id < b.user_id
        GROUP BY a.user_id, b.user_id
        HAVING count(*) >= 3
    )"""]
    for i in range(rounds):
        parts.append(f""",
    k{i} AS MATERIALIZED (
        SELECT node FROM (
            SELECT u AS node FROM r{i} UNION ALL SELECT v FROM r{i}
        ) t GROUP BY node HAVING count(*) >= {k}
    ),
    r{i + 1} AS MATERIALIZED (
        SELECT e.u, e.v FROM r{i} e
        JOIN k{i} a ON a.node = e.u
        JOIN k{i} b ON b.node = e.v
    )""")
    parts.append(f"""
    SELECT user_id, CAST(count(*) AS BIGINT) AS core_degree
    FROM (
        SELECT u AS user_id FROM r{rounds}
        UNION ALL SELECT v FROM r{rounds}
    ) m
    GROUP BY user_id
    """)
    return "".join(parts)


@query("k_core_membership", oracle=_kcore_oracle())
def k_core_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the user co-occurrence graph: the maximal subgraph
    where every surviving user keeps ≥3 surviving neighbors — the
    standard cohesion filter separating embedded community members
    from peripheral users (operators/graph.py::k_core, iterative
    peeling with per-round lineage cuts; the oracle unrolls the peel
    to a fixed depth above the measured fixpoint)."""
    from ..operators.graph import cooccurrence_edges, k_core

    ev = table(spark, sf_dir, "events")
    return k_core(cooccurrence_edges(ev, min_weight=3, max_cell_users=60),
                  k=3)


@query(
    "link_prediction_scores",
    oracle="""
    WITH cells AS (
        SELECT DISTINCT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
               user_id
        FROM events
    ),
    sizes AS (
        SELECT event_type, h FROM cells
        GROUP BY event_type, h HAVING count(*) <= 60
    ),
    small AS (
        SELECT c.* FROM cells c JOIN sizes s USING (event_type, h)
    ),
    edges AS (
        SELECT a.user_id AS u, b.user_id AS v
        FROM small a JOIN small b USING (event_type, h)
        WHERE a.user_id < b.user_id
        GROUP BY a.user_id, b.user_id
        HAVING count(*) >= 3
    ),
    sym AS (
        SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
    ),
    deg AS (
        SELECT u AS node, CAST(count(*) AS BIGINT) AS d
        FROM sym GROUP BY u
    ),
    cand AS (
        SELECT a.v AS x, b.v AS y, a.u AS n
        FROM sym a
        JOIN sym b ON a.u = b.u AND a.v < b.v
        JOIN deg dn ON dn.node = a.u AND dn.d <= 30
    ),
    agg AS (
        SELECT c.x, c.y,
               CAST(count(*) AS BIGINT) AS cn,
               round(sum(1.0 / ln(dn.d)), 4) AS adamic_adar
        FROM cand c JOIN deg dn ON dn.node = c.n
        GROUP BY c.x, c.y
        HAVING count(*) >= 2
    )
    SELECT a.x AS u, a.y AS v, a.cn, a.adamic_adar,
           round(CAST(a.cn AS DOUBLE) / (dx.d + dy.d - a.cn), 6)
               AS jaccard
    FROM agg a
    JOIN deg dx ON dx.node = a.x
    JOIN deg dy ON dy.node = a.y
    WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.u = a.x AND e.v = a.y
    )
    """,
)
def link_prediction_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the user co-occurrence graph: common
    neighbors, Adamic-Adar, and Jaccard for non-adjacent pairs
    (Liben-Nowell & Kleinberg 2003's unsupervised baselines).

    Delegates to :func:`operators.graph.link_prediction` with the
    SQL-expressible ``hub_cut=30`` strategy (a hub co-membership
    carries no link signal — Adamic-Adar down-weights it toward zero
    anyway — and the cut bounds wedge fan-out at nodes x cut^2).  On
    DENSE graphs the hub cut can silence the operator entirely (the
    10x densified probe graph honestly returned 0 pairs); the operator
    exposes ``neighbor_cap`` — per-neighbor top-k wedge sampling that
    keeps every neighbor contributing — as the dense-graph knob
    (density test in ``tests/test_behavior.py``).  No broadcast hints:
    degree frames scale with the node count (round-5 hint policy).
    """
    from ..operators.graph import cooccurrence_edges, link_prediction

    ev = table(spark, sf_dir, "events")
    edges = cooccurrence_edges(
        ev, min_weight=3, max_cell_users=60).select("u", "v")
    # Explicit hub_cut strategy (neighbor_cap=None): the DuckDB oracle
    # is the SQL-expressible hub-exclusion form; the operator's DEFAULT
    # is the dense-safe neighbor_cap (round-9 flip).
    return link_prediction(edges, hub_cut=30, neighbor_cap=None,
                           min_common=2)


@query(
    "degree_assortativity",
    oracle="""
    WITH cells AS (
        SELECT DISTINCT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
               user_id
        FROM events
    ),
    sizes AS (
        SELECT event_type, h FROM cells
        GROUP BY event_type, h HAVING count(*) <= 60
    ),
    small AS (
        SELECT c.* FROM cells c JOIN sizes s USING (event_type, h)
    ),
    edges AS (
        SELECT a.user_id AS u, b.user_id AS v
        FROM small a JOIN small b USING (event_type, h)
        WHERE a.user_id < b.user_id
        GROUP BY a.user_id, b.user_id
        HAVING count(*) >= 3
    ),
    sym AS (
        SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
    ),
    deg AS (
        SELECT u AS node, CAST(count(*) AS BIGINT) AS d
        FROM sym GROUP BY u
    )
    SELECT CAST(count(*) / 2 AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           round((SELECT avg(d) FROM deg), 4) AS avg_degree,
           round(corr(du.d, dv.d), 4) AS assortativity
    FROM sym s
    JOIN deg du ON du.node = s.u
    JOIN deg dv ON dv.node = s.v
    """,
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-occurrence graph (Newman 2002):
    Pearson correlation of endpoint degrees over directed edge stubs —
    do high-degree users co-occur with other high-degree users?

    The graph summary statistic that decides the skew strategy for
    every downstream graph pass (assortative graphs concentrate load
    on hub-hub edges).  Degrees are one aggregate over the collapsed
    edge list, broadcast back onto the stubs (node-count-sized), and
    the correlation is a single partial-aggregatable pass — nothing
    here ever rescans events.  ``corr`` over exact integer degrees
    rounds at 4 dp (rule 13).
    """
    from ..operators.graph import cooccurrence_edges

    ev = table(spark, sf_dir, "events")
    edges = cooccurrence_edges(
        ev, min_weight=3, max_cell_users=60
    ).select("u", "v").localCheckpoint()
    sym = edges.union(edges.select(F.col("v").alias("u"),
                                   F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d"))
    du = F.broadcast(deg.select(F.col("node").alias("u"),
                                F.col("d").alias("du")))
    dv = F.broadcast(deg.select(F.col("node").alias("v"),
                                F.col("d").alias("dv")))
    deg_stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.round(F.avg("d"), 4).alias("avg_degree"),
    )
    return (
        sym.join(du, "u").join(dv, "v")
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
            F.round(F.corr("du", "dv"), 4).alias("assortativity"),
        )
        .crossJoin(F.broadcast(deg_stats))
        .select("n_edges", "n_nodes", "avg_degree", "assortativity")
    )


@query(
    "attribution_touchpoints",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS e,
               first_value(CASE WHEN event_type IN ('click', 'view')
                                THEN event_type END IGNORE NULLS)
                   OVER w AS ft_type,
               first_value(CASE WHEN event_type IN ('click', 'view')
                                THEN CAST(floor(epoch(ts)) AS BIGINT)
                                END IGNORE NULLS) OVER w AS ft_epoch,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_type END IGNORE NULLS)
                   OVER w AS lt_type,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN CAST(floor(epoch(ts)) AS BIGINT)
                               END IGNORE NULLS) OVER w AS lt_epoch
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id AS purchase_id, e AS purchase_epoch,
           coalesce(ft_type, '(none)') AS first_touch_type,
           coalesce(ft_epoch, -1) AS first_touch_epoch,
           coalesce(lt_type, '(none)') AS last_touch_type,
           coalesce(lt_epoch, -1) AS last_touch_epoch,
           CASE WHEN lt_epoch IS NULL THEN -1
                ELSE e - lt_epoch END AS seconds_since_last_touch
    FROM marked WHERE event_type = 'purchase'
    """,
)
def attribution_touchpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch marketing attribution: for every
    purchase, the user's earliest and latest preceding touch event
    (click or view) plus the conversion lag — the two classic
    single-touch attribution models over a raw event stream.

    ONE window pass, PARTITIONED by user (parallelism = user
    cardinality, never a global sort): ``first/last(..., ignorenulls)``
    over the rows-preceding frame carries both touchpoints along the
    stream, and the purchase filter afterwards keeps the window's
    input untouched by the predicate (carry-forward semantics — the
    same shape as P4's requestID fold).  Touch-less purchases emit the
    ``(none)`` / -1 sentinels on both engines (rule 10).  Epochs are
    whole seconds (rule 13).
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("click", "view")
    t_type = F.when(is_touch, F.col("event_type"))
    t_epoch = F.when(is_touch, F.unix_timestamp("ts"))
    marked = ev.select(
        "user_id", "event_id", "event_type",
        F.unix_timestamp("ts").alias("e"),
        F.first(t_type, ignorenulls=True).over(w).alias("ft_type"),
        F.first(t_epoch, ignorenulls=True).over(w).alias("ft_epoch"),
        F.last(t_type, ignorenulls=True).over(w).alias("lt_type"),
        F.last(t_epoch, ignorenulls=True).over(w).alias("lt_epoch"),
    )
    return (
        marked.filter(F.col("event_type") == "purchase")
        .select(
            "user_id", F.col("event_id").alias("purchase_id"),
            F.col("e").alias("purchase_epoch"),
            F.coalesce("ft_type", F.lit("(none)"))
            .alias("first_touch_type"),
            F.coalesce("ft_epoch", F.lit(-1)).alias("first_touch_epoch"),
            F.coalesce("lt_type", F.lit("(none)"))
            .alias("last_touch_type"),
            F.coalesce("lt_epoch", F.lit(-1)).alias("last_touch_epoch"),
            F.when(F.col("lt_epoch").isNull(), F.lit(-1))
            .otherwise(F.col("e") - F.col("lt_epoch"))
            .alias("seconds_since_last_touch"),
        )
    )


@query(
    "growth_accounting_weekly",
    oracle="""
    WITH active AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(date_trunc('week', ts)) / 604800)
                    AS BIGINT) AS wk
        FROM events
    ),
    flagged AS (
        SELECT user_id, wk,
               min(wk) OVER (PARTITION BY user_id) AS first_wk,
               lag(wk) OVER (PARTITION BY user_id ORDER BY wk)
                   AS prev_wk
        FROM active
    ),
    states AS (
        SELECT wk,
               CASE WHEN wk = first_wk THEN 'new'
                    WHEN prev_wk = wk - 1 THEN 'retained'
                    ELSE 'resurrected' END AS state
        FROM flagged
        UNION ALL
        SELECT wk + 1 AS wk, 'churned' AS state
        FROM flagged f
        WHERE NOT EXISTS (
            SELECT 1 FROM active a
            WHERE a.user_id = f.user_id AND a.wk = f.wk + 1
        )
        AND f.wk + 1 <= (SELECT max(wk) FROM active)
    )
    SELECT wk, state, CAST(count(*) AS BIGINT) AS n_users
    FROM states GROUP BY wk, state
    """,
)
def growth_accounting_weekly(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Weekly growth accounting: every (week, user) activity cell is
    classified new / retained / resurrected, and a user active in week
    w but not w+1 contributes a churned row to w+1 — the
    DAU/WAU-style growth ledger (new + retained + resurrected −
    churned telescopes into the active-user delta).

    One DISTINCT collapse to (user, week) cells — the only pass over
    the facts — then two user-partitioned windows classify the cells
    and a self-anti-join (on the SAME user key, AQE reuses the
    exchange) derives churn; the final count groupBy runs on the
    cell frame.  Weeks are epoch-week integers (rule 13/4: never raw
    timestamps).  The churn horizon stops at the last observed week so
    the open week never reports churners.
    """
    ev = table(spark, sf_dir, "events")
    active = (
        ev.select(
            "user_id",
            F.floor(F.unix_timestamp(F.date_trunc("week", "ts"))
                    / 604800).cast("long").alias("wk"))
        .distinct()
    )
    uw = Window.partitionBy("user_id")
    ow = Window.partitionBy("user_id").orderBy("wk")
    flagged = active.select(
        "user_id", "wk",
        F.min("wk").over(uw).alias("first_wk"),
        F.lag("wk").over(ow).alias("prev_wk"),
    )
    states = flagged.select(
        "wk",
        F.when(F.col("wk") == F.col("first_wk"), "new")
        .when(F.col("prev_wk") == F.col("wk") - 1, "retained")
        .otherwise("resurrected").alias("state"),
    )
    max_wk = active.agg(F.max("wk").alias("mx"))
    nxt = flagged.select(
        "user_id", (F.col("wk") + 1).alias("wk"))
    churned = (
        nxt.join(active, ["user_id", "wk"], "left_anti")
        .crossJoin(F.broadcast(max_wk))
        .filter(F.col("wk") <= F.col("mx"))
        .select("wk", F.lit("churned").alias("state"))
    )
    return (
        states.unionByName(churned)
        .groupBy("wk", "state")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH s AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s ON s.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > s.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    ),
    lags AS (
        SELECT CAST(floor(epoch(date_trunc('week', s.t1))) AS BIGINT)
                   AS cohort_week,
               CAST(floor(epoch(p.t3)) AS BIGINT)
                   - CAST(floor(epoch(s.t1)) AS BIGINT) AS lag_s
        FROM s JOIN p ON p.user_id = s.user_id
    )
    SELECT cohort_week,
           CAST(count(*) AS BIGINT) AS n_converters,
           round(quantile_cont(lag_s, 0.5) + 1e-9, 6) AS p50_s,
           round(quantile_cont(lag_s, 0.9) + 1e-9, 6) AS p90_s
    FROM lags GROUP BY cohort_week
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution per signup cohort: for users who
    complete the strict signup → click → purchase funnel, the median
    and p90 signup→purchase lag by signup week — the latency view of
    the funnel (`funnel_conversion_rates` is the volume view).

    Reuses the funnel's user-keyed stage collapse
    (``operators/behavior.py::funnel_stage_times`` — three
    co-partitioned aggregations on one shuffle key); percentiles run
    over the converter cohort frame.  Exact ``percentile`` ==
    DuckDB ``quantile_cont`` with the +1e-9 nudge at round(6)
    (rules 13/15); at 100 TB swap for ``approx_percentile`` — same
    single-aggregation topology.
    """
    ev = table(spark, sf_dir, "events")
    stages = funnel_stage_times(ev)
    lags = (
        stages.filter(F.col("t3").isNotNull())
        .select(
            F.unix_timestamp(F.date_trunc("week", "t1"))
            .alias("cohort_week"),
            (F.unix_timestamp("t3") - F.unix_timestamp("t1"))
            .alias("lag_s"),
        )
    )
    return lags.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_converters"),
        F.expr("round(percentile(lag_s, 0.5) + 1e-9, 6)").alias("p50_s"),
        F.expr("round(percentile(lag_s, 0.9) + 1e-9, 6)").alias("p90_s"),
    )
