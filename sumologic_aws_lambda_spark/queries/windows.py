"""Window functions: ranking, frames, carry-forward, sessionization.

The reference's only genuinely order-sensitive operator is the stateful
requestID carry-forward (SURVEY §2.3 P4, ``cloudwatchlogs-with-dlq/
cloudwatchlogs_lambda.js:44-63``) — expressed here, in its general form,
as ``last(..., ignorenulls)`` over an unbounded-preceding frame.  Ranking /
lag / lead / paging (SURVEY §2.7 W2 and the '(absent)' row) round out the
search-API surface.

Scale notes: every window partitions on a high-cardinality key (customer,
user) — one shuffle on that key, then per-partition sorting; no global
sort.  Skewed users are the known hazard; AQE skew handling applies to the
shuffle, and sessionization can fall back to ``session_window`` streaming
aggregation where state must be bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from . import query


@query(
    "window_topn_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS total_price, rn
    FROM (
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
               row_number() OVER (
                   PARTITION BY c.c_custkey
                   ORDER BY o.o_totalprice DESC, o.o_orderkey
               ) AS rn
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    )
    WHERE rn <= 3
    """,
)
def window_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — row_number ranking (tie-broken on the
    primary key so the result is deterministic across engines)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "rn",
        )
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spend
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer — unbounded-preceding frame."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT user_id, event_id,
           round(value - lag(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ), 4) AS value_delta,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS next_event_type
    FROM events
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics over the event stream (SURVEY §2.7 absent row)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("value_delta"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


@query(
    "carry_forward_last_value",
    oracle="""
    SELECT user_id, event_id,
           last_value(purchase_val IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_purchase_value
    FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'purchase' THEN round(value, 4) END
                   AS purchase_val
        FROM events
    )
    """,
)
def carry_forward_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The P4 requestID carry-forward pattern (``cloudwatchlogs_lambda.js:
    44-63``): rows lacking a value inherit the most recent non-null one
    within their ordered partition — ``last(..., ignorenulls=True)``.

    Deterministic because the order key (ts, event_id) is unique, exactly
    as the decode stage must emit an (envelope_id, event_index) order
    column (SURVEY §7 'hard parts').
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(
        F.col("event_type") == "purchase", F.round(F.col("value"), 4)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.last(purchase_val, ignorenulls=True)
        .over(w)
        .alias("last_purchase_value"),
    )


@query(
    "paged_results",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    ORDER BY ts, event_id
    LIMIT 50 OFFSET 100
    """,
)
def paged_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-job result paging (SURVEY §2.7 W2, ``sumologic.py:105-113``):
    stable OFFSET/LIMIT over a total order.

    Scale shape: ``orderBy().limit(offset+page)`` lowers to
    TakeOrderedAndProject — each partition keeps its local top-150 and
    only those survivors reach the driver-side merge, so the full table
    is never globally sorted.  The row_number that applies the offset
    then runs over a ≤150-row frame, where a single-partition window is
    the point, not a bottleneck.  (The naive form — row_number over the
    whole table — moves 100 TB to one partition.)
    """
    ev = table(spark, sf_dir, "events")
    page = (
        ev.select("event_id", "user_id", "event_type", "ts")
        .orderBy("ts", "event_id")
        .limit(150)
    )
    w = Window.orderBy("ts", "event_id")
    return (
        page.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 100)
        .select("event_id", "user_id", "event_type")
    )


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         <= 1800000000
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_epoch,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap.

    Batch twin of ``session_window`` (SURVEY §2.8 T10) — expressed as
    gaps-and-islands so the oracle can verify it; the streaming shell uses
    ``session_window`` itself, which Spark merges incrementally with state
    bounded by the watermark.

    Determinism notes (both sides identical): the gap compares
    MICROSECOND deltas (whole-second truncation would disagree with an
    exact interval compare for gaps inside (1800 s, 1801 s)), and the
    running-sum window orders by (ts, event_id) — the same total order
    the flag window used, so tied timestamps cannot shuffle events
    between sessions.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_ok = (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
              <= 1_800_000_000)
    flagged = ev.withColumn(
        "new_session", F.when(gap_ok, F.lit(0)).otherwise(F.lit(1))
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(run))
    return sessions.groupBy("user_id", "session_id").agg(
        F.unix_timestamp(F.min("ts")).alias("session_start_epoch"),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("session_id")


@query(
    "window_rank_battery",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           round(o_totalprice, 2) AS total_price,
           rnk, drnk,
           round(prnk, 6) AS prnk,
           round(cdist, 6) AS cdist,
           quartile
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               rank()         OVER w AS rnk,
               dense_rank()   OVER w AS drnk,
               percent_rank() OVER w AS prnk,
               cume_dist()    OVER w AS cdist,
               ntile(4)       OVER w AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY round(o_totalprice, 2) DESC, o_orderkey)
    ) t
    WHERE rnk <= 5
    """,
)
def window_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function surface over one partitioned window:
    rank / dense_rank / percent_rank / cume_dist / ntile.

    One window spec → ONE shuffle on the partition key serves all five
    functions (Catalyst fuses same-spec window functions into a single
    WindowExec).  The ordering key is the ROUNDED price with the order
    key as tiebreak, so rank ties — and therefore every downstream
    value — are identical across engines.  percent_rank/cume_dist/ntile
    are computed over the FULL partition and only then top-5-filtered
    (the filter cannot push through the window, by design).
    """
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.round("o_totalprice", 2).desc(), F.col("o_orderkey"))
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority", "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rnk") <= 5)
    )
