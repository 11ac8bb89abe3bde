"""Warehouse-lifecycle operators: SCD2 interval build, CDC snapshot
merge, referential-integrity audit, join-key skew diagnostics, and a
k-anonymity audit.

The reference's pipeline tier moves state into warehouses (S3 sinks,
batch-import APIs); these queries are the lifecycle operations a user
runs AROUND that movement — dimension versioning, change-capture merge,
and the data-quality / privacy audits a 100 TB training corpus needs
before use.  Scale stances per query:

* SCD2 / CDC — every window is PARTITIONED by the entity key (150 k
  tasks at a billion users, never a global sort); the CDC midpoint is
  one scalar aggregate broadcast back.
* referential integrity — each FK edge is one left join + conditional
  count.  Fact→fact edges (lineitem→orders) sort-merge on the natural
  key; dim edges AQE-broadcast.  No hints: parents scale with SF
  (round-5 policy).
* skew diagnostics — per-key counts are one partial-aggregatable
  shuffle per analyzed column; the stats over the key frame are a
  second tiny aggregate.  This is the tool you run BEFORE choosing a
  join strategy (salting, AQE skew-join) — `salted_agg_routing_key`
  is the cure, this is the diagnosis.
* k-anonymity — one groupBy over the quasi-identifier tuple, one
  scalar aggregate over the class frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from . import query


@query(
    "scd2_intervals",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, event_id, ts,
               CAST(floor(epoch(ts)) AS BIGINT) AS e,
               coalesce(lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id),
                   '(first)') AS prev
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type AS state, e AS valid_from,
               ts, event_id
        FROM ordered WHERE event_type <> prev
    )
    SELECT user_id, state, valid_from,
           CAST(row_number() OVER w AS BIGINT) AS version,
           lead(valid_from) OVER w AS valid_to,
           lead(valid_from) OVER w - valid_from AS duration_s
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (Type 2) interval build from a change
    stream: collapse each user's event history to state-change rows
    (``event_type`` as the tracked attribute), then close each version
    with the next change's start — the Kimball SCD2 shape every
    warehouse dimension load needs.

    Two windows, BOTH partitioned by ``user_id`` (change detection via
    lag, interval close via lead) — parallelism is the entity-key
    cardinality, no global sort anywhere.  The open (current) version
    keeps a NULL ``valid_to`` on both engines.  Epochs are whole
    seconds (``unix_timestamp`` == DuckDB ``floor(epoch)``, rule 13);
    the lag sentinel ``(first)`` keeps the first-row comparison
    non-NULL on both engines (rule 11).
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn(
            "prev",
            F.coalesce(F.lag("event_type").over(w), F.lit("(first)")))
        .filter(F.col("event_type") != F.col("prev"))
        .select(
            "user_id", F.col("event_type").alias("state"),
            F.unix_timestamp("ts").alias("valid_from"), "ts", "event_id")
    )
    # versioning reuses the same (ts, event_id) event ordering — NOT
    # valid_from, which is whole seconds and would reorder two
    # same-second changes
    return changes.select(
        "user_id", "state", "valid_from",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.lead("valid_from").over(w).alias("valid_to"),
        (F.lead("valid_from").over(w) - F.col("valid_from"))
        .alias("duration_s"),
    )


@query(
    "cdc_snapshot_merge",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS e
        FROM events
    ),
    bounds AS (SELECT (min(e) + max(e)) // 2 AS mid FROM e),
    snap AS (
        SELECT user_id, event_type AS state, e AS state_epoch
        FROM (
            SELECT x.*, row_number() OVER (
                PARTITION BY user_id
                ORDER BY e DESC, event_id DESC) AS rn
            FROM e x, bounds WHERE x.e < bounds.mid
        ) WHERE rn = 1
    ),
    batch AS (
        SELECT user_id, event_type AS state, e AS state_epoch
        FROM (
            SELECT x.*, row_number() OVER (
                PARTITION BY user_id
                ORDER BY e DESC, event_id DESC) AS rn
            FROM e x, bounds WHERE x.e >= bounds.mid
        ) WHERE rn = 1
    )
    SELECT coalesce(s.user_id, b.user_id) AS user_id,
           coalesce(b.state, s.state) AS state,
           coalesce(b.state_epoch, s.state_epoch) AS state_epoch,
           CASE WHEN s.user_id IS NULL THEN 'insert'
                WHEN b.user_id IS NULL THEN 'carry'
                ELSE 'update' END AS action
    FROM snap s FULL OUTER JOIN batch b ON s.user_id = b.user_id
    """,
)
def cdc_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge: apply a change batch onto a prior snapshot (the
    lakehouse MERGE INTO shape).  The event stream splits at its epoch
    midpoint — earlier half collapses to the per-user snapshot, later
    half to the incoming batch — then a full-outer key join emits the
    merged state plus the merge action (insert / update / carry).

    Latest-wins is a row_number window PARTITIONED by the key (order:
    epoch desc, event_id desc — total, engine-agnostic); the midpoint
    is ONE scalar min/max aggregate broadcast back (integer floor
    division both sides).  The merge join shuffles both collapsed
    frames on the key they were just aggregated on, so AQE reuses the
    exchange; at 100 TB this is the canonical one-shuffle upsert.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.unix_timestamp("ts").alias("e"))
    bounds = ev.agg(F.expr("(min(e) + max(e)) div 2").alias("mid"))
    staged = ev.crossJoin(F.broadcast(bounds))

    def latest(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.col("e").desc(), F.col("event_id").desc())
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("event_type").alias("state"),
                    F.col("e").alias("state_epoch"))
        )

    snap = latest(staged.filter(F.col("e") < F.col("mid")))
    batch = latest(staged.filter(F.col("e") >= F.col("mid")))
    s = snap.alias("s")
    b = batch.alias("b")
    return (
        s.join(b, F.col("s.user_id") == F.col("b.user_id"), "full_outer")
        .select(
            F.coalesce("s.user_id", "b.user_id").alias("user_id"),
            F.coalesce("b.state", "s.state").alias("state"),
            F.coalesce("b.state_epoch", "s.state_epoch")
            .alias("state_epoch"),
            F.when(F.col("s.user_id").isNull(), "insert")
            .when(F.col("b.user_id").isNull(), "carry")
            .otherwise("update").alias("action"),
        )
    )


@query(
    "referential_integrity_audit",
    oracle="""
    SELECT 'lineitem->orders' AS fk, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT)
               AS n_orphans
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem->part', CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE p.p_partkey IS NULL) AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'orders->customer', CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'supplier->nation', CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
    FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def referential_integrity_audit(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the star schema: for each FK
    edge, total child rows and rows whose parent key is missing — the
    DQ check that gates a snapshot's promotion (Deequ's
    ``isContainedIn`` / referential constraint, here as plain plans).

    One LEFT JOIN + conditional count per edge.  The fact→fact edge
    (lineitem→orders) sort-merge-joins on the natural key — the
    designed 100 TB shape; dimension parents AQE-broadcast at small SF
    with no hints (parents scale with SF, round-5 policy).  Counting
    NULL parents after a left join beats an anti-join + second scan:
    one pass per edge gives both counts.
    """

    def edge(child: DataFrame, parent: DataFrame, ck: str, pk: str,
             name: str) -> DataFrame:
        joined = child.select(F.col(ck)).join(
            parent.select(F.col(pk)), child[ck] == parent[pk], "left")
        return joined.agg(
            F.lit(name).alias("fk"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col(pk).isNull(), 1)).alias("n_orphans"),
        ).select("fk", "n_rows", "n_orphans")

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    return (
        edge(li, orders, "l_orderkey", "o_orderkey", "lineitem->orders")
        .unionAll(edge(li, part, "l_partkey", "p_partkey",
                       "lineitem->part"))
        .unionAll(edge(orders, cust, "o_custkey", "c_custkey",
                       "orders->customer"))
        .unionAll(edge(supp, nation, "s_nationkey", "n_nationkey",
                       "supplier->nation"))
    )


@query(
    "join_key_skew_stats",
    oracle="""
    WITH et AS (
        SELECT event_type AS k, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    uid AS (
        SELECT CAST(user_id AS VARCHAR) AS k,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    )
    SELECT 'event_type' AS key_col, CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(max(c) AS BIGINT) AS max_count,
           round(CAST(max(c) AS DOUBLE) * count(*) / sum(c), 4)
               AS skew_factor,
           round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_share
    FROM et
    UNION ALL
    SELECT 'user_id', CAST(count(*) AS BIGINT), CAST(sum(c) AS BIGINT),
           CAST(max(c) AS BIGINT),
           round(CAST(max(c) AS DOUBLE) * count(*) / sum(c), 4),
           round(CAST(max(c) AS DOUBLE) / sum(c), 6)
    FROM uid
    """,
)
def join_key_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics: per candidate join/agg key, the
    key cardinality, heaviest-key count, skew factor (max/mean — 1.0
    is uniform) and heaviest-key share.  This is the measurement that
    decides between a plain shuffle, AQE skew-join, and salting
    (`salted_agg_routing_key` is the cure; this is the diagnosis).

    Per-key counts are one partial-aggregatable shuffle per analyzed
    column; the stats run over the KEY-cardinality frame (a second,
    tiny aggregate).  Skew factor = max·n_keys/n_rows — a single
    division of exact integers (rule 2), rounded once.
    """
    ev = table(spark, sf_dir, "events")

    def stats(keyed: DataFrame, name: str) -> DataFrame:
        per_key = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
        return per_key.agg(
            F.lit(name).alias("key_col"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("c").alias("n_rows"),
            F.max("c").alias("max_count"),
            F.round(F.max("c").cast("double") * F.count(F.lit(1))
                    / F.sum("c"), 4).alias("skew_factor"),
            F.round(F.max("c").cast("double") / F.sum("c"), 6)
            .alias("top_share"),
        ).select("key_col", "n_keys", "n_rows", "max_count",
                 "skew_factor", "top_share")

    return stats(
        ev.select(F.col("event_type").alias("k")), "event_type"
    ).unionAll(stats(
        ev.select(F.col("user_id").cast("string").alias("k")), "user_id"))


@query(
    "k_anonymity_audit",
    oracle="""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(count(*) AS BIGINT) AS sz
        FROM customer GROUP BY 1, 2
    )
    SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(sz) AS BIGINT) AS min_class_size,
           CAST(count(*) FILTER (WHERE sz < 10) AS BIGINT)
               AS classes_below_k,
           CAST(coalesce(sum(sz) FILTER (WHERE sz < 10), 0) AS BIGINT)
               AS rows_below_k,
           round(CAST(coalesce(sum(sz) FILTER (WHERE sz < 10), 0)
                      AS DOUBLE) / sum(sz), 6) AS share_below_k
    FROM classes
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple
    (nation × market segment on the customer dimension, k = 10):
    equivalence-class sizes, how many classes (and rows) fall below k,
    and the at-risk row share — the privacy gate a training-data
    release runs before shipping user-derived records (Sweeney 2002,
    public).

    One groupBy over the QI tuple (partial-aggregatable), one scalar
    aggregate over the class frame.  At 100 TB the class frame is
    |QI-combinations|-sized — still tiny next to the facts; the
    at-risk share is a single division of exact counts (rule 2).
    """
    classes = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    below = F.when(F.col("sz") < 10, F.col("sz")).otherwise(0)
    return classes.agg(
        F.sum("sz").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("sz").alias("min_class_size"),
        F.count(F.when(F.col("sz") < 10, 1)).alias("classes_below_k"),
        F.sum(below).alias("rows_below_k"),
        F.round(F.sum(below).cast("double") / F.sum("sz"), 6)
        .alias("share_below_k"),
    )


@query(
    "pointintime_feature_join",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, event_id, ts,
               CAST(floor(epoch(ts)) AS BIGINT) AS e,
               coalesce(lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id),
                   '(first)') AS prev
        FROM events
    ),
    intervals AS (
        SELECT user_id, event_type AS state, e AS valid_from,
               CAST(row_number() OVER w AS BIGINT) AS version,
               lead(e) OVER w AS valid_to
        FROM ordered WHERE event_type <> prev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    purchases AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS e
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.event_id, p.e AS purchase_epoch,
           i.state AS state_at_purchase, i.version
    FROM purchases p
    JOIN intervals i
      ON i.user_id = p.user_id
     AND p.e >= i.valid_from
     AND (i.valid_to IS NULL OR p.e < i.valid_to)
    """,
)
def pointintime_feature_join(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Point-in-time correct feature join: each purchase event looks up
    the SCD2 state version that was ACTIVE at its event time — the
    as-of join every feature store runs to prevent training-serving
    skew (a plain latest-state join would leak the future into
    training rows).

    Composes :func:`scd2_intervals`' interval build with an interval-
    containment join.  Scale shape: BOTH sides key on ``user_id``, so
    the equi-join part co-partitions on one shuffle key and the range
    predicate evaluates within each user's (small) interval list —
    never a global range join.  Epochs are whole seconds (rule 13);
    the open current version matches via the NULL-``valid_to`` arm on
    both engines.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    intervals = (
        ev.withColumn(
            "prev",
            F.coalesce(F.lag("event_type").over(w), F.lit("(first)")))
        .filter(F.col("event_type") != F.col("prev"))
        .select("user_id", F.col("event_type").alias("state"),
                F.unix_timestamp("ts").alias("valid_from"),
                "ts", "event_id")
        .select("user_id", "state", "valid_from",
                F.row_number().over(w).cast("bigint").alias("version"),
                F.lead("valid_from").over(w).alias("valid_to"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("e"))
    p, i = purchases.alias("p"), intervals.alias("i")
    return (
        p.join(i, (F.col("p.user_id") == F.col("i.user_id"))
               & (F.col("p.e") >= F.col("i.valid_from"))
               & (F.col("i.valid_to").isNull()
                  | (F.col("p.e") < F.col("i.valid_to"))))
        .select(F.col("p.user_id").alias("user_id"), "event_id",
                F.col("p.e").alias("purchase_epoch"),
                F.col("i.state").alias("state_at_purchase"), "version")
    )
