"""Advanced relational surface promised by SURVEY §2.5/§2.6 '(absent)'
rows: as-of join, range join, cube, grouping sets — plus the IVF ANN
scale path for similarity search.

All run on the shared TPC-H-ish tables.  Event timestamps are compared
and emitted as epoch seconds (BIGINT) so the DuckDB(ns)/Spark(µs)
resolution difference can never skew the hash compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.asof import asof_join
from . import query


def _events_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.withColumn("epoch_s", F.unix_timestamp("ts"))


@query(
    "asof_join_last_click",
    oracle="""
    WITH clicks AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
               max(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, CAST(floor(epoch(ts)) AS BIGINT)
    ), purchases AS (
        SELECT user_id, event_id AS purchase_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS purchase_epoch
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.purchase_id, p.purchase_epoch,
           c.click_id AS last_click_id,
           c.epoch_s AS last_click_epoch
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.epoch_s <= p.purchase_epoch
    """,
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (§2.5 absent row): each purchase gets the most recent
    click by the same user at-or-before it.  Clicks are pre-deduped to
    one per (user, second) — max event_id — so the match is unique and
    the union+window plan (see ``operators/asof.py``) is deterministic.
    One shuffle on user_id; no range/theta join anywhere in the plan."""
    ev = _events_epoch(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "epoch_s")
        .agg(F.max("event_id").alias("last_click_id"))
        .withColumnRenamed("epoch_s", "click_epoch")
        .withColumn("last_click_epoch", F.col("click_epoch"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("epoch_s").alias("purchase_epoch"),
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_epoch",
        right_ts="click_epoch",
        right_cols=["last_click_id", "last_click_epoch"],
    )
    return joined.select(
        "user_id",
        "purchase_id",
        "purchase_epoch",
        "last_click_id",
        "last_click_epoch",
    )


@query(
    "range_join_value_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('low', 0.0, 10.0), ('mid', 10.0, 100.0),
               ('high', 100.0, 1e9)
    )
    SELECT b.band, CAST(count(*) AS BIGINT) AS n,
           round(sum(e.value), 2) AS total_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a tiny banding dimension — broadcast
    nested-loop by construction, never a shuffle: the dim is 3 rows, so
    Catalyst broadcasts it and the probe stays narrow.  The 100 TB rule:
    range joins are only safe when one side broadcasts; otherwise
    rewrite as an as-of/bucketed join."""
    ev = table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 100.0), ("high", 100.0, 1e9)],
        "band string, lo double, hi double",
    )
    cond = (ev.value >= bands.lo) & (ev.value < bands.hi)
    return (
        ev.join(F.broadcast(bands), cond)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "cube_order_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with grouping_id disambiguation
    (§2.6 absent row).  Catalyst expands the cube map-side; one shuffle,
    partial aggregation first — exactly the plan a hand-rolled 4-way
    union of groupBys would need 4 scans for."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.col("gid").cast("long").alias("gid"),
            "n",
            "total",
        )
    )


@query(
    "grouping_sets_lineitem",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS rflag,
           coalesce(l_linestatus, 'ALL') AS lstatus,
           CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form behind rollup/cube (§2.6 absent
    row), via the native DataFrame API (Spark 4 ``groupingSets``)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            F.col("gid").cast("long").alias("gid"),
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# IVF ANN: coarse-quantize then probe — the scale path for similarity
# ---------------------------------------------------------------------------

_N_CENTROIDS = 8
_NPROBE = 2
_IVF_COS = (
    "list_dot_product(v.e, c.ce) /"
    " (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c.ce, c.ce)))"
)


@query(
    "ivf_ann_topk",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), cent AS (
        SELECT vec_id AS cid, e AS ce FROM vecs WHERE vec_id < {_N_CENTROIDS}
    ), assign AS (
        SELECT vec_id, cluster_id FROM (
            SELECT v.vec_id, c.cid AS cluster_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {_IVF_COS} DESC, c.cid
                   ) AS rn
            FROM vecs v CROSS JOIN cent c
        ) WHERE rn = 1
    ), probes AS (
        SELECT vec_id AS query_id, cluster_id FROM (
            SELECT v.vec_id, c.cid AS cluster_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {_IVF_COS} DESC, c.cid
                   ) AS rn
            FROM vecs v CROSS JOIN cent c
            WHERE v.vec_id % 97 = 0
        ) WHERE rn <= {_NPROBE}
    ), cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM probes p JOIN assign a ON p.cluster_id = a.cluster_id
        WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank FROM (
        SELECT cd.query_id, cd.neighbor_id,
               round(list_dot_product(q.e, n.e) /
                     (sqrt(list_dot_product(q.e, q.e)) *
                      sqrt(list_dot_product(n.e, n.e))), 6) AS sim,
               row_number() OVER (
                   PARTITION BY cd.query_id
                   ORDER BY round(list_dot_product(q.e, n.e) /
                                  (sqrt(list_dot_product(q.e, q.e)) *
                                   sqrt(list_dot_product(n.e, n.e))), 6)
                            DESC, cd.neighbor_id
               ) AS rank
        FROM cand cd
        JOIN vecs q ON q.vec_id = cd.query_id
        JOIN vecs n ON n.vec_id = cd.neighbor_id
    ) WHERE rank <= 3
    """,
)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbour: assign every vector to its
    nearest of K coarse centroids (here: the first K corpus vectors as a
    deterministic stand-in for trained centroids), probe the query's
    nprobe nearest cells, exact-rank only the candidates.

    Scale shape: centroid table is tiny → both assignment passes are
    broadcast cross-joins (narrow, no shuffle); the only shuffle is the
    candidate equi-join on cluster_id + the final per-query top-k window.
    At 100 TB the corpus assignment is computed once and persisted,
    turning every query into a prune-then-scan of ~nprobe/K of the data.
    """
    from ..operators.similarity import (
        _centroid_struct_arr,
        _ranked_cells,
        as_double,
        cosine,
        l2_norm,
    )

    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("e")
    ).withColumn("en", l2_norm(F.col("e")))

    # All K centroids as ONE broadcast array row: the per-vector argmax
    # then happens inside a higher-order expression — no explode, no
    # window, no shuffle.  The previous shape (crossJoin + row_number
    # window partitioned by vec_id) re-shuffled the entire corpus×K
    # candidate set just to pick a max; at 100 TB the assignment pass is
    # the dominant cost, so it must stay narrow.  Norms ride along
    # pre-computed (vector-side column, centroid-side struct field) so the
    # per-(vector, centroid) work is ONE dot — bit-identical to the inline
    # cosine (same op order), 3× less array folding.  The carrier/ranking
    # machinery is shared with ivfpq_adc_topk so IVF and IVF-PQ cell
    # assignment can never drift apart.
    cent_arr = _centroid_struct_arr(
        vecs.filter(F.col("vec_id") < _N_CENTROIDS).select(
            F.col("vec_id").alias("cid"), F.col("e").alias("ce")))

    def nearest(df: DataFrame, n: int, id_out: str) -> DataFrame:
        # Sort key (−sim, cid) ≡ ORDER BY sim DESC, cid — matching the
        # oracle's row_number ordering.
        ranked = _ranked_cells(F.col("e"), F.col("en"))
        joined = df.crossJoin(cent_arr)
        if n == 1:
            return joined.select(
                F.col("vec_id").alias(id_out),
                F.element_at(ranked, 1)["cid"].alias("cluster_id"),
            )
        return joined.select(
            F.col("vec_id").alias(id_out),
            F.explode(F.slice(ranked, 1, n)).alias("cell"),
        ).select(id_out, F.col("cell.cid").alias("cluster_id"))

    assign = nearest(vecs, 1, "vec_id")
    probes = nearest(vecs.filter(F.col("vec_id") % 97 == 0), _NPROBE, "query_id")

    cand = (
        probes.join(assign, "cluster_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    q = vecs.select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
    n = vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"))
    scored = (
        cand.join(q, "query_id")
        .join(n, "neighbor_id")
        .withColumn("sim", F.round(cosine(F.col("qe"), F.col("ne")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


# ---------------------------------------------------------------------------
# §3.3 metrics API: selector match + datapoint quantization
# ---------------------------------------------------------------------------

_M_START = 1704067200          # 2024-01-01T00:00:00Z
_M_END = _M_START + 3 * 86400
_M_INTERVAL = 21600            # ceil(3d / 12 requested points)


@query(
    "metrics_quantize",
    oracle=f"""
    WITH src AS (
        SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es,
               event_type,
               json_extract_string(props, '$.k') AS k,
               value
        FROM events
    ), tagged AS (
        SELECT 'A' AS row_id, es, event_type, value FROM src
        WHERE event_type = 'click'
        UNION ALL
        SELECT 'B', es, event_type, value FROM src
        WHERE event_type = 'purchase' AND starts_with(k, '1')
    )
    SELECT row_id, event_type AS metric,
           (es // {_M_INTERVAL}) * {_M_INTERVAL} AS bucket_start,
           round(avg(value), 4) AS avg_value,
           CAST(count(*) AS BIGINT) AS n
    FROM tagged
    WHERE es >= {_M_START} AND es < {_M_END}
    GROUP BY 1, 2, 3
    """,
)
def metrics_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.3 metrics variant: two request rows (selector match language,
    ``sumoresource.py:959-988``) quantized to requestedDataPoints buckets
    (``sumologic.py:185-202``) — one scan for the whole request, buckets
    by portable epoch arithmetic."""
    from ..plans.metrics_service import MetricsQuery, metrics_results

    ev = table(spark, sf_dir, "events").select(
        "ts",
        F.col("event_type").alias("metric"),
        F.create_map(F.lit("k"),
                     F.get_json_object("props", "$.k")).alias("dims"),
        "value",
    )
    out = metrics_results(
        ev,
        [MetricsQuery("A", "metric=click"),
         MetricsQuery("B", "metric=purchase k=1*")],
        start_epoch=_M_START, end_epoch=_M_END,
        requested_datapoints=12,
    )
    return out.select(
        "row_id", "metric", "bucket_start",
        F.round("avg_value", 4).alias("avg_value"), "n",
    )


@query(
    "salted_agg_routing_key",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total,
           round(avg(value), 4) AS mean,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi
    FROM events GROUP BY event_type
    """,
)
def salted_agg_routing_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation on the routing key (§2.6 A1 at
    100 TB: source_category is Zipf-hot).  The salt must be semantically
    invisible — the oracle is the plain GROUP BY.  avg decomposes into
    sum+count across phases; salt here is deterministic (hash of the
    unique event id) so the oracle compare is reproducible."""
    from ..operators.skew import salt_from, salted_agg

    ev = table(spark, sf_dir, "events")
    out = salted_agg(
        ev, ["event_type"],
        {"n": "count(event_id)", "total": "sum(value)",
         "mean": "avg(value)", "lo": "min(value)", "hi": "max(value)"},
        salt=salt_from("event_id", 16),
    )
    return out.select(
        "event_type", "n",
        F.round("total", 2).alias("total"),
        F.round("mean", 4).alias("mean"),
        F.round("lo", 4).alias("lo"),
        F.round("hi", 4).alias("hi"),
    )


@query(
    "rollup_hierarchy_daily",
    oracle="""
    SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400
               AS bucket_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi
    FROM events
    GROUP BY 1, 2
    """,
)
def rollup_hierarchy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup hierarchy: raw → 1h rollup → coarsened to 1d by
    re-aggregating partials (never rescanning raw).  The oracle is the
    DIRECT daily aggregation of raw events — proving the algebraic
    re-aggregation is exact, the property that lets 100 TB dashboards
    serve from ~1/3600th of the data."""
    from ..operators.rollup import build_rollup, coarsen

    ev = table(spark, sf_dir, "events")
    hourly = build_rollup(ev, "1h")
    daily = coarsen(hourly, "1h", "1d")
    return daily.select(
        "bucket_start", "event_type", "n",
        F.round("sum_value", 2).alias("total"),
        F.round("min_value", 4).alias("lo"),
        F.round("max_value", 4).alias("hi"),
    )


@query(
    "transpose_event_matrix",
    oracle="""
    SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400 AS day_start,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
               AS click,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
               AS error,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
               AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
               AS view
    FROM events
    GROUP BY 1
    """,
)
def transpose_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sumo's ``transpose`` (dashboard matrix): day rows × event-type
    columns via ``pivot`` with an EXPLICIT value list — at 100 TB never
    let pivot run its implicit distinct-discovery job over the fact
    table; the domain comes from the catalog."""
    ev = table(spark, sf_dir, "events")
    day = (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
    out = (
        ev.groupBy(day.alias("day_start"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
    )
    cols = ["click", "error", "purchase", "signup", "view"]
    return out.select(
        "day_start",
        *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c) for c in cols],
    )


@query(
    "outlier_detection",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, value,
               CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s,
               CAST(sum(CAST(value AS DECIMAL(18,6))
                        * CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                   AS sq,
               CAST(count(value) OVER w AS DOUBLE) AS n
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY event_id
            ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING
        )
    ), stats AS (
        SELECT user_id, event_id, value, s / n AS mu,
               sqrt(greatest((sq - s * s / n) / (n - 1), 0)) AS sigma
        FROM seq WHERE n >= 2
    )
    SELECT user_id, event_id, value, mu
    FROM stats
    WHERE abs(value - mu) > 3 * sigma
    """,
)
def outlier_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sumo's ``outlier`` operator: flag values deviating more than 3σ
    from the trailing-window mean, per series, with the frame ending at
    1 PRECEDING so a point never contaminates its own baseline.

    mu/σ come from algebraic sufficient statistics (windowed sum, sum of
    squares, count) with the sums in DECIMAL: decimal addition is exact
    and order-independent, so both engines derive bit-identical doubles
    — built-in ``avg``/``stddev`` window aggregates differ across
    engines in float summation order, which flips rounding boundaries.
    One shuffle on the series key; single pass."""
    dec = F.col("value").cast("decimal(18,6)")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-20, -1)
    )
    ev = table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id", "event_id", "value",
        F.sum(dec).over(w).cast("double").alias("s"),
        F.sum(dec * dec).over(w).cast("double").alias("sq"),
        F.count("value").over(w).cast("double").alias("n"),
    ).filter(F.col("n") >= 2)
    stats = seq.select(
        "user_id", "event_id", "value",
        (F.col("s") / F.col("n")).alias("mu"),
        F.sqrt(
            F.greatest(
                (F.col("sq") - F.col("s") * F.col("s") / F.col("n"))
                / (F.col("n") - 1),
                F.lit(0.0),
            )
        ).alias("sigma"),
    )
    # No round(_, 4) on the outputs: mu = s/n with exact-decimal s lands
    # on x.xxxx5 boundaries CONSTANTLY (44.4725/2 = 22.23625), where
    # Spark's BigDecimal HALF_UP and DuckDB's float rounding disagree.
    # s and n are bit-identical doubles in both engines, so unrounded
    # s/n is bit-identical too (found at sf0.1; sf0.01 never hit a tie).
    return stats.filter(
        F.abs(F.col("value") - F.col("mu")) > 3 * F.col("sigma")
    ).select("user_id", "event_id", "value", "mu")


_KM_K = 8
_KM_SCALE = 1_000_000
_KM_D2 = ("list_sum(list_transform(list_zip(v.e, c.ce),"
          " p -> (p[1] - p[2]) * (p[1] - p[2])))")


def _km_assign(cent_cte: str, name: str) -> str:
    return f"""
    {name} AS (
        SELECT vec_id, cid FROM (
            SELECT v.vec_id, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY {_KM_D2}, c.cid) AS rn
            FROM vecs v CROSS JOIN {cent_cte} c
        ) WHERE rn = 1
    )"""


def _km_sums(assign_cte: str, name: str) -> str:
    return f"""
    {name} AS (
        SELECT a.cid, t.i,
               sum(CAST(floor(t.x * {_KM_SCALE}) AS BIGINT)) AS s,
               count(*) AS n
        FROM {assign_cte} a
        JOIN (SELECT vec_id, generate_subscripts(e, 1) AS i,
                     unnest(e) AS x
              FROM vecs) t USING (vec_id)
        GROUP BY a.cid, t.i
    )"""


@query(
    "kmeans_centroid_stats",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    seed AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e AS ce
        FROM vecs ORDER BY vec_id LIMIT {_KM_K}
    ),
    {_km_assign("seed", "a1").lstrip()},
    {_km_sums("a1", "sums1").lstrip()},
    cent2 AS (
        SELECT cid, list(s / (n * {_KM_SCALE}.0) ORDER BY i) AS ce
        FROM sums1 GROUP BY cid
    ),
    {_km_assign("cent2", "a2").lstrip()},
    {_km_sums("a2", "sums2").lstrip()}
    SELECT CAST(cid AS INT) AS cid,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(CASE WHEN i = 1 THEN s END) AS BIGINT) AS qsum_d1,
           CAST(sum(s) AS BIGINT) AS qsum_total
    FROM sums2 GROUP BY cid
    """,
)
def kmeans_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained coarse centroids for IVF: two Lloyd's rounds over the
    embedding corpus (``operators.similarity.kmeans_lite`` — narrow
    literal-array argmin assignment + one integer-sum shuffle per round,
    O(k·dim) driver state).  Emits per-cluster size and quantized-sum
    checksums; the oracle re-runs both rounds in DuckDB on the exact
    integer arithmetic, so assignment AND centroid trajectories must
    agree bit-for-bit.  At 100 TB this is the centroid-training pass
    whose output feeds ``ivf_ann_topk`` in place of its deterministic
    first-K stand-ins (the provider is pluggable)."""
    from ..operators.similarity import kmeans_lite

    emb = table(spark, sf_dir, "embeddings", parallel=True)
    _, final = kmeans_lite(emb, k=_KM_K, iters=2, scale=_KM_SCALE)
    rows = [(cid, n, sums[0], sum(sums)) for cid, n, sums in final]
    return spark.createDataFrame(
        rows, "cid int, n bigint, qsum_d1 bigint, qsum_total bigint"
    )


@query(
    "interval_overlap_pairs",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id AS pid,
               CAST(floor(epoch(ts)) AS BIGINT) AS ps,
               CAST(floor(epoch(ts)) AS BIGINT) + 1800 AS pe
        FROM events WHERE event_type = 'purchase'
    ),
    e AS (
        SELECT user_id, event_id AS eid,
               CAST(floor(epoch(ts)) AS BIGINT) AS es,
               CAST(floor(epoch(ts)) AS BIGINT) + 3600 AS ee
        FROM events WHERE event_type = 'error'
    ),
    pairs AS (
        SELECT p.user_id, p.pid, e.eid
        FROM p JOIN e USING (user_id)
        WHERE p.ps < e.ee AND e.es < p.pe
    )
    SELECT user_id, count(*) AS n_pairs,
           min(pid) AS first_pid, min(eid) AS first_eid
    FROM pairs GROUP BY user_id
    """,
)
def interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (§2.5 family): every (purchase-session,
    error-window) pair per user whose half-open time intervals overlap
    — purchases open a 30-minute session, errors a 60-minute incident
    window.  The oracle is the straightforward nested-loop predicate;
    the Spark plan is the BUCKETIZED equi-join
    (``operators/asof.py::interval_overlap_join``): explode to
    30-minute buckets, equi-join on (user, bucket), exact predicate +
    first-shared-bucket dedup as post-filters — no theta join, no
    distinct shuffle, fan-out bounded by interval/bucket."""
    ev = _events_epoch(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"),
        F.col("epoch_s").alias("ps"),
        (F.col("epoch_s") + 1800).alias("pe"))
    e = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("eid"),
        F.col("epoch_s").alias("es"),
        (F.col("epoch_s") + 3600).alias("ee"))
    from ..operators.asof import interval_overlap_join

    j = interval_overlap_join(p, e, "ps", "pe", "es", "ee",
                              on="user_id", bucket=1800)
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("pid").alias("first_pid"),
        F.min("eid").alias("first_eid"),
    )
