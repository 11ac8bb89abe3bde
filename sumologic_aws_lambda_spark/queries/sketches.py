"""Mergeable-sketch queries — the pre-aggregated dashboard tier.

Sumo's UI operators (``count_frequent``, distinct panels, compare) are
explicitly approximate beyond small cardinalities; the reference consumes
them through the Search Job API (``sumologic-app-utils/src/sumologic.py:
96-116``).  At 100 TB the right physical design is DataSketches-style
MERGEABLE sketches: build one small sketch per partition (per day, per
source), store those, and answer any cross-partition rollup by merging
sketches — never re-scanning the fact table.  Spark 4 ships the
Apache DataSketches family as built-in aggregates (``hll_sketch_agg`` /
``hll_union_agg``, ``theta_sketch_agg`` / ``theta_intersection_agg``,
``approx_top_k``), all partial-aggregatable JVM expressions.

Oracle strategy (same as ``approx_count_distinct_parts``): sketch
estimates are engine-specific, so every emitted column is either an exact
scalar DuckDB reproduces or a boolean asserting the estimate landed
within its error bound — deterministic TRUE on both sides unless the
sketch is actually broken.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from . import query

# approx_top_k maxItemsTracked for heavy_hitters_twopass.  The EXACT
# oracle is sound only while this dominates the distinct-key count
# (exact regime — the sketch never purges); the precondition is
# asserted against the fixtures in tests/test_sketch_preconditions.py.
HH_SKETCH_WIDTH = 100_000


@query(
    "approx_topk_routing_keys",
    oracle="""
    SELECT 'u' || CAST(user_id % 40 AS VARCHAR) AS item,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1
    """,
)
def approx_topk_routing_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent routing keys via ``approx_top_k`` — the sketch tier of
    Sumo's ``count_frequent`` (documented approximate beyond 10k values).
    One partial-aggregatable sketch pass, no groupBy shuffle of the key
    universe; ``maxItemsTracked`` (1000) far exceeds the 40-key
    cardinality here, so the sketch is in its exact regime and the DuckDB
    oracle can check values, not just bounds.  At real scale the same
    call degrades gracefully to approximate counts while the plan shape
    is unchanged."""
    ev = table(spark, sf_dir, "events")
    keyed = ev.select(
        F.concat(F.lit("u"), (F.col("user_id") % 40).cast("string"))
        .alias("item")
    )
    topk = keyed.agg(
        F.expr("approx_top_k(item, 40, 1000)").alias("tk")
    )
    return topk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("item"),
        F.col("e.count").cast("bigint").alias("cnt"),
    )


@query(
    "hll_daily_rollup",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           TRUE AS sketch_within_5pct
    FROM events GROUP BY event_type
    """,
)
def hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scheduled-view / pre-aggregation pattern: one HLL sketch of
    active users per (event_type, day) — the only pass that touches the
    fact table — then any rollup (here: per event_type across all days)
    is a union of day sketches.  ``hll_union_agg`` is partial-aggregatable,
    so merging N daily sketches shuffles N small binaries, not rows; a
    100 TB backfill never re-scans.  The exact distinct (for the oracle's
    bound check) is computed alongside and would be dropped in
    production."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users_exact")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "n_users_exact",
        (
            F.abs(F.col("est") - F.col("n_users_exact"))
            <= F.greatest(
                F.ceil(F.col("n_users_exact") * 0.05), F.lit(1)
            )
        ).alias("sketch_within_5pct"),
    )


@query(
    "theta_user_overlap",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_both_exact,
           TRUE AS overlap_within_10pct
    FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ) t
    """,
)
def theta_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-intersection cardinality via theta sketches: users seen in
    BOTH click and purchase streams.  Each stream contributes one theta
    sketch (exact below the 4k nominal-entries threshold, estimate
    above); ``theta_intersection_agg`` combines them without ever joining
    the underlying id sets — the 100 TB answer to audience-overlap
    questions, where the exact INTERSECT needs two distincts plus a
    shuffle join.  The exact count rides along for the oracle's bound
    check."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    sk = ev.groupBy("event_type").agg(
        F.expr("theta_sketch_agg(user_id)").alias("sk")
    )
    est = sk.agg(
        F.expr("theta_sketch_estimate(theta_intersection_agg(sk))")
        .alias("est")
    )
    clicks = ev.filter(F.col("event_type") == "click") \
        .select("user_id").distinct()
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("user_id").distinct()
    exact = clicks.intersect(purchases).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_both_exact")
    )
    return exact.crossJoin(est).select(
        "n_both_exact",
        (
            F.abs(F.col("est") - F.col("n_both_exact"))
            <= F.greatest(
                F.ceil(F.col("n_both_exact") * 0.10), F.lit(1)
            )
        ).alias("overlap_within_10pct"),
    )


@query(
    "heavy_hitters_twopass",
    oracle="""
    WITH keyed AS (
        SELECT 'u' || CAST(user_id AS VARCHAR) AS item FROM events
    ),
    counts AS (
        SELECT item, CAST(count(*) AS BIGINT) AS cnt
        FROM keyed GROUP BY item
    ),
    ranked AS (
        SELECT item, cnt,
               row_number() OVER (ORDER BY cnt DESC, item) AS rank
        FROM counts
    )
    SELECT item, cnt, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def heavy_hitters_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT top-10 heavy hitters via the two-pass sketch-then-verify
    pattern (Misra-Gries/SpaceSaving candidates + exact recount —
    Cormode & Hadjieleftheriou 2008, public): pass 1 is a
    partial-aggregatable ``approx_top_k`` sketch producing a candidate
    set; pass 2 exactly counts ONLY the ≤100 candidates (a broadcast
    semi-join over the scan) and ranks them.

    Sizing contract (the part that makes the EXACT oracle sound):
    top-k containment requires ``maxItemsTracked`` to dominate either
    the distinct-key count (exact regime — nothing is ever purged) or
    n / (the k-th frequency minus the error bound).  The fixture's
    user universe is near-uniform (no frequency gap), so the width is
    set to 100 000 ≫ the 15 000 distinct users at sf1 — the sketch is
    in its exact regime at every test SF, which the round-8 review
    demanded be explicit: at width 1000 the containment claim was
    vacuous on this distribution and the oracle pass was luck.  The
    precondition is CHECKED, not assumed (round-9 advisor fix):
    ``tests/test_sketch_preconditions.py`` asserts distinct users ≤
    ``HH_SKETCH_WIDTH`` at the driver's oracle SF, so a fixture regen
    that silently crosses the width fails CI instead of the compare.  On a
    REAL heavy-hitter distribution (what the operator is for) the
    frequency-gap bound applies and a few-thousand width suffices at
    any n; when neither bound is satisfiable, pass 2 still returns
    verified EXACT counts for the candidates — degraded to
    "top-k among candidates", never silently-wrong counts.

    Why this beats one exact groupBy at 100 TB: the key universe never
    shuffles — pass 1 moves merged sketch state (bounded by the
    width), pass 2 moves exact counts for ≤100 candidate keys.  A raw
    groupBy on a high-cardinality key (user ids at 15 B rows) shuffles
    the whole universe just to throw away all but 10 rows.
    """
    ev = table(spark, sf_dir, "events")
    keyed = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string"))
        .alias("item"))
    candidates = (
        keyed.agg(F.expr(f"approx_top_k(item, 100, {HH_SKETCH_WIDTH})")
                  .alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("item"))
    )
    exact = (
        keyed.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    head = exact.orderBy(F.col("cnt").desc(), "item").limit(10)
    w = Window.orderBy(F.col("cnt").desc(), "item")
    return head.select(
        "item", "cnt",
        F.row_number().over(w).cast("bigint").alias("rank"))
