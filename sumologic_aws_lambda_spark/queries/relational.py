"""Relational core: scans, filters, projections, joins, aggregations.

The reference's Lambdas only ever group-and-collect (SURVEY §2.6 A1-A6) and
lookup-join (§2.5 J1-J4); the full relational surface lives behind the
Search Job API the reference calls (``sumologic-app-utils/src/sumologic.py:
96-116``).  Here that surface is first-class: declarative DataFrame plans
that Catalyst compiles to pushed-down scans, broadcast/sort-merge joins and
partial+final aggregates.

Scale notes (100 TB): every query below is a single Catalyst plan — no
driver-side loops, no collect.  Dimension sides of joins (region/nation/
customer at TPC-H proportions) are broadcast explicitly; fact-fact joins
(orders⋈lineitem) shuffle on the join key, which AQE re-plans at runtime
for skew.  All aggregates are expressed with built-ins so map-side partial
aggregation applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query

# Money/avg columns are rounded identically on both sides: sums of ~1e6
# magnitudes carry ~1e-9 float noise, so 2 decimals is hash-stable.


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the canonical scan→filter→agg plan.

    Exercises: predicate pushdown to parquet, column pruning, map-side
    partial aggregation (Catalyst splits sum/avg/count into partial+final
    automatically; cf. SURVEY §2.6 '(absent)' row).
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "filter_project",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total_price
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 1000.0
          AND o_orderdate >= TIMESTAMP '2024-01-05'
    ORDER BY o_orderkey
    LIMIT 100
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter/projection chain (SURVEY §2.4 F1-F3, §2.3 P6-P7 analogues).

    The predicate and the 3-column projection must reach the parquet scan
    (``PushedFilters`` / ``ReadSchema`` in explain) — at 100 TB this is the
    difference between reading 3 columns of a pruned partition set and a
    full-table read.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderstatus") == "O")
            & (F.col("o_totalprice") > 1000.0)
            & (F.col("o_orderdate") >= F.lit("2024-01-05").cast("timestamp"))
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


@query(
    "revenue_topk",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — multi-join + agg + top-k.

    orders⋈lineitem is the one real shuffle, on the natural key.
    ``orderBy().limit()`` lowers to TakeOrderedAndProject — no global
    sort at scale.  No broadcast() hint on customer: it SCALES WITH THE
    FACTS (15 B rows at SF100k), so a hard hint would OOM the driver at
    scale — AQE broadcasts it when the filtered side is actually small
    (it is at test scale) and shuffle-joins otherwise.
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    # Reduce orders by the selective customer filter FIRST, so the big
    # li⋈o shuffle joins against a ~1/5-sized build side.
    o_building = o.join(c, o.o_custkey == c.c_custkey)
    return (
        li.join(o_building, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "region_rollup_join",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           count(*)                  AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY r.r_name, n.n_name
    """,
)
def region_rollup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join through two broadcast dims (SURVEY §2.5 J1/J3 pattern).

    region and nation are the ENI-dimension analogue: tiny, broadcast to
    every executor — zero shuffle on the fact side until the final agg.
    """
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@query(
    "semi_join_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    )
    GROUP BY o_orderpriority
    """,
)
def semi_join_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — left-semi join (SURVEY §2.5 '(absent)' row)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "anti_join_idle_customers",
    oracle="""
    SELECT c.c_nationkey AS nation_key, count(*) AS idle_customers
    FROM customer c
    ANTI JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
)
def anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders — left-anti join + agg."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nation_key"))
        .agg(F.count(F.lit(1)).alias("idle_customers"))
    )


@query(
    "set_ops_nations",
    oracle="""
    WITH cust_n AS (SELECT DISTINCT c_nationkey AS nation_key FROM customer),
         supp_n AS (SELECT DISTINCT s_nationkey AS nation_key FROM supplier)
    SELECT nation_key, 'both' AS membership
      FROM (SELECT * FROM cust_n INTERSECT SELECT * FROM supp_n)
    UNION ALL
    SELECT nation_key, 'customer_only' AS membership
      FROM (SELECT * FROM cust_n EXCEPT SELECT * FROM supp_n)
    """,
)
def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (SURVEY §2.7 '(absent)' row)."""
    cust_n = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nation_key"))
        .distinct()
    )
    supp_n = (
        table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nation_key"))
        .distinct()
    )
    both = cust_n.intersect(supp_n).withColumn("membership", F.lit("both"))
    cust_only = cust_n.exceptAll(supp_n).withColumn(
        "membership", F.lit("customer_only")
    )
    return both.unionAll(cust_only)


@query(
    "rollup_order_status",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*)                         AS n_orders,
           round(sum(o_totalprice), 2)      AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (SURVEY §2.6 '(absent)' row).

    NULL group markers are coalesced to 'ALL' so the hash comparison does
    not depend on engine NULL ordering.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@query(
    "count_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(*)                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def count_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count-distinct in one agg (expands to a grouping-sets plan)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "approx_count_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts_exact,
           TRUE AS sketch_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_count_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ count-distinct — the 100 TB answer to exact distinct.

    The HLL estimate itself is engine-specific, so the oracle checks the
    exact count (computed in the same aggregation pass) plus a boolean
    asserting the sketch landed within 5× its configured 1% rsd — a
    deterministic TRUE on both sides unless the sketch is actually broken.
    """
    li = table(spark, sf_dir, "lineitem")
    # dedup first, sketch second: mixing countDistinct with the HLL in
    # one agg planned an Expand (every input row duplicated per agg
    # branch) and updated the 1%-rsd sketch once per RAW row.  HLL is
    # duplicate-insensitive, so sketching the (flag, part) distinct
    # pairs — which the exact count has to materialize anyway — yields
    # the identical estimate while the expensive sketch update runs on
    # distinct-pair scale, not corpus scale (r14, guide §2.3
    # "aggregate before you shuffle"; measured 3.9 → 1.0 s at sf0.1).
    dedup = li.groupBy("l_returnflag", "l_partkey").agg(F.lit(1))
    # count only non-NULL partkey groups: count(DISTINCT x) ignores
    # NULLs, and so does the HLL sketch — a plain count(*) over the
    # dedup groups would count a (flag, NULL) group that neither side
    # of the comparison sees (NULL-free in TPC-H, but keep the
    # semantics identical to the pre-r14 countDistinct form).
    exact = F.count(F.when(F.col("l_partkey").isNotNull(), 1))
    approx = F.approx_count_distinct("l_partkey", rsd=0.01)
    return dedup.groupBy("l_returnflag").agg(
        exact.alias("n_parts_exact"),
        (F.abs(approx - exact)
         <= F.greatest(F.ceil(exact * 0.05), F.lit(1))
         ).alias("sketch_within_5pct"),
    )


@query(
    "percentile_quantity",
    oracle="""
    SELECT l_linestatus,
           round(quantile_cont(l_quantity, 0.25), 4) AS q25,
           round(quantile_cont(l_quantity, 0.50), 4) AS q50,
           round(quantile_cont(l_quantity, 0.75), 4) AS q75,
           round(min(l_quantity), 2) AS min_qty,
           round(max(l_quantity), 2) AS max_qty
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def percentile_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``).  ``percentile_approx`` is exposed separately
    (rows-only) as the at-scale variant."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q25"),
        F.round(F.expr("percentile(l_quantity, 0.50)"), 4).alias("q50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("q75"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
    )


@query(
    "scalar_function_battery",
    oracle="""
    SELECT n_nationkey,
           upper(n_name) AS uname,
           lower(n_name) || ':' || CAST(n_regionkey AS VARCHAR) AS tag,
           concat_ws('-', n_name, CAST(n_nationkey AS VARCHAR)) AS joined,
           substr(n_name, 1, 3) AS prefix,
           round(pow(2, n_regionkey), 1) AS pow2,
           CAST(length(n_name) AS INT) AS name_len,
           list_sort(string_split(n_name || ' ' || n_name, ' '))[1]
               AS first_tok,
           CAST(len(list_distinct(
               string_split(n_name || ' ' || n_name, ' '))) AS INT)
               AS n_distinct_toks,
           printf('%s#%02d', n_name, n_nationkey) AS formatted
    FROM nation
    """,
)
def scalar_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 scalar-function surface in one oracle-checked pass: case
    mapping, concat/concat_ws, substring, pow, length, split +
    array_distinct/sort_array, format_string — every one a built-in
    Column expression (zero UDFs), matching the reference's per-record
    string/math library."""
    nat = table(spark, sf_dir, "nation")
    toks = F.split(F.concat_ws(" ", "n_name", "n_name"), " ")
    return nat.select(
        "n_nationkey",
        F.upper("n_name").alias("uname"),
        F.concat(F.lower("n_name"), F.lit(":"),
                 F.col("n_regionkey").cast("string")).alias("tag"),
        F.concat_ws("-", "n_name",
                    F.col("n_nationkey").cast("string")).alias("joined"),
        F.substring("n_name", 1, 3).alias("prefix"),
        F.round(F.pow(F.lit(2), F.col("n_regionkey")), 1).alias("pow2"),
        F.length("n_name").alias("name_len"),
        F.sort_array(toks).getItem(0).alias("first_tok"),
        F.size(F.array_distinct(toks)).alias("n_distinct_toks"),
        F.format_string("%s#%02d", F.col("n_name"),
                        F.col("n_nationkey")).alias("formatted"),
    )


@query(
    "approx_percentile_quantity",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_percentile_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-scale sibling of ``percentile_quantity``: quantile-sketch
    ``percentile_approx`` with accuracy 10000 — single-pass, bounded
    memory, mergeable across partitions (exact percentile requires a
    full sort per group at 100 TB).

    Sketch outputs are engine-specific, so — as with the HLL query above —
    the emitted columns are scalars the oracle can reproduce: the group
    count plus booleans asserting each sketch percentile lies within 5%
    (+1 absolute slack) of the exact interpolated percentile computed in
    the same pass.  All cells are hashable scalars (the driver cannot
    canonicalize array columns)."""
    li = table(spark, sf_dir, "lineitem")

    def ok(p: float, name: str):
        approx = F.percentile_approx("l_quantity", p, 10000)
        exact = F.percentile("l_quantity", F.lit(p))
        return (F.abs(approx - exact)
                <= exact * 0.05 + F.lit(1.0)).alias(name)

    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        ok(0.5, "p50_ok"), ok(0.95, "p95_ok"), ok(0.99, "p99_ok"),
    )


@query(
    "pivot_status_matrix",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS F,
           CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS O,
           CAST(count_if(o_orderstatus = 'P') AS BIGINT) AS P,
           round(sum(CASE WHEN o_orderstatus = 'F'
                          THEN o_totalprice END), 2) AS rev_F,
           round(sum(CASE WHEN o_orderstatus = 'O'
                          THEN o_totalprice END), 2) AS rev_O,
           round(sum(CASE WHEN o_orderstatus = 'P'
                          THEN o_totalprice END), 2) AS rev_P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): order counts and revenue by priority × status.

    ``groupBy().pivot(col, values)`` with the value list EXPLICIT — an
    unlisted pivot first runs a distinct-scan job to discover values,
    which is an extra pass over 100 TB and a non-deterministic column
    order; pinned values keep it to ONE scan.  Spark lowers the pivot
    to (priority, status) partial+final aggregation followed by a
    pivotfirst aggregation on priority — two exchanges, but BOTH run
    after map-side combine over the ~15-row key domain, so the shuffled
    volume is partitions×keys rows regardless of input size (the
    CASE-WHEN battery the oracle spells out is the same data flow with
    the statuses unrolled by hand).
    """
    counts = F.count(F.lit(1)).alias("cnt")
    rev = F.round(F.sum("o_totalprice"), 2).alias("rev")
    wide = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(counts, rev)
    )
    # pivot names multi-agg columns "<value>_<alias>"; align to oracle
    # pivot emits NULL for an empty (priority, status) cell; the
    # oracle's count_if emits 0 — coalesce so the engines agree when a
    # fixture generation leaves a cell empty (revenue stays NULL on
    # both sides: SQL sum over zero rows).
    return wide.select(
        "o_orderpriority",
        F.coalesce("F_cnt", F.lit(0)).alias("F"),
        F.coalesce("O_cnt", F.lit(0)).alias("O"),
        F.coalesce("P_cnt", F.lit(0)).alias("P"),
        F.col("F_rev").alias("rev_F"),
        F.col("O_rev").alias("rev_O"),
        F.col("P_rev").alias("rev_P"),
    )
