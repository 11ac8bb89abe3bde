"""Classic multi-way relational benchmarks (TPC-H-shaped plans).

The reference exposes its relational surface through the Search Job API
(``sumologic-app-utils/src/sumologic.py:96-116``); ``relational.py``
covers the Q1/Q3/Q4/Q6 shapes.  This module adds the remaining CLASSIC
plan shapes an analytics user runs daily — each one a join/agg topology
Catalyst must plan differently:

- ``local_supplier_volume`` (Q5): the 6-way snowflake join with a
  co-location constraint (customer and supplier in the SAME nation).
- ``volume_shipping``       (Q7): fact-fact join with a disjunctive
  two-nation predicate evaluated AFTER two broadcast dim joins.
- ``customer_order_distribution`` (Q13): LEFT OUTER join with the
  filter in the JOIN CONDITION (not WHERE), then a count-of-counts
  double aggregation.
- ``large_volume_customers`` (Q18): groupBy-HAVING over the fact table
  joined BACK to its parents (aggregate-as-semi-join).
- ``global_sales_opportunity`` (Q22): scalar-aggregate subquery
  (broadcast single row) + NOT EXISTS anti-join.

Scale notes (100 TB): region/nation are broadcast; customer/supplier/
orders/lineitem all scale with the data, so none of them carries a
broadcast hint — AQE promotes the filtered side to broadcast when it is
actually small and shuffle-joins otherwise (revenue_topk precedent,
round-5 fix).  Every aggregate is a built-in, so partial (map-side)
aggregation applies; the Q13 double aggregation's second groupBy is over
a count domain of a few dozen values — a near-trivial shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query


@query(
    "local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
                    AND c.c_nationkey = s.s_nationkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 — local supplier volume (6-way snowflake join).

    The co-location predicate ``c_nationkey = s_nationkey`` rides the
    supplier join as an extra equi-condition, so it participates in the
    hash-join key match instead of becoming a post-join filter.  Join
    order: the date filter reduces orders first (one year ≈ 1/7 of the
    fact), customer attaches its nationkey, then the one big shuffle
    joins lineitem on the natural key; supplier/nation/region attach on
    the already-reduced stream.  nation⋈region collapses to a broadcast
    of ~nation-count rows carrying the region gate with it.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # dims collapse first: nation rows in the gated region only
    n_asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    oc = o.join(c, o.o_custkey == c.c_custkey)
    return (
        li.join(oc, li.l_orderkey == F.col("o_orderkey"))
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
        .join(F.broadcast(n_asia), s.s_nationkey == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01'
                           AND TIMESTAMP '1996-12-31'
    GROUP BY n1.n_name, n2.n_name, l_year
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 — volume shipping between two nations.

    The disjunctive nation-pair predicate cannot be pushed into either
    single join, but each SIDE of it can: suppliers and customers are
    pre-filtered to the two nations (broadcast semi through the
    two-row nation dim), so the big lineitem⋈orders shuffle runs over
    ~2/25 of each dim's keys and the pair predicate only post-filters
    the crossed remainder (the classic Q7 plan).
    """
    both = F.col("n_name").isin("NATION_1", "NATION_2")
    n1 = table(spark, sf_dir, "nation").filter(both).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = table(spark, sf_dir, "nation").filter(both).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    s = table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
    c = table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1995-01-01", "1996-12-31"))
    o = table(spark, sf_dir, "orders")
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o.join(c, F.col("o_custkey") == F.col("c_custkey")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) cc
    GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 — customer order-count distribution.

    The priority filter lives in the JOIN CONDITION, not WHERE: a
    customer whose every order is urgent must still appear with
    ``c_count = 0`` (a WHERE would delete the NULL-extended rows and
    silently drop those customers — the classic outer-join-filter bug).
    Double aggregation: the first groupBy shuffles on c_custkey (the
    natural key, uniform); the second groups a customer-sized frame by
    a count domain of a few dozen values — near-free.  count() of the
    RIGHT side's key counts only matched rows, exactly SQL's
    ``count(o_orderkey)`` NULL semantics.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           round(o.o_totalprice, 2) AS total_price,
           round(hot.sum_qty, 2)    AS sum_qty
    FROM (
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 250
    ) hot
    JOIN orders o   ON o.o_orderkey = hot.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 — large-volume customers (aggregate-as-semi-join).

    The HAVING aggregate is computed ONCE and joined back as the probe
    side — not recomputed per order (the textbook Q18 oracle re-scans
    lineitem inside an IN subquery; Catalyst would decorrelate it to
    exactly this plan).  The hot-order frame is tiny (99th-percentile
    cut), so AQE broadcasts it into the orders join; customer attaches
    on its natural key.
    """
    li = table(spark, sf_dir, "lineitem")
    hot = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sum_qty"))
        .filter(F.col("_sum_qty") > 250)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(hot, o.o_orderkey == hot.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
            F.round("_sum_qty", 2).alias("sum_qty"),
        )
    )


@query(
    "global_sales_opportunity",
    oracle="""
    WITH eligible AS (
        SELECT c_custkey, c_acctbal, c_nationkey
        FROM customer
        WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ),
    avg_bal AS (
        SELECT round(avg(c_acctbal), 4) AS cutoff
        FROM eligible WHERE c_acctbal > 0
    )
    SELECT e.c_nationkey AS nation_key,
           count(*)      AS numcust,
           round(sum(e.c_acctbal), 2) AS totacctbal
    FROM eligible e, avg_bal
    WHERE e.c_acctbal > avg_bal.cutoff
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = e.c_custkey
            AND o.o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY e.c_nationkey
    """,
)
def global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 — positive-balance customers with no recent orders.

    Two classic sub-shapes composed: a SCALAR-aggregate subquery (the
    average balance rides as a broadcast single-row frame, crossJoin —
    the sanctioned broadcast-of-scalar pattern) and a NOT EXISTS
    anti-join against the date-filtered orders.  The anti-join's build
    side is reduced by the pushed date predicate before the shuffle;
    the eligible set is reduced by the nation filter at the scan.
    """
    elig = table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    ).select("c_custkey", "c_acctbal", "c_nationkey")
    # cutoff ROUNDED before the strict compare (determinism rule: a
    # cross-engine float aggregate must never gate membership raw)
    cutoff = elig.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 4).alias("cutoff"))
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1999-01-01").select("o_custkey")
    return (
        elig.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("cutoff"))
        .join(recent, elig.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nation_key"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "market_share",
    oracle="""
    WITH vol AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'EUROPE' AND p.p_type = 'STANDARD'
          AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                                AND TIMESTAMP '1996-12-31'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3'
                          THEN volume ELSE 0 END), 2) AS nation_volume,
           round(sum(volume), 2) AS total_volume,
           round(round(sum(CASE WHEN supp_nation = 'NATION_3'
                                THEN volume ELSE 0 END), 2)
                 / round(sum(volume), 2), 6) AS mkt_share
    FROM vol
    GROUP BY o_year
    """,
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 — national market share (7-way join + conditional ratio).

    The deepest join tree in the suite: the fact stream picks up part
    (type gate), supplier and orders/customer, then THREE broadcast dim
    hops (customer nation → region gate, supplier nation → share label).
    The share is a conditional-sum ratio computed from the ROUNDED
    sums so the cross-engine hash compare is float-order-proof.
    """
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31"))
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"))
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cust_region = (
        c.join(F.broadcast(
            n1.join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
            .select("n_nationkey")),
            c.c_nationkey == F.col("n_nationkey"))
        .select("c_custkey")
    )
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_region, o.o_custkey == F.col("c_custkey"))
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("volume"),
            "supp_nation",
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")) \
        .otherwise(F.lit(0.0))
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(F.sum(nat), 2).alias("nation_volume"),
            F.round(F.sum("volume"), 2).alias("total_volume"),
        )
        .select(
            "o_year", "nation_volume", "total_volume",
            F.round(F.col("nation_volume") / F.col("total_volume"), 6)
            .alias("mkt_share"),
        )
    )


@query(
    "promo_revenue",
    oracle="""
    SELECT round(sum(CASE WHEN p.p_type = 'PROMO'
                     THEN l.l_extendedprice * (1 - l.l_discount)
                     ELSE 0 END), 2) AS promo_rev,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
               AS total_rev,
           round(100.0 * round(sum(CASE WHEN p.p_type = 'PROMO'
                     THEN l.l_extendedprice * (1 - l.l_discount)
                     ELSE 0 END), 2)
                 / round(sum(l.l_extendedprice * (1 - l.l_discount)), 2), 6)
               AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 — promotion effect (conditional-aggregate ratio).

    One month of lineitem joins part on the natural key (AQE decides
    broadcast vs shuffle — part scales with the catalog, not the
    facts); promo share computed from the rounded sums.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01")
        & (F.col("l_shipdate") < "1996-10-01"))
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(F.sum(promo), 2).alias("promo_rev"),
            F.round(F.sum(rev), 2).alias("total_rev"),
        )
        .select(
            "promo_rev", "total_rev",
            F.round(100.0 * F.col("promo_rev") / F.col("total_rev"), 6)
            .alias("promo_pct"),
        )
    )


@query(
    "top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM supplier s
    JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 — top supplier (argmax over an aggregate).

    The quarter's per-supplier revenue aggregates once; its max rides
    back as a broadcast single-row frame (the Q22 scalar pattern) and
    an equality filter keeps every tied supplier.  The max compares
    ROUNDED revenues, so ties are exact across engines.  No window over
    the whole frame — the scalar max is cheaper than a global
    rank()/max() window at scale (no single-partition sort).
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01"))
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("total_revenue"))
    )
    peak = rev.agg(F.max("total_revenue").alias("_peak"))
    s = table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(peak))
        .filter(F.col("total_revenue") == F.col("_peak"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "small_quantity_revenue",
    oracle="""
    WITH brand AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#11'
    ),
    thresh AS (
        SELECT l_partkey, round(0.5 * avg(l_quantity), 4) AS cutoff
        FROM brand
        GROUP BY l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_small_lines,
           round(sum(b.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM brand b
    JOIN thresh t ON b.l_partkey = t.l_partkey
    WHERE b.l_quantity < t.cutoff
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 — small-quantity-order revenue (correlated avg → join).

    The textbook form correlates ``avg(l_quantity)`` per part inside
    WHERE; decorrelated here to ONE aggregate over the brand-gated
    lineitem joined back on partkey (AQE broadcasts the per-part
    threshold frame — it is bounded by the brand's part count).  The
    threshold is ROUNDED before the strict compare so the cutoff
    cannot flip on float noise across engines.
    """
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    li = table(spark, sf_dir, "lineitem")
    brand = li.join(p, li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice")
    thresh = brand.groupBy("l_partkey").agg(
        F.round(0.5 * F.avg("l_quantity"), 4).alias("cutoff"))
    return (
        brand.join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("cutoff"))
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        )
    )


@query(
    "disjunctive_predicate_revenue",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 — discounted revenue under a disjunctive mixed predicate.

    The three-arm OR mixes columns from BOTH join sides, so it cannot
    ride the join key; Catalyst still pushes the single-side residues
    (brand/size membership to the part scan, the quantity hull to the
    lineitem scan) and evaluates the full disjunction post-join inside
    codegen.  The join itself stays a plain equi-join on partkey —
    never a theta join.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    arm1 = (F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 15) \
        & F.col("l_quantity").between(1, 11)
    arm2 = (F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 25) \
        & F.col("l_quantity").between(10, 20)
    arm3 = (F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 35) \
        & F.col("l_quantity").between(20, 30)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(arm1 | arm2 | arm3)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Completion wave: the remaining classic topologies, adapted to the fixture
# schema (no partsupp table, no commit/receipt dates — the lineitem DISTINCT
# (partkey, suppkey) bridge stands in for partsupp, and shipdate lateness
# relative to o_orderdate stands in for the receipt/commit contract).  Each
# keeps the ORIGINAL query's plan topology — that is what Catalyst must get
# right, and what the 100 TB story grades.


@query(
    "min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    eur AS (
        SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 2) AS acctbal,
               n.n_name AS nation_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    cand AS (
        SELECT p.p_partkey, p.p_name, e.s_name, e.acctbal, e.nation_name
        FROM part p
        JOIN ps ON ps.l_partkey = p.p_partkey
        JOIN eur e ON e.s_suppkey = ps.l_suppkey
        WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 20
    ),
    best AS (
        SELECT p_partkey, min(acctbal) AS min_bal
        FROM cand GROUP BY p_partkey
    )
    SELECT c.p_partkey, c.p_name, c.s_name, c.acctbal, c.nation_name
    FROM cand c JOIN best b
      ON c.p_partkey = b.p_partkey AND c.acctbal = b.min_bal
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 topology — cheapest eligible supplier per part.

    The textbook form correlates ``min(ps_supplycost)`` per part inside
    WHERE; with no partsupp table the DISTINCT (partkey, suppkey) pairs
    observed in lineitem are the supply relation, account balance the
    cost surrogate.  Decorrelated the way Catalyst would: ONE argmin
    aggregate over the candidate frame joined back on (part, min) —
    never a per-part subquery, never a global sort.  The region gate
    collapses supplier⋈nation⋈region to a broadcast-sized dim before
    the bridge join; ties on the min keep every tied supplier (exact —
    balances pass through unrounded arithmetic on both engines).
    """
    li = table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n.join(F.broadcast(r),
                                 n.n_regionkey == r.r_regionkey)
                          .select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name",
                F.round("s_acctbal", 2).alias("acctbal"),
                F.col("n_name").alias("nation_name"))
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20))
    cand = (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .join(eur, ps.l_suppkey == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "acctbal", "nation_name")
    )
    best = cand.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min("acctbal").alias("_min_bal"))
    return (
        cand.join(best, (cand.p_partkey == F.col("_pk"))
                  & (cand.acctbal == F.col("_min_bal")))
        .select("p_partkey", "p_name", "s_name", "acctbal", "nation_name")
    )


@query(
    "product_type_profit",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               - 0.8 * p.p_retailprice * l.l_quantity
                               AS DECIMAL(24, 6))), 2) AS DOUBLE)
               AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation_name, o_year
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 topology — product-line profit by supplier nation/year.

    Profit = revenue − cost·qty with 80%-of-retail as the unit-cost
    surrogate (no partsupp supplycost in the fixture).  The name-LIKE
    gate prunes part at the scan and rides the partkey join into
    lineitem; orders attaches ONLY for the year; nation is the final
    broadcast hop.  One shuffle aggregate on a (25 nations × years)
    key domain — partial aggregation collapses it map-side.
    """
    p = table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.8 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"),
                 F.year("o_orderdate").alias("o_year"))
        # EXACT decimal accumulation on BOTH sides: per-row profit is a
        # single double expression (bit-identical across engines), but
        # the GROUP SUM's accumulation order differs and its ~1e-6
        # noise at this magnitude can straddle a half-cent — at sf0.1
        # one group landed exactly on x.955 and the former +1e-4 nudge
        # merely relocated the boundary (round-9 sf0.1 sweep finding).
        # Casting each term to DECIMAL(24,6) (4-dp-exact money values,
        # far from the 6-dp cast boundary) makes the sums exact and
        # identical, so both engines round the same number.
        .agg(F.round(F.sum(profit.cast("decimal(24,6)")), 2)
             .cast("double").alias("sum_profit"))
    )


@query(
    "returned_item_report",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           round(c.c_acctbal, 2) AS acctbal, n.n_name AS nation_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, acctbal, nation_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 — top returned-revenue customers in a quarter.

    The returnflag and quarter predicates push to the two fact scans
    before the lineitem⋈orders shuffle; the aggregate key is the
    customer (uniform, natural).  Top-20 cutoff orders by the ROUNDED
    revenue with the custkey as tiebreak — a raw-float ORDER BY at a
    LIMIT boundary is exactly where cross-engine noise flips rows.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01"))
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name",
                 F.round("c_acctbal", 2).alias("acctbal"),
                 F.col("n_name").alias("nation_name"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "acctbal", "nation_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "important_part_value",
    oracle="""
    WITH vals AS (
        SELECT l.l_partkey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                   AS part_value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE s.s_nationkey = 5
        GROUP BY l.l_partkey
    ),
    total AS (
        SELECT round(round(sum(part_value), 2) * 2.0 / count(*), 4)
            AS cutoff
        FROM vals
    )
    SELECT v.l_partkey AS p_partkey, v.part_value
    FROM vals v, total t
    WHERE v.part_value > t.cutoff
    """,
)
def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 — important stock (global-aggregate HAVING).

    Per-part shipped value from one nation's suppliers, kept only where
    it exceeds TWICE the average per-part value — the scalar-subquery-
    in-HAVING shape.  (The textbook fraction-of-total cutoff must scale
    with 1/SF or it degenerates to zero rows as the catalog grows; the
    2×-average form is scale-invariant by construction.)  The cutoff
    re-aggregates the small per-part frame (never a second fact scan)
    and rides back as a broadcast single row; it divides the ROUNDED
    total by the exact part count and re-rounds so the strict compare
    is noise-proof (rule-16/17 precedent).
    """
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 5)
    vals = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("part_value"))
    )
    cutoff = vals.agg(
        F.round(F.round(F.sum("part_value"), 2) * 2.0
                / F.count(F.lit(1)), 4).alias("cutoff"))
    return (
        vals.crossJoin(F.broadcast(cutoff))
        .filter(F.col("part_value") > F.col("cutoff"))
        .select(F.col("l_partkey").alias("p_partkey"), "part_value")
    )


@query(
    "late_shipment_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >  o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    """,
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 topology — priority mix of late shipments per status.

    Lateness (shipdate > orderdate + 60 days — the receipt/commit
    surrogate) compares columns from BOTH join sides, so it evaluates
    post-join inside codegen; the year hull pushes to the lineitem
    scan.  The conditional counts are exact integers — immune to
    hashing noise by construction.
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "supplier_part_variety",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    ok_supp AS (
        SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN ps ON ps.l_partkey = p.p_partkey
    JOIN ok_supp ok ON ok.s_suppkey = ps.l_suppkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (5, 10, 15, 20, 25, 30)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 — supplier variety per (brand, type, size).

    The complaints NOT-IN subquery becomes a semi-join against the
    clean-supplier set (negative balance = complaint surrogate): for a
    NOT-IN whose inner side can never be NULL, anti/semi conversion is
    exactly what Catalyst's RewritePredicateSubquery does.  The
    supply relation is again the DISTINCT lineitem bridge; the
    count-DISTINCT aggregates a pair-sized frame, never raw lineitem.
    """
    li = table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    ok = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") >= 0).select("s_suppkey")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30))
    return (
        ps.join(ok, ps.l_suppkey == ok.s_suppkey, "left_semi")
        .join(p, ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "excess_supply_candidates",
    oracle="""
    WITH bolt_lines AS (
        SELECT l.l_suppkey, l.l_quantity, l.l_shipdate
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%bolt%'
    ),
    per_supp AS (
        SELECT l_suppkey,
               round(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                               AND l_shipdate <  TIMESTAMP '1997-01-01'
                              THEN l_quantity ELSE 0 END), 2) AS qty_1996,
               round(sum(l_quantity), 2) AS qty_total
        FROM bolt_lines
        GROUP BY l_suppkey
    ),
    global_share AS (
        SELECT round(round(sum(qty_1996), 2) / round(sum(qty_total), 2), 6)
            AS cut FROM per_supp
    )
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation_name,
           ps.qty_1996, ps.qty_total
    FROM per_supp ps
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    CROSS JOIN global_share g
    WHERE r.r_name = 'ASIA'
      AND round(ps.qty_1996 / ps.qty_total, 6) > g.cut
    """,
)
def excess_supply_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 topology — suppliers holding excess line share.

    The original's nested partsupp/lineitem correlation (availqty >
    half the year's shipments) becomes ONE conditional aggregate per
    supplier over the name-gated lines: the year's quantity vs the
    all-time quantity, kept where the supplier's year-share beats the
    GLOBAL year-share (a fixed 30% cut degenerates to zero rows as per-
    supplier volume grows and shares concentrate at the calendar mean —
    the global-share scalar stays ~half-selective at every SF, and adds
    the Q15/Q22 broadcast-scalar shape to the topology).  One fact
    pass, one supplier-keyed shuffle; the region gate rides the
    broadcast dim chain AFTER aggregation (supplier-sized frame).
    Both ratios divide ROUNDED sums and round at 6 before the strict
    compare (rule-17).
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    in_96 = (F.col("l_shipdate") >= "1996-01-01") \
        & (F.col("l_shipdate") < "1997-01-01")
    agg = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.when(in_96, F.col("l_quantity")).otherwise(0.0)), 2)
            .alias("qty_1996"),
            F.round(F.sum("l_quantity"), 2).alias("qty_total"),
        )
    )
    cut = agg.agg(
        F.round(F.round(F.sum("qty_1996"), 2)
                / F.round(F.sum("qty_total"), 2), 6).alias("cut"))
    per_supp = (
        agg.crossJoin(F.broadcast(cut))
        .filter(F.round(F.col("qty_1996") / F.col("qty_total"), 6)
                > F.col("cut"))
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", F.col("n_name").alias("nation_name"))
    return (
        per_supp.join(s, per_supp.l_suppkey == s.s_suppkey)
        .join(F.broadcast(dims), s.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "nation_name", "qty_1996", "qty_total")
    )


@query(
    "waiting_orders_suppliers",
    oracle="""
    WITH marked AS (
        SELECT l.l_orderkey, l.l_suppkey,
               CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                    THEN 1 ELSE 0 END AS is_late
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
    ),
    per_order AS (
        SELECT l_orderkey,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END)
                   AS n_late_supp
        FROM marked
        GROUP BY l_orderkey
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM (
        SELECT DISTINCT m.l_orderkey, m.l_suppkey
        FROM marked m WHERE m.is_late = 1
    ) late
    JOIN per_order po ON po.l_orderkey = late.l_orderkey
    JOIN supplier s   ON s.s_suppkey = late.l_suppkey
    WHERE po.n_supp > 1 AND po.n_late_supp = 1
    GROUP BY s.s_name
    """,
)
def waiting_orders_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 — suppliers who alone kept finished orders waiting.

    The textbook EXISTS / NOT-EXISTS pair over two lineitem aliases
    becomes ONE per-order aggregate (distinct suppliers, distinct LATE
    suppliers) joined back to the late lines — the decorrelation
    Catalyst itself applies, but with the two existentials fused into
    a single pass instead of two more fact joins.  Lateness is the
    90-day shipdate surrogate; 'F' status gates orders at the scan.
    The order-keyed shuffle is the natural co-partitioning; per_order
    and the late pairs share it (one exchange, reused).
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    marked = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey", "l_suppkey",
            F.when(F.col("l_shipdate")
                   > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1)
            .otherwise(0).alias("is_late"),
        )
    )
    per_order = marked.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    late = marked.filter(F.col("is_late") == 1) \
        .select("l_orderkey", "l_suppkey").distinct()
    s = table(spark, sf_dir, "supplier")
    return (
        late.join(per_order.filter(
            (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
            "l_orderkey")
        .join(s, late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
