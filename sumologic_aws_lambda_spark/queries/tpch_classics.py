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
        SELECT avg(c_acctbal) AS cutoff FROM eligible WHERE c_acctbal > 0
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
    cutoff = elig.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("cutoff"))
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
