"""Semantic and plan-shape tests for the classic TPC-H-shaped wave.

The DuckDB oracles pin end-to-end values; these tests pin the edge
semantics the oracles could miss at one scale factor (outer-join filter
placement, anti-join emptiness) and the physical shapes the docstrings
claim (no cartesian products, dims broadcast)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sumologic_aws_lambda_spark import queries as registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def qs():
    return registry.all_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q13_keeps_zero_order_customers(spark, qs):
    """The priority filter lives in the JOIN condition: customers whose
    every order is 1-URGENT must surface in the c_count=0 bucket, and
    every customer appears exactly once across the distribution."""
    from sumologic_aws_lambda_spark.catalog import table

    dist = qs["customer_order_distribution"](spark, SF_DIR)
    total = dist.agg(F.sum("custdist").alias("n")).collect()[0]["n"]
    n_cust = table(spark, SF_DIR, "customer").count()
    assert total == n_cust
    # the urgent-only cohort exists at this SF; assert the 0 bucket when
    # the data provides one, keyed off an independent computation
    c = table(spark, SF_DIR, "customer")
    o = table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    with_match = o.select("o_custkey").distinct().count()
    zero_expected = n_cust - with_match
    zero_row = dist.filter(F.col("c_count") == 0).collect()
    zero_got = zero_row[0]["custdist"] if zero_row else 0
    assert zero_got == zero_expected


def test_q18_every_row_exceeds_threshold(spark, qs):
    rows = qs["large_volume_customers"](spark, SF_DIR).collect()
    assert all(r["sum_qty"] > 250 for r in rows)


def test_q22_excludes_recent_purchasers(spark, qs):
    """Anti-join semantics: no surviving customer may own a post-cutoff
    order."""
    from sumologic_aws_lambda_spark.catalog import table

    out = qs["global_sales_opportunity"](spark, SF_DIR)
    # recompute the surviving customer set with an inner-join probe
    elig = table(spark, SF_DIR, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
    recent = table(spark, SF_DIR, "orders").filter(
        F.col("o_orderdate") >= "1999-01-01").select("o_custkey").distinct()
    overlap_nations = {r["c_nationkey"] for r in elig.join(
        recent, elig.c_custkey == recent.o_custkey).collect()}
    # the query's per-nation counts must not exceed the eligible counts
    # minus the recent purchasers (sanity; values are oracle-pinned)
    got = {r["nation_key"]: r["numcust"] for r in out.collect()}
    per_nation_elig = {
        r["c_nationkey"]: r["n"]
        for r in elig.groupBy("c_nationkey").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    for k, n in got.items():
        assert n <= per_nation_elig[k]
    assert overlap_nations.issubset(set(per_nation_elig))


def test_no_cartesian_and_dims_broadcast(spark, qs):
    for name in ("local_supplier_volume", "volume_shipping",
                 "customer_order_distribution", "large_volume_customers",
                 "global_sales_opportunity"):
        plan = _plan(qs[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
    # Q5/Q7's nation/region gates must ride broadcast joins
    for name in ("local_supplier_volume", "volume_shipping"):
        plan = _plan(qs[name](spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, name


def test_q22_scalar_broadcast_single_row(spark, qs):
    """The avg-balance cutoff joins as a broadcast nested loop over ONE
    row — never a shuffled join."""
    plan = _plan(qs["global_sales_opportunity"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_wave2_no_cartesian(spark, qs):
    for name in ("market_share", "promo_revenue", "top_supplier",
                 "small_quantity_revenue", "disjunctive_predicate_revenue"):
        plan = _plan(qs[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name


def test_top_supplier_no_global_window(spark, qs):
    """The argmax must be scalar-broadcast, not a whole-frame window
    (a global Window would single-partition the supplier frame)."""
    plan = _plan(qs["top_supplier"](spark, SF_DIR))
    assert "Window" not in plan
    rows = qs["top_supplier"](spark, SF_DIR).collect()
    assert len(rows) >= 1
    assert len({r["total_revenue"] for r in rows}) == 1


def test_q19_residues_pushed_to_part_scan(spark, qs):
    """Catalyst must derive the part-side residue of the disjunction
    (brand membership) and push it into the part parquet scan."""
    plan = _plan(qs["disjunctive_predicate_revenue"](spark, SF_DIR))
    assert "p_brand" in plan.split("part.parquet")[0].rsplit("Scan", 1)[-1] \
        or "In(p_brand" in plan


def test_q17_threshold_join_semantics(spark, qs):
    """Every surviving line sits strictly under half its part's average
    quantity — replayed in pure Python."""
    from sumologic_aws_lambda_spark.catalog import table

    li = table(spark, SF_DIR, "lineitem")
    p = table(spark, SF_DIR, "part").filter(F.col("p_brand") == "Brand#11")
    rows = li.join(p, li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice").collect()
    from collections import defaultdict
    per_part = defaultdict(list)
    for r in rows:
        per_part[r["l_partkey"]].append(r)
    n_small, total = 0, 0.0
    for pk, rs in per_part.items():
        cutoff = round(0.5 * sum(x["l_quantity"] for x in rs) / len(rs), 4)
        for x in rs:
            if x["l_quantity"] < cutoff:
                n_small += 1
                total += x["l_extendedprice"]
    got = qs["small_quantity_revenue"](spark, SF_DIR).collect()[0]
    assert got["n_small_lines"] == n_small
    assert abs(got["avg_yearly"] - round(total / 7.0, 2)) < 0.05


# ------------------------------------------------------- completion wave


def test_q2_min_cost_is_argmin_per_part(spark, qs):
    """Every emitted supplier carries its part's exact minimum balance,
    and a part never appears with two different balances."""
    rows = qs["min_cost_supplier"](spark, SF_DIR).collect()
    per_part = {}
    for r in rows:
        per_part.setdefault(r["p_partkey"], set()).add(r["acctbal"])
    assert all(len(v) == 1 for v in per_part.values())
    plan = _plan(qs["min_cost_supplier"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the argmin is a decorrelated aggregate+join, never a global window
    assert "Window" not in plan


def test_q21_late_pairs_are_sole_late_supplier(spark, qs):
    """Recompute the per-order existentials independently: a counted
    supplier must share its order with another supplier, and no OTHER
    supplier on that order may be late."""
    from sumologic_aws_lambda_spark.catalog import table

    o = table(spark, SF_DIR, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, SF_DIR, "lineitem")
    m = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey",
                (F.col("l_shipdate")
                 > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
                .alias("late"))
        .collect()
    )
    by_order = {}
    for r in m:
        by_order.setdefault(r["l_orderkey"], []).append(
            (r["l_suppkey"], r["late"]))
    expect = {}
    for lines in by_order.values():
        supps = {s for s, _ in lines}
        late = {s for s, is_late in lines if is_late}
        if len(supps) > 1 and len(late) == 1:
            s = next(iter(late))
            expect[s] = expect.get(s, 0) + 1
    got = {
        r["s_name"]: r["numwait"]
        for r in qs["waiting_orders_suppliers"](spark, SF_DIR).collect()
    }
    supp_names = {r["s_suppkey"]: r["s_name"]
                  for r in table(spark, SF_DIR, "supplier").collect()}
    assert got == {supp_names[s]: n for s, n in expect.items()}


def test_q20_year_share_beats_global_share(spark, qs):
    """Emitted suppliers must be exactly the ASIA members of the
    independently-recomputed above-global-share set (the scalar cut is
    ~half-selective pre-gate, so the pre-gate set is never empty; the
    tiny sf0.001 ASIA slice may legitimately be)."""
    from sumologic_aws_lambda_spark.catalog import table

    li = table(spark, SF_DIR, "lineitem")
    p = table(spark, SF_DIR, "part").filter(F.col("p_name").contains("bolt"))
    in96 = (F.col("l_shipdate") >= "1996-01-01") \
        & (F.col("l_shipdate") < "1997-01-01")
    agg = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.when(in96, F.col("l_quantity")).otherwise(0.0)), 2)
             .alias("q96"),
             F.round(F.sum("l_quantity"), 2).alias("qt"))
        .collect()
    )
    cut = round(round(sum(r["q96"] for r in agg), 2)
                / round(sum(r["qt"] for r in agg), 2), 6)
    above = {r["l_suppkey"] for r in agg
             if round(r["q96"] / r["qt"], 6) > cut}
    assert above, "pre-gate scalar cut degenerated to zero suppliers"
    n = table(spark, SF_DIR, "nation")
    r_ = table(spark, SF_DIR, "region").filter(F.col("r_name") == "ASIA")
    s = table(spark, SF_DIR, "supplier")
    asia = {row["s_suppkey"] for row in
            s.join(n, s.s_nationkey == n.n_nationkey)
            .join(r_, n.n_regionkey == r_.r_regionkey)
            .select("s_suppkey").collect()}
    got = {r["s_suppkey"]
           for r in qs["excess_supply_candidates"](spark, SF_DIR).collect()}
    assert got == (above & asia)


def test_q16_excludes_negative_balance_suppliers(spark, qs):
    """A (brand,type,size) group served ONLY by negative-balance
    suppliers must not appear at all."""
    from sumologic_aws_lambda_spark.catalog import table

    plan = _plan(qs["supplier_part_variety"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    bad = {r["s_suppkey"]
           for r in table(spark, SF_DIR, "supplier")
           .filter(F.col("s_acctbal") < 0).collect()}
    # independent recount for one emitted group
    rows = qs["supplier_part_variety"](spark, SF_DIR).limit(1).collect()
    if rows:
        g = rows[0]
        li = table(spark, SF_DIR, "lineitem")
        p = table(spark, SF_DIR, "part").filter(
            (F.col("p_brand") == g["p_brand"])
            & (F.col("p_type") == g["p_type"])
            & (F.col("p_size") == g["p_size"]))
        supps = {r["l_suppkey"] for r in
                 li.join(p, li.l_partkey == p.p_partkey)
                 .select("l_suppkey").distinct().collect()}
        assert len(supps - bad) == g["supplier_cnt"]


def test_q10_top20_is_take_ordered(spark, qs):
    """A LIMIT over an ORDER BY must lower to TakeOrderedAndProject —
    a global Sort would single-partition the customer frame at scale."""
    plan = _plan(qs["returned_item_report"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Sort [revenue" not in plan


def test_q12_counts_partition_exactly(spark, qs):
    """high + low must equal the late-line total per status — the
    conditional arms are complements, no line dropped or double-counted."""
    from sumologic_aws_lambda_spark.catalog import table

    rows = qs["late_shipment_priority"](spark, SF_DIR).collect()
    o = table(spark, SF_DIR, "orders")
    li = table(spark, SF_DIR, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01"))
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus").count().collect()
    )
    totals = {r["l_linestatus"]: r["count"] for r in late}
    for r in rows:
        assert r["high_line_count"] + r["low_line_count"] \
            == totals[r["l_linestatus"]]
