"""Behavior-analytics wave: funnel, retention, transitions, PageRank,
chi-square, range partitioning — value checks on the sf0.001 fixture
plus the plan shapes the 100 TB story depends on."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sumologic_aws_lambda_spark import queries as registry
from sumologic_aws_lambda_spark.operators.graph import (
    pagerank,
    transition_edges,
    transition_probabilities,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return registry.all_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- funnel

def test_funnel_stage_times_strictly_ordered(spark, qs):
    rows = qs["event_funnel_conversion"](spark, SF_DIR).collect()
    assert rows, "fixture has signups"
    for r in rows:
        if r.click_s != -1:
            assert r.click_s >= r.signup_s
        if r.purchase_s != -1:
            assert r.click_s != -1, "purchase requires a prior click"
            assert r.purchase_s >= r.click_s


def test_funnel_counts_monotone(spark, qs):
    df = qs["event_funnel_conversion"](spark, SF_DIR)
    agg = df.agg(
        F.count(F.lit(1)).alias("s"),
        F.sum((F.col("click_s") != -1).cast("int")).alias("c"),
        F.sum((F.col("purchase_s") != -1).cast("int")).alias("p"),
    ).first()
    assert agg.s >= agg.c >= agg.p


# ------------------------------------------------------------- retention

def test_retention_offsets_start_at_zero(spark, qs):
    rows = qs["retention_cohorts"](spark, SF_DIR).collect()
    assert rows
    by_cohort: dict[str, list] = {}
    for r in rows:
        assert r.offset_weeks >= 0
        by_cohort.setdefault(r.cohort_week, []).append(r)
    for cohort, rs in by_cohort.items():
        offs = {r.offset_weeks for r in rs}
        assert 0 in offs, f"cohort {cohort} missing week-0 row"
        # Week 0 has every cohort member, so it is the max count.
        week0 = next(r.n_users for r in rs if r.offset_weeks == 0)
        assert all(r.n_users <= week0 for r in rs)


# ----------------------------------------------------------- transitions

def test_transition_probabilities_row_stochastic(spark, qs):
    rows = qs["event_markov_transitions"](spark, SF_DIR).collect()
    assert rows
    by_src: dict[str, float] = {}
    for r in rows:
        assert r.n_transitions > 0
        by_src[r.src] = by_src.get(r.src, 0.0) + r.p
    for src, total in by_src.items():
        assert math.isclose(total, 1.0, abs_tol=1e-4), (src, total)


def test_transition_edges_count_conservation(spark):
    from sumologic_aws_lambda_spark.catalog import table
    ev = table(spark, SF_DIR, "events")
    edges = transition_edges(ev)
    total_edges = edges.agg(F.sum("n_transitions")).first()[0]
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # Each user contributes (events - 1) transitions.
    assert total_edges == n_events - n_users


# -------------------------------------------------------------- pagerank

def test_pagerank_sums_to_one(spark, qs):
    rows = qs["event_pagerank"](spark, SF_DIR).collect()
    assert rows
    assert math.isclose(sum(r.rank for r in rows), 1.0, abs_tol=1e-3)
    assert all(r.rank > 0 for r in rows)


def test_pagerank_uniform_on_symmetric_graph(spark):
    # A 3-cycle with equal weights must stay uniform at 1/3 each.
    edges = spark.createDataFrame(
        [("a", "b", 5), ("b", "c", 5), ("c", "a", 5)],
        "src string, dst string, n_transitions long",
    )
    ranks = {r.node: r.rank for r in pagerank(edges, iterations=4).collect()}
    for v in ranks.values():
        assert math.isclose(v, 1.0 / 3.0, abs_tol=1e-9)


def test_pagerank_dangling_mass_conserved(spark):
    # b has no out-edges: its mass redistributes, total stays 1.
    edges = spark.createDataFrame(
        [("a", "b", 1)], "src string, dst string, n_transitions long"
    )
    ranks = pagerank(edges, iterations=3).collect()
    assert math.isclose(sum(r.rank for r in ranks), 1.0, abs_tol=1e-9)


def test_pagerank_iterates_on_broadcast_joins(spark):
    from sumologic_aws_lambda_spark.catalog import table
    ev = table(spark, SF_DIR, "events")
    plan = _plan(pagerank(transition_edges(ev), iterations=2))
    # Iteration joins over the collapsed graph must all broadcast —
    # a SortMergeJoin would mean we are shuffling the graph per step.
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------------------ chi2

def test_chi2_expected_totals_match_observed(spark, qs):
    rows = qs["chi2_event_weekday"](spark, SF_DIR).collect()
    assert rows
    n_obs = sum(r.observed for r in rows)
    n_exp = sum(r.expected for r in rows)
    assert math.isclose(n_obs, n_exp, rel_tol=1e-3)
    for r in rows:
        assert 0 <= r.dow <= 6
        assert r.chi2_cell >= 0


# ---------------------------------------------------- range partitioning

def test_range_buckets_contiguous_and_complete(spark, qs):
    rows = sorted(
        qs["range_partition_plan"](spark, SF_DIR).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.bucket for r in rows] == list(range(8))
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo, "bucket ranges must be disjoint and ordered"
    # Exact percentile boundaries → near-equal bucket populations.
    counts = [r.n_rows for r in rows]
    assert max(counts) - min(counts) <= max(2, sum(counts) // 4)


def test_range_assignment_is_shuffle_free(spark, qs):
    plan = _plan(qs["range_partition_plan"](spark, SF_DIR))
    # One exchange for the boundary agg, one for the final 8-key audit
    # groupBy; bucket assignment itself must not add a third.
    assert plan.count("Exchange") <= 3
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------------- trigrams

def test_path_trigrams_shape_and_order(spark, qs):
    rows = qs["event_path_trigrams"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert len(r.path.split(">")) == 3
        assert r.n > 0


# ------------------------------------------------------ weighted sample

def test_weighted_reservoir_deterministic_and_bounded(spark, qs):
    a = qs["weighted_reservoir_sample"](spark, SF_DIR).collect()
    b = qs["weighted_reservoir_sample"](spark, SF_DIR).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    assert len(a) == 25
    for r in a:
        assert 0.0 <= r.es_key <= 1.0
    keys = [r.es_key for r in a]
    assert keys == sorted(keys, reverse=True)


def test_weighted_sample_favors_heavy_docs(spark, qs):
    from sumologic_aws_lambda_spark.catalog import table
    from pyspark.sql import functions as F
    sampled = qs["weighted_reservoir_sample"](spark, SF_DIR)
    corpus_avg = (
        table(spark, SF_DIR, "documents").agg(F.avg("n_chars")).first()[0]
    )
    sample_avg = sampled.agg(F.avg("n_chars")).first()[0]
    # Weighting by n_chars must pull the sample mean above the corpus
    # mean (A-ES property; deterministic here, so no flake).
    assert sample_avg > corpus_avg


# --------------------------------------------------------- split audit

def test_split_leakage_audit_contract(spark, qs):
    rows = qs["split_leakage_audit"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_doc_splits <= 3
        assert r.group_split in {"train", "val", "test"}
        assert r.leaks_across_splits == (r.n_doc_splits > 1)
    # The audit's reason to exist: doc-level hashing leaks for any
    # multi-doc source; at least one source must show it.
    assert any(r.leaks_across_splits for r in rows)


# ----------------------------------------------------------- wave 3

def test_trend_slopes_contract(spark, qs):
    rows = qs["trend_slopes_by_type"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n > 0
        assert 0.0 <= r.r2 <= 1.0
        # Synthetic values are ~trendless: the fitted line must pass
        # near the data, i.e. intercept is finite and slope is small
        # relative to the value range.
        assert abs(r.slope_per_day) < 1e3


def test_mad_outliers_bounded(spark, qs):
    rows = qs["mad_outlier_counts"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.mad >= 0
        assert 0 <= r.n_outliers <= r.n
        # A 3-sigma-equivalent fence flags a small tail, never the bulk.
        assert r.n_outliers < r.n * 0.2


def test_mad_is_single_pass_no_window(spark, qs):
    plan = _plan(qs["mad_outlier_counts"](spark, SF_DIR))
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_pagerank_deep_iteration_plans_stay_linear(spark):
    # Without the per-iteration lineage cut the plan doubles each pass
    # (2^n leaves) and 12 iterations would hang analysis.
    import time
    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 1), ("c", "a", 3), ("b", "a", 1)],
        "src string, dst string, n_transitions long",
    )
    t0 = time.time()
    rows = pagerank(edges, iterations=12).collect()
    assert time.time() - t0 < 60
    assert abs(sum(r.rank for r in rows) - 1.0) < 1e-9


def test_seasonal_residuals_contract(spark, qs):
    rows = qs["seasonal_residual_outliers"](spark, SF_DIR).collect()
    assert rows
    by_type: dict[str, int] = {}
    for r in rows:
        by_type[r.event_type] = by_type.get(r.event_type, 0) + 1
        assert r.n > 0
    # 30 days of data, lag 7 → at most 23 residual days per type.
    assert all(n <= 23 for n in by_type.values())
    # A 2-sigma fence keeps outliers a small minority of each series.
    n_out = sum(1 for r in rows if r.is_outlier)
    assert n_out <= len(rows) * 0.15


def test_funnel_rates_consistent_with_stage_rows(spark, qs):
    rates = qs["funnel_conversion_rates"](spark, SF_DIR).first()
    rows = qs["event_funnel_conversion"](spark, SF_DIR).collect()
    assert rates.n_signup == len(rows)
    assert rates.n_click == sum(1 for r in rows if r.click_s != -1)
    assert rates.n_purchase == sum(1 for r in rows if r.purchase_s != -1)
    assert 0.0 <= rates.purchase_rate <= rates.click_rate <= 1.0


def test_cohort_ltv_aligns_with_retention(spark, qs):
    ltv = qs["cohort_ltv"](spark, SF_DIR).collect()
    ret = {(r.cohort_week, r.offset_weeks): r.n_users
           for r in qs["retention_cohorts"](spark, SF_DIR).collect()}
    assert ltv
    for r in ltv:
        # Every LTV cell has a retention cell, and buyers are a subset
        # of active users.
        assert (r.cohort_week, r.offset_weeks) in ret
        assert 0 <= r.n_buyers <= ret[(r.cohort_week, r.offset_weeks)]
        assert r.revenue >= 0.0
        assert (r.revenue > 0) == (r.n_buyers > 0)


# ---------------------------------------------------------------- k-core


def test_k_core_peels_to_known_core(spark):
    # Graph: K4 on {1,2,3,4} (the 3-core) plus a pendant chain 4-5-6
    # and a triangle {7,8,9} (only a 2-core) — peeling must remove the
    # chain AND the triangle, keeping exactly the K4 at degree 3.
    from sumologic_aws_lambda_spark.operators.graph import k_core

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    extra = [(4, 5), (5, 6), (7, 8), (7, 9), (8, 9)]
    edges = spark.createDataFrame(k4 + extra, "u long, v long")
    got = {r["user_id"]: r["core_degree"]
           for r in k_core(edges, k=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_k_core_empty_when_no_core(spark):
    from sumologic_aws_lambda_spark.operators.graph import k_core

    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "u long, v long")
    assert k_core(chain, k=3).count() == 0


# ------------------------------------------------------- link prediction


def test_link_prediction_hub_cut_silences_dense_graph(spark):
    # K10 minus one edge: every node has degree >= 8, so hub_cut=5
    # excludes EVERY neighbor from the wedge space — the documented
    # dense-graph failure mode the neighbor_cap strategy exists for.
    from sumologic_aws_lambda_spark.operators.graph import link_prediction

    edges = [(a, b) for a in range(10) for b in range(a + 1, 10)
             if (a, b) != (0, 1)]
    df = spark.createDataFrame(edges, "u long, v long")
    assert link_prediction(df, hub_cut=5).count() == 0


def test_link_prediction_neighbor_cap_keeps_dense_graph_alive(spark):
    # Same dense graph: neighbor_cap caps each wedge center's fan-out
    # instead of silencing it, so the one non-adjacent pair (0, 1) —
    # reachable through 8 shared neighbors — must surface.
    from sumologic_aws_lambda_spark.operators.graph import link_prediction

    edges = [(a, b) for a in range(10) for b in range(a + 1, 10)
             if (a, b) != (0, 1)]
    df = spark.createDataFrame(edges, "u long, v long")
    rows = link_prediction(df, hub_cut=None, neighbor_cap=4).collect()
    assert rows, "neighbor_cap path must not silence a dense graph"
    got = {(r["u"], r["v"]) for r in rows}
    assert (0, 1) in got
    for r in rows:
        assert r["cn"] >= 2 and 0.0 < r["jaccard"] <= 1.0


def test_link_prediction_default_is_dense_safe(spark):
    # Round-9 flip: a NAIVE caller (no strategy args) on a dense graph
    # must get capped wedges, not silently-empty output — the old
    # hub_cut=30 default excluded every node of K40-minus-one-edge.
    from sumologic_aws_lambda_spark.operators.graph import link_prediction

    edges = [(a, b) for a in range(40) for b in range(a + 1, 40)
             if (a, b) != (0, 1)]
    df = spark.createDataFrame(edges, "u long, v long")
    rows = link_prediction(df).collect()
    assert rows, "default strategy silenced a dense graph"
    assert (0, 1) in {(r["u"], r["v"]) for r in rows}


def test_link_prediction_exact_matches_hand_computation(spark):
    # Path graph 1-2-3-4 plus edge 2-4: candidate (1, 3) shares {2};
    # (1, 4) shares {2}; (3, ...) etc.  With min_common=1, check the
    # exact unbounded wedge space against hand-computed scores.
    from sumologic_aws_lambda_spark.operators.graph import link_prediction
    import math

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 4)], "u long, v long")
    got = {(r["u"], r["v"]): r for r in link_prediction(
        df, hub_cut=None, min_common=1).collect()}
    # deg: 1->1, 2->3, 3->2, 4->2.  Non-adjacent pairs via a wedge:
    # (1,3) via 2, (1,4) via 2.  (3,4) and (2,*) are adjacent.
    assert set(got) == {(1, 3), (1, 4)}
    aa = round(1.0 / math.log(3), 4)
    assert got[(1, 3)]["cn"] == 1
    assert got[(1, 3)]["adamic_adar"] == aa
    # jaccard(1,3) = 1 / (1 + 2 - 1) = 0.5
    assert got[(1, 3)]["jaccard"] == 0.5
    assert got[(1, 4)]["jaccard"] == 0.5
