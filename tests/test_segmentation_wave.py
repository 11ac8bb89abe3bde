"""Semantic and plan-shape tests for the segmentation / retrieval /
series wave (RFM, basket affinity, concentration, ACF, CUSUM, BM25,
link prediction).

The DuckDB oracles pin end-to-end values at sf0.01; these pin the
invariants a single scale factor could satisfy by accident (quartile
balance, rule-metric algebra, score monotonicity, non-adjacency) and
the physical shapes the docstrings claim (dims broadcast, no cartesian
pair generation)."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from sumologic_aws_lambda_spark import queries as registry
from sumologic_aws_lambda_spark.catalog import table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def qs():
    return registry.all_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rfm_quartiles_ordered_and_roughly_balanced(spark, qs):
    # Round-8 semantics: quartile assignment is broadcast exact-
    # percentile CUT POINTS (never a global ntile window — the r7
    # verdict's single-partition flag), so ties share a bucket and
    # sizes are only approximately n/4: assert ordering invariants
    # for every measure, plus balance on the continuous measure.
    rows = qs["rfm_segmentation"](spark, SF_DIR).collect()
    n = len(rows)
    assert n == table(spark, SF_DIR, "customer").select(
        "c_custkey").join(
        table(spark, SF_DIR, "orders").select(
            F.col("o_custkey").alias("c_custkey")).distinct(),
        "c_custkey").count()
    for col, measure in (("r_score", "last_day"),
                         ("f_score", "frequency"),
                         ("m_score", "monetary")):
        by_score: dict[int, list] = {}
        for r in rows:
            assert 1 <= r[col] <= 4
            by_score.setdefault(r[col], []).append(r[measure])
        # better quartile ⇒ strictly larger measure values at the seam
        present = sorted(by_score)
        for hi, lo in zip(present, present[1:]):
            assert min(by_score[hi]) > max(by_score[lo]), (col, hi, lo)
    # the continuous measure (2-dp monetary) has ~distinct values, so
    # exact-percentile cuts keep buckets within ±n/8 of a quarter
    m_sizes = [sum(1 for r in rows if r["m_score"] == s)
               for s in (1, 2, 3, 4)]
    assert all(abs(sz - n / 4) <= n / 8 + 1 for sz in m_sizes), m_sizes
    q1 = [r["monetary"] for r in rows if r["m_score"] == 1]
    q4 = [r["monetary"] for r in rows if r["m_score"] == 4]
    assert min(q1) >= max(q4)


def test_affinity_rule_algebra(spark, qs):
    df = qs["part_affinity_rules"](spark, SF_DIR)
    rows = df.collect()
    assert rows, "support>=3 pairs exist at this SF"
    li = table(spark, SF_DIR, "lineitem")
    n_orders = li.select("l_orderkey").distinct().count()
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["support"] >= 3
        assert r["support"] <= min(r["cnt_a"], r["cnt_b"])
        assert r["conf_a_b"] == pytest.approx(
            r["support"] / r["cnt_a"], abs=1e-6)
        assert r["lift"] == pytest.approx(
            r["support"] * n_orders / (r["cnt_a"] * r["cnt_b"]), abs=1e-4)
    # item counts broadcast onto the pair frame
    assert "BroadcastHashJoin" in _plan(df)


def test_concentration_bounds(spark, qs):
    rows = qs["revenue_concentration"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # HHI in points: uniform floor 10000/n, monopoly ceiling 10000
        assert 10000.0 / r["n_customers"] - 0.01 <= r["hhi_points"] \
            <= 10000.0 + 0.01
        assert 0.0 < r["top_decile_share"] <= 1.0
        # top decile holds at least its proportional share
        assert r["top_decile_share"] >= 1.0 / 10 - 0.01


def test_acf_is_a_correlation(spark, qs):
    rows = qs["daily_autocorrelation"](spark, SF_DIR).collect()
    assert rows
    by_type = {}
    for r in rows:
        assert -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9
        by_type.setdefault(r["event_type"], set()).add(r["lag"])
        assert r["n_pairs"] >= 2
    for lags in by_type.values():
        assert lags == {1, 2, 3}


def test_cusum_peak_is_the_max(spark, qs):
    """Recompute the cumulative deviations per type and confirm the
    reported day attains the maximum magnitude."""
    rows = qs["cusum_changepoints"](spark, SF_DIR).collect()
    assert rows
    ev = table(spark, SF_DIR, "events")
    daily = (
        ev.groupBy("event_type",
                   F.floor(F.col("ts").cast("double") / 86400)
                   .cast("long").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    ).collect()
    series = {}
    for d in daily:
        series.setdefault(d["event_type"], []).append(
            (d["day"], d["cnt"]))
    for r in rows:
        pts = sorted(series[r["event_type"]])
        mu = round(sum(c for _, c in pts) / len(pts), 4)
        s, best_day, best_abs = 0.0, None, -1.0
        for day, cnt in pts:
            s += cnt - mu
            if round(abs(s), 4) > best_abs:
                best_abs, best_day = round(abs(s), 4), day
        assert r["cp_day"] == best_day
        assert abs(abs(r["peak_cusum"]) - best_abs) < 1e-6
        assert r["n_days"] == len(pts)


def test_bm25_scores_rank_matching_docs(spark, qs):
    rows = qs["bm25_retrieval"](spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 10
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] \
        == list(range(1, len(rows) + 1))
    ordered = sorted(rows, key=lambda r: r["rank"])
    for earlier, later in zip(ordered, ordered[1:]):
        assert earlier["bm25"] >= later["bm25"]
    # every hit contains at least one query term
    docs = {r["doc_id"]: r for r in rows}
    texts = dict(
        table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id").isin(*docs))
        .select("doc_id", "text").collect())
    for doc_id, r in docs.items():
        toks = set(texts[doc_id].lower().split())
        hit = {"dup", "spark", "vector"} & toks
        assert hit and len(hit) == r["matched"]


def test_link_prediction_pairs_are_non_adjacent(spark, qs):
    from sumologic_aws_lambda_spark.operators.graph import (
        cooccurrence_edges,
    )

    df = qs["link_prediction_scores"](spark, SF_DIR)
    rows = df.collect()
    assert rows
    edges = {
        (r["u"], r["v"])
        for r in cooccurrence_edges(
            table(spark, SF_DIR, "events"),
            min_weight=3, max_cell_users=60).collect()
    }
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    for r in rows:
        assert r["u"] < r["v"]
        assert (r["u"], r["v"]) not in edges
        assert r["cn"] >= 2
        assert 0.0 < r["jaccard"] <= 1.0
        # Jaccard denominator from independently recomputed degrees
        assert r["jaccard"] == pytest.approx(
            r["cn"] / (deg[r["u"]] + deg[r["v"]] - r["cn"]), abs=1e-6)
    assert "CartesianProduct" not in _plan(df)


def test_adamic_adar_matches_pure_python(spark, qs):
    """Full pure-Python replay of the wedge generation on the small
    fixture graph."""
    from sumologic_aws_lambda_spark.operators.graph import (
        cooccurrence_edges,
    )

    edges = {
        (r["u"], r["v"])
        for r in cooccurrence_edges(
            table(spark, SF_DIR, "events"),
            min_weight=3, max_cell_users=60).collect()
    }
    nbrs = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    expected = {}
    nodes = sorted(nbrs)
    for n in nodes:
        if len(nbrs[n]) > 30:  # hub cut mirrors the query
            continue
        ns = sorted(nbrs[n])
        for i, x in enumerate(ns):
            for y in ns[i + 1:]:
                key = (x, y) if x < y else (y, x)
                cn, aa = expected.get(key, (0, 0.0))
                expected[key] = (cn + 1, aa + 1.0 / math.log(len(nbrs[n])))
    expected = {
        k: (cn, round(aa, 4)) for k, (cn, aa) in expected.items()
        if cn >= 2 and k not in edges
    }
    got = {
        (r["u"], r["v"]): (r["cn"], r["adamic_adar"])
        for r in qs["link_prediction_scores"](spark, SF_DIR).collect()
    }
    assert got == expected
