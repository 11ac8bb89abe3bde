"""Tests for the blocklist/truncation filter wave: plan shapes (both
shuffle-free up to the final aggregate, one corpus scan) and a
pure-Python value replay of the blocklist gate."""

from __future__ import annotations

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


def test_blocklist_matches_python_replay(spark, qs):
    rows = table(spark, SF_DIR, "documents").select(
        "source", "text").collect()
    from sumologic_aws_lambda_spark.queries.curation import _BLOCKLIST
    bad = set(_BLOCKLIST)
    exp: dict[str, list[int]] = {}
    for r in rows:
        toks = r["text"].strip().split()
        nb = sum(1 for t in toks if t in bad)
        exp.setdefault(r["source"], []).append(
            (len(toks), nb))
    got = {r["source"]: r
           for r in qs["blocklist_filter_stats"](spark, SF_DIR).collect()}
    assert set(got) == set(exp)
    for src, pairs in exp.items():
        n_dropped = sum(1 for nt, nb in pairs if nb * 10 > nt)
        total_bad = sum(nb for _, nb in pairs)
        assert got[src]["n_docs"] == len(pairs), src
        assert got[src]["n_dropped"] == n_dropped, src
        assert got[src]["total_bad_tokens"] == total_bad, src


def test_blocklist_single_scan_one_exchange(spark, qs):
    plan = _plan(qs["blocklist_filter_stats"](spark, SF_DIR))
    assert plan.count("documents.parquet") == 1
    # higher-order filter, no explode/join: the groupBy(source) exchange
    # is the plan's only shuffle
    assert plan.count("Exchange") <= 1
    assert "Generate" not in plan  # no explode


def test_truncation_waste_values(spark, qs):
    from sumologic_aws_lambda_spark.queries.curation import _TRUNC_CAPS
    rows = {r["cap"]: r for r in qs["truncation_waste"](spark, SF_DIR).collect()}
    assert set(rows) == set(_TRUNC_CAPS)
    n_tok = [len(r["text"].strip().split()) for r in table(
        spark, SF_DIR, "documents").select("text").collect()]
    for cap, r in rows.items():
        assert r["docs_truncated"] == sum(1 for n in n_tok if n > cap)
        assert r["tokens_lost"] == sum(max(n - cap, 0) for n in n_tok)
        assert r["tokens_kept"] == sum(min(n, cap) for n in n_tok)
    # monotone: a bigger cap never loses more tokens
    assert rows[32]["tokens_lost"] >= rows[64]["tokens_lost"] >= \
        rows[128]["tokens_lost"]


def test_truncation_single_scan_broadcast_caps(spark, qs):
    plan = _plan(qs["truncation_waste"](spark, SF_DIR))
    assert plan.count("documents.parquet") == 1
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# --- analytics extras wave (resample / rank battery / pivot) ----------


def test_resample_grid_contiguous_and_bounded(spark, qs):
    """The slot grid is dense per series, and every interpolated value
    lies within [min(prev, next), max(prev, next)]."""
    rows = qs["resample_interpolate"](spark, SF_DIR).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["slot_epoch"])
        slots = [r["slot_epoch"] for r in rs]
        assert slots == list(range(slots[0], slots[-1] + 3600, 3600)), t
        # interpolated points sit between their rounded neighbors
        present = [(i, r["value"]) for i, r in enumerate(rs)
                   if not r["interpolated"]]
        for (i0, v0), (i1, v1) in zip(present, present[1:]):
            lo, hi = min(v0, v1), max(v0, v1)
            for j in range(i0 + 1, i1):
                assert lo - 1e-3 <= rs[j]["value"] <= hi + 1e-3, (t, j)


def test_rank_battery_semantics(spark, qs):
    rows = qs["window_rank_battery"](spark, SF_DIR).collect()
    assert rows and all(1 <= r["rnk"] <= 5 for r in rows)
    for r in rows:
        assert r["drnk"] <= r["rnk"]
        assert 0.0 <= r["prnk"] <= 1.0
        assert 0.0 < r["cdist"] <= 1.0
        assert 1 <= r["quartile"] <= 4
    # within a partition the top row is rank 1 with the max price
    by_p: dict[str, list] = {}
    for r in rows:
        by_p.setdefault(r["o_orderpriority"], []).append(r)
    for p, rs in by_p.items():
        top = [r for r in rs if r["rnk"] == 1]
        assert top and max(r["total_price"] for r in rs) == \
            top[0]["total_price"], p


def test_rank_battery_single_window_exec(spark, qs):
    """All five ranking functions share one window spec — the plan must
    contain exactly ONE Window operator (Catalyst fuses them)."""
    plan = qs["window_rank_battery"](spark, SF_DIR) \
        ._jdf.queryExecution().executedPlan().toString()
    import re
    n_window_ops = len(re.findall(r"\bWindow\b", plan)) \
        - plan.count("WindowGroupLimit")
    assert n_window_ops == 1, plan[:500]


def test_pivot_counts_reconcile(spark, qs):
    from sumologic_aws_lambda_spark.catalog import table

    rows = qs["pivot_status_matrix"](spark, SF_DIR).collect()
    total = sum((r["F"] or 0) + (r["O"] or 0) + (r["P"] or 0) for r in rows)
    assert total == table(spark, SF_DIR, "orders").count()
    plan = qs["pivot_status_matrix"](spark, SF_DIR) \
        ._jdf.queryExecution().executedPlan().toString()
    # explicit pivot values: one scan, and only the two tiny-key
    # post-partial-agg exchanges of Spark's pivot lowering
    assert plan.count("orders.parquet") == 1
    assert plan.count("Exchange") <= 2
    assert "partial_pivotfirst" in plan


def test_triangle_counts_pure_python_replay(spark, qs):
    """Replay the full edge→orientation→triangle pipeline in pure
    Python at sf0.001 and compare per-node counts exactly."""
    from collections import defaultdict

    from sumologic_aws_lambda_spark.catalog import table

    ev = table(spark, SF_DIR, "events").select(
        "event_type", (F.col("ts").cast("double") / 3600)
        .cast("bigint").alias("h"), "user_id").collect()
    cells = defaultdict(set)
    for r in ev:
        cells[(r["event_type"], r["h"])].add(r["user_id"])
    w = defaultdict(int)
    for users in cells.values():
        if len(users) > 60:
            continue
        us = sorted(users)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                w[(us[i], us[j])] += 1
    edges = {e for e, c in w.items() if c >= 3}
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    adj = defaultdict(set)
    for u, v in edges:
        s, t = (u, v) if (deg[u], u) < (deg[v], v) else (v, u)
        adj[s].add(t)
    tri_count = defaultdict(int)
    for a in adj:
        for b in adj[a]:
            for c in adj.get(b, ()):
                if c in adj[a]:
                    for n in (a, b, c):
                        tri_count[n] += 1
    got = {r["user_id"]: r["n_triangles"]
           for r in qs["triangle_communities"](spark, SF_DIR).collect()}
    assert got == dict(tri_count)


def test_triangle_plan_all_equi_joins(spark, qs):
    plan = qs["triangle_communities"](spark, SF_DIR) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_clustering_coefficients_bounds(spark, qs):
    rows = qs["clustering_coefficients"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["clustering_coeff"] <= 1.0
        if r["degree"] < 2:
            assert r["clustering_coeff"] == 0.0
        # a node cannot sit in more triangles than its degree pairs
        assert r["n_triangles"] <= r["degree"] * (r["degree"] - 1) / 2
