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
    bad = {"slow", "corrupt", "broken"}
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
    rows = {r["cap"]: r for r in qs["truncation_waste"](spark, SF_DIR).collect()}
    assert set(rows) == {32, 64, 128}
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
