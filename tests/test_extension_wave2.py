"""Invariant tests for the diagnostics wave: embedding dimension
stats, degree assortativity, compaction bin planning, per-domain score
calibration."""

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


def test_embedding_dimension_stats_shape(spark, qs):
    rows = qs["embedding_dimension_stats"](spark, SF_DIR).collect()
    n_vecs = table(spark, SF_DIR, "embeddings").count()
    assert sorted(r["dim"] for r in rows) == list(range(1, 65))
    for r in rows:
        assert r["n"] == n_vecs
        assert r["vmin"] <= r["mean"] <= r["vmax"]
        assert r["std"] >= 0.0


def test_assortativity_is_bounded_and_consistent(spark, qs):
    from sumologic_aws_lambda_spark.operators.graph import (
        cooccurrence_edges,
    )

    row = qs["degree_assortativity"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert -1.0 - 1e-9 <= r["assortativity"] <= 1.0 + 1e-9
    n_edges = cooccurrence_edges(
        table(spark, SF_DIR, "events"),
        min_weight=3, max_cell_users=60).count()
    assert r["n_edges"] == n_edges
    # handshake identity: avg degree = 2E / V
    assert r["avg_degree"] == pytest.approx(
        2.0 * r["n_edges"] / r["n_nodes"], abs=1e-3)


def test_compaction_bins_are_contiguous_and_exhaustive(spark, qs):
    rows = qs["compaction_bin_plan"](spark, SF_DIR).collect()
    docs = table(spark, SF_DIR, "documents")
    totals = {
        r["source"]: (r["n"], r["chars"])
        for r in docs.groupBy("source").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars")).collect()
    }
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert set(by_source) == set(totals)
    for source, bins in by_source.items():
        bins.sort(key=lambda r: r["bin"])
        assert [b["bin"] for b in bins] == list(range(len(bins)))
        assert sum(b["n_files"] for b in bins) == totals[source][0]
        assert sum(b["bin_chars"] for b in bins) == totals[source][1]
        # bins cover disjoint, ordered doc ranges
        for earlier, later in zip(bins, bins[1:]):
            assert earlier["last_doc"] < later["first_doc"]
        # every non-final bin ends at or past its 20 KB boundary
        cum = 0
        for b in bins[:-1]:
            cum += b["bin_chars"]
            assert cum >= (b["bin"] + 1) * 20000


def test_calibration_selects_half_per_domain(spark, qs):
    rows = qs["quality_score_calibration"](spark, SF_DIR).collect()
    by_source = {}
    for r in rows:
        assert 0.0 <= r["calibrated"] <= 1.0
        assert r["selected"] == (1 if r["calibrated"] >= 0.5 else 0)
        by_source.setdefault(r["source"], []).append(r)
    for source, docs in by_source.items():
        frac = sum(d["selected"] for d in docs) / len(docs)
        assert 0.4 <= frac <= 0.6, (source, frac)
        assert max(d["calibrated"] for d in docs) == 1.0
