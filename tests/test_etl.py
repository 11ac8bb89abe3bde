"""Edge-case semantics for the round-8 lifecycle wave (queries/etl.py,
operators/similarity.mmr_topk).  The driver's DuckDB oracle checks
value parity on the fixture tables; these tests pin the SEMANTICS on
hand-built frames — open SCD2 intervals, CDC action classification,
orphan detection, and MMR's relevance/diversity trade."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long, "
              "ts timestamp")


def test_scd2_builds_versions_and_leaves_current_open(spark, monkeypatch):
    from sumologic_aws_lambda_spark.queries import etl

    t0 = dt.datetime(2024, 1, 1)
    ev = _events(spark, [
        (1, "view", 1, t0),
        (1, "view", 2, t0 + dt.timedelta(seconds=10)),   # no change
        (1, "click", 3, t0 + dt.timedelta(seconds=30)),  # v2
        (1, "view", 4, t0 + dt.timedelta(seconds=90)),   # v3
        (2, "error", 5, t0),                              # single state
    ])
    monkeypatch.setattr(etl, "table", lambda *a, **k: ev)
    rows = {(r["user_id"], r["version"]): r
            for r in etl.scd2_intervals(spark, "unused").collect()}
    assert set(rows) == {(1, 1), (1, 2), (1, 3), (2, 1)}
    v1, v2, v3 = rows[(1, 1)], rows[(1, 2)], rows[(1, 3)]
    assert (v1["state"], v2["state"], v3["state"]) == (
        "view", "click", "view")
    # consecutive same-state events do NOT open a new version
    assert v1["valid_to"] == v2["valid_from"]
    assert v1["duration_s"] == 30
    assert v2["duration_s"] == 60
    # the current version stays open
    assert v3["valid_to"] is None and v3["duration_s"] is None
    assert rows[(2, 1)]["valid_to"] is None


def test_cdc_merge_classifies_insert_update_carry(spark, monkeypatch):
    from sumologic_aws_lambda_spark.queries import etl

    t0 = dt.datetime(2024, 1, 1)
    late = t0 + dt.timedelta(hours=10)
    ev = _events(spark, [
        # user 1: in both halves -> update, batch state wins
        (1, "view", 1, t0), (1, "purchase", 2, late),
        # user 2: only before the midpoint -> carry
        (2, "click", 3, t0),
        # user 3: only after -> insert
        (3, "signup", 4, late),
    ])
    monkeypatch.setattr(etl, "table", lambda *a, **k: ev)
    got = {r["user_id"]: r
           for r in etl.cdc_snapshot_merge(spark, "unused").collect()}
    assert got[1]["action"] == "update"
    assert got[1]["state"] == "purchase"
    assert got[2]["action"] == "carry" and got[2]["state"] == "click"
    assert got[3]["action"] == "insert" and got[3]["state"] == "signup"


def test_referential_integrity_counts_orphans(spark, monkeypatch):
    from sumologic_aws_lambda_spark.queries import etl

    frames = {
        "lineitem": spark.createDataFrame(
            [(1, 10), (1, 11), (2, 10), (99, 12)],
            "l_orderkey long, l_partkey long"),
        "orders": spark.createDataFrame(
            [(1, 5), (2, 6)], "o_orderkey long, o_custkey long"),
        "part": spark.createDataFrame(
            [(10,), (11,), (12,)], "p_partkey long"),
        "customer": spark.createDataFrame(
            [(5, 1)], "c_custkey long, c_nationkey long"),
        "supplier": spark.createDataFrame(
            [(100, 1), (101, 77)], "s_suppkey long, s_nationkey long"),
        "nation": spark.createDataFrame([(1,)], "n_nationkey long"),
    }
    monkeypatch.setattr(
        etl, "table", lambda spark, sf, name, **k: frames[name])
    got = {r["fk"]: r for r in
           etl.referential_integrity_audit(spark, "unused").collect()}
    assert got["lineitem->orders"]["n_rows"] == 4
    assert got["lineitem->orders"]["n_orphans"] == 1      # orderkey 99
    assert got["lineitem->part"]["n_orphans"] == 0
    assert got["orders->customer"]["n_orphans"] == 1      # custkey 6
    assert got["supplier->nation"]["n_orphans"] == 1      # nation 77


def test_mmr_prefers_diverse_over_redundant(spark):
    """Hand-built geometry: query q = e0.  Candidates: a ~ q (rel .99),
    b ~ a (near-duplicate of a, rel .98), c orthogonal-ish (rel .6).
    Plain top-2 picks {a, b}; MMR must pick {a, c} — the duplicate's
    redundancy penalty outweighs its relevance edge."""
    from sumologic_aws_lambda_spark.operators.similarity import mmr_topk

    vecs = [
        (1, [1.0, 0.02, 0.0]),   # a: almost the query
        (2, [1.0, 0.05, 0.0]),   # b: near-duplicate of a
        (3, [0.5, 0.0, 0.9]),    # c: diverse, lower relevance
    ]
    corpus = spark.createDataFrame(vecs, "vec_id long, e array<double>")
    qv = spark.createDataFrame([([1.0, 0.0, 0.0],)], "qe array<double>")
    got = mmr_topk(corpus, qv, k=2, lam=0.5, pool_size=3).collect()
    picked = [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert picked == [1, 3], picked
    assert got[0]["relevance"] > got[1]["relevance"]


def test_mmr_rank_one_is_plain_argmax_relevance(spark):
    from sumologic_aws_lambda_spark.operators.similarity import mmr_topk

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 6)],
        "vec_id long, e array<double>")
    qv = spark.createDataFrame([([1.0, 0.0],)], "qe array<double>")
    got = sorted(mmr_topk(corpus, qv, k=3, pool_size=5).collect(),
                 key=lambda r: r["rank"])
    rels = [r["relevance"] for r in got]
    # rank 1 carries the global max relevance
    assert got[0]["relevance"] == max(rels)
    assert [r["rank"] for r in got] == [1, 2, 3]
    assert len({r["vec_id"] for r in got}) == 3


def test_lit_vector_bit_identical_to_flit(spark):
    """lit_vector/lit_matrix parse repr(float)+'D' strings — must yield
    the exact doubles F.lit would (the ANN oracles depend on it),
    including subnormal-ish, scientific-notation, and negative values."""
    from sumologic_aws_lambda_spark.operators.similarity import (
        lit_matrix,
        lit_vector,
    )

    vals = [0.05424950644373894, 6.7e-05, -1.2e-300, 3.141592653589793,
            -0.0, 1e16, 123456.78901234567]
    row = spark.range(1).select(
        lit_vector(vals).alias("a"),
        F.array(*[F.lit(v) for v in vals]).alias("b"),
        lit_matrix([vals, vals[::-1]]).alias("m"),
    ).collect()[0]
    assert row["a"] == row["b"] == vals
    assert row["m"] == [vals, vals[::-1]]


def test_mmr_empty_corpus_returns_empty_frame(spark):
    from sumologic_aws_lambda_spark.operators.similarity import mmr_topk

    corpus = spark.createDataFrame([], "vec_id long, e array<double>")
    qv = spark.createDataFrame([([1.0, 0.0],)], "qe array<double>")
    out = mmr_topk(corpus, qv, k=3, pool_size=5)
    assert out.count() == 0
    assert out.columns == ["rank", "vec_id", "relevance", "mmr_score"]


def test_mmr_keeps_caller_id_name_and_string_type(spark):
    """Round-9 advisor fix: the result schema derives the id column's
    name AND dtype from the input — a string-keyed corpus used to
    crash createDataFrame against the hardcoded `vec_id long`."""
    from sumologic_aws_lambda_spark.operators.similarity import mmr_topk

    corpus = spark.createDataFrame(
        [("doc-a", [1.0, 0.02, 0.0]),
         ("doc-b", [1.0, 0.05, 0.0]),
         ("doc-c", [0.5, 0.0, 0.9])],
        "doc_key string, e array<double>")
    qv = spark.createDataFrame([([1.0, 0.0, 0.0],)], "qe array<double>")
    out = mmr_topk(corpus, qv, k=2, lam=0.5, pool_size=3,
                   id_col="doc_key")
    assert out.columns == ["rank", "doc_key", "relevance", "mmr_score"]
    assert dict(out.dtypes)["doc_key"] == "string"
    got = sorted(out.collect(), key=lambda r: r["rank"])
    assert [r["doc_key"] for r in got] == ["doc-a", "doc-c"]
    # empty corpus keeps the custom name/type too
    empty = mmr_topk(
        spark.createDataFrame([], "doc_key string, e array<double>"),
        qv, k=2, pool_size=3, id_col="doc_key")
    assert empty.columns == ["rank", "doc_key", "relevance", "mmr_score"]
    assert empty.count() == 0


def test_centroid_drift_norm_ratio_is_volume_invariant(spark, monkeypatch):
    """Round-9 advisor fix: norm_ratio divides each half's sum-vector
    norm by its row count, so a half with 3x the rows of the SAME
    distribution reads 1.0, not 3.0 (the old unnormalized-sum ratio)."""
    from sumologic_aws_lambda_spark.queries import similarity as simq

    v = [3.0, 4.0]  # norm 5
    rows = ([(i, v, 7) for i in (0, 2)]            # half 0: 2 rows
            + [(i, v, 7) for i in (1, 3, 5, 7, 9, 11)])  # half 1: 6 rows
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(simq, "table", lambda *a, **k: emb)
    [r] = simq.embedding_centroid_drift(spark, "unused").collect()
    assert (r["n_a"], r["n_b"]) == (2, 6)
    assert r["centroid_cosine"] == pytest.approx(1.0, abs=1e-3)
    assert r["norm_ratio"] == pytest.approx(1.0, abs=1e-3)


def test_link_prediction_handles_noncanonical_edges(spark):
    # Triangle with one edge stored reversed plus a both-orientations
    # duplicate: adjacent pairs must never surface as predictions and
    # degrees must count each undirected edge once (round-8 review).
    from sumologic_aws_lambda_spark.operators.graph import link_prediction

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1),          # (3,1) is non-canonical
         (2, 1),                           # duplicate, reversed
         (2, 4)],                          # pendant: candidate wedges
        "u long, v long")
    rows = link_prediction(edges, hub_cut=None, min_common=1).collect()
    got = {(r["u"], r["v"]): r for r in rows}
    # (1,3) is adjacent (via the reversed edge) — must NOT appear
    assert (1, 3) not in got
    # non-adjacent wedge pairs through node 2: (1,4) and (3,4)
    assert set(got) == {(1, 4), (3, 4)}
    # deg(1)=2 (not 3 — the duplicate edge counts once), deg(4)=1,
    # cn=1 → jaccard = 1/(2+1-1) = 0.5
    assert got[(1, 4)]["jaccard"] == 0.5
