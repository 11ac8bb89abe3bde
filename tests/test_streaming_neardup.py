"""Streaming MinHash-LSH near-dedup: cross-batch band-bucket store
semantics, redelivery idempotence, and batch-funnel parity."""

from __future__ import annotations

import json

import pytest

from sumologic_aws_lambda_spark.streaming.neardup import (
    CurationStage1Sink,
    MinHashDedupSink,
    run_minhash_dedup,
)

# 30 shared words: same-template docs are near-duplicates (high
# Jaccard over 3-gram shingles → every band key matches with margin);
# tails make them never exact.
_TPL_A = " ".join(f"a{i}" for i in range(30))
_TPL_B = " ".join(f"b{i}" for i in range(30))
_TPL_C = " ".join(f"c{i}" for i in range(30))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_cross_batch_near_dedup(spark, tmp_path):
    sink = MinHashDedupSink(spark, str(tmp_path / "store"),
                            str(tmp_path / "out"))
    sink(_docs(spark, [
        (1, _TPL_A + " x1 x2"),
        (2, _TPL_A + " y1 y2"),        # near-dup of 1, same batch
        (3, _TPL_B + " z1 z2"),
    ]), 0)
    assert sink.batch_stats[-1] == (0, 3, 2)       # 1 and 3 survive
    sink(_docs(spark, [
        (4, _TPL_A + " q1 q2"),        # near-dup of 1, earlier batch
        (5, _TPL_C + " r1 r2"),        # new content
    ]), 1)
    assert sink.batch_stats[-1] == (1, 2, 1)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.doc_id for r in out.collect()) == [1, 3, 5]


def test_dropped_docs_buckets_persist_for_transitive_blocking(
        spark, tmp_path):
    """The batch rule is transitive through DROPPED docs (A kills B;
    B's later bucket-mate C dies too) — so the store must record every
    batch document's buckets, not just survivors'.  B's tail-derived
    band keys differ from A's, so if only survivors were stored the
    bucket count would equal A's band count."""
    sink = MinHashDedupSink(spark, str(tmp_path / "store"),
                            str(tmp_path / "out"))
    a = _TPL_A + " x1 x2"
    b = _TPL_A + " y1 y2"              # dropped: near-dup of A
    sink(_docs(spark, [(1, a), (2, b)]), 0)
    assert sink.batch_stats[-1] == (0, 2, 1)
    store = spark.read.parquet(str(tmp_path / "store"))
    n_buckets = store.select("band", "band_key").distinct().count()
    # A alone occupies 4 buckets; B's differing tail grams give it at
    # least one bucket A does not share — the store holds it
    assert n_buckets > 4
    # and an exact copy of the DROPPED doc B is blocked in a later
    # batch purely by B's stored buckets
    sink(_docs(spark, [(3, b)]), 1)
    assert sink.batch_stats[-1] == (1, 1, 0)


def test_redelivered_batch_is_idempotent(spark, tmp_path):
    """Redelivery after ANY subset of the writes recomputes the same
    admit set and overwrites in place — no duplicates, no budget loss."""
    sink = MinHashDedupSink(spark, str(tmp_path / "store"),
                            str(tmp_path / "out"))
    b = _docs(spark, [(1, _TPL_A + " x1"), (2, _TPL_B + " y1")])
    sink(b, 0)
    sink(b, 0)     # redelivery AFTER output + store writes
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.doc_id for r in out.collect()) == [1, 2]
    # a later batch still dedups against batch 0's (single) store rows
    sink(_docs(spark, [(3, _TPL_A + " z9")]), 1)
    assert sink.batch_stats[-1] == (1, 1, 0)


def test_null_and_empty_texts_do_not_vanish(spark, tmp_path):
    """A NULL text must not drop the row from the exploded stream (the
    doc would silently vanish); NULL/empty texts share one shingle
    bucket and dedup together."""
    sink = MinHashDedupSink(spark, str(tmp_path / "store"),
                            str(tmp_path / "out"))
    sink(_docs(spark, [(1, None), (2, ""), (3, _TPL_A + " x")]), 0)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.doc_id for r in out.collect()) == [1, 3]


def test_within_batch_keeper_is_lowest_order(spark, tmp_path):
    sink = MinHashDedupSink(spark, str(tmp_path / "store"),
                            str(tmp_path / "out"))
    sink(_docs(spark, [(9, _TPL_A + " x"), (2, _TPL_A + " y"),
                       (5, _TPL_A + " z")]), 0)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert [r.doc_id for r in out.collect()] == [2]


def test_reserved_internal_names_do_not_shadow_user_columns(
        spark, tmp_path):
    """User columns named band/band_key/seed/_nd_txt must ride through
    untouched (the round-10 reserved-name defect class)."""
    sink = MinHashDedupSink(spark, str(tmp_path / "store"),
                            str(tmp_path / "out"))
    df = spark.createDataFrame(
        [(1, _TPL_A, "b", "k", 7, "t")],
        "doc_id bigint, text string, band string, band_key string, "
        "seed int, _nd_txt string")
    sink(df, 0)
    out = spark.read.parquet(str(tmp_path / "out")).collect()[0]
    assert (out.band, out.band_key, out.seed, out._nd_txt) \
        == ("b", "k", 7, "t")
    with pytest.raises(ValueError, match="batch_id"):
        sink(df.withColumnRenamed("band", "batch_id"), 1)


def test_invalid_band_arithmetic_rejected():
    with pytest.raises(ValueError, match="rows_per_band"):
        MinHashDedupSink(None, "s", "o", num_hashes=8, rows_per_band=3)


def test_engine_driven_micro_batches(spark, tmp_path):
    """Two engine-driven availableNow runs over one checkpoint: the
    second run's batch dedups against the first run's store."""
    (tmp_path / "in").mkdir()

    def run():
        q, sink = run_minhash_dedup(
            spark, str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "store"), str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        return sink

    (tmp_path / "in" / "b1.json").write_text("\n".join(
        json.dumps({"doc_id": i, "text": t}) for i, t in [
            (1, _TPL_A + " x1"), (2, _TPL_A + " x2"), (3, _TPL_B + " y1"),
        ]) + "\n")
    sink = run()
    assert sink.batch_stats[-1] == (0, 3, 2)

    (tmp_path / "in" / "b2.json").write_text("\n".join(
        json.dumps({"doc_id": i, "text": t}) for i, t in [
            (4, _TPL_B + " y9"), (5, _TPL_C + " z1"),
        ]) + "\n")
    sink = run()
    assert sink.batch_stats[-1] == (1, 2, 1)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.doc_id for r in out.collect()) == [1, 3, 5]


def test_stage1_sink_matches_batch_funnel(spark, tmp_path):
    """Streaming/batch parity: CurationStage1Sink over two doc_id-
    ordered micro-batches of the stage-1 fixture admits EXACTLY the
    documents ``crawl_stage1_funnel`` keeps (count AND doc_id sum —
    the funnel's own kept-set pin), across all four stages: URL dedup,
    registered-domain cap, extraction+gates, MinHash near-dedup."""
    from pyspark.sql import functions as F

    from sumologic_aws_lambda_spark.operators.html import (
        extract_main_text,
    )
    from sumologic_aws_lambda_spark.queries.curation import (
        _FUNNEL_CAP,
        _funnel_fixture_url,
        _s1_fixture_html,
        crawl_stage1_funnel,
    )
    from tests.conftest import SF_DIR

    funnel = {r.stage: r.n_docs
              for r in crawl_stage1_funnel(spark, SF_DIR).collect()}

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", _funnel_fixture_url().alias("url"),
        _s1_fixture_html().alias("page_html"))
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    sink = CurationStage1Sink(
        spark, str(tmp_path / "fp"), str(tmp_path / "cap"),
        str(tmp_path / "band"), str(tmp_path / "out"),
        url_col="url", order_col="doc_id", cap=_FUNNEL_CAP,
        content_col="page_html",
        extract=lambda c: extract_main_text(c)["extracted_text"],
        min_chars=120, token_band=(15, 1000))
    sink(docs.filter(F.col("doc_id") <= mid), 0)
    sink(docs.filter(F.col("doc_id") > mid), 1)

    out = spark.read.parquet(str(tmp_path / "out"))
    got = out.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("doc_id").alias("s")).collect()[0]
    assert got.n == funnel["d_near_dup"]
    assert got.s == funnel["e_kept_docid_sum"]
    # per-stage stats line up with the funnel's counts too
    stats = sink.batch_stats
    assert sum(s[3] for s in stats) == funnel["a_domain_cap"]
    assert sum(s[5] for s in stats) == funnel["d_near_dup"]


def test_stage1_engine_driven_wiring(spark, tmp_path):
    """run_curation_stage1 drives the composed stage-1 sink from a
    json-lines stream: URL dedup, cap, gates and near-dedup all fire in
    one engine-driven availableNow run."""
    import json as _json

    from sumologic_aws_lambda_spark.streaming.neardup import (
        run_curation_stage1,
    )

    (tmp_path / "in").mkdir()
    tpl = " ".join(f"e{i}f{i}" for i in range(30))
    (tmp_path / "in" / "b1.json").write_text("\n".join(
        _json.dumps({"doc_id": i, "url": u, "text": t}) for i, u, t in [
            (1, "https://a.pub.org/1", tpl + " one two"),
            (2, "https://a.pub.org/1", tpl + " respelled"),  # url dup
            (3, "https://b.pub.org/3", tpl + " near dup"),   # nd of 1
            (4, "https://b.pub.org/4", "too short"),         # gate-fail
        ]) + "\n")
    q, sink = run_curation_stage1(
        spark, str(tmp_path / "in"), str(tmp_path / "fp"),
        str(tmp_path / "cap"), str(tmp_path / "band"),
        str(tmp_path / "out"), str(tmp_path / "ckpt"),
        cap=10, min_chars=120, token_band=(15, 1000))
    q.awaitTermination(120)
    # (id, in, url_dedup, capped, gated, admitted)
    assert sink.batch_stats[-1] == (0, 4, 3, 3, 2, 1)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.doc_id for r in out.collect()) == [1]
