"""Streaming stage-2 curation: the cross-batch token-budget sink and
the composed CurationStage2Sink (stage-1 chain → repetition gate →
hash sample → per-publisher token budget), including batch-funnel
parity and redelivery idempotence."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.streaming.domain_cap import (
    TokenBudgetSink,
)
from sumologic_aws_lambda_spark.streaming.neardup import (
    CurationStage2Sink,
)


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, pub string, toks bigint")


def _budget_sink(spark, tmp_path, budget=100):
    return TokenBudgetSink(
        spark, str(tmp_path / "store"), str(tmp_path / "out"),
        weight_col="toks", url_col="pub", order_col="doc_id",
        budget=budget, key_fn=lambda c: c)


def test_token_budget_within_and_across_batches(spark, tmp_path):
    sink = _budget_sink(spark, tmp_path)
    sink(_rows(spark, [
        (1, "a", 40), (2, "a", 50), (3, "a", 30),   # cum 40/90/120
        (4, "b", 99),
    ]), 0)
    assert sink.batch_stats[-1] == (0, 4, 3)        # doc 3 over budget
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 4]
    # doc 3's tokens still CONSUMED the budget (batch-funnel cumsum
    # semantics): a tiny later doc cannot sneak in under the cap
    sink(_rows(spark, [(5, "a", 5), (6, "b", 1)]), 1)
    assert sink.batch_stats[-1] == (1, 2, 1)        # only b admits
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 4, 6]


def test_token_budget_redelivery_is_idempotent(spark, tmp_path):
    sink = _budget_sink(spark, tmp_path)
    b0 = _rows(spark, [(1, "a", 60), (2, "a", 60)])
    sink(b0, 0)
    sink(b0, 0)     # redelivery after both writes
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.doc_id for r in out.collect()) == [1]
    # budget consumed exactly once: 120 recorded, not 240
    store = spark.read.parquet(str(tmp_path / "store"))
    assert store.agg(F.sum("toks")).collect()[0][0] == 120
    sink(_rows(spark, [(3, "a", 1)]), 1)
    assert sink.batch_stats[-1] == (1, 1, 0)


def test_token_budget_null_weight_and_key(spark, tmp_path):
    sink = _budget_sink(spark, tmp_path, budget=10)
    sink(_rows(spark, [
        (1, None, 4), (2, None, 8),      # (null) sentinel shares budget
        (3, "a", None),                  # NULL weight counts 0
    ]), 0)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.doc_id for r in out.collect()) == [1, 3]


def test_token_budget_validates_at_construction():
    with pytest.raises(ValueError, match="budget"):
        TokenBudgetSink(None, "s", "o", weight_col="w", budget=-1)


def test_stage2_sink_matches_batch_funnel(spark, tmp_path):
    """Streaming/batch parity across all SEVEN stages: URL dedup,
    registered-domain cap, extraction+gates, MinHash near-dedup,
    repetition-ratio gate, hash sample, per-publisher token budget —
    the composed sink over two doc_id-ordered micro-batches admits
    EXACTLY the documents ``crawl_stage2_funnel`` keeps (count AND
    doc_id sum)."""
    from sumologic_aws_lambda_spark.operators.html import (
        extract_main_text,
    )
    from sumologic_aws_lambda_spark.queries.curation import (
        _FUNNEL_CAP,
        _funnel_fixture_url,
        _s2_fixture_html,
        crawl_stage2_funnel,
    )
    from tests.conftest import SF_DIR

    funnel = {r.stage: r.n_docs
              for r in crawl_stage2_funnel(spark, SF_DIR).collect()}

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", _funnel_fixture_url().alias("url"),
        _s2_fixture_html().alias("page_html"))
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    sink = CurationStage2Sink(
        spark, str(tmp_path / "fp"), str(tmp_path / "cap"),
        str(tmp_path / "band"), str(tmp_path / "budget"),
        str(tmp_path / "out"),
        url_col="url", order_col="doc_id", cap=_FUNNEL_CAP,
        content_col="page_html",
        extract=lambda c: extract_main_text(c)["extracted_text"],
        min_chars=120, token_band=(15, 1000), sample_hex="b2",
        token_budget=100)
    sink(docs.filter(F.col("doc_id") <= mid), 0)
    sink(docs.filter(F.col("doc_id") > mid), 1)

    out = spark.read.parquet(str(tmp_path / "out"))
    got = out.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("doc_id").alias("s")).collect()[0]
    assert got.n == funnel["d_token_budget"]
    assert got.s == funnel["e_kept_docid_sum"]
    stats = sink.batch_stats
    assert sum(s[5] for s in stats) == funnel["a_near_dup"]
    assert sum(s[6] for s in stats) == funnel["b_quality"]
    assert sum(s[7] for s in stats) == funnel["c_sampled"]
    assert sum(s[8] for s in stats) == funnel["d_token_budget"]


def test_stage2_sink_redelivery_is_idempotent(spark, tmp_path):
    """Redelivering batch 0 AFTER all five persistent writes recomputes
    the identical admit set: no duplicate output rows, no cap or token
    budget consumed twice."""
    from sumologic_aws_lambda_spark.operators.html import (
        extract_main_text,
    )
    from sumologic_aws_lambda_spark.queries.curation import (
        _FUNNEL_CAP,
        _funnel_fixture_url,
        _s2_fixture_html,
    )
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", _funnel_fixture_url().alias("url"),
        _s2_fixture_html().alias("page_html"))
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    sink = CurationStage2Sink(
        spark, str(tmp_path / "fp"), str(tmp_path / "cap"),
        str(tmp_path / "band"), str(tmp_path / "budget"),
        str(tmp_path / "out"),
        url_col="url", order_col="doc_id", cap=_FUNNEL_CAP,
        content_col="page_html",
        extract=lambda c: extract_main_text(c)["extracted_text"])
    b0 = docs.filter(F.col("doc_id") <= mid)
    sink(b0, 0)
    first = sink.batch_stats[-1]
    sink(b0, 0)     # full redelivery
    assert sink.batch_stats[-1] == first
    sink(docs.filter(F.col("doc_id") > mid), 1)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == out.select("doc_id").distinct().count()
    assert out.count() == sum(
        s[8] for s in (sink.batch_stats[0], sink.batch_stats[2]))


def test_stage2_sample_hex_validated():
    with pytest.raises(ValueError, match="sample_hex"):
        CurationStage2Sink(None, "a", "b", "c", "d", "e",
                           sample_hex="B2")


def test_stage2_engine_driven_micro_batches(spark, tmp_path):
    """Two engine-driven availableNow runs over one checkpoint: the
    second run's batch pays URL-dedup, cap, band and TOKEN budget
    against the first run's stores."""
    import json as _json

    from sumologic_aws_lambda_spark.streaming.neardup import (
        run_curation_stage2,
    )

    (tmp_path / "in").mkdir()
    tpl = " ".join(f"s{i}x{i}" for i in range(30))   # 30 words, >120 chars

    def run():
        q, sink = run_curation_stage2(
            spark, str(tmp_path / "in"), str(tmp_path / "fp"),
            str(tmp_path / "cap"), str(tmp_path / "band"),
            str(tmp_path / "budget"), str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
            cap=10, min_chars=120, token_band=(15, 1000),
            sample_hex="ff",      # sample-all: isolate the budget stage
            token_budget=70)
        q.awaitTermination(120)
        return sink

    (tmp_path / "in" / "b1.json").write_text("\n".join(
        _json.dumps({"doc_id": i, "url": u, "text": t}) for i, u, t in [
            (1, "https://a.pub.org/1", tpl + " one two"),       # 32 tok
            (2, "https://a.pub.org/1", tpl + " dup spelling"),  # url dup
            (3, "https://b.pub.org/3", tpl + " three four"),    # 32 tok
        ]) + "\n")
    sink = run()
    # (id, in, url_dedup, capped, gated, nd, quality, sampled, admitted)
    assert sink.batch_stats[-1] == (0, 3, 2, 2, 2, 1, 1, 1, 1)

    (tmp_path / "in" / "b2.json").write_text("\n".join(
        _json.dumps({"doc_id": i, "url": u, "text": t}) for i, u, t in [
            # near-dup of doc 1 (earlier run's band store must block it)
            (4, "https://c.pub.org/4", tpl + " nine ten"),
            # distinct content, same publisher: 32 prior + 39 > 70
            (5, "https://d.pub.org/5",
             " ".join(f"q{i}z{i}" for i in range(37)) + " a b"),
        ]) + "\n")
    sink = run()
    assert sink.batch_stats[-1][5] == 1       # near-dedup killed doc 4
    assert sink.batch_stats[-1][8] == 0       # budget killed doc 5
    from pyspark.sql import functions as F
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.doc_id for r in out.collect()) == [1]


def test_stage2_empty_and_fully_gated_batches(spark, tmp_path):
    """Empty micro-batches and batches where every doc fails the
    gates must write their (empty) partitions and leave the stores
    readable for later batches."""
    sink = CurationStage2Sink(
        spark, str(tmp_path / "fp"), str(tmp_path / "cap"),
        str(tmp_path / "band"), str(tmp_path / "budget"),
        str(tmp_path / "out"), sample_hex="ff")
    schema = "doc_id bigint, url string, text string"
    sink(spark.createDataFrame([], schema), 0)
    assert sink.batch_stats[-1] == (0, 0, 0, 0, 0, 0, 0, 0, 0)
    sink(spark.createDataFrame(
        [(1, "https://x.org/1", "too short")], schema), 1)
    assert sink.batch_stats[-1] == (1, 1, 1, 1, 0, 0, 0, 0, 0)
    tpl = " ".join(f"g{i}h{i}" for i in range(30))
    sink(spark.createDataFrame(
        [(2, "https://x.org/2", tpl + " a b")], schema), 2)
    assert sink.batch_stats[-1][8] == 1
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.doc_id for r in out.collect()) == [2]


def test_token_budget_reserved_store_names_do_not_shadow(
        spark, tmp_path):
    """User data columns named 'key'/'toks' (the STORE schema names)
    must ride through the budget sink untouched — the round-10
    reserved-name defect class."""
    tb = TokenBudgetSink(
        spark, str(tmp_path / "store"), str(tmp_path / "out"),
        weight_col="toks", url_col="pub", order_col="doc_id",
        budget=100, key_fn=lambda c: c)
    df = spark.createDataFrame(
        [(1, "a", 10, "userkey")],
        "doc_id bigint, pub string, toks bigint, key string")
    tb(df, 0)
    row = spark.read.parquet(str(tmp_path / "out")).collect()[0]
    assert (row.key, row.toks) == ("userkey", 10)
    with pytest.raises(ValueError, match="batch_id"):
        tb(df.withColumnRenamed("key", "batch_id"), 1)
