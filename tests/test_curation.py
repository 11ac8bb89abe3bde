"""Round-6 curation wave: repeated-span dedup, vocab/OOV, unigram-LM
scoring, SemDeDup — operator semantics + the plan shapes the 100 TB
design depends on."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark import queries as registry
from sumologic_aws_lambda_spark.operators.dedup import duplicate_span_stats
from sumologic_aws_lambda_spark.operators.similarity import semdedup_labels

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- spans

def test_duplicate_spans_found_and_short_docs_skipped(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h tail one"),
            (2, "head a b c d e f g h"),      # shares the 8-token span
            (3, "completely different words here so no span repeats"),
            (4, "short doc"),                 # < k tokens: skipped
        ],
        "doc_id long, text string",
    )
    out = duplicate_span_stats(docs, k=8).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["n_occ"] == 2


def test_duplicate_spans_counts_intra_doc_repeats(spark):
    eight = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(1, f"{eight} x {eight}"), (2, eight)],
        "doc_id long, text string",
    )
    out = {r["n_occ"]: r["n_docs"]
           for r in duplicate_span_stats(docs, k=8).collect()}
    # the repeated span occurs 3× total (twice in doc 1, once in doc 2)
    assert 3 in out and out[3] == 2


def test_span_pipeline_single_shuffle(spark):
    """One groupBy on the span hash — the gram fan-out itself must stay
    narrow (no join/window before the aggregation)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(duplicate_span_stats(docs, k=8))
    assert "Window" not in plan
    assert "Join" not in plan


# ------------------------------------------------------------ vocab/OOV

def test_vocab_membership_is_broadcast(spark):
    qs = registry.all_queries()
    plan = _plan(qs["vocab_oov_rates"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # top-N vocab cut lowers to distributed take-ordered, not a sort
    assert "TakeOrderedAndProject" in plan


def test_oov_rate_zero_when_vocab_covers_corpus(spark):
    from sumologic_aws_lambda_spark.queries.curation import vocab_oov_rates

    out = vocab_oov_rates(spark, SF_DIR)
    rows = out.collect()
    assert all(0.0 <= r["oov_rate"] <= 1.0 for r in rows)
    assert all(r["oov_tokens"] <= r["total_tokens"] for r in rows)
    assert any(r["oov_tokens"] > 0 for r in rows)  # N=16 < pool size


# ------------------------------------------------------------ unigram LM

def test_unigram_lm_matches_handrolled(spark):
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")],
        "doc_id long, text string",
    )
    import sumologic_aws_lambda_spark.queries.curation as cur

    # replicate the query body on a toy frame via the operators it uses
    ex = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), " ")).alias("tok"),
    )
    cnt = {r["tok"]: r["c"] for r in
           ex.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).collect()}
    total = sum(cnt.values())          # a:2 b:2 c:1, total 5
    # doc 0: tokens a a b → bits = log2(5) - (2*log2(2)+log2(2))/3
    expect0 = round(math.log2(total) - (3 * math.log2(2)) / 3, 4)
    expect1 = round(math.log2(total) - (math.log2(2) + math.log2(1)) / 2, 4)
    assert cnt == {"a": 2, "b": 2, "c": 1}
    # sanity of the closed form used in the SQL/Spark twin queries
    p = {t: c / total for t, c in cnt.items()}
    direct0 = round(-(2 * math.log2(p["a"]) + math.log2(p["b"])) / 3, 4)
    assert expect0 == direct0
    assert expect1 == round(-(math.log2(p["b"]) + math.log2(p["c"])) / 2, 4)


def test_unigram_query_vocab_is_broadcast(spark):
    qs = registry.all_queries()
    plan = _plan(qs["unigram_lm_scores"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# -------------------------------------------------------------- SemDeDup

def test_semdedup_prunes_near_duplicates(spark):
    # four centroid seeds + two near-identical vectors far from seeds:
    # the later twin must be pruned, the earlier kept
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (10, [0.5, 0.5, 0.7, 0.1]),
        (11, [0.5, 0.5, 0.71, 0.1]),   # near-dup of 10
        (12, [-1.0, -1.0, -0.1, 0.0]),  # alone in its cluster
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: (r["cluster_id"], r["keep"])
           for r in semdedup_labels(df, n_centroids=2,
                                    threshold=0.95).collect()}
    assert out[10][0] == out[11][0]          # same cluster
    assert out[10][1] is True and out[11][1] is False
    assert out[12][1] is True


def test_semdedup_assignment_is_narrow(spark):
    """The corpus-side cluster assignment must not shuffle: broadcast
    centroid array + higher-order argmax, no exchange before the
    within-cluster join."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    labels = semdedup_labels(emb)
    plan = _plan(labels)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # no row_number window anywhere — argmax is the array sort
    assert "Window" not in plan


def test_semdedup_keep_counts_consistent(spark):
    qs = registry.all_queries()
    rows = qs["semdedup_prune"](spark, SF_DIR).collect()
    assert rows, "no clusters"
    for r in rows:
        assert r["n_members"] == r["n_pruned"] + r["n_kept"]
        assert r["n_kept"] >= 1    # every cluster keeps a representative


# -------------------------------------------------- mixing / manifests

def test_temperature_weights_sum_to_one_and_upweight_small(spark):
    qs = registry.all_queries()
    rows = qs["temperature_mixture_weights"](spark, SF_DIR).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-3
    small = min(rows, key=lambda r: r["src_tokens"])
    big = max(rows, key=lambda r: r["src_tokens"])
    # α<1 gives the smallest domain MORE epochs than the largest
    assert small["epochs"] > big["epochs"]
    assert all(r["epochs"] > 0 for r in rows)


def test_manifest_diff_classes(spark):
    qs = registry.all_queries()
    got = {r["change"]: r["n_docs"]
           for r in qs["dataset_manifest_diff"](spark, SF_DIR).collect()}
    n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    ids = range(n)
    expect = {
        "added": sum(1 for i in ids if i % 7 == 0 and i % 13 != 0),
        "removed": sum(1 for i in ids if i % 13 == 0 and i % 7 != 0),
        "changed": sum(1 for i in ids
                       if i % 7 != 0 and i % 13 != 0 and i % 11 == 0),
        "unchanged": sum(1 for i in ids
                         if i % 7 != 0 and i % 13 != 0 and i % 11 != 0),
    }
    assert got == {k: v for k, v in expect.items() if v}


def test_manifest_diff_joins_fingerprints_not_text(spark):
    """The diff join must move only (doc_id, fp) — the text column is
    projected away before the exchange."""
    qs = registry.all_queries()
    plan = _plan(qs["dataset_manifest_diff"](spark, SF_DIR))
    import re as _re

    for ex in _re.findall(r"Exchange hashpartitioning\([^)]*\)", plan):
        assert "text" not in ex


# ------------------------------------------------------- span removal

def test_remove_duplicate_spans_keeps_first_occurrence(spark):
    from sumologic_aws_lambda_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    eight = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(1, f"{eight} x"), (2, f"z {eight}"), (3, "nothing shared here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(docs, k=8).collect()}
    assert out[1]["text"] == f"{eight} x"          # winner untouched
    assert out[1]["n_tokens_removed"] == 0
    assert out[2]["text"] == "z"                   # loser span cut
    assert out[2]["n_tokens_removed"] == 8
    assert out[3]["text"] == "nothing shared here"
    assert out[3]["n_tokens_removed"] == 0


def test_remove_duplicate_spans_merges_overlapping_windows(spark):
    from sumologic_aws_lambda_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    ten = "a b c d e f g h i j"     # 3 overlapping k=8 windows
    docs = spark.createDataFrame(
        [(1, ten), (2, ten)], "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(docs, k=8).collect()}
    # doc 2 is fully covered by merged overlapping windows: 10 tokens
    # removed ONCE (position-based), not 3×8
    assert out[2]["n_tokens_removed"] == 10
    assert out[2]["text"] == ""
    assert out[1]["n_tokens_removed"] == 0


def test_remove_duplicate_spans_no_window_in_plan(spark):
    from sumologic_aws_lambda_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(remove_duplicate_spans(docs))
    assert "Window" not in plan    # winner via min(struct), never a window


def test_remove_duplicate_spans_intra_doc_and_cross_doc_scope(spark):
    from sumologic_aws_lambda_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    eight = "a b c d e f g h"
    # the span repeats only WITHIN doc 1
    docs = spark.createDataFrame(
        [(1, f"{eight} x {eight}"), (2, "totally different words here")],
        "doc_id long, text string",
    )
    corpus = {r["doc_id"]: r for r in
              remove_duplicate_spans(docs, k=8).collect()}
    # ExactSubstr scope: the second intra-doc occurrence is cut
    assert corpus[1]["n_tokens_removed"] == 8
    assert corpus[1]["text"] == f"{eight} x"
    cross = {r["doc_id"]: r for r in
             remove_duplicate_spans(docs, k=8,
                                    cross_doc_only=True).collect()}
    # cross-doc scope (matching duplicate_span_stats): nothing cut
    assert cross[1]["n_tokens_removed"] == 0


def test_interleave_has_no_long_same_domain_runs(spark):
    """Stride scheduling must alternate domains at their proportions —
    the max same-source run in the prefix stays near total/min_share."""
    qs = registry.all_queries()
    rows = qs["domain_interleave_order"](spark, SF_DIR) \
        .orderBy("order_idx").collect()
    assert [r["order_idx"] for r in rows] == list(range(1, len(rows) + 1))
    # every domain appears early: by index ~2×#domains all sources seen
    n_sources = len({r["source"] for r in rows})
    early = {r["source"] for r in rows[: 3 * n_sources]}
    assert len(early) == n_sources
    # no run longer than a handful for near-uniform fixture domains
    longest, cur, prev = 1, 1, None
    for r in rows:
        cur = cur + 1 if r["source"] == prev else 1
        prev = r["source"]
        longest = max(longest, cur)
    assert longest <= 4


def test_quality_features_survive_empty_text(spark):
    """ANSI divide-by-zero: one empty document must yield NULL ratios,
    not kill the stage."""
    from sumologic_aws_lambda_spark.operators.text import quality_features

    df = spark.createDataFrame([(1, "real text here"), (2, "")],
                               "doc_id long, text string")
    rows = {r.doc_id: r for r in quality_features(df).collect()}
    assert rows[1]["punct_ratio"] is not None
    assert rows[2]["punct_ratio"] is None
    assert rows[2]["n_chars_calc"] == 0


def test_simhash_rejects_out_of_range_bits(spark):
    import pytest

    from sumologic_aws_lambda_spark.operators.dedup import simhash

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match=r"\[1, 60\]"):
        simhash(df, bits=64)
    # 60 bits — the documented maximum — must work
    assert simhash(df, bits=60).count() == 1


# -------------------------------------------------------------- chunking

def test_chunk_documents_short_doc_single_chunk(spark):
    from sumologic_aws_lambda_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=8, overlap=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["chunk_idx"], r["start_tok"], r["n_chunk_tokens"]) == (0, 0, 3)
    assert r["chunk_text"] == "a b c"


def test_chunk_documents_overlap_and_tail(spark):
    from sumologic_aws_lambda_spark.operators.text import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    docs = spark.createDataFrame([(1, " ".join(toks))],
                                 "doc_id long, text string")
    out = sorted(
        chunk_documents(docs, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: r["chunk_idx"])
    # stride 2: starts 0,2,4,6 cover through token 9 (ceil((10-4)/2)+1=4)
    assert [r["start_tok"] for r in out] == [0, 2, 4, 6]
    assert [r["chunk_text"] for r in out] == [
        "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9"]
    # consecutive chunks share exactly the 2-token overlap
    assert out[0]["chunk_text"].split()[-2:] == \
        out[1]["chunk_text"].split()[:2]


def test_chunk_documents_exact_boundary_no_empty_tail(spark):
    from sumologic_aws_lambda_spark.operators.text import chunk_documents

    toks = [f"t{i}" for i in range(8)]   # n == chunk + 2*stride exactly
    docs = spark.createDataFrame([(1, " ".join(toks))],
                                 "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=4, overlap=2).collect()
    assert [r["n_chunk_tokens"] for r in
            sorted(out, key=lambda r: r["chunk_idx"])] == [4, 4, 4]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest
    from sumologic_aws_lambda_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_chunk_documents_plan_has_no_shuffle(spark):
    from sumologic_aws_lambda_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([(1, "a b c d e")],
                                 "doc_id long, text string")
    plan = _plan(chunk_documents(docs, chunk_tokens=4, overlap=1))
    assert "Exchange" not in plan
