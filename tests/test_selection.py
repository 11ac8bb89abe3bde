"""Data-selection wave: DSIR importance weights, the Naive-Bayes
quality classifier, and the SumoQL ``logreduce`` verb — semantics
against hand-computed models, plus the plan shapes the 100 TB design
depends on (broadcast model tables, single corpus shuffle)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.operators.selection import (
    dsir_weights,
    hashed_bigrams,
    nb_token_scores,
)
from sumologic_aws_lambda_spark.plans.sumoql import (
    SumoQLError,
    SumoSchema,
    compile_query,
    logreduce_signature,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------ features

def test_hashed_bigrams_counts_and_range(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, "x y")],
        "doc_id long, text string",
    )
    rows = hashed_bigrams(docs, n_buckets=8).collect()
    # doc 1 has 2 bigrams, doc 2 none (single token), doc 3 one.
    per_doc = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
        assert 0 <= r["bucket"] < 8
    assert per_doc == {1: 2, 3: 1}


def test_hashed_bigrams_stable_across_calls(spark):
    docs = spark.createDataFrame([(1, "alpha beta gamma")],
                                 "doc_id long, text string")
    a = sorted(r["bucket"] for r in hashed_bigrams(docs).collect())
    b = sorted(r["bucket"] for r in hashed_bigrams(docs).collect())
    assert a == b


# ---------------------------------------------------------------- DSIR

def test_dsir_weights_match_hand_model(spark):
    # Two docs, one bigram each, disjoint buckets (w.h.p. for these
    # strings at 64 buckets — asserted below).  Target = doc 1.
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "cc dd")], "doc_id long, text string")
    feats = {r["doc_id"]: r["bucket"]
             for r in hashed_bigrams(docs, n_buckets=64).collect()}
    assert feats[1] != feats[2]
    out = {r["doc_id"]: r for r in dsir_weights(
        docs, F.col("doc_id") == 1, n_buckets=64).collect()}
    # p model: target has 1 gram total; q model: 2 grams total.
    lam_target = (math.log(2 / 65.0) - math.log(2 / 66.0))
    lam_other = (math.log(1 / 65.0) - math.log(2 / 66.0))
    assert out[1]["n_grams"] == 1
    assert out[1]["dsir_weight"] == pytest.approx(round(lam_target, 4))
    assert out[2]["dsir_weight"] == pytest.approx(round(lam_other, 4))
    # Target-looking text scores above raw-looking text.
    assert out[1]["dsir_weight"] > out[2]["dsir_weight"]


def test_dsir_weight_scales_with_occurrences(spark):
    # The same bigram repeated contributes its log-ratio per occurrence.
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb aa bb")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in dsir_weights(
        docs, F.lit(True), n_buckets=16).collect()}
    assert out[2]["n_grams"] == 3  # "bb aa" bridge bigram too
    # Both classes identical (target == raw) → every λ uses p==q counts.
    assert out[1]["dsir_weight"] == pytest.approx(0.0, abs=1e-4)


def test_dsir_model_table_is_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} tok{i + 2}") for i in range(20)],
        "doc_id long, text string",
    )
    plan = _plan(dsir_weights(docs, F.col("doc_id") < 5))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------------- NB model

def test_nb_scores_separate_classes(spark):
    # Token vocab perfectly separates the label → self-scoring must
    # classify every doc correctly.
    docs = spark.createDataFrame(
        [(1, "good good fine", 1), (2, "good fine", 1),
         (3, "bad awful", 0), (4, "awful bad bad", 0)],
        "doc_id long, text string, label int",
    )
    out = {r["doc_id"]: r["nb_score"] for r in nb_token_scores(
        docs, F.col("label") == 1).collect()}
    assert out[1] > 0 and out[2] > 0
    assert out[3] < 0 and out[4] < 0


def test_nb_scores_match_hand_model(spark):
    docs = spark.createDataFrame(
        [(1, "x", True), (2, "y", False)],
        "doc_id long, text string, label boolean",
    )
    out = {r["doc_id"]: r["nb_score"] for r in nb_token_scores(
        docs, F.col("label")).collect()}
    # V=2, N_pos=N_neg=1, D_pos=D_neg=1 → prior = 0.
    # llr("x") = ln(2/3) - ln(1/3) = ln 2;  llr("y") = -ln 2.
    assert out[1] == pytest.approx(round(math.log(2), 4))
    assert out[2] == pytest.approx(round(-math.log(2), 4))


def test_nb_model_join_is_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(10)],
        "doc_id long, text string",
    )
    plan = _plan(nb_token_scores(docs, F.col("doc_id") < 5))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------------ logreduce

def test_logreduce_signature_masks_each_class(spark):
    df = spark.createDataFrame(
        [
            ("id 550e8400-e29b-41d4-a716-446655440000 ok",),
            ("digest deadbeef00c0ffee done",),
            ("peer 192.168.1.250 timeout",),
            ("took 35 ms (1.5 retries)",),
        ],
        "msg string",
    )
    sigs = [r["s"] for r in
            df.select(logreduce_signature("msg").alias("s")).collect()]
    assert sigs == [
        "id * ok",
        "digest * done",
        "peer * timeout",
        "took * ms (* retries)",
    ]


def test_logreduce_stage_groups_and_ranks(spark):
    df = spark.createDataFrame(
        [("user 7 logged in",), ("user 9 logged in",),
         ("user 12 logged in",),
         ("disk 81% full",), ("disk 9% full",),
         ("one-off message",)],
        "line string",
    )
    out = compile_query(
        df, "* | logreduce", SumoSchema(raw_col="line")).collect()
    assert [(r["_signature"], r["_count"]) for r in out] == [
        ("user * logged in", 3),
        ("disk *% full", 2),
        ("one-off message", 1),
    ]


def test_logreduce_limit_and_field_options(spark):
    df = spark.createDataFrame(
        [("a 1", "x"), ("a 2", "x"), ("b 9", "y")],
        "line string, other string",
    )
    out = compile_query(
        df, "* | logreduce field=line limit=1",
        SumoSchema(raw_col="other")).collect()
    assert [(r["_signature"], r["_count"]) for r in out] == [("a *", 2)]


def test_logreduce_rejects_junk(spark):
    df = spark.createDataFrame([("x",)], "line string")
    with pytest.raises(SumoQLError):
        compile_query(df, "* | logreduce bogus",
                      SumoSchema(raw_col="line"))


def test_logreduce_no_global_sort_of_corpus(spark):
    df = spark.createDataFrame([("m 1",), ("m 2",)], "line string")
    plan = _plan(compile_query(df, "* | logreduce",
                               SumoSchema(raw_col="line")))
    assert "TakeOrderedAndProject" in plan


# ----------------------------------------------------------- logcompare

def _lc_frame(spark):
    return spark.createDataFrame(
        [
            # baseline (day 1): 3 "login" lines, 1 "disk" line
            ("2024-01-01 01:00:00", "user 1 login"),
            ("2024-01-01 02:00:00", "user 2 login"),
            ("2024-01-01 03:00:00", "user 3 login"),
            ("2024-01-01 04:00:00", "disk 50% full"),
            # target (trailing 1h of the frame): 1 login, 1 brand-new
            ("2024-01-02 23:30:00", "user 9 login"),
            ("2024-01-02 23:45:00", "kernel panic code 7"),
        ],
        "t string, line string",
    ).selectExpr("CAST(t AS TIMESTAMP) AS t", "line")


def test_logcompare_counts_and_new_flag(spark):
    out = {r["_signature"]: r for r in compile_query(
        _lc_frame(spark), "* | logcompare last 1h",
        SumoSchema(raw_col="line", ts_col="t")).collect()}
    login = out["user * login"]
    assert (login["_baseline_count"], login["_target_count"]) == (3, 1)
    assert not login["_is_new"]
    panic = out["kernel panic code *"]
    assert (panic["_baseline_count"], panic["_target_count"]) == (0, 1)
    assert panic["_is_new"]
    disk = out["disk *% full"]
    assert (disk["_baseline_count"], disk["_target_count"]) == (1, 0)
    # The brand-new template scores above both incumbents (login and
    # disk happen to tie at these counts: 2/4÷4/6 = 1/4÷2/6 = 3/4).
    assert panic["_change"] > login["_change"]
    assert panic["_change"] > disk["_change"]


def test_logcompare_change_is_smoothed_log2_ratio(spark):
    out = {r["_signature"]: r for r in compile_query(
        _lc_frame(spark), "* | logcompare last 1h",
        SumoSchema(raw_col="line", ts_col="t")).collect()}
    # B=4 baseline rows, T=2 target rows.
    expected = round(math.log2(((1 + 1) / (2 + 2)) / ((0 + 1) / (4 + 2))), 4)
    assert out["kernel panic code *"]["_change"] == pytest.approx(expected)


def test_logcompare_rejects_missing_window(spark):
    with pytest.raises(SumoQLError):
        compile_query(_lc_frame(spark), "* | logcompare",
                      SumoSchema(raw_col="line", ts_col="t"))


def test_logcompare_limit_takeordered(spark):
    df = _lc_frame(spark)
    plan = _plan(compile_query(
        df, "* | logcompare last 1h limit=2",
        SumoSchema(raw_col="line", ts_col="t")))
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------------ pipeline funnel

def test_curation_funnel_is_monotone_and_complete(spark):
    from sumologic_aws_lambda_spark.queries.selection import (
        curation_pipeline_funnel,
    )

    rows = {r["stage"]: r for r in curation_pipeline_funnel(
        spark, "/root/testdata/sf0.001").collect()}
    assert list(sorted(rows)) == [
        "0_ingest", "1_quality", "2_dedup", "3_lang", "4_select"]
    docs = [rows[s]["n_docs"] for s in sorted(rows)]
    toks = [rows[s]["n_tokens"] for s in sorted(rows)]
    # Every stage only removes documents/tokens.
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert docs[0] == 500 and docs[-1] > 0


def test_logreduce_null_messages_group_as_visible_template(spark):
    df = spark.createDataFrame(
        [("disk 1 full",), (None,), (None,)], "line string")
    out = {r["_signature"]: r["_count"] for r in compile_query(
        df, "* | logreduce", SumoSchema(raw_col="line")).collect()}
    # NULLs collapse into one "(null)" group instead of an
    # engine-ordering-dependent NULL group.
    assert out == {"(null)": 2, "disk * full": 1}


def test_logreduce_keys_clusters_by_schema(spark):
    df = spark.createDataFrame(
        [('{"b": 1, "a": 2}',), ('{"a": 9, "b": 0}',),
         ('{"a": 1}',), ("not json",), ("[1, 2]",)],
        "j string",
    )
    out = {r["_signature"]: r["_count"] for r in compile_query(
        df, "* | logreduce keys",
        SumoSchema(raw_col="j")).collect()}
    assert out == {'["a","b"]': 2, '["a"]': 1, "(no keys)": 2}
