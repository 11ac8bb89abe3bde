"""Physical-plan regression tests: assert the *shape* we designed for
100 TB, not just the results.  These pin the properties README claims:
pushdown reaches the scan, dims broadcast, top-k never global-sorts,
the CWL hot path never shuffles, and pair generation never goes
cartesian.  If Catalyst ever picks a different strategy (upgrade, config
drift), these fail loudly."""

from __future__ import annotations

import os

import pytest

from sumologic_aws_lambda_spark import queries as registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def qs():
    return registry.all_queries()


def test_filter_project_pushes_down(spark, qs):
    plan = _plan(qs["filter_project"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    # at least one predicate actually pushed (not the empty list)
    assert "PushedFilters: []" not in plan


def test_dim_joins_broadcast_not_smj(spark, qs):
    for name in ("region_rollup_join", "vpc_eni_enrichment",
                 "two_hop_dim_join"):
        plan = _plan(qs[name](spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_topk_lowers_to_take_ordered(spark, qs):
    plan = _plan(qs["revenue_topk"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    # no full global Sort node outside the take-ordered operator
    assert plan.count("Sort ") <= plan.count("SortMergeJoin")


def test_paged_results_is_take_ordered_not_global_sort(spark, qs):
    """W2: OFFSET/LIMIT paging must bound the data via distributed top-k
    (TakeOrderedAndProject) BEFORE the offset window — the naive
    row_number-over-everything form funnels the whole table into one
    partition."""
    plan = _plan(qs["paged_results"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    # the only window runs after the take-ordered bound, so no exchange
    # ships the full table to a single partition
    assert "Exchange hashpartitioning" not in plan


def test_cwl_hot_path_is_narrow(spark, qs):
    """S1/§3.1: decode → explode → parse → route, zero shuffles."""
    plan = _plan(qs["cwl_decode_pipeline"](spark, SF_DIR))
    assert "Exchange" not in plan


def test_cwl_decode_single_python_stage(spark, qs):
    """r15: gunzip_udf is an optimizer-fenced (asNondeterministic)
    pandas UDF, so predicate pushdown can no longer clone the decode
    below the CONTROL_MESSAGE filter — exactly ONE Python stage per
    query (the pre-fence plan had two: every payload gunzipped and
    JSON-parsed twice, two Python round-trips per task)."""
    plan = _plan(qs["cwl_decode_pipeline"](spark, SF_DIR))
    assert plan.count("ArrowEvalPython") == 1


def test_vpc_enrichment_reuses_ip_subnet_broadcast(spark, qs):
    """r15: the (ip → subnet) lookup is joined twice via dataframe
    aliases over ONE frame, so the two broadcast subtrees canonicalize
    identically and AQE runtime exchange reuse executes the dimension
    aggregate + broadcast build once (the old withColumnRenamed copies
    were non-canonical — the agg ran twice per query).  Runtime
    property: assert on the POST-execution adaptive plan."""
    df = qs["vpc_eni_enrichment"](spark, SF_DIR)
    df.collect()
    assert "ReusedExchange" in _plan(df)


def test_asof_join_is_single_shuffle_no_join(spark, qs):
    """The as-of join compiles to union+window: no join operator, and
    only the one hash exchange for the window partition key."""
    plan = _plan(qs["asof_join_last_click"](spark, SF_DIR))
    assert "Join" not in plan.replace("joinType", "")
    assert plan.count("Exchange hashpartitioning") <= 2  # window + agg


def test_lsh_pairs_never_cartesian(spark, qs):
    for name in ("minhash_lsh_pairs", "lsh_ann_topk"):
        plan = _plan(qs[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name


def test_neardup_pairs_no_cartesian(spark, qs):
    """Near-dup pair generation must be the banded-LSH equi-join, never
    the r4 all-pairs theta join (O(n²), no partitionable key)."""
    plan = _plan(qs["embedding_neardup_pairs"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_winner_no_content_hash_window(spark, qs):
    """Dedup winners must come from map-side-combinable groupBy aggs —
    a row_number window partitioned by the content hash serializes all
    copies of a hot duplicate into one task (r4 'What's wrong' #3)."""
    for name in ("paragraph_dedup_stats", "exact_dedup_stats"):
        plan = _plan(qs[name](spark, SF_DIR))
        assert "Window" not in plan, name
        assert "partial_min" in plan or "partial_count" in plan, name


def test_range_join_broadcasts_tiny_dim(spark, qs):
    plan = _plan(qs["range_join_value_bands"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_agg_is_partial_plus_final(spark, qs):
    """Catalyst must map-side combine before the exchange (§2.6 note)."""
    plan = _plan(qs["pricing_summary"](spark, SF_DIR))
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("Exchange")  # below it


def test_whole_stage_codegen_active(spark, qs):
    import contextlib
    import io

    # AQE defers codegen to runtime stages; disable it for the inspection
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs["pricing_summary"](spark, SF_DIR).explain("codegen")
        out = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in out
    assert "Found 0 WholeStageCodegen" not in out


def test_hash_sample_is_shuffle_free_and_pruned(spark, qs):
    """The threshold sample is a pure filter: no exchange, and the scan
    reads only the three projected columns."""
    plan = _plan(qs["sample_by_hash"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "ReadSchema" in plan
    assert "text" not in plan.split("ReadSchema")[1][:200]


def test_fillmissing_axis_broadcasts(spark, qs):
    """The dense time axis (slices rows) must broadcast back onto the
    series — a sort-merge join here would shuffle the whole series for
    a dimension-sized axis."""
    plan = _plan(qs["sumoql_fillmissing_zero"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_subsearch_join_broadcasts_postagg_side(spark, qs):
    """Both join operands are post-aggregation frames; the smaller must
    broadcast rather than shuffle-merge."""
    plan = _plan(qs["sumoql_subsearch_join"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_predict_fit_broadcasts(spark, qs):
    """The OLS fit is one tiny agg row joined back to the series —
    broadcast, never a shuffle join."""
    plan = _plan(qs["sumoql_predict_linear"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan


def test_ngram_bucket_pairs_has_no_self_join(spark, qs):
    """The df-cut Jaccard generates pairs inside shingle buckets: no
    join operator over the exploded shingles (the hot-shingle exclusion
    is the lone broadcast anti-join), no sort-merge anywhere."""
    plan = _plan(qs["ngram_jaccard_pairs"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # every join is broadcast-side (hot-shingle LeftAnti exclusion +
    # size lookups on the small pair frame) — the shingle-keyed
    # equi-SELF-join of the old shape must not reappear
    assert "LeftAnti" in plan


def test_ivf_assignment_is_narrow(spark, qs):
    """IVF centroid assignment must not shuffle the corpus: the only
    hash exchanges allowed are the K-row centroid collect_list aggs and
    the final per-query top-k window; the corpus side of the candidate
    join must arrive un-exchanged (probe side broadcasts)."""
    plan = _plan(qs["ivf_ann_topk"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # no corpus-wide row_number window for the argmax (VERDICT r1 #4) —
    # exactly one Window operator: the final top-k.
    assert plan.count("Window") - plan.count("WindowGroupLimit") <= 1
    # hash exchanges: 2× single-partition centroid agg + 1 top-k window
    assert plan.count("Exchange hashpartitioning") <= 1
    assert plan.count("Exchange SinglePartition") <= 2


def test_logreduce_prunes_and_single_agg_shuffle(spark, qs):
    """Signature clustering is scan → project → partial agg → exchange →
    final agg: exactly one shuffle, message text never read (built from
    typed columns)."""
    plan = _plan(qs["logreduce_signatures"](spark, SF_DIR))
    assert plan.count("Exchange") - plan.count("BroadcastExchange") <= 2
    assert "HashAggregate" in plan  # Object/Hash, never SortAggregate
    assert "SortAggregate" not in plan


def test_decontamination_broadcasts_benchmark_no_corpus_shuffle(spark, qs):
    """The benchmark gram set must broadcast; the corpus side may only
    shuffle AFTER the broadcast join has pruned it to the (rare) hits —
    so at most 2 hash exchanges (bench distinct + hits groupBy), never a
    shuffle of the full exploded corpus."""
    plan = _plan(qs["ngram_decontamination"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_domain_mixture_broadcasts_rates(spark, qs):
    """Per-source rates are dimension-sized and must broadcast back onto
    the corpus; membership is then a narrow filter."""
    plan = _plan(qs["domain_mixture_sample"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_char_entropy_is_fully_narrow(spark, qs):
    """Entropy is a pure per-row expression — zero exchanges."""
    plan = _plan(qs["char_entropy_scores"](spark, SF_DIR))
    assert "Exchange" not in plan


def test_int8_quantize_is_fully_narrow(spark, qs):
    """Quantization is per-row Column math — zero exchanges."""
    plan = _plan(qs["embedding_quantize_int8"](spark, SF_DIR))
    assert "Exchange" not in plan


def test_int8_ann_rerank_broadcasts_queries_no_corpus_shuffle(spark, qs):
    """Coarse scoring must broadcast the query codes over the corpus
    (never a shuffle join / cartesian), and the only hash exchanges are
    the two per-query top-k windows over candidate rows."""
    plan = _plan(qs["int8_ann_rerank"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_count_frequent_is_take_ordered(spark, qs):
    """count_frequent must lower to TakeOrderedAndProject over the
    grouped counts — no global sort."""
    plan = _plan(qs["sumoql_count_frequent"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_top_bigrams_stages_token_split(spark, qs):
    """The staged gram build must survive optimization as TWO projections
    — the Project computing ``grams`` references the bound ``_toks``
    attribute, never a re-inlined ``split``.  (CollapseProject merging
    them would re-evaluate the split per gram reference.  The separate
    ``size(...) > 0`` filter Catalyst infers from the explode does inline
    the split — that's InferFiltersFromGenerate, identical in both forms
    and not what this guards.)"""
    df = qs["top_bigrams_per_source"](spark, SF_DIR)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    gram_lines = [ln for ln in optimized.splitlines()
                  if "AS grams" in ln]
    assert gram_lines, "staged grams projection disappeared"
    assert all("split(" not in ln for ln in gram_lines)
    assert all("_toks" in ln for ln in gram_lines)


def test_no_inferred_generator_filter(spark, qs):
    """InferFiltersFromGenerate must stay excluded: it infers
    size(grams) > 0 before explode and pushdown then inlines the WHOLE
    gram expression into a Filter below the parallelizing exchange,
    re-running split+regexp per element on a single partition (measured
    9x on top_bigrams_per_source).  Guard the optimized plan: no Filter
    node may contain the gram-generating transform."""
    opt = qs["top_bigrams_per_source"](spark, SF_DIR) \
        ._jdf.queryExecution().optimizedPlan().toString()
    for line in opt.splitlines():
        if line.strip().startswith(("Filter", "+- Filter")) or \
                " Filter " in f" {line.split('[')[0]} ":
            assert "transform(" not in line, (
                "generator expression inlined into a Filter — "
                "InferFiltersFromGenerate is active again:\n" + line[:300])


def test_curation_pipeline_dedup_has_no_window(spark, qs):
    """Exact dedup inside the curation composite must be the
    partial-aggregatable min(struct) groupBy, never a row_number window
    partitioned by the content hash (VERDICT r4 #3: every copy of a hot
    duplicated doc shares one hash, so the window serializes them into a
    single task)."""
    plan = _plan(qs["curation_pipeline"](spark, SF_DIR))
    assert "Window" not in plan


def test_paragraph_dedup_has_no_window_and_one_corpus_shuffle(spark, qs):
    """paragraph_dedup: winner-by-min groupBy on the paragraph hash, no
    content-hash window; totals come from a narrow arithmetic
    projection, so the exploded corpus shuffles exactly once."""
    plan = _plan(qs["paragraph_dedup_stats"](spark, SF_DIR))
    assert "Window" not in plan


def test_runtime_bloom_filter_reaches_fact_scan(spark):
    """100 TB technique: a selective filter on one join side should
    propagate to the other side's SCAN as a runtime Bloom filter —
    rows that cannot match are dropped before the shuffle, not after.
    Spark injects it when the creation side is small enough; pin that
    the engine's plans stay eligible (equi-join on a raw column, no
    expression wrapping the key that would block the rewrite)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "10GB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        o = spark.read.parquet(
            f"{SF_DIR}/orders.parquet"
        ).filter(F.col("o_orderpriority") == "1-URGENT")
        j = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority").count())
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_curation_funnel_reads_corpus_at_most_twice(spark, qs):
    """Round-6 advisory: the funnel used to re-scan documents once per
    stage (5 reads).  Now: one conditional aggregate over the scan
    (stage 0/1), one dedup-winner shuffle whose output is persisted for
    the three downstream consumers — so the corpus contributes at most
    TWO distinct parquet scans to the plan and the winner pool is
    cached (InMemoryTableScan present)."""
    import re

    df = qs["curation_pipeline_funnel"](spark, SF_DIR)
    plan = _plan(df)
    assert "InMemoryTableScan" in plan
    scan_lines = {
        re.sub(r"^[\s:+\-*()\d]+", "", ln)
        for ln in plan.splitlines()
        if "Scan parquet" in ln or "FileScan parquet" in ln
    }
    assert len(scan_lines) <= 2, sorted(scan_lines)


# Frames where an unpartitioned window is BOUNDED by construction, so a
# single-partition sort is the point, not a bottleneck.  Every entry
# must say why; anything not listed (and not fed by a Limit — the
# pagination pattern) fails the registry-wide guard below.  Round 13:
# every SITE behind these entries goes through
# planmarks.bounded_global_window, which demands the bound sentence at
# the call site too — the invariant is now local to the code, not just
# to this list (round-12 verdict item 6).
_GLOBAL_WINDOW_OK = {
    # SumoQL `accum` / timeslice series semantics: the window runs over
    # the post-aggregation timeslice series (one row per slice).
    "sumoql_accum_total",
    "sumoql_outlier_series",
    # SLO burn-rate / error-budget: post-agg timeslice series frames.
    "slo_burn_rate_windows",
    "slo_error_budget",
    # Rank over the vocabulary-sized token-count frame (vocab_cap).
    "zipf_spectrum",
    # Dimension-sized chunking (supplier); docstring records the
    # foreachPartition local-batching 100 TB alternative.
    "chunked_batches",
}


def test_no_unbounded_global_windows_registry_wide(spark, qs):
    """Round-7 regression guard: rfm_segmentation shipped three global
    ntile windows ("No Partition Defined for Window" × 8 at runtime).
    Walk EVERY registry query's optimized plan and fail on any Window
    with an empty partitionSpec that is neither Limit-bounded nor on
    the documented allowlist of series/vocab/dim-sized frames."""
    from sumologic_aws_lambda_spark.testing.plans import (
        unbounded_global_windows,
    )

    offenders = {}
    for name, fn in qs.items():
        if name in _GLOBAL_WINDOW_OK:
            continue
        n = unbounded_global_windows(fn(spark, SF_DIR))
        if n:
            offenders[name] = n
    assert not offenders, (
        f"unbounded global windows (single-partition sort at scale): "
        f"{offenders}; partition the window, bound it with limit(k), "
        f"or mark the site with planmarks.bounded_global_window AND "
        f"justify an allowlist entry in _GLOBAL_WINDOW_OK")


def test_bounded_global_window_demands_a_real_bound(spark):
    """The round-13 call-site marker refuses a vacuous bound — the
    helper must never become a silent cargo-cult escape hatch for the
    registry-wide guard above."""
    from sumologic_aws_lambda_spark.planmarks import bounded_global_window

    w = bounded_global_window(
        "x", bound="post-agg series, one row per slice")
    df = spark.range(5).withColumnRenamed("id", "x")
    from pyspark.sql import functions as F

    assert df.select(F.row_number().over(w).alias("r")).count() == 5
    for bad in ("", "   ", "bounded", None):
        with pytest.raises((ValueError, TypeError)):
            bounded_global_window("x", bound=bad)
    with pytest.raises(TypeError):
        bounded_global_window("x")  # bound is keyword-required


def test_guard_flags_window_over_fact_join_with_limited_dim(spark):
    """Round-8 review regression: a Limit ANYWHERE in the subtree must
    not exempt the window — facts ⋈ dim.limit(5) is still fact-sized.
    Conversely the sanctioned pagination pattern (window over the
    orderBy+limit head) stays exempt."""
    from sumologic_aws_lambda_spark.testing.plans import (
        unbounded_global_windows,
    )
    from pyspark.sql import Window, functions as F

    facts = spark.range(1000).withColumn("k", F.col("id") % 7)
    dim = spark.range(7).withColumnRenamed("id", "k").limit(5)
    bad = (
        facts.join(dim, "k")
        .withColumn("rn", F.row_number().over(Window.orderBy("id")))
    )
    assert unbounded_global_windows(bad) == 1

    ok = (
        facts.orderBy("id").limit(20)
        .withColumn("rn", F.row_number().over(Window.orderBy("id")))
    )
    assert unbounded_global_windows(ok) == 0


def test_crawl_funnel_psl_keying_stays_broadcast(spark, qs):
    """Round-12: the crawl funnels key on the FULL 9,506-rule PSL
    snapshot — the two DATA-SCALE tiers (5,473 + 2,302 exact rules)
    must be BROADCAST joins, the eight small tiers codegen'd set
    membership (a broadcast exchange costs ~0.2 s fixed latency per
    tier — ten of them tripled the funnels' bench time), riding AFTER
    the canonical groupBy (keeper rows only) with zero added
    shuffles: still ONE parquet scan, no SortMergeJoin, and exactly
    the two pre-existing hash exchanges (canonical groupBy +
    publisher-window rank)."""
    plan = _plan(qs["crawl_stage0_funnel"](spark, SF_DIR))
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2
    assert plan.count("Exchange hashpartitioning") == 2


def test_psl_snapshot_single_scan_all_broadcast(spark, qs):
    """The full-9.5k-rule PSL path must stay ONE parquet scan with the
    two data-scale tiers BROADCAST-joined (small tiers inline as set
    membership — see the funnel test above) and exactly one hash
    exchange (the cap window on reg_dom, whose partitioning the final
    groupBy reuses) — the production plan where only the rule tables
    grow with the list."""
    plan = _plan(qs["psl_snapshot_domains"](spark, SF_DIR))
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2
    assert plan.count("Exchange hashpartitioning") == 1


# The shuffle audit's ADJUDICATED flag set (round-14, verdict item 1:
# the hand-maintained "36 flagged" BASELINE sentence drifted from the
# shipped tree's 37 — exactly the failure mode _GLOBAL_WINDOW_OK was
# built to prevent, so the adjudication now lives here, in code).
# name -> (frozenset of expected flags, why the shape is correct at
# 100 TB).  The registry-wide guard below recomputes every query's
# flags with the SAME code the tool uses
# (testing.plans.audit_flags, executedPlan at SF_DIR) and fails on any
# unadjudicated flag, any vanished flag, or any count change — adding
# an operator whose plan carries a new flag means adjudicating it HERE
# with a reason, not editing prose.
_SMJ_GRAPH = ("fact-fact edge self-joins: both sides corpus-scale, "
              "SMJ is the correct strategy; r13 10x probes measured "
              "sublinear (wedge-bound)")
_SMJ_BANDED = ("banded candidate self-join: both sides are the "
               "banded fact, equi-join on (band, key) — never "
               "all-pairs; SMJ correct for fact-fact")
_SMJ_TPCH = ("fact-fact join (orders-lineitem family): both sides "
             "data-scale, SMJ is the right strategy; dims still "
             "broadcast")
_MANY_AGG = ("multi-stage agg/window pipeline: each exchange is a "
             "distinct-key-scale partial-agg or window repartition, "
             "none corpus-redundant")
_GWIN = ("bounded global window adjudicated in _GLOBAL_WINDOW_OK; "
         "site marked via planmarks.bounded_global_window")
_AUDIT_FLAGS_OK: dict[str, tuple[frozenset, str]] = {
    # -- graph tier: SMJ + many exchanges, all edge self-joins --
    "clustering_coefficients": (frozenset({"SMJ", "MANY-EXCHANGES"}),
                                _SMJ_GRAPH),
    "triangle_communities": (frozenset({"SMJ", "MANY-EXCHANGES"}),
                             _SMJ_GRAPH),
    "link_prediction_scores": (frozenset({"SMJ", "MANY-EXCHANGES"}),
                               _SMJ_GRAPH),
    # -- dedup/similarity tier: banded/bucketed candidate joins --
    # r14: MANY-EXCHANGES dropped — narrow minhash vectors (no
    # signature SortAggregate exchange) + zip_with agreement estimate
    # (no per-seed groupBy) removed the excess exchanges
    "minhash_calibration": (frozenset({"SMJ"}), _SMJ_BANDED),
    # r15: MANY-EXCHANGES dropped — the output semi-join (which
    # re-derived the touched-node union/distinct) was replaced by the
    # member pre-filter over the checkpointed node set, so the final
    # plan is labels ∪ (anti-join over two checkpointed frames)
    "semantic_dedup_clusters_star": (
        frozenset({"SMJ"}),
        "large-star/small-star contraction rounds join corpus-scale "
        "cluster-id frames; SMJ correct, rounds bounded"),
    "ahash_real_neardup": (frozenset({"SMJ"}), _SMJ_BANDED),
    "phash_hamming_neardup": (frozenset({"SMJ"}), _SMJ_BANDED),
    "semdedup_prune": (frozenset({"SMJ"}), _SMJ_BANDED),
    "ngram_jaccard_pairs": (frozenset({"MANY-EXCHANGES"}), _SMJ_BANDED),
    # -- TPC-H-style fact-fact analytics --
    "min_cost_supplier": (frozenset({"SMJ", "MANY-EXCHANGES"}),
                          _SMJ_TPCH),
    "waiting_orders_suppliers": (frozenset({"SMJ", "MANY-EXCHANGES"}),
                                 _SMJ_TPCH),
    "market_share": (frozenset({"SMJ"}), _SMJ_TPCH),
    "volume_shipping": (frozenset({"SMJ"}), _SMJ_TPCH),
    "cdc_snapshot_merge": (frozenset({"SMJ"}),
                           "full-outer snapshot-to-snapshot merge: "
                           "both sides the same table's versions"),
    "dataset_manifest_diff": (frozenset({"SMJ"}),
                              "manifest-to-manifest full-outer diff: "
                              "both sides shard-manifest scale"),
    # -- multi-stage agg/window pipelines (exchanges only) --
    "part_affinity_rules": (frozenset({"MANY-EXCHANGES"}), _MANY_AGG),
    "curation_pipeline_funnel": (frozenset({"MANY-EXCHANGES"}),
                                 _MANY_AGG),
    # r14: bm25_retrieval's MANY-EXCHANGES dropped — tf/dlen are now
    # row properties and all corpus stats come from one broadcast agg
    "chi2_event_weekday": (frozenset({"MANY-EXCHANGES"}), _MANY_AGG),
    "embedding_centroid_drift": (frozenset({"MANY-EXCHANGES"}),
                                 _MANY_AGG),
    "bigram_lm_perplexity": (frozenset({"MANY-EXCHANGES"}), _MANY_AGG),
    # r14: crawl_stage1_funnel's MANY-EXCHANGES dropped — the narrow
    # minhash/band-key rewrite removed the signature groupBy exchanges
    "crawl_stage2_funnel": (frozenset({"MANY-EXCHANGES"}), _MANY_AGG),
    "table_profile": (frozenset({"MANY-EXCHANGES"}),
                      "r14 Expand-removal: five per-column distinct "
                      "counts as separate partial-agg frames broadcast "
                      "back as 1-row joins — exchange count fixed in "
                      "columns, each distinct-value-scale, replaces a "
                      "6x Expand SortAggregate of the corpus"),
    "event_funnel_conversion": (frozenset({"MANY-EXCHANGES"}),
                                _MANY_AGG),
    "event_markov_transitions": (frozenset({"MANY-EXCHANGES"}),
                                 _MANY_AGG),
    "funnel_conversion_rates": (frozenset({"MANY-EXCHANGES"}),
                                _MANY_AGG),
    "growth_accounting_weekly": (frozenset({"MANY-EXCHANGES"}),
                                 _MANY_AGG),
    "monitor_alert_throttle": (frozenset({"MANY-EXCHANGES"}),
                               _MANY_AGG),
    "revenue_concentration": (frozenset({"MANY-EXCHANGES"}), _MANY_AGG),
    "seasonal_residual_outliers": (frozenset({"MANY-EXCHANGES"}),
                                   _MANY_AGG),
    "winnowing_fingerprint_stats": (frozenset({"MANY-EXCHANGES"}),
                                    _MANY_AGG),
    # -- bounded global windows (see _GLOBAL_WINDOW_OK) --
    "zipf_spectrum": (frozenset({"GLOBAL-WINDOW"}), _GWIN),
    "slo_burn_rate_windows": (frozenset({"GLOBAL-WINDOW"}), _GWIN),
    "slo_error_budget": (frozenset({"GLOBAL-WINDOW"}), _GWIN),
    "sumoql_accum_total": (frozenset({"GLOBAL-WINDOW"}), _GWIN),
    "sumoql_outlier_series": (frozenset({"GLOBAL-WINDOW"}), _GWIN),
    "chunked_batches": (frozenset({"GLOBAL-WINDOW"}), _GWIN),
}


def test_audit_flags_match_adjudicated_set_registry_wide(spark, qs):
    """Round-14 verdict item 1: recompute every registry query's
    shuffle-audit flags (same computation as tools/audit_shuffles.py)
    and fail on ANY divergence from _AUDIT_FLAGS_OK — an unadjudicated
    new flag, a flag that silently vanished (the adjudication is then
    stale), or an entry for a query that no longer exists."""
    from sumologic_aws_lambda_spark.testing.plans import audit_flags

    problems = []
    seen = set()
    for name, fn in qs.items():
        flags = frozenset(audit_flags(fn(spark, SF_DIR)))
        expected = _AUDIT_FLAGS_OK.get(name, (frozenset(), None))[0]
        if flags != expected:
            problems.append(f"{name}: plan flags {sorted(flags)} != "
                            f"adjudicated {sorted(expected)}")
        seen.add(name)
    for name in _AUDIT_FLAGS_OK:
        if name not in seen:
            problems.append(f"{name}: adjudicated but not in registry")
    assert not problems, (
        "shuffle-audit adjudication drift — update _AUDIT_FLAGS_OK "
        "WITH a reason (and re-run tools/audit_shuffles.py):\n"
        + "\n".join(problems))
    # 37 at r14 rotation; 36 after the r14 optimizations (bm25 and
    # crawl_stage1 lost MANY-EXCHANGES, table_profile gained it)
    assert len(_AUDIT_FLAGS_OK) == 36
