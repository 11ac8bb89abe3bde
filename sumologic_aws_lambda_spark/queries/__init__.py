"""Query/operator registry — the driver-facing surface.

Every implemented operator from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with an ANSI
SQL oracle string that DuckDB runs over the same parquet tables.  Column
names are aliased identically on both sides — the driver sorts columns by
name before hashing values.

Registration is decorator-based; importing this package imports every
query module so the registry is fully populated.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query callable and (optionally) its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check —
    reserved for genuinely non-SQL-expressible operators (approx sketches,
    binary decode, custom stateful streaming).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The external correctness driver checks registrations in dict order and
# caps at the first 50.  Round-11 window (staleness recomputed
# programmatically this round by aggregating CORRECTNESS_r01-r10
# latest-sample rounds — freshness was {r5: 34, r6: 50, r7: 45, r8: 50,
# r9: 48, r10: 50}, CORRECTNESS_r10 was 50/50 green so no failures are
# owed a re-check): (a) the round-11 addition — registered-domain caps
# under the FULL vendored 9,506-rule PSL snapshot with the full-grammar
# generated oracle; (b) ALL 34 queries whose latest hard signal is
# round 5 (the oldest cohort — exactly the list the round-10 note owed
# this window); (c) the first 15 of the 50-query r6 cohort,
# registry-name order, filling the window to exactly 50.
_PRIORITY: tuple[str, ...] = (
    # -- (a) round-11 addition --
    "psl_snapshot_domains",
    # -- (b) oldest-validated cohort (latest hard signal round 5) --
    "ingest_include_exclude_rules", "kv_flatten_props",
    "loggroup_match", "loggroup_subscription_plan",
    "logstream_prefix_filter", "monitor_threshold_alerts",
    "multimodal_resize_plan", "nested_projection",
    "paragraph_dedup_stats", "pq_codebook_stats",
    "quality_binned_sample", "repetition_ratios",
    "rollup_hierarchy_daily", "securityhub_group_findings",
    "semantic_dedup_clusters", "shard_plan", "sns_message_parse",
    "stratified_hash_sample", "sumoql_compare_timeshift",
    "sumoql_csv_split", "sumoql_eval_functions",
    "sumoql_fillmissing_zero", "sumoql_ip_date_functions",
    "sumoql_logexplain", "sumoql_lookup_expr",
    "sumoql_parse_field_chain", "sumoql_percentile_first_last",
    "sumoql_split_values", "sumoql_subquery_compose",
    "sumoql_timeslice_buckets", "sumoql_trace_chain",
    "sumoql_transpose_matrix", "transpose_event_matrix",
    "url_decode_keys",
    # -- (c) r6 cohort, registry-name order, first 15 --
    "audio_chunk_plan", "blocked_name_matching",
    "bpe_merge_candidates", "chi2_event_weekday",
    "curation_pipeline_funnel", "dashboard_panel_data",
    "dataset_manifest_diff", "document_chunking",
    "domain_interleave_order", "domain_quality_caps",
    "dsir_importance_weights", "dsir_resample_stats",
    "event_funnel_conversion", "event_markov_transitions",
    "event_pagerank",
)

# Round-12 rotation notes: recompute programmatically by aggregating
# CORRECTNESS_r01-r11 — do not trust hand-maintained lists.  Owed the
# r12 head: any round-12 additions and anything CORRECTNESS_r11 failed,
# then the 35 r6-cohort queries this window could not fit
# (event_path_trigrams, exactsubstr_removal_stats, image_patch_grid,
# index_routing_stats, ingest_budget_enforcement,
# interval_overlap_pairs, ivfpq_ann_topk, mad_outlier_counts,
# minhash_calibration, monitor_alert_throttle, nb_quality_scores,
# pq_adc_topk, range_partition_plan, retention_cohorts,
# scheduled_view_rollup, seasonal_residual_outliers,
# semantic_dedup_clusters_star, semdedup_prune, slo_error_budget,
# split_leakage_audit, substring_dup_spans, sumoql_cidr_functions,
# sumoql_logcompare, sumoql_logreduce, sumoql_logreduce_keys,
# sumoql_save_lookup_roundtrip, temperature_mixture_weights,
# theta_user_overlap, trend_slopes_by_type, unigram_lm_scores,
# vocab_oov_rates, weighted_reservoir_sample,
# winnowing_fingerprint_stats, zipf_spectrum, zorder_cell_stats),
# then the r7 cohort.  Keep the window EXACTLY 50 — re-count after
# every edit (tests/test_doc_counts.py pins this).


def _prioritized(d: dict) -> dict:
    head = {n: d[n] for n in _PRIORITY if n in d}
    tail = {n: v for n, v in d.items() if n not in head}
    return {**head, **tail}


def all_queries() -> dict[str, QueryFn]:
    _import_all()
    return _prioritized(_QUERIES)


def all_oracles() -> dict[str, str]:
    _import_all()
    return _prioritized(_ORACLES)


_IMPORTED = False


def _import_all() -> None:
    global _IMPORTED
    if _IMPORTED:
        return
    # Imported for registration side effects.
    from . import (  # noqa: F401
        relational,
        windows,
        parsing,
        ingest,
        text,
        dedup,
        similarity,
        sumoql_queries,
        catalog_ops,
        extensions,
        ingest_gap,
        advanced,
        timeseries,
        sampling,
        monitoring,
        sketches,
        curation,
        selection,
        behavior,
        resolution,
        tpch_classics,
        profiling,
        segmentation,
        etl,
        drift,
    )
    _IMPORTED = True
