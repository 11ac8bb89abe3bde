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
# caps at the first 50.  Rounds 1–5 driver-validated 153 of the
# pre-round-6 160 registered queries (r5: 50/50 green).  Round 6 rotates
# in (a) the 9 queries added late in round 5 that the frozen r5 window
# never sampled, (b) every query NEW in round 6 — the curation wave,
# then the selection/late wave (DSIR, NB classifier, the
# logreduce/logcompare verb family, chunking, IVF-PQ, the curation
# funnel, winnowing, interval overlap, domain caps, zipf, z-order,
# MinHash calibration), then (c) previously-green queries whose
# machinery this round touched, then (d) a cross-family regression
# spread.  Everything else keeps registration order after the head and
# remains covered by the repo's own full-surface driver replica
# (tools/verify_driver_contract.py, all queries).
_PRIORITY: tuple[str, ...] = (
    # -- (a) added late in round 5, never driver-sampled --
    "theta_user_overlap", "sumoql_save_lookup_roundtrip",
    "audio_chunk_plan", "dashboard_panel_data", "image_patch_grid",
    "index_routing_stats", "ingest_budget_enforcement",
    "bpe_merge_candidates", "semantic_dedup_clusters_star",
    # -- (b) new this round (round 6): the curation wave, then the
    #    selection wave (DSIR, NB classifier, logreduce) --
    "substring_dup_spans", "vocab_oov_rates", "unigram_lm_scores",
    "semdedup_prune", "sumoql_cidr_functions", "exactsubstr_removal_stats",
    "temperature_mixture_weights", "dataset_manifest_diff",
    "domain_interleave_order",
    "dsir_importance_weights", "dsir_resample_stats", "nb_quality_scores",
    "sumoql_logreduce", "sumoql_logcompare", "document_chunking",
    "ivfpq_ann_topk", "pq_adc_topk", "curation_pipeline_funnel",
    "winnowing_fingerprint_stats", "interval_overlap_pairs",
    "domain_quality_caps", "zipf_spectrum", "zorder_cell_stats",
    "sumoql_logreduce_keys", "minhash_calibration", "slo_error_budget",
    # -- (c) machinery touched this round: lookups threading
    #    (compile_prefixed_query), scheduled-view refresh/marks, star
    #    components' shared cluster contract, the review-campaign
    #    rewrites (CFN timestamp contract, metrics bucket alignment) --
    "scheduled_view_rollup",
    # -- (d) behavior-analytics wave, added in the round-6 extension:
    #    never driver-sampled --
    "event_funnel_conversion", "retention_cohorts",
    "event_markov_transitions", "event_pagerank",
    "chi2_event_weekday", "range_partition_plan",
    "event_path_trigrams", "blocked_name_matching",
    "weighted_reservoir_sample", "split_leakage_audit",
    "trend_slopes_by_type", "mad_outlier_counts",
    "monitor_alert_throttle", "seasonal_residual_outliers",
)

# Round-7 rotation notes: (0a) two round-6 additions landed AFTER the
# final window and have only replica-green — sample them first:
# funnel_conversion_rates, cohort_ltv; (0) these were bumped out of the
# r6 window by
# the late behavior/resolution waves and carry round-6 rewrites — sample
# them first: cfn_stack_telemetry, metrics_quantize, quality_scores,
# semantic_dedup_clusters (r6 star-contract rewrite; its _star twin IS
# sampled), sumoql_lookup_expr (r6 lookups threading; save_lookup_
# roundtrip in-window exercises the same machinery),
# simhash_signatures, salted_agg_routing_key, multimodal_feature_extract,
# sessionize_events, asof_join_last_click, cwl_decode_pipeline,
# asff_validation_gate, fer_registry_apply, monitor_threshold_alerts;
# then: (1) queries NEW or changed in round 7 first;
# (2) these round-6 additions did NOT fit the 50-slot r6 window and
# have only self-harness green — sample them next:
# ngram_jaccard_pairs (dropped late), vpc_eni_enrichment and
# firehose_transform (dropped late), embedding_neardup_pairs,
# paragraph_dedup_stats,
# gopher_quality_filters, stratified_hash_sample, ngram_decontamination,
# exact_dedup_stats, minhash_lsh_pairs, ivf_ann_topk, tfidf_top_terms,
# kmeans_centroid_stats, pricing_summary, revenue_topk,
# window_topn_orders, range_join_value_bands, cloudtrail_records_explode,
# vpc_flow_parse, metric_rule_extract — all were green r3–r5 and
# unchanged-or-regression-tested, but re-warm them; (3) then spread over
# windows/lag, streaming-adjacent, and sumoql parse verbs.


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
    )
    _IMPORTED = True
