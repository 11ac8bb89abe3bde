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
# caps at the first 50.  Round-9 window (staleness recomputed
# programmatically this round by aggregating CORRECTNESS_r01-r08
# latest-sample rounds; CORRECTNESS_r08 was 50/50 green so nothing is
# owed a re-check): (a) the 6 round-9 additions — the curation stage-0
# operators the round-8 verdict ranked first (URL canonicalization/
# dedup, HTML boilerplate strip, per-domain caps) plus the multimodal
# pHash near-dup and the split-boundary n-gram decontamination audit;
# (b) all 24 queries whose latest hard
# signal is round 3 (the oldest cohort, exactly the list the round-8
# note owed this window); (c) 18 of the 49-query r4 cohort, ordered by
# most-recent git commit touching the query's module (verdict item 5:
# files refactored in r5-r9 carry the highest divergence risk —
# similarity.py took a round-9 fix, text/timeseries/sumoql/relational/
# windows took r8 plan work), registry-name tiebreak.  The remaining
# 31 r4-cohort queries (relational/catalog_ops/ingest/advanced/extensions/
# ingest_gap/parsing, all files untouched since r4) lead the round-10
# window.  Everything else keeps registration order after the head and
# remains covered by the repo's own full-surface driver replica
# (tools/verify_driver_contract.py, all 274 queries green this round).
_PRIORITY: tuple[str, ...] = (
    # -- (a) round-9 additions --
    "url_canonical_dedup", "html_text_extraction", "url_domain_caps",
    "phash_hamming_neardup", "split_ngram_decontamination",
    "crawl_stage0_funnel",
    # -- (a2) round-9 oracle-hardening rewrites (sf0.1 sweep findings) --
    "product_type_profit", "embedding_dimension_stats",
    # -- (b) oldest-validated cohort (latest hard signal round 3) --
    "ngram_jaccard_pairs", "paged_results", "pii_redaction",
    "pricing_summary", "range_join_value_bands", "revenue_topk",
    "scalar_function_battery", "securityhub_org_findings",
    "semi_join_priority", "sequence_packing", "simhash_signatures",
    "sumoql_accum_total", "sumoql_count_by", "sumoql_dedup_latest",
    "sumoql_outlier_series", "sumoql_parse_anchor",
    "sumoql_parse_regex_where", "sumoql_predict_linear",
    "sumoql_subsearch_join", "sumoql_timeslice_agg", "timeslice_5m",
    "timeslice_daily_active", "vpc_eni_enrichment", "window_lag_delta",
    # -- (c) r4 cohort, most-recently-touched module files first --
    "knn_label_vote", "int8_ann_rerank", "embedding_quantize_int8",
    "top_bigrams_per_source", "token_count_stats", "tfidf_top_terms",
    "quality_scores", "lang_detect_matrix", "doc_fingerprints",
    "char_entropy_scores", "sumoql_trailing_windows",
    "logreduce_signatures", "logcompare_baseline_target",
    "sample_by_hash", "sumoql_transaction", "sumoql_top_values",
    "sumoql_stats_aggs", "sumoql_sort_limit",
)

# Round-10 rotation notes: recompute programmatically by aggregating
# CORRECTNESS_r01-r09 — do not trust hand-maintained lists.  Owed the
# r10 head: any round-10 additions and anything CORRECTNESS_r09 failed,
# then the 31 r4-cohort queries this window could not fit
# (sumoql_parse_multi, sumoql_kv_extract, sumoql_geoip_enrich, sumoql_count_frequent, set_ops_nations, rollup_order_status, region_rollup_join, filter_project, anti_join_idle_customers,
# window_topn_orders, window_running_total, sessionize_events,
# two_hop_dim_join, multimodal_frame_sample, metric_rule_extract,
# cfn_stack_telemetry, auto_enable_s3_logging, vpc_flow_parse,
# guardduty_unwrap, salted_agg_routing_key, outlier_detection,
# metrics_quantize, grouping_sets_lineitem, grouped_agg_udaf,
# otlp_metric_parse, metadata_override_merge, fer_registry_apply,
# delivery_accounting, cloudtrail_records_explode,
# regexp_extract_docs, epoch_normalize), then the r5 cohort.  Keep the
# window EXACTLY 50 — re-count after every edit
# (tests/test_doc_counts.py pins this).


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
