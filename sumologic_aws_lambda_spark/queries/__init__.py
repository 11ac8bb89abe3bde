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
# caps at the first 50.  Round-10 window (staleness recomputed
# programmatically this round by aggregating CORRECTNESS_r01-r09
# latest-sample rounds; CORRECTNESS_r09 was 50/50 green so no failures
# are owed a re-check): (a) the round-10 additions and rewrites — the
# new stage-1/stage-2 funnels (MinHash near-dedup on extracted text;
# quality gate + hash sample + per-publisher token budget), the two
# queries re-keyed onto registered_domain (publisher-level caps,
# subdomain-sharded fixtures, new oracles), and the PSL broadcast-join
# production path under the hash gate; (b) ALL 31 queries whose
# latest hard signal is round 4 (the oldest cohort — exactly the list
# the round-9 note owed this window); (c) 14 of the 48-query r5
# cohort, registry-name order, filling the window to exactly 50.
_PRIORITY: tuple[str, ...] = (
    # -- (a) round-10 additions / registered-domain rewrites --
    "crawl_stage1_funnel", "crawl_stage2_funnel", "url_domain_caps",
    "crawl_stage0_funnel", "registered_domain_psl_caps",
    # -- (b) oldest-validated cohort (latest hard signal round 4) --
    "anti_join_idle_customers", "auto_enable_s3_logging",
    "cfn_stack_telemetry", "cloudtrail_records_explode",
    "delivery_accounting", "epoch_normalize", "fer_registry_apply",
    "filter_project", "grouped_agg_udaf", "grouping_sets_lineitem",
    "guardduty_unwrap", "metadata_override_merge",
    "metric_rule_extract", "metrics_quantize",
    "multimodal_frame_sample", "otlp_metric_parse",
    "outlier_detection", "regexp_extract_docs", "region_rollup_join",
    "rollup_order_status", "salted_agg_routing_key",
    "sessionize_events", "set_ops_nations", "sumoql_count_frequent",
    "sumoql_geoip_enrich", "sumoql_kv_extract", "sumoql_parse_multi",
    "two_hop_dim_join", "vpc_flow_parse", "window_running_total",
    "window_topn_orders",
    # -- (c) r5 cohort, registry-name order, first 14 --
    "ann_recall_eval", "apigw_body_rows_parse",
    "approx_topk_routing_keys", "chunked_batches",
    "cidr_prefix_aggregation", "content_pack_saved_search",
    "control_message_skip", "corrupt_payload_discard",
    "datetime_iso_serialize", "embedding_neardup_pairs",
    "fields_schema_apply", "gopher_quality_filters",
    "hll_daily_rollup", "incremental_dedup_batch",
)

# Round-11 rotation notes: recompute programmatically by aggregating
# CORRECTNESS_r01-r10 — do not trust hand-maintained lists.  Owed the
# r11 head: any round-11 additions and anything CORRECTNESS_r10 failed,
# then the 34 r5-cohort queries this window could not fit
# (ingest_include_exclude_rules, kv_flatten_props, loggroup_match, loggroup_subscription_plan, logstream_prefix_filter,
# monitor_threshold_alerts, multimodal_resize_plan, nested_projection,
# paragraph_dedup_stats, pq_codebook_stats, quality_binned_sample,
# repetition_ratios, rollup_hierarchy_daily, securityhub_group_findings,
# semantic_dedup_clusters, shard_plan, sns_message_parse,
# stratified_hash_sample, sumoql_compare_timeshift, sumoql_csv_split,
# sumoql_eval_functions, sumoql_fillmissing_zero,
# sumoql_ip_date_functions, sumoql_logexplain, sumoql_lookup_expr,
# sumoql_parse_field_chain, sumoql_percentile_first_last,
# sumoql_split_values, sumoql_subquery_compose,
# sumoql_timeslice_buckets, sumoql_trace_chain,
# sumoql_transpose_matrix, transpose_event_matrix, url_decode_keys),
# then the r6 cohort.  Keep the window EXACTLY 50 — re-count after
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
