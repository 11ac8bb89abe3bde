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
# caps at the first 50.  Round-8 window (recomputed programmatically by
# aggregating CORRECTNESS_r01-r07 latest-sample rounds): (a) the 13
# never-driver-sampled queries — the three r7 post-window stragglers
# (rfm_segmentation / cusum_changepoints / link_prediction_scores,
# verdict item 1) plus the round-8 ETL/forecast/attribution/MMR/drift
# wave;
# (b) the 4 queries whose latest hard signal is still round 1 (verdict
# item: r1-stale); (c) the 3 queries round 8 REWROTE (rfm is in (a);
# revenue_concentration and part_affinity_rules lost their fact-side
# broadcast hints, bm25_retrieval got the TakeOrdered finisher) —
# changed plans need fresh hard signal; (d) 24 of the 48 queries whose
# latest sample is round 3 (oldest cohort), in registry order — the
# remaining 24 r3 + the r4 cohort lead round 9.  Everything else keeps
# registration order after the head and remains covered by the repo's
# own full-surface driver replica (tools/verify_driver_contract.py,
# all 268 queries green this round).
_PRIORITY: tuple[str, ...] = (
    # -- (a) never driver-sampled: r7 stragglers --
    "rfm_segmentation", "cusum_changepoints", "link_prediction_scores",
    # -- (a2) never driver-sampled: round-8 wave --
    "scd2_intervals", "cdc_snapshot_merge",
    "referential_integrity_audit", "join_key_skew_stats",
    "k_anonymity_audit", "attribution_touchpoints",
    "holt_linear_forecast", "mmr_diversified_topk",
    "psi_drift_score", "benford_digit_audit", "pmi_collocations",
    "heavy_hitters_twopass", "pointintime_feature_join",
    "growth_accounting_weekly", "funnel_time_to_convert",
    "embedding_centroid_drift",
    # -- (b) latest hard signal is round 1 --
    "count_distinct_parts", "percentile_quantity",
    "timestamp_locator_extract", "vpc_internal_filter",
    # -- (c) plans rewritten in round 8 --
    "revenue_concentration", "part_affinity_rules", "bm25_retrieval",
    # -- (d) oldest-validated cohort (latest sample round 3) --
    "approx_count_distinct_parts", "approx_percentile_quantity",
    "asff_validation_gate", "asof_join_last_click",
    "carry_forward_last_value", "cosine_topk_bruteforce",
    "cube_order_priority", "curation_pipeline", "cwl_decode_pipeline",
    "dataset_hash_split", "dedup_clusters", "domain_mixture_sample",
    "exact_dedup_stats", "firehose_transform", "ivf_ann_topk",
    "json_autodetect_parse", "json_extract_props",
    "kmeans_centroid_stats", "lsh_ann_topk", "minhash_lsh_pairs",
    "minhash_signatures", "multiline_assembly",
    "multimodal_feature_extract", "ngram_decontamination",
)

# Round-9 rotation notes: recompute programmatically by aggregating
# CORRECTNESS_r01-r08 latest-sample rounds — do not trust
# hand-maintained lists.  Owed the r9 head: any round-9 additions and
# anything CORRECTNESS_r08 failed, then the 24 r3-stale queries this
# window could not fit (registry order after ngram_decontamination:
# ngram_jaccard_pairs, paged_results, pii_redaction, pricing_summary,
# range_join_value_bands, revenue_topk, scalar_function_battery,
# securityhub_org_findings, semi_join_priority, sequence_packing,
# simhash_signatures,
# sumoql_accum_total, sumoql_count_by, sumoql_dedup_latest,
# sumoql_outlier_series, sumoql_parse_anchor,
# sumoql_parse_regex_where, sumoql_predict_linear,
# sumoql_subsearch_join, sumoql_timeslice_agg, timeslice_5m,
# timeslice_daily_active, vpc_eni_enrichment, window_lag_delta), then
# the 49-query r4 cohort.  Keep the window EXACTLY 50 — re-count after
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
