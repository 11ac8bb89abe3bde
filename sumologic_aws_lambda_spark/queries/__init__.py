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
# caps at the first 50.  Round-14 window (staleness recomputed
# programmatically by aggregating CORRECTNESS_r01-r13 latest-sample
# rounds — freshness was {r8: 39, r9: 48, r10: 46, r11: 50, r12: 49,
# r13: 50}, CORRECTNESS_r13 was 50/50 green so no failures are owed a
# re-check): (a) the round-14 addition (multi-group regex-form parse
# multi) plus the two operator-changed queries that must re-earn green
# — sumoql_parse_multi (its compiled branch was restructured by the
# multi-group change) and multimodal_real_decode (its payload
# generator gained PNG round i%4, the new stdlib decoder); (b) ALL 39
# queries whose latest hard signal is round 8 (the oldest cohort —
# the true count; the r13 note's "40" forgot multimodal_feature_extract
# entered that window via its operator change); (c) the first 8 of the
# 48-query r9 cohort, registry order, filling the window to exactly 50.
_PRIORITY: tuple[str, ...] = (
    # -- (a) round-14 addition + operator-changed re-verification --
    "sumoql_parse_regex_multi_ngroup", "sumoql_parse_multi",
    "multimodal_real_decode",
    # -- (b) ALL 39 queries whose latest hard signal is round 8 --
    "asff_validation_gate", "multiline_assembly", "cwl_decode_pipeline",
    "curation_pipeline", "ngram_decontamination", "bm25_retrieval",
    "pmi_collocations", "exact_dedup_stats", "minhash_signatures",
    "minhash_lsh_pairs", "dedup_clusters", "dataset_hash_split",
    "domain_mixture_sample", "cosine_topk_bruteforce", "lsh_ann_topk",
    "mmr_diversified_topk", "embedding_centroid_drift",
    "asof_join_last_click", "cube_order_priority", "ivf_ann_topk",
    "kmeans_centroid_stats", "cusum_changepoints",
    "holt_linear_forecast", "heavy_hitters_twopass",
    "link_prediction_scores", "attribution_touchpoints",
    "growth_accounting_weekly", "funnel_time_to_convert",
    "rfm_segmentation", "part_affinity_rules", "revenue_concentration",
    "scd2_intervals", "cdc_snapshot_merge",
    "referential_integrity_audit", "join_key_skew_stats",
    "k_anonymity_audit", "pointintime_feature_join", "psi_drift_score",
    "benford_digit_audit",
    # -- (c) oldest 8 of the 48-query r9 cohort, registry order,
    # filling the window to exactly 50 --
    "pricing_summary", "revenue_topk", "semi_join_priority",
    "scalar_function_battery", "window_lag_delta", "paged_results",
    "timeslice_5m", "timeslice_daily_active",
)

# Round-15 rotation notes: recompute programmatically by aggregating
# CORRECTNESS_r01-r14 — do not trust hand-maintained lists.  Owed the
# r15 head: any round-15 additions and anything CORRECTNESS_r14 failed,
# then the remaining r9-cohort queries this window could not fit
# (the r9 cohort minus the 9 in (c) above — recompute the exact list),
# then the r10 cohort.  Keep the window EXACTLY 50 — re-count after
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
