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
# caps at the first 50.  Round-12 window (staleness recomputed
# programmatically by aggregating CORRECTNESS_r01-r11 latest-sample
# rounds — freshness was {r6: 35, r7: 45, r8: 50, r9: 48, r10: 50,
# r11: 50}, CORRECTNESS_r11 was 50/50 green so no failures are owed a
# re-check): (a) the round-12 addition (anchor-form parse multi) and
# the four queries whose PRODUCTION KEYING + ORACLES changed this round
# — the crawl funnels and registered_domain_psl_caps now key on the
# full vendored 9,506-rule PSL snapshot with regenerated full-grammar
# oracles, so their green must be re-earned under the new definition;
# (b) ALL 35 queries whose latest hard signal is round 6 (the oldest
# cohort — exactly the list the round-11 note owed this window);
# (c) the first 10 of the 45-query r7 cohort, registry-name order,
# filling the window to exactly 50.
_PRIORITY: tuple[str, ...] = (
    # -- (a) round-12 addition + changed-keying re-verification --
    "sumoql_parse_anchor_multi",
    "crawl_stage0_funnel", "crawl_stage1_funnel", "crawl_stage2_funnel",
    "registered_domain_psl_caps",
    # -- (b) oldest-validated cohort (latest hard signal round 6) --
    "event_path_trigrams", "exactsubstr_removal_stats",
    "image_patch_grid", "index_routing_stats",
    "ingest_budget_enforcement", "interval_overlap_pairs",
    "ivfpq_ann_topk", "mad_outlier_counts", "minhash_calibration",
    "monitor_alert_throttle", "nb_quality_scores", "pq_adc_topk",
    "range_partition_plan", "retention_cohorts",
    "scheduled_view_rollup", "seasonal_residual_outliers",
    "semantic_dedup_clusters_star", "semdedup_prune",
    "slo_error_budget", "split_leakage_audit", "substring_dup_spans",
    "sumoql_cidr_functions", "sumoql_logcompare", "sumoql_logreduce",
    "sumoql_logreduce_keys", "sumoql_save_lookup_roundtrip",
    "temperature_mixture_weights", "theta_user_overlap",
    "trend_slopes_by_type", "unigram_lm_scores", "vocab_oov_rates",
    "weighted_reservoir_sample", "winnowing_fingerprint_stats",
    "zipf_spectrum", "zorder_cell_stats",
    # -- (c) r7 cohort, registry-name order, first 10 --
    "bigram_lm_perplexity", "blocklist_filter_stats",
    "clustering_coefficients", "cohort_ltv", "compaction_bin_plan",
    "customer_order_distribution", "daily_autocorrelation",
    "data_quality_checks", "degree_assortativity",
    "disjunctive_predicate_revenue",
)

# Round-13 rotation notes: recompute programmatically by aggregating
# CORRECTNESS_r01-r12 — do not trust hand-maintained lists.  Owed the
# r13 head: any round-13 additions and anything CORRECTNESS_r12 failed,
# then the remaining 35 r7-cohort queries this window could not fit
# (r7 cohort minus the 10 in (c) above — recompute the exact list),
# then the r8 cohort.  Keep the window EXACTLY 50 — re-count after
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
