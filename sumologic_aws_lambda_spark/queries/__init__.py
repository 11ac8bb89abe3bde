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
    # -- (a) round-13 additions + operator-changed re-verification
    # (real-decode dispatch now under extract_features; the anchor
    # parse-multi stage gained the multi-star branch) --
    "multimodal_real_decode", "ahash_real_neardup",
    "sumoql_parse_anchor_multi_nstar",
    "multimodal_feature_extract", "sumoql_parse_anchor_multi",
    # -- (b) ALL 35 queries whose latest hard signal is round 7 (the
    # oldest cohort; recomputed by aggregating CORRECTNESS_r01-r12:
    # freshness was {r7: 35, r8: 50, r9: 48, r10: 46, r11: 50,
    # r12: 50}, zero red at latest sample so no failures owed) --
    "pivot_status_matrix", "window_rank_battery", "pii_masking_rules",
    "epoch_shard_manifest", "hard_negative_mining",
    "embedding_decontamination", "sumoql_benchmark",
    "sumoql_lookup_contains", "entity_hierarchy_rollup",
    "tag_resources_plan", "resample_interpolate", "value_percentile_bands",
    "slo_burn_rate_windows", "ewma_drift_alerts", "truncation_waste",
    "quality_score_calibration", "funnel_conversion_rates",
    "triangle_communities", "k_core_membership", "local_supplier_volume",
    "volume_shipping", "large_volume_customers",
    "global_sales_opportunity", "market_share", "promo_revenue",
    "top_supplier", "small_quantity_revenue", "min_cost_supplier",
    "returned_item_report", "important_part_value",
    "late_shipment_priority", "supplier_part_variety",
    "excess_supply_candidates", "waiting_orders_suppliers",
    "table_profile",
    # -- (c) oldest 10 of the 50-query r8 cohort, registry order,
    # filling the window to exactly 50 --
    "count_distinct_parts", "approx_count_distinct_parts",
    "percentile_quantity", "approx_percentile_quantity",
    "carry_forward_last_value", "json_extract_props",
    "json_autodetect_parse", "timestamp_locator_extract",
    "vpc_internal_filter", "firehose_transform",
)

# Round-14 rotation notes: recompute programmatically by aggregating
# CORRECTNESS_r01-r13 — do not trust hand-maintained lists.  Owed the
# r14 head: any round-14 additions and anything CORRECTNESS_r13 failed,
# then the remaining 40 r8-cohort queries this window could not fit
# (r8 cohort minus the 10 in (c) above — recompute the exact list),
# then the r9 cohort.  Keep the window EXACTLY 50 — re-count after
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
