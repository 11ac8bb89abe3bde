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


# Changed-query re-verification head (r14 verdict items 3 + 8): every
# repo-relative source file whose change this round affects declared
# query RESULTS maps to the window queries that re-earn driver green
# for it.  tests/test_doc_counts.py derives the round's changed files
# from `git diff` against the round-start commit (the last commit that
# touched VERDICT.md) and fails if a changed file is neither mapped
# here nor in _REVERIFY_EXEMPT — the rotation discipline is a failing
# test, not a review convention.  The r14-changed queries below also
# re-verify at the r15 head because the r14 window was frozen before
# those optimizations landed (r14 verdict item 4).
_REVERIFY: dict[str, tuple[str, ...]] = {
    # r15: connected_components member-endpoint pre-filter (semantics
    # fix) + exact/incremental dedup live in the same file
    "sumologic_aws_lambda_spark/operators/dedup.py": (
        "dedup_clusters", "semantic_dedup_clusters",
        "semantic_dedup_clusters_star", "incremental_dedup_batch",
        "exact_dedup_stats", "minhash_calibration",
    ),
    # r15: NULL-safe exact count in approx_count_distinct_parts
    "sumologic_aws_lambda_spark/queries/relational.py": (
        "approx_count_distinct_parts",
    ),
    # r15: split_leakage_audit group_split derived from the grouping
    # key after the agg (SortAggregate → HashAggregate)
    "sumologic_aws_lambda_spark/queries/sampling.py": (
        "split_leakage_audit",
    ),
    # r15: ip→subnet lookup joined via dataframe aliases so the second
    # broadcast becomes a runtime ReusedExchange (plan change only;
    # results verified identical)
    "sumologic_aws_lambda_spark/sources/vpc.py": (
        "vpc_eni_enrichment",
    ),
    # r15: gunzip_udf optimizer fence (asNondeterministic) — the CWL
    # decode no longer duplicates below the pushed CONTROL_MESSAGE
    # filter (ArrowEvalPython 2 → 1; results verified identical)
    "sumologic_aws_lambda_spark/functions/codecs.py": (
        "cwl_decode_pipeline",
    ),
}
# Changed files with no declared-query result surface (the window
# cannot re-verify them; say why for each).
_REVERIFY_EXEMPT: frozenset[str] = frozenset({
    # the window definition itself
    "sumologic_aws_lambda_spark/queries/__init__.py",
})

# Queries whose plans changed in a PREVIOUS round after that round's
# window was already frozen, owed driver re-verification at this head
# (r14 verdict item 4 names this exact list).  They outrank the stale
# cohorts for one round, then fall back into normal rotation.
_REVERIFY_CARRYOVER: tuple[str, ...] = (
    "crawl_stage0_funnel", "crawl_stage1_funnel", "crawl_stage2_funnel",
    "url_canonical_dedup", "table_profile", "approx_count_distinct_parts",
    "minhash_calibration", "triangle_communities",
    "clustering_coefficients", "k_core_membership", "pq_codebook_stats",
    "pq_adc_topk", "ivfpq_ann_topk", "semantic_dedup_clusters",
    "semantic_dedup_clusters_star",
)

# The external correctness driver checks registrations in dict order and
# caps at the first 50.  Round-15 window (staleness recomputed by
# aggregating CORRECTNESS_r01-r14 latest-sample rounds — freshness is
# {r9: 40, r10: 45, r11: 50, r12: 49, r13: 49, r14: 50},
# CORRECTNESS_r14 was 50/50 green so no failures are owed a re-check):
# (a) the r14/r15 operator-changed re-verification head — the union of
# _REVERIFY (this round's changed files) and _REVERIFY_CARRYOVER (the
# 15 queries the r14 verdict item 4 names, whose plans changed in r14
# after that round's window was frozen); (b) backfill with the
# oldest-freshness cohort (r9, 40 queries — url_canonical_dedup
# already sits in (a), vpc_eni_enrichment moved into (a) when its
# operator changed) in sorted order up to exactly 50.  The 9 r9-cohort
# queries that did not fit are owed the r16 head:
# sumoql_stats_aggs, sumoql_subsearch_join, sumoql_timeslice_agg,
# sumoql_top_values, sumoql_trailing_windows, sumoql_transaction,
# tfidf_top_terms, token_count_stats, top_bigrams_per_source.
_PRIORITY: tuple[str, ...] = (
    # -- (a) r14/r15 operator-changed re-verification --
    "dedup_clusters", "semantic_dedup_clusters",
    "semantic_dedup_clusters_star", "incremental_dedup_batch",
    "exact_dedup_stats", "minhash_calibration",
    "approx_count_distinct_parts",
    "crawl_stage0_funnel", "crawl_stage1_funnel", "crawl_stage2_funnel",
    "url_canonical_dedup", "table_profile",
    "triangle_communities", "clustering_coefficients",
    "k_core_membership", "pq_codebook_stats", "pq_adc_topk",
    "ivfpq_ann_topk",
    # r15 plan changes (split_leakage SortAgg removal, vpc broadcast
    # reuse, cwl decode fence)
    "split_leakage_audit", "vpc_eni_enrichment", "cwl_decode_pipeline",
    # -- (b) oldest (r9) cohort backfill, sorted, to exactly 50 --
    "char_entropy_scores", "doc_fingerprints",
    "embedding_dimension_stats", "embedding_quantize_int8",
    "html_text_extraction", "int8_ann_rerank", "knn_label_vote",
    "lang_detect_matrix", "logcompare_baseline_target",
    "logreduce_signatures", "ngram_jaccard_pairs",
    "phash_hamming_neardup", "pii_redaction", "product_type_profit",
    "quality_scores", "range_join_value_bands", "sample_by_hash",
    "securityhub_org_findings", "sequence_packing", "simhash_signatures",
    "split_ngram_decontamination", "sumoql_accum_total",
    "sumoql_count_by", "sumoql_dedup_latest", "sumoql_outlier_series",
    "sumoql_parse_anchor", "sumoql_parse_regex_where",
    "sumoql_predict_linear", "sumoql_sort_limit",
)

# Round-16 rotation notes: recompute programmatically by aggregating
# CORRECTNESS_r01-r15 — do not trust hand-maintained lists.  Owed the
# r16 head: any round-16 additions, anything CORRECTNESS_r15 failed,
# any round-16 operator-changed queries, then the 10 leftover r9-cohort
# queries listed above, then the r10 cohort.  Keep the window EXACTLY
# 50 — re-count after every edit (tests/test_doc_counts.py pins this).


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
