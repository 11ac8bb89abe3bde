"""Dump formatted physical plans for the headline queries into PLANS.md —
the reviewable evidence that pushdown/broadcast/narrow claims hold."""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sumologic_aws_lambda_spark import queries as registry  # noqa: E402
from sumologic_aws_lambda_spark.session import get_spark  # noqa: E402

SHOWCASE = [
    "pricing_summary",        # partial+final agg, pushdown
    "filter_project",         # PushedFilters + pruned ReadSchema
    "revenue_topk",           # broadcast dim + TakeOrderedAndProject
    "cwl_decode_pipeline",    # zero-shuffle ingest hot path
    "asof_join_last_click",   # union+window as-of (no join operator)
    "salted_agg_routing_key", # two-phase skew-safe agg
    "minhash_lsh_pairs",      # LSH equi-join (no cartesian)
    "ngram_jaccard_pairs",    # df-cut bucket-pairs (broadcast-only joins)
    "ivf_ann_topk",           # broadcast centroids + pruned candidates
    "curation_pipeline",      # fused filter chain + fingerprint shuffle
    "logreduce_signatures",   # HashAggregate (no SortAggregate) + bcast back
    "sample_by_hash",         # zero-shuffle deterministic sample
    "sumoql_subsearch_join",  # post-agg operands broadcast
    "sumoql_predict_linear",  # decimal-stat OLS fit broadcast to series
    "paged_results",          # TakeOrderedAndProject before offset window
    "ngram_decontamination",  # broadcast bench grams, corpus un-shuffled
    "domain_mixture_sample",  # broadcast per-source rates, narrow member
    "tfidf_top_terms",        # broadcast idf + WindowGroupLimit top-k
    "char_entropy_scores",    # staged projections, zero exchange
    "paragraph_dedup_stats",  # one-agg winner, no content-hash window
    "pq_adc_topk",            # narrow encode + literal-codebook ADC scan
    "quality_binned_sample",  # row-local bins/rates, one rollup exchange
    "shard_plan",             # md5-mod shard assignment + manifest rollup
    "sumoql_logexplain",      # one conditional-count pass + 1-row bcast
    "sumoql_subquery_compose",  # broadcast left-semi on composed keys
    "hll_daily_rollup",       # partial-agg sketches, days×types reduce side
    "scheduled_view_rollup",  # partial-agg merge == full recompute
    "gopher_quality_filters",  # narrow flag projection + one rollup
    "substring_dup_spans",    # narrow gram fan-out, one span-hash agg
    "exactsubstr_removal_stats",  # min(struct) winners, no window
    "vocab_oov_rates",        # TakeOrdered vocab + broadcast membership
    "unigram_lm_scores",      # vocabulary-sized broadcast LM join
    "semdedup_prune",         # narrow argmax assign + cluster equi-join
    "dataset_manifest_diff",  # fingerprints-only full-outer join
    "dsir_importance_weights",  # broadcast bucket model, one score shuffle
    "nb_quality_scores",      # vocab broadcast llr join, one score shuffle
    "sumoql_logreduce",       # narrow mask + HashAggregate + TakeOrdered
    "sumoql_logcompare",      # 1-row cut bcast + conditional-count pass
    "document_chunking",      # zero-shuffle sequence-explode windows
    "ivfpq_ann_topk",         # one narrow codes+cells pass, topk-only shuffle
    "curation_pipeline_funnel",  # five-stage funnel union of aggregates
    "winnowing_fingerprint_stats",  # narrow window-fold + hash rollup
    "interval_overlap_pairs",  # bucketized equi-join, no theta join
    "zipf_spectrum",          # corpus count agg + vocab-sized regression
    "minhash_calibration",    # candidate-pair estimator eval (no corpus²)
    "slo_error_budget",       # one conditional-count pass + series window
    "sumoql_logreduce_keys",  # JSON-schema clustering, narrow + TakeOrdered
    "event_funnel_conversion",  # user-key co-partitioned staged funnel
    "event_pagerank",         # collapsed-graph broadcast power iteration
    "event_path_trigrams",    # one window shuffle shared by both lags
    "range_partition_plan",   # broadcast boundaries, shuffle-free assign
    "blocked_name_matching",  # blocking equi-join + two-groupBy best match
    "weighted_reservoir_sample",  # A-ES keys + TakeOrderedAndProject
    "trend_slopes_by_type",   # regr_* partial+final single agg
    "mad_outlier_counts",     # grouped exact percentiles, no window
    "monitor_alert_throttle",  # series-keyed lag over reduced alerts
    "seasonal_residual_outliers",  # week-ago equi-join on series frame
    "entity_hierarchy_rollup",  # explorer tree: ONE expand+rollup shuffle
    "pii_masking_rules",      # redaction fold, fully narrow
    "slo_burn_rate_windows",  # series-row RANGE windows after one agg
    "ewma_drift_alerts",      # trailing collect_list fold on series rows
    "bigram_lm_perplexity",   # narrow bigram explode + broadcast LM join
    "hard_negative_mining",   # LSH bucket join, broadcast anchors
    "embedding_decontamination",  # broadcast bench array, narrow corpus
    "epoch_shard_manifest",   # md5 keys + one partial-agg groupBy
    "local_supplier_volume",  # Q5: 6-way snowflake, co-location key
    "market_share",           # Q8: deepest join tree, conditional ratio
    "customer_order_distribution",  # Q13: outer-join count-of-counts
    "table_profile",          # one-scan multi-distinct Expand profile
    "blocklist_filter_stats",  # higher-order filter, one exchange
    "resample_interpolate",   # grid explode + ignorenulls windows
    "window_rank_battery",    # five ranking fns, ONE WindowExec
    "triangle_communities",   # degree-ordered wedges, equi-join closure
    "rfm_segmentation",       # broadcast percentile cut points, no window
    "scd2_intervals",         # user-partitioned lag/lead versioning
    "cdc_snapshot_merge",     # one-shuffle full-outer latest-wins merge
    "referential_integrity_audit",  # per-edge left join + cond. count
    "attribution_touchpoints",  # one user-partitioned ignorenulls pass
    "holt_linear_forecast",   # series fold, one corpus groupBy
    "mmr_diversified_topk",   # TakeOrdered pool + pool-sized greedy
    "psi_drift_score",        # one conditional-count groupBy + scalar
    "url_canonical_dedup",    # codegen canonicalizer + one key shuffle
    "html_text_extraction",   # zero-exchange regex/HOF projection
    "url_domain_caps",        # publisher-partitioned rank + rollup
    "phash_hamming_neardup",  # band equi-join, bit_count(xor) verify
    "split_ngram_decontamination",  # uniform-key gram join, 2-level agg
    "crawl_stage0_funnel",    # single-lineage 5-stage conditional agg
    "crawl_stage1_funnel",    # one-scan stage-0+near-dup composition
    "crawl_stage2_funnel",    # quality+sample+budget, one more window
    "registered_domain_psl_caps",  # broadcast PSL join, one window
    "psl_snapshot_domains",   # FULL 9.5k-rule PSL: 10 bcast tiers, 1 exch
    "multimodal_real_decode",  # Arrow mapInPandas decode, narrow stage
    "ahash_real_neardup",     # banded Hamming self-join (adjudicated SMJ)
    "sumoql_parse_regex_multi_ngroup",  # n-group generator in codegen
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plans")
    qs = registry.all_queries()
    out = ["# PLANS — formatted physical plans of showcase queries",
           "", f"Generated by `python tools/dump_plans.py` at {sf_dir}.", ""]
    for name in SHOWCASE:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", "```", buf.getvalue().rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
