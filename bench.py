"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Two JSON lines are emitted; the FINAL line is the driver-facing one and
satisfies the contract above: it fits inside the driver's 2000-char tail
capture and its "queries" key carries the 28-query canon per-query map
(the stable cross-round comparison set).  The first line is the full
artifact with every registry timing for local consumers.

Each query is materialized with a noop-format write so timings measure the
full distributed plan (scan → shuffle → agg) without driver-side collect
overhead — the same shape the plan has on a real cluster.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sumologic_aws_lambda_spark import queries as registry  # noqa: E402
from sumologic_aws_lambda_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family, weighted toward the plans whose
# scale behavior matters (joins, windows, sessionization, dedup, ANN).
HEADLINE = [
    "pricing_summary",
    "filter_project",
    "revenue_topk",
    "region_rollup_join",
    "semi_join_priority",
    "window_topn_orders",
    "window_running_total",
    "sessionize_events",
    "json_extract_props",
    "timeslice_5m",
    "count_distinct_parts",
    "percentile_quantity",
]
# Added as the corresponding operators land (kept separate so bench.py
# never names a query that does not exist yet).
OPTIONAL = [
    "exact_dedup_stats",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "cosine_topk_bruteforce",
    "token_count_stats",
    "sumoql_count_by",
    "asof_join_last_click",
    "ivf_ann_topk",
    "lsh_ann_topk",
    "cube_order_priority",
    "logreduce_signatures",
    "sumoql_trailing_windows",
    "sumoql_subsearch_join",
    "dataset_hash_split",
    "logcompare_baseline_target",
    "top_bigrams_per_source",
    "ngram_decontamination",
    "domain_mixture_sample",
    "char_entropy_scores",
    "tfidf_top_terms",
    "embedding_quantize_int8",
    "int8_ann_rerank",
    "sumoql_stats_aggs",
    "sumoql_count_frequent",
    "paragraph_dedup_stats",
    "incremental_dedup_batch",
    "embedding_neardup_pairs",
    "ann_recall_eval",
    "semantic_dedup_clusters",
    "pq_adc_topk",
    "sumoql_logexplain",
    "quality_binned_sample",
    "sumoql_subquery_compose",
    "gopher_quality_filters",
    "hll_daily_rollup",
    "scheduled_view_rollup",
    "index_routing_stats",
    "substring_dup_spans",
    "vocab_oov_rates",
    "unigram_lm_scores",
    "semdedup_prune",
    "exactsubstr_removal_stats",
    "temperature_mixture_weights",
    "dataset_manifest_diff",
    "domain_interleave_order",
    "dsir_resample_stats",
    "nb_quality_scores",
    "sumoql_logreduce",
    "sumoql_logcompare",
    "document_chunking",
    "ivfpq_ann_topk",
    "curation_pipeline_funnel",
    "winnowing_fingerprint_stats",
    "interval_overlap_pairs",
    "domain_quality_caps",
    "zipf_spectrum",
    "zorder_cell_stats",
    "sumoql_logreduce_keys",
    "minhash_calibration",
    "slo_error_budget",
    "event_funnel_conversion",
    "retention_cohorts",
    "event_pagerank",
    "event_path_trigrams",
    "range_partition_plan",
    "blocked_name_matching",
    "weighted_reservoir_sample",
    "trend_slopes_by_type",
    "mad_outlier_counts",
    "monitor_alert_throttle",
    "seasonal_residual_outliers",
    "funnel_conversion_rates",
    "cohort_ltv",
    "entity_hierarchy_rollup",
    "pii_masking_rules",
    "slo_burn_rate_windows",
    "bigram_lm_perplexity",
    "hard_negative_mining",
    "ewma_drift_alerts",
    "embedding_decontamination",
    "epoch_shard_manifest",
    "tag_resources_plan",
    "sumoql_benchmark",
    "local_supplier_volume",
    "volume_shipping",
    "customer_order_distribution",
    "large_volume_customers",
    "global_sales_opportunity",
    "market_share",
    "promo_revenue",
    "top_supplier",
    "small_quantity_revenue",
    "disjunctive_predicate_revenue",
    "table_profile",
    "data_quality_checks",
    "blocklist_filter_stats",
    "truncation_waste",
    "resample_interpolate",
    "window_rank_battery",
    "pivot_status_matrix",
    "triangle_communities",
    "clustering_coefficients",
    "sumoql_lookup_contains",
    "value_percentile_bands",
    "rfm_segmentation",
    "scd2_intervals",
    "cdc_snapshot_merge",
    "referential_integrity_audit",
    "join_key_skew_stats",
    "k_anonymity_audit",
    "attribution_touchpoints",
    "holt_linear_forecast",
    "mmr_diversified_topk",
    "psi_drift_score",
    "benford_digit_audit",
    "pmi_collocations",
    "heavy_hitters_twopass",
    "pointintime_feature_join",
    "growth_accounting_weekly",
    "funnel_time_to_convert",
    "embedding_centroid_drift",
    # round-9 wave
    "url_canonical_dedup",
    "html_text_extraction",
    "url_domain_caps",
    "phash_hamming_neardup",
    "split_ngram_decontamination",
    "crawl_stage0_funnel",
    # round-10 wave
    "crawl_stage1_funnel",
    "crawl_stage2_funnel",
    "registered_domain_psl_caps",
    # round-11 wave
    "psl_snapshot_domains",
]


# Canonical cross-round comparison set: 28 queries, one per operator
# family, all present since the rounds they landed in and NEVER rotated.
# Emitted as a SEPARATE trailing "canon" key so that when the recorded
# BENCH_r{N}.json is front-truncated, the stable subset still survives
# verbatim and round-over-round comparisons stop depending on which
# "queries" entries the truncation kept.
CANON = HEADLINE + [
    "exact_dedup_stats",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "cosine_topk_bruteforce",
    "token_count_stats",
    "sumoql_count_by",
    "asof_join_last_click",
    "ivf_ann_topk",
    "lsh_ann_topk",
    "cube_order_priority",
    "logreduce_signatures",
    "sumoql_trailing_windows",
    "sumoql_subsearch_join",
    "dataset_hash_split",
    "logcompare_baseline_target",
    "top_bigrams_per_source",
]
assert len(CANON) == 28


def _cpu_sample() -> tuple[int, int, int, int] | None:
    """(idle, iowait, steal, total) jiffies from /proc/stat — None
    off-Linux.  iowait and steal ride separately from busy: loadavg
    counts D-state disk waiters that never show as CPU-busy, and on a
    VM host-side contention appears ONLY as steal — exactly the
    ambient signals that moved the r12 canon ×1.34 on untouched
    code."""
    try:
        with open("/proc/stat") as fh:
            vals = [int(v) for v in fh.readline().split()[1:]]
        iow = vals[4] if len(vals) > 4 else 0
        steal = vals[7] if len(vals) > 7 else 0
        # fields 8-9 (guest/guest_nice) are already counted inside
        # user/nice — summing them would double-count guest time and
        # deflate every fraction on a VM-hosting machine
        return vals[3], iow, steal, sum(vals[:8])
    except (OSError, ValueError, IndexError):
        return None


def _busy_frac(a, b) -> dict | None:
    """Machine-wide CPU busy / iowait / steal fractions between
    samples (busy = everything except idle+iowait; steal is already
    inside busy but broken out — nonzero steal means the HOST took
    the cycles, not this workload)."""
    if a is None or b is None or b[3] <= a[3]:
        return None
    dtot = b[3] - a[3]
    return {
        "busy": round(1.0 - (b[0] - a[0] + b[1] - a[1]) / dtot, 3),
        "iowait": round((b[1] - a[1]) / dtot, 3),
        "steal": round((b[2] - a[2]) / dtot, 3),
    }


def _loadavg_1m() -> float | None:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    qs = registry.all_queries()
    # Canon runs FIRST, fresh after warmup: the round-7 verdict traced
    # canon drift (1.24x on code-unchanged queries) to run-order bias —
    # canon used to run at the END of a 100+-entry session, inheriting
    # GC/codegen-cache pressure from everything before it.  Putting the
    # cross-round comparison set first makes its numbers reflect the
    # plans, not the session history.  BASELINE.md §R8 records the
    # one-off both-orderings experiment quantifying the bias.
    rest = [n for n in HEADLINE + [o for o in OPTIONAL if o in qs]
            if n not in set(CANON)]
    names = list(CANON) + rest
    if os.environ.get("SPARK_GRAFT_BENCH_CANON_LAST"):
        names = rest + list(CANON)  # bias-measurement mode only

    # Warmup: one UNTIMED pass over the whole canon subset.  The round-8
    # both-orderings experiment showed canon-first reads 43.1 s where
    # canon-last reads 12.7 s on identical code — the dominant variance
    # is JVM/JIT/codegen warmup accumulated across the session, not
    # end-of-session pressure.  Warming on the canon plans themselves
    # makes the timed region measure the plans, not the JIT, regardless
    # of position.
    for name in CANON:
        try:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
        except Exception:  # noqa: BLE001 — warmup must never kill bench
            pass

    # min of two runs per query: the second run reuses compiled codegen,
    # so this measures the plan, not JIT/compile noise (±15% otherwise).
    # Each query is isolated — one bad plan must not zero the whole
    # artifact (round-3 lesson: a single AnalysisException cost every
    # recorded number).
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}

    def _time_once(name: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        return time.time() - t0

    # Canon: REPEAT whole-set passes (default 3; --repeat N /
    # $SPARK_GRAFT_BENCH_REPEAT override).  Round 8 measured a 13.5 s
    # vs 17.4 s same-code spread from ambient session variance; the
    # per-query min over repeated full passes collapses it to one
    # defensible number, and the raw per-pass totals ride along in the
    # artifact so the spread itself stays visible (round-8 verdict
    # item 7).
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    if "--repeat" in sys.argv:
        # a malformed flag must never zero the artifact (round-3
        # lesson) — fall back to the default instead of crashing
        idx = sys.argv.index("--repeat") + 1
        if idx < len(sys.argv):
            try:
                repeat = int(sys.argv[idx])
            except ValueError:
                print(f"bench: ignoring malformed --repeat value "
                      f"{sys.argv[idx]!r}; using {repeat}",
                      file=sys.stderr)
        else:
            print(f"bench: --repeat given without a value; using "
                  f"{repeat}", file=sys.stderr)
    canon_names = [n for n in names if n in set(CANON)]
    canon_pass_totals: list[float | None] = []
    # ambient-load telemetry (round-12 verdict item 4): the r12 canon
    # artifact read ×1.34 on code-untouched queries purely from
    # machine load, and nothing in the JSON let a judge adjudicate
    # that without re-deriving per-query uniformity by hand.  Record
    # the 1-minute loadavg at each pass start and the machine-wide
    # CPU-busy fraction over the pass (/proc/stat deltas) — a canon
    # delta with flat load is code; one tracking load is ambient.
    canon_pass_load: list[dict] = []
    for _ in range(max(repeat, 1)):
        pass_total, pass_complete = 0.0, True
        load0, cpu0 = _loadavg_1m(), _cpu_sample()
        for name in canon_names:
            try:
                dt = min(_time_once(name), _time_once(name))
            except Exception as e:  # noqa: BLE001 — harness boundary
                errors[name] = f"{type(e).__name__}: {e}"[:500]
                pass_complete = False
                continue
            pass_total += dt
            timings[name] = round(min(timings.get(name, float("inf")),
                                      dt), 3)
        # a pass missing any query publishes None, not a partial sum —
        # partial totals would read as fake speedups in the variance
        # record BASELINE.md builds on (round-9 review finding)
        canon_pass_totals.append(
            round(pass_total, 3) if pass_complete else None)
        canon_pass_load.append({
            "loadavg_1m_start": load0,
            "cpu": _busy_frac(cpu0, _cpu_sample()),
        })
    # invariant: a name lives in EXACTLY one of timings/errors.  A
    # transient error in one pass followed by a success in another
    # would otherwise mark the artifact incomplete while canon_total
    # reads complete (round-9 review finding) — the successful timing
    # wins, matching the per-query min-of-runs semantics.
    for name in list(errors):
        if name in timings:
            del errors[name]

    for name in names:
        if name in timings or name in errors:
            continue
        try:
            best = min(_time_once(name), _time_once(name))
        except Exception as e:  # noqa: BLE001 — harness boundary
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            continue
        timings[name] = round(best, 3)

    # Full-registry sweep (round-11 verdict item 3): every registry
    # query OUTSIDE the curated headline set gets ONE timed run, so a
    # perf regression in the uncurated tiers (graph, lifecycle, ...)
    # is visible round-over-round.  Single run, not min-of-2 — the goal
    # is regression visibility at bounded wall-clock; the curated set
    # keeps the tighter protocol, and cross-round totals stay
    # comparable because "value" still sums the curated set only.
    for name in qs:
        if name in timings or name in errors:
            continue
        try:
            timings[name] = round(_time_once(name), 3)
        except Exception as e:  # noqa: BLE001 — harness boundary
            errors[name] = f"{type(e).__name__}: {e}"[:500]

    # A failed query must not read as a speedup: when any CURATED query
    # errored, the total is meaningless to consumers comparing across
    # rounds, so emit value=null plus an explicit incomplete flag
    # instead of silently summing the survivors.  "value" keeps its
    # historical definition — the curated HEADLINE+OPTIONAL+canon sum —
    # so BENCH_r12+ stays comparable to earlier rounds; the
    # full-registry sum rides in "registry_total".  "incomplete" keys
    # ONLY on curated errors: an uncurated sweep failure invalidates
    # registry_total, not the headline value, and consumers keying on
    # "incomplete" to discard cross-round comparisons must not lose
    # valid headline totals over it (round-12 ADVICE) — sweep failures
    # ride separately in "registry_errors"/"registry_incomplete".
    curated = set(names)
    curated_errors = {n: e for n, e in errors.items() if n in curated}
    registry_errors = {n: e for n, e in errors.items()
                       if n not in curated}
    total = (None if curated_errors
             else round(sum(t for n, t in timings.items()
                            if n in curated), 3))
    registry_total = (None if errors
                      else round(sum(timings.values()), 3))
    canon = {n: timings[n] for n in CANON if n in timings}
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if curated_errors:
        out["errors"] = curated_errors
        out["incomplete"] = True
    if registry_errors:
        out["registry_errors"] = registry_errors
        out["registry_incomplete"] = True
    # trailing keys survive front-truncation of the recorded artifact
    out["canon_order"] = ("last" if os.environ.get(
        "SPARK_GRAFT_BENCH_CANON_LAST") else "first")
    out["canon"] = canon
    out["canon_total"] = (round(sum(canon.values()), 3)
                          if len(canon) == len(CANON) else None)
    out["canon_repeat"] = repeat
    # each canon pass times every query twice and keeps the min —
    # record it so wall-clock comparisons against single-run rounds
    # don't misread 2×repeat executions as one (round-9 advisor note)
    out["canon_runs_per_pass"] = 2
    out["canon_pass_totals"] = canon_pass_totals
    out["canon_pass_load"] = canon_pass_load
    out["loadavg_1m_end"] = _loadavg_1m()
    out["registry_total"] = registry_total
    out["n_registry"] = len(timings)
    print(json.dumps(out))
    # The full artifact line is tens of KB (283 query timings) and the
    # driver's tail capture keeps only the LAST 2000 chars, then parses
    # the LAST line — so the final line must both fit entirely inside
    # that window and carry a per-query map, or the driver's PERF
    # comparison reads per_query: {} every round (r14 verdict item 2).
    # The 283-entry map cannot fit (~8.5 KB), so the final line carries
    # the CANON map (28 stable queries, never rotated — exactly the
    # cross-round comparison set) as its "queries" key; the full map
    # still rides in the first line for local consumers.  NOTHING is
    # removed from the bench itself: n_queries / n_registry still count
    # every registry query and the first line keeps every timing.
    summary = {
        "metric": "bench_summary",
        "n_queries": len(timings),
        "n_errors": len(errors),
        "value": total,
        "unit": "sec",
        "sf": sf,
        "queries": canon,
        "canon_total": out["canon_total"],
        "canon_repeat": repeat,
        "canon_runs_per_pass": 2,
        "canon_pass_totals": canon_pass_totals,
        "registry_total": registry_total,
        "n_registry": len(timings),
        "incomplete": bool(curated_errors),
        "registry_incomplete": bool(registry_errors),
    }
    line = json.dumps(summary)
    if len(line) >= 1900:
        # never let the parsed line outgrow the 2000-char tail window:
        # drop the diagnostic pass totals first, then (pathologically)
        # the map itself — a summary without per-query beats an
        # unparseable fragment.
        summary.pop("canon_pass_totals", None)
        line = json.dumps(summary)
        if len(line) >= 1900:
            summary["queries"] = {}
            line = json.dumps(summary)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
