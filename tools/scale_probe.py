"""Scaling probes: time an operator at 1× and ~10× input and report the
ratio.  A healthy distributed shape scales at-or-below linearly in rows;
a superlinear ratio flags a quadratic join / skew blowup.

ngram-jaccard: 1× = documents with doc_id % 10 == 0, 10× = the full
documents table — real rows, so shingle doc-frequencies grow naturally
and the df-cut (max_doc_freq) is exercised the way skew would exercise
it at 100 TB.

Usage: python tools/scale_probe.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sumologic_aws_lambda_spark.catalog import table  # noqa: E402
from sumologic_aws_lambda_spark.operators.dedup import (  # noqa: E402
    minhash_signatures,
    ngram_jaccard_pairs,
    paragraph_dedup,
)
from sumologic_aws_lambda_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    hard_negatives,
    hyperplanes,
    lsh_topk,
)
from sumologic_aws_lambda_spark.operators.text import (  # noqa: E402
    add_char_entropy,
    benchmark_ngram_hits,
)
from sumologic_aws_lambda_spark.session import get_spark  # noqa: E402


def _time(df) -> tuple[float, int]:
    t0 = time.time()
    n = df.count()
    return time.time() - t0, n


def _gopher_rollup(d):
    from sumologic_aws_lambda_spark.operators.text import gopher_rule_flags

    return gopher_rule_flags(d).groupBy("source").agg(
        F.count_if(F.col("pass_all")).alias("n_pass")
    )


def _dsir(d):
    from sumologic_aws_lambda_spark.operators.selection import dsir_weights

    return dsir_weights(d, F.col("lang") == "en", n_buckets=64)


def _nb(d):
    from sumologic_aws_lambda_spark.operators.selection import (
        nb_token_scores,
    )

    return nb_token_scores(d, F.col("n_chars") >= 300)


def _winnow(d):
    from sumologic_aws_lambda_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    return winnowing_fingerprints(d, k=4, w=4)


def _funnel(d):
    from sumologic_aws_lambda_spark.operators.dedup import exact_dedup
    from sumologic_aws_lambda_spark.operators.selection import dsir_weights
    from sumologic_aws_lambda_spark.operators.text import token_count

    s1 = d.withColumn("__n_tok", token_count("text")).filter(
        F.col("__n_tok").between(20, 180))
    s3 = exact_dedup(s1).filter(F.col("lang") != "zh")
    return dsir_weights(
        s3, F.col("lang") == "en", keep=("doc_id", "__n_tok")
    ).filter(F.col("dsir_weight") > 0)




def _pii_mask(d):
    from sumologic_aws_lambda_spark.provisioning import CatalogStore, Source

    src = Source(name="p", collector_id="c", filters=[
        {"filterType": "Mask", "name": "m", "regexp": "customer",
         "mask": "#####"},
        {"filterType": "Hash", "name": "h",
         "regexp": r"\b(?:join|merge)\b"},
    ])
    return d.select(
        "doc_id",
        F.md5(CatalogStore.source_mask_transform(src, "text")).alias("m"))


def _bigram_lm(d):
    from sumologic_aws_lambda_spark.operators.text import normalize_text

    toks = F.split(normalize_text("text"), " ")
    n = F.size(toks)
    pairs = d.select("doc_id", F.explode(F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("prev"),
        F.slice(toks, 2, n - 1).alias("cur"))).alias("p")) \
        .select("doc_id", "p.prev", "p.cur")
    bi = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cb"))
    return pairs.join(F.broadcast(bi), ["prev", "cur"]) \
        .groupBy("doc_id").agg(F.sum(F.log2("cb")).alias("s"))


def _soak_stage2(spark, n_batches: int) -> int:
    """Long-stream soak of the composed stage-2 curation sink
    (round-11 verdict item 5): ``n_batches`` micro-batches through
    :class:`CurationStage2Sink` (one file per trigger), then measure
    per-store partition growth, file counts and store read time BEFORE
    vs AFTER compaction, and finally check batch-run parity — the
    soaked admissions must equal a one-batch twin's over the same rows.
    Prints one JSON line for BASELINE.md."""
    import json
    import shutil
    import tempfile

    from sumologic_aws_lambda_spark.streaming.dedup import (
        compact_batch_store,
        fingerprint_store_agg,
        last_committed_batch_id,
    )
    from sumologic_aws_lambda_spark.streaming.domain_cap import (
        budget_store_agg,
        cap_store_agg,
        order_watermark_agg,
        order_watermark_dir,
    )
    from sumologic_aws_lambda_spark.streaming.neardup import (
        CurationStage2Sink,
        band_store_agg,
    )

    root = tempfile.mkdtemp(prefix="soak_stage2_")
    j = lambda *p: os.path.join(root, *p)  # noqa: E731

    # synthetic crawl: 20 urls/batch over a 25-publisher pool, ~30% raw
    # spellings repeat an earlier batch's page (URL-dedup pressure),
    # text shares a boilerplate template per pub (near-dup pressure)
    def rows(b):
        out = []
        for i in range(20):
            doc = b * 20 + i
            page = doc if doc % 3 else max(doc - 21, 0)
            pub = page % 25
            txt = (" ".join(f"w{pub}t{k}" for k in range(30))
                   + f" tail{page}")
            out.append({"doc_id": doc,
                        "url": f"https://s{page % 3}.pub{pub}.org/p/"
                               f"{page}?utm_source=x",
                        "text": txt})
        return out

    os.makedirs(j("in"))
    now = time.time()
    for b in range(n_batches):
        p = j("in", f"b{b:04d}.json")
        with open(p, "w") as fh:
            for r in rows(b):
                fh.write(json.dumps(r) + "\n")
        # FileStreamSource orders same-mtime files arbitrarily — force
        # distinct increasing mtimes so batch order == crawl order.
        # (First soak run proved the point: TokenBudgetSink's
        # order-watermark guard REFUSED the out-of-order delivery.)
        os.utime(p, (now + b, now + b))

    stores = {
        "dedup": (j("dedup"), fingerprint_store_agg),
        "cap": (j("cap"), cap_store_agg),
        "band": (j("band"), band_store_agg),
        "budget": (j("budget"), budget_store_agg),
        "order_wm": (order_watermark_dir(j("budget")),
                     order_watermark_agg),
    }
    sink = CurationStage2Sink(
        spark, j("dedup"), j("cap"), j("band"), j("budget"), j("out"),
        cap=40, token_budget=900, min_chars=10, token_band=(5, 2000))
    stream = (spark.readStream.format("json")
              .schema("doc_id long, url string, text string")
              .option("maxFilesPerTrigger", 1)
              .load(j("in")))
    t0 = time.time()
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", j("ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    soak_s = time.time() - t0

    def _stats():
        out = {}
        for name, (d, _) in stores.items():
            parts = files = 0
            for dirpath, _dirs, fnames in os.walk(d):
                if os.path.basename(dirpath).startswith("batch_id="):
                    parts += 1
                files += sum(f.endswith(".parquet") for f in fnames)
            t = time.time()
            n = spark.read.parquet(d).count() if parts else 0
            out[name] = {"partitions": parts, "files": files,
                         "rows": n, "read_s": round(time.time() - t, 3)}
        return out

    before = _stats()
    upto = last_committed_batch_id(spark, j("ckpt"))
    t0 = time.time()
    for name, (d, agg) in stores.items():
        compact_batch_store(spark, d, upto, agg=agg)
    compact_s = time.time() - t0
    after = _stats()

    # batch-run parity: one batch holding the union through fresh stores
    twin = CurationStage2Sink(
        spark, j("t_dedup"), j("t_cap"), j("t_band"), j("t_budget"),
        j("t_out"), cap=40, token_budget=900, min_chars=10,
        token_band=(5, 2000))
    union = [r for b in range(n_batches) for r in rows(b)]
    twin(spark.createDataFrame(
        [(r["doc_id"], r["url"], r["text"]) for r in union],
        "doc_id long, url string, text string"), 0)
    soaked = sorted(r.doc_id for r in
                    spark.read.parquet(j("out")).select("doc_id").collect())
    twinned = sorted(r.doc_id for r in
                     spark.read.parquet(j("t_out")).select("doc_id")
                     .collect())
    print(json.dumps({
        "probe": "soak_stage2", "n_batches": n_batches,
        "n_rows": 20 * n_batches, "soak_s": round(soak_s, 1),
        "last_committed": upto, "compact_s": round(compact_s, 1),
        "before": before, "after": after,
        "n_admitted": len(soaked),
        "parity": soaked == twinned,
    }))
    shutil.rmtree(root, ignore_errors=True)
    return 0 if soaked == twinned else 1


def _soak_stage1(spark, n_batches: int) -> int:
    """Long-stream soak of the composed stage-1 curation sink
    (round-14 verdict item 8: the r13 lazy extraction checkpoint
    landed AFTER the r13 soak) — ``n_batches`` micro-batches of
    HTML-bearing crawl rows through :class:`CurationStage1Sink` with a
    REAL ``extract_main_text`` extraction stage, then batch-run parity
    (one-batch twin over the union) AND replay idempotence (redeliver
    the final batch; per-batch-overwrite stores must leave the output
    byte-identical).  Prints one JSON line for BASELINE.md."""
    import json
    import shutil
    import tempfile

    from sumologic_aws_lambda_spark.operators.html import (
        extract_main_text,
    )
    from sumologic_aws_lambda_spark.streaming.neardup import (
        CurationStage1Sink,
    )

    root = tempfile.mkdtemp(prefix="soak_stage1_")
    j = lambda *p: os.path.join(root, *p)  # noqa: E731

    # synthetic crawl with an EXTRACTION-heavy payload: main paragraph
    # (30 words, shared template per publisher -> near-dup pressure)
    # + boilerplate nav/footer segments the extractor must strip;
    # ~30% of raw spellings repeat an earlier page (URL-dedup
    # pressure), all under a 25-publisher pool (cap pressure)
    def rows(b):
        out = []
        for i in range(20):
            doc = b * 20 + i
            page = doc if doc % 3 else max(doc - 21, 0)
            pub = page % 25
            body = (" ".join(f"w{pub}t{k}" for k in range(30))
                    + f" tail{page}")
            html = (f"<html><body><nav>home | about</nav>"
                    f"<p>{body}</p>"
                    f"<footer><a href='/x'>links</a></footer>"
                    f"</body></html>")
            out.append({"doc_id": doc,
                        "url": f"https://s{page % 3}.pub{pub}.org/p/"
                               f"{page}?utm_source=x",
                        "page_html": html})
        return out

    os.makedirs(j("in"))
    now = time.time()
    for b in range(n_batches):
        p = j("in", f"b{b:04d}.json")
        with open(p, "w") as fh:
            for r in rows(b):
                fh.write(json.dumps(r) + "\n")
        os.utime(p, (now + b, now + b))

    def make_sink(prefix):
        return CurationStage1Sink(
            spark, j(f"{prefix}dedup"), j(f"{prefix}cap"),
            j(f"{prefix}band"), j(f"{prefix}out"),
            url_col="url", order_col="doc_id", cap=40,
            content_col="page_html",
            extract=lambda c: extract_main_text(c)["extracted_text"],
            min_chars=10, token_band=(5, 2000))

    sink = make_sink("")
    stream = (spark.readStream.format("json")
              .schema("doc_id long, url string, page_html string")
              .option("maxFilesPerTrigger", 1)
              .load(j("in")))
    t0 = time.time()
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", j("ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    soak_s = time.time() - t0

    out_df = spark.read.parquet(j("out"))
    soaked = sorted(r.doc_id for r in
                    out_df.select("doc_id").collect())

    # replay idempotence: redeliver the FINAL batch verbatim (the one
    # batch the engine can still redeliver after a crash) — admitted
    # set must not change
    last = n_batches - 1
    sink(spark.createDataFrame(
        [(r["doc_id"], r["url"], r["page_html"]) for r in rows(last)],
        "doc_id long, url string, page_html string"), last)
    replayed = sorted(r.doc_id for r in
                      spark.read.parquet(j("out"))
                      .select("doc_id").collect())

    # batch-run parity: one batch holding the union through fresh
    # stores admits the same documents
    twin = make_sink("t_")
    union = [r for b in range(n_batches) for r in rows(b)]
    twin(spark.createDataFrame(
        [(r["doc_id"], r["url"], r["page_html"]) for r in union],
        "doc_id long, url string, page_html string"), 0)
    twinned = sorted(r.doc_id for r in
                     spark.read.parquet(j("t_out"))
                     .select("doc_id").collect())

    ok = soaked == twinned and soaked == replayed
    print(json.dumps({
        "probe": "soak_stage1", "n_batches": n_batches,
        "n_rows": 20 * n_batches, "soak_s": round(soak_s, 1),
        "s_per_trigger": round(soak_s / n_batches, 2),
        "n_admitted": len(soaked),
        "parity": soaked == twinned,
        "replay_idempotent": soaked == replayed,
    }))
    shutil.rmtree(root, ignore_errors=True)
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--registry", nargs="*", default=None,
                    help="probe named REGISTRY queries at sf0.01 (1x) vs "
                         "sf0.1 (10x) instead of the operator probes")
    ap.add_argument("--soak-stage2", type=int, default=None,
                    metavar="N_BATCHES",
                    help="long-stream soak of CurationStage2Sink: N "
                         "micro-batches, store growth + compaction + "
                         "batch-run parity (round-11 verdict item 5)")
    ap.add_argument("--soak-stage1", type=int, default=None,
                    metavar="N_BATCHES",
                    help="long-stream soak of CurationStage1Sink with "
                         "a real extraction stage: N micro-batches, "
                         "batch-run parity + final-batch replay "
                         "idempotence (round-14 verdict item 8)")
    args = ap.parse_args()
    spark = get_spark("scale-probe")

    if args.soak_stage2 is not None:
        rc = _soak_stage2(spark, args.soak_stage2)
        spark.stop()
        return rc

    if args.soak_stage1 is not None:
        rc = _soak_stage1(spark, args.soak_stage1)
        spark.stop()
        return rc

    if args.registry is not None:
        # Generic registry probe: real 10x-row inputs via the sf dirs,
        # so partition counts, dims and join fan-ins all grow the way a
        # scale-up grows them (not a synthetic filter).  The 1x dir is
        # DERIVED from --sf (one scale-factor decade down), so a
        # non-default --sf keeps the printed 1x/10x labels truthful.
        from sumologic_aws_lambda_spark import queries as registry

        m = re.fullmatch(r"(.*?/sf)0*([0-9.]+)/?", args.sf)
        if not m:
            raise SystemExit(f"--sf {args.sf!r} is not an sfN dir")
        small_dir = f"{m.group(1)}{float(m.group(2)) / 10:g}"
        if not os.path.isdir(small_dir):
            raise SystemExit(f"no 1x dir {small_dir!r} below --sf")
        qs = registry.all_queries()
        names = args.registry or list(qs)
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        for name in names:
            fn = qs[name]
            t1, n1 = _time(fn(spark, small_dir))   # warm
            t1, n1 = _time(fn(spark, small_dir))
            t10, n10 = _time(fn(spark, args.sf))
            ratio = t10 / t1 if t1 else float("inf")
            print(
                f"{name}: 1x {t1:.2f}s ({n1} rows) -> 10x {t10:.2f}s "
                f"({n10} rows), time ratio {ratio:.1f}x"
            )
        return 0

    docs = table(spark, args.sf, "documents", parallel=True)
    probes = {
        "ngram_jaccard_df50": lambda d: ngram_jaccard_pairs(
            d, threshold=0.1, max_doc_freq=50
        ),
        "minhash_signatures": lambda d: minhash_signatures(d, num_hashes=8),
        "ngram_decontamination": lambda d: benchmark_ngram_hits(
            d.filter(F.col("doc_id") % 17 != 0),
            d.filter(F.col("doc_id") % 17 == 0),
            n=4,
        ),
        "char_entropy": lambda d: add_char_entropy(d).select(
            "doc_id", "entropy_nats"
        ),
        "paragraph_dedup": lambda d: paragraph_dedup(d).select(
            "doc_id", "n_kept"
        ),
        # Gopher battery: one narrow flag projection + a map-side-combined
        # rollup — the ratio should track rows.
        "gopher_rules": lambda d: _gopher_rollup(d),
        # Selection wave: model tables are bucket/vocabulary-sized
        # broadcasts; the only corpus-sized shuffle is the per-doc score
        # groupBy — ratios should track rows.
        "dsir_weights": lambda d: _dsir(d),
        "nb_token_scores": lambda d: _nb(d),
        # Five-stage funnel: filters + two partial-agg shuffles (dedup
        # winners, DSIR scores) — ratio should track rows.
        "curation_funnel": lambda d: _funnel(d),
        # Winnowing: per-document array math, zero shuffles — ratio
        # should track rows even though windows fan out ~len×w structs.
        "winnowing": lambda d: _winnow(d),
        # Round-7 wave: narrow redaction fold; broadcast-LM scoring.
        "pii_masking": lambda d: _pii_mask(d),
        "bigram_lm": lambda d: _bigram_lm(d),
    }
    for name, fn in probes.items():
        small = docs.filter(F.col("doc_id") % 10 == 0)
        t1, n1 = _time(fn(small))     # warm
        t1, n1 = _time(fn(small))
        t10, n10 = _time(fn(docs))
        ratio = t10 / t1 if t1 else float("inf")
        print(
            f"{name}: 1x {t1:.2f}s ({n1} rows) -> 10x {t10:.2f}s "
            f"({n10} rows), time ratio {ratio:.1f}x"
        )

    # Behavior wave: events-keyed probes.  Funnel/trigrams shuffle on
    # the user key only; pagerank collapses events to a node² edge list
    # then iterates on broadcasts — event-count growth should show in
    # the one aggregation pass, never in the iteration.
    ev = table(spark, args.sf, "events", parallel=True)

    def _pagerank(e):
        from sumologic_aws_lambda_spark.operators.graph import (
            pagerank,
            transition_edges,
        )

        return pagerank(transition_edges(e), iterations=3)

    def _ev_funnel(e):
        from sumologic_aws_lambda_spark.operators.behavior import (
            funnel_stage_times,
        )

        return funnel_stage_times(e)

    def _trigrams(e):
        from sumologic_aws_lambda_spark.operators.behavior import (
            path_ngram_counts,
        )

        return path_ngram_counts(e, n=3)

    def _rangeparts(e):
        from sumologic_aws_lambda_spark.operators.behavior import (
            range_bucket_stats,
        )

        return range_bucket_stats(e, "value")

    def _funnel_rates(e):
        from sumologic_aws_lambda_spark.operators.behavior import (
            funnel_stage_times,
        )

        return funnel_stage_times(e).agg(
            F.count(F.lit(1)).alias("n_signup"),
            F.count("t2").alias("n_click"),
            F.count("t3").alias("n_purchase"),
        )

    def _cohort_ltv(e):
        first_seen = e.groupBy("user_id").agg(
            F.date_trunc("week", F.min("ts")).alias("cohort"))
        is_p = F.col("event_type") == "purchase"
        return (
            e.join(first_seen, "user_id")
            .groupBy("cohort", F.date_trunc("week", "ts").alias("wk"))
            .agg(
                F.countDistinct(
                    F.when(is_p, F.col("user_id"))).alias("n_buyers"),
                F.round(F.sum(F.when(is_p, F.col("value"))
                              .otherwise(0.0)), 4).alias("revenue"),
            )
        )


    def _hier(e):
        from sumologic_aws_lambda_spark.plans.hierarchies import (
            HierarchyLevel,
            explorer_rollup,
        )

        level = HierarchyLevel.from_dict({
            "entityType": "event_type",
            "nextLevelsWithConditions": [
                {"condition": "error",
                 "level": {"entityType": "user_bucket"}}],
            "nextLevel": {"entityType": "weekday"},
        })
        return explorer_rollup(e, level, dims={
            "event_type": F.col("event_type"),
            "user_bucket": (F.col("user_id") % 10).cast("string"),
            "weekday": F.dayofweek("ts").cast("string"),
        })

    def _ewma(e):
        from pyspark.sql import Window

        series = e.groupBy(
            "event_type",
            F.unix_timestamp(F.date_trunc("hour", "ts"))
            .alias("slice_epoch"),
        ).agg(F.count(F.lit(1)).alias("cnt"))
        w = (Window.partitionBy("event_type").orderBy("slice_epoch")
             .rowsBetween(-12, -1))
        hist = series.withColumn(
            "a", F.collect_list(F.col("cnt").cast("double")).over(w))
        n = F.size("a")
        arr = F.col("a")
        num = F.aggregate(
            F.sequence(F.lit(1), n), F.lit(0.0),
            lambda acc, j: acc + F.try_element_at(arr, j)
            * F.pow(F.lit(0.7), (n - j).cast("double")))
        den = F.aggregate(
            F.sequence(F.lit(1), n), F.lit(0.0),
            lambda acc, j: acc + F.pow(F.lit(0.7), (n - j).cast("double")))
        return hist.filter(n >= 3).select(
            "event_type", "slice_epoch", "cnt",
            F.round(num / den, 6).alias("ewma_prev"))

    def _burn(e):
        from sumologic_aws_lambda_spark.plans.slos import (
            SloSpec,
            burn_rate_windows,
        )
        from sumologic_aws_lambda_spark.plans.sumoql import SumoSchema

        spec = SloSpec(name="s", good_condition="event_type <> 'error'",
                       target=0.75, slice_="1h")
        return burn_rate_windows(
            e, spec, SumoSchema(ts_col="ts"), long_hours=6)

    ev_probes = {
        "event_pagerank": _pagerank,
        "event_funnel": _ev_funnel,
        "event_trigrams": _trigrams,
        "range_partition": _rangeparts,
        "funnel_conversion_rates": _funnel_rates,
        "cohort_ltv": _cohort_ltv,
        "entity_hierarchy": _hier,
        "ewma_drift": _ewma,
        "slo_burn_windows": _burn,
    }
    def _time_full(fn, d):
        # pagerank localCheckpoints eagerly during CONSTRUCTION, so the
        # build call must sit inside the timed region or the probe only
        # measures the final count over checkpointed blocks.
        t0 = time.time()
        n = fn(d).count()
        return time.time() - t0, n

    for name, fn in ev_probes.items():
        small = ev.filter(F.col("event_id") % 10 == 0)
        t1, n1 = _time_full(fn, small)     # warm
        t1, n1 = _time_full(fn, small)
        t10, n10 = _time_full(fn, ev)
        ratio = t10 / t1 if t1 else float("inf")
        print(
            f"{name}: 1x {t1:.2f}s ({n1} rows) -> 10x {t10:.2f}s "
            f"({n10} rows), time ratio {ratio:.1f}x"
        )

    # Hot-key probe: the C4 motivation case — ONE boilerplate paragraph
    # duplicated across ~10⁵ synthetic docs (every copy shares one
    # paragraph hash).  The r4 content-hash-window form serialized all
    # copies into a single task, so 10× hot rows meant ~10× wall time on
    # one core; the groupBy-winner + composite-key-join form absorbs the
    # hot key map-side, so the ratio should track rows (≤ ~linear), not
    # concentrate.
    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"
    for n_hot, tag in ((10_000, "1x"), (100_000, "10x")):
        hot = spark.range(n_hot).select(
            (F.col("id") + 1_000_000).alias("doc_id"),
            F.concat(F.lit(boiler + " unique tail "),
                     F.col("id").cast("string")).alias("text"),
        )
        t, n = _time(paragraph_dedup(hot).select("doc_id", "n_kept"))
        if tag == "1x":
            t_hot1 = t
        else:
            print(
                f"paragraph_dedup_hotkey: 1x {t_hot1:.2f}s -> 10x {t:.2f}s "
                f"({n} rows), time ratio {t / t_hot1 if t_hot1 else 0:.1f}x"
            )

    # Hot-BUCKET probe for the shared crawl-funnel near-dedup chain
    # (queries/curation.py::_funnel_neardup): ONE 40-word template with
    # a 2-word unique tail duplicated 10⁴/10⁵× — a viral boilerplate
    # page class whose MinHash band keys all collide, so every copy of
    # a band lands in a single Window.partitionBy(band, band_key) task.
    # The round-10 verdict watch item: bucket size is bounded by the
    # stage-0 domain cap in the REAL funnels, but the chain itself
    # should degrade linearly, not concentrate, if a cap-less caller
    # ever feeds it raw skew.
    from sumologic_aws_lambda_spark.queries.curation import (
        _funnel_neardup,
    )

    template = " ".join(f"tok{i:02d}x" for i in range(40))
    for n_hot, tag in ((10_000, "1x"), (100_000, "10x")):
        hot = spark.range(n_hot).select(
            F.col("id").alias("doc_id"),
            F.lit(True).alias("gated"),
            F.concat(F.lit(template + " tail "),
                     F.col("id").cast("string")).alias("xt"),
        )
        t, n = _time(_funnel_neardup(hot, ("doc_id", "gated")))
        if tag == "1x":
            t_nd1 = t
        else:
            print(
                f"funnel_neardup_hotbucket: 1x {t_nd1:.2f}s -> 10x "
                f"{t:.2f}s ({n} rows), time ratio "
                f"{t / t_nd1 if t_nd1 else 0:.1f}x"
            )

    # ANN probes scale in CORPUS size with a fixed query set: the corpus
    # side must stay narrow (bucketing / scoring), so healthy ratios track
    # rows, never rows².
    emb = table(spark, args.sf, "embeddings", parallel=True)
    queries = emb.filter(F.col("vec_id") < 20)
    planes = hyperplanes(num_planes=8, dim=64)
    def _ivfpq(c):
        from sumologic_aws_lambda_spark.operators.similarity import (
            ivfpq_adc_topk,
            pq_train,
        )

        books = pq_train(c, m=8, k=8, iters=0)
        cents = c.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
        return ivfpq_adc_topk(c, books, cents, queries, k=5, nprobe=2)

    ann_probes = {
        "lsh_ann_topk": lambda c: lsh_topk(c, queries, planes, k=5),
        "brute_force_topk": lambda c: brute_force_topk(c, queries, k=5),
        # Corpus work is one narrow codes+cells pass; candidates scale
        # with rows/K, so the ratio should track rows or better.
        "ivfpq_adc_topk": _ivfpq,
        # Same bucket-join shape as lsh_topk plus the label filter.
        "hard_negatives": lambda c: hard_negatives(
            c, queries, planes, k=4),
    }
    for name, fn in ann_probes.items():
        small = emb.filter(F.col("vec_id") % 10 == 0)
        t1, n1 = _time(fn(small))     # warm
        t1, n1 = _time(fn(small))
        t10, n10 = _time(fn(emb))
        ratio = t10 / t1 if t1 else float("inf")
        print(
            f"{name}: 1x {t1:.2f}s ({n1} rows) -> 10x {t10:.2f}s "
            f"({n10} rows), time ratio {ratio:.1f}x"
        )

    # PQ probes: encode is a narrow projection (ratio ≈ rows); ADC reads
    # codes only, scoring corpus × fixed-query-set (ratio ≈ rows).  Both
    # pay a fixed Catalyst-compile cost that dominates at sf0.1 — the
    # ratio, not the absolute, is the scaling signal.
    from sumologic_aws_lambda_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    books = pq_train(emb, m=8, k=8, iters=1)
    pq_probes = {
        "pq_encode": lambda c: pq_encode(c, books),
        "pq_adc_topk": lambda c: pq_adc_topk(
            pq_encode(c, books), books, queries, k=5),
    }
    for name, fn in pq_probes.items():
        small = emb.filter(F.col("vec_id") % 10 == 0)
        t1, n1 = _time(fn(small))     # warm
        t1, n1 = _time(fn(small))
        t10, n10 = _time(fn(emb))
        ratio = t10 / t1 if t1 else float("inf")
        print(
            f"{name}: 1x {t1:.2f}s ({n1} rows) -> 10x {t10:.2f}s "
            f"({n10} rows), time ratio {ratio:.1f}x"
        )
    # Budget probe: 50 keys ALL over budget at both scales — the worst
    # case, every row pays the cumulative-sum window — so the ratio
    # measures pure window scaling, not a cheap-path/expensive-path
    # regime change.  1x runs twice (warm) like every other probe so the
    # one-time codegen/class-loading cost doesn't bias the ratio down.
    from sumologic_aws_lambda_spark.operators.budgets import (
        apply_ingest_budget,
    )

    def _budget_run(n_rows: int) -> float:
        hot = spark.range(n_rows).select(
            F.col("id"),
            (F.col("id") % 50).cast("string").alias("key"),
            F.concat(F.lit("payload-"), F.col("id")).alias("msg"),
        )
        t, _ = _time(
            apply_ingest_budget(hot, budget_bytes=500, key_cols=["key"],
                                order_cols=["id"], size=F.length("msg"))
            .groupBy("_over_budget").count()
        )
        return t

    _budget_run(20_000)            # warm
    t_b1 = _budget_run(20_000)
    t_b10 = _budget_run(200_000)
    print(
        f"ingest_budget_allover: 1x {t_b1:.2f}s (20000 rows) -> "
        f"10x {t_b10:.2f}s (200000 rows), time ratio "
        f"{t_b10 / t_b1 if t_b1 else 0:.1f}x"
    )

    # Sketch probe: per-day HLL sketches merged per type — two partial-
    # aggregatable shuffles whose reduce side is days × types regardless
    # of row count, so the ratio should track the scan, nothing more.
    ev = table(spark, args.sf, "events")

    def hll_rollup(e):
        daily = e.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        ).agg(F.hll_sketch_agg("user_id").alias("sk"))
        return daily.groupBy("event_type").agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
        )

    small = ev.filter(F.col("event_id") % 10 == 0)
    t1, n1 = _time(hll_rollup(small))
    t1, n1 = _time(hll_rollup(small))
    t10, n10 = _time(hll_rollup(ev))
    print(
        f"hll_daily_rollup: 1x {t1:.2f}s ({n1} rows) -> 10x {t10:.2f}s "
        f"({n10} rows), time ratio {t10 / t1 if t1 else 0:.1f}x"
    )

    # Round-6 probes.  Span dedup: gram fan-out is linear in tokens and
    # the only shuffle is one partial-agg groupBy on the span hash — the
    # ratio should track rows even though a boilerplate span is a hot
    # KEY (map-side combine absorbs it; contrast the hot-key paragraph
    # probe above).  SemDeDup: assignment is narrow, but the
    # within-cluster pair space grows ~quadratically in cluster size
    # when k is FIXED while the corpus grows 10× — the printed ratio
    # documents exactly that (the design mitigation is scaling k with
    # the corpus, which caps cluster sizes; see semdedup_labels's doc).
    from sumologic_aws_lambda_spark.operators.dedup import (
        duplicate_span_stats,
    )
    from sumologic_aws_lambda_spark.operators.similarity import (
        semdedup_labels,
    )

    r6_probes = {
        "substring_dup_spans": (
            docs, lambda d: duplicate_span_stats(d, k=8)),
        "semdedup_labels_fixed_k": (
            emb, lambda e: semdedup_labels(e, n_centroids=8,
                                           threshold=0.2)),
        # the scale path: clusters per corpus size held constant by
        # growing k 10× with the data — pair space per cluster stays
        # bounded, ratio should fall back toward linear.
        "semdedup_labels_scaled_k": (
            emb, lambda e: semdedup_labels(e, n_centroids=80,
                                           threshold=0.2)),
    }
    for name, (src, fn) in r6_probes.items():
        id_col = "doc_id" if "doc_id" in src.columns else "vec_id"
        small = src.filter(F.col(id_col) % 10 == 0)
        t1, n1 = _time(fn(small))     # warm
        t1, n1 = _time(fn(small))
        t10, n10 = _time(fn(src))
        ratio = t10 / t1 if t1 else float("inf")
        print(
            f"{name}: 1x {t1:.2f}s ({n1} rows) -> 10x {t10:.2f}s "
            f"({n10} rows), time ratio {ratio:.1f}x"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
