"""Data-selection queries: DSIR importance resampling and the
Naive-Bayes (fastText-style) quality classifier — the model-based
selection recipes of a pre-training pipeline, on top of
``operators/selection.py``.  Each oracle replays the full pipeline
(feature hashing → model fit → scoring) in DuckDB, so the hard signal
covers the math, not just the final rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.selection import dsir_weights, nb_token_scores
from .sampling import _hex8_to_int_sql
from . import query

# DuckDB twin of operators.text.normalize_text.
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_DSIR_B = 64  # hashed-bigram buckets (production: 10k–100k; the
              # fixture corpus has ~31 tokens → ~1k distinct bigrams)

# Shared oracle CTEs: hashed-bigram features + smoothed log-ratio table.
_DSIR_CTES = f"""
    docs AS (
        SELECT doc_id, source, (lang = 'en') AS is_t,
               string_split({_NORM}, ' ') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id, source, is_t,
               {_hex8_to_int_sql("md5(t[i] || ' ' || t[i+1])")} % {_DSIR_B}
                   AS bucket
        FROM docs,
             LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
    ),
    bstats AS (
        SELECT bucket,
               sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS p_c,
               count(*) AS q_c
        FROM grams GROUP BY bucket
    ),
    btot AS (
        SELECT CAST(sum(p_c) AS DOUBLE) AS p_tot,
               CAST(sum(q_c) AS DOUBLE) AS q_tot
        FROM bstats
    ),
    lam AS (
        SELECT bucket,
               ln((p_c + 1) / (p_tot + {_DSIR_B}))
                   - ln((q_c + 1) / (q_tot + {_DSIR_B})) AS lam
        FROM bstats CROSS JOIN btot
    ),
    weights AS (
        SELECT doc_id, source,
               count(*) AS n_grams,
               round(sum(lam), 4) AS dsir_weight
        FROM grams JOIN lam USING (bucket)
        GROUP BY doc_id, source
    )
"""


@query(
    "dsir_importance_weights",
    oracle=f"""
    WITH {_DSIR_CTES}
    SELECT doc_id, n_grams, dsir_weight
    FROM weights WHERE doc_id < 200
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) importance weights with English documents
    as the target distribution: per-document log-likelihood ratio under
    hashed-bigram bag models of target vs raw.  Scored output restricted
    to doc_id < 200 (the per-doc-exact compare convention, as
    ``unigram_lm_scores``) — the oracle replays hashing, smoothing and
    scoring end-to-end.  Documents under 2 tokens carry no bigram
    evidence and produce no row (both engines).

    Plan shape (see ``operators/selection.py::dsir_weights``): the model
    is 64 hash buckets → broadcast; ONE corpus-sized shuffle."""
    d = table(spark, sf_dir, "documents", parallel=True)
    w = dsir_weights(d, F.col("lang") == "en", n_buckets=_DSIR_B)
    return w.filter(F.col("doc_id") < 200).select(
        "doc_id", "n_grams", "dsir_weight")


@query(
    "dsir_resample_stats",
    oracle=f"""
    WITH {_DSIR_CTES}
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN dsir_weight > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_selected,
           CAST(sum(CASE WHEN dsir_weight > 0 THEN n_grams ELSE 0 END)
                AS BIGINT) AS selected_grams
    FROM weights
    GROUP BY source
    """,
)
def dsir_resample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resampling half of DSIR: keep documents whose importance
    weight clears the acceptance bar (0 = "looks more target than raw";
    production draws Gumbel top-k, which is this filter with noise), and
    account the per-source yield.  Thresholding happens on the ROUNDED
    weight — the cross-engine convention for float compares — and the
    rollup is a pure integer aggregate on top of the scored frame."""
    d = table(spark, sf_dir, "documents", parallel=True)
    w = dsir_weights(d, F.col("lang") == "en", n_buckets=_DSIR_B,
                     keep=("doc_id", "source"))
    return w.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("dsir_weight") > 0, 1).otherwise(0))
        .cast("bigint").alias("n_selected"),
        F.sum(F.when(F.col("dsir_weight") > 0, F.col("n_grams"))
              .otherwise(0)).cast("bigint").alias("selected_grams"),
    )


_NB_MIN_CHARS = 300  # positive-class label: doc length proxy


@query(
    "nb_quality_scores",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, source, (n_chars >= {_NB_MIN_CHARS}) AS is_pos,
               string_split({_NORM}, ' ') AS t
        FROM documents
    ),
    toks AS (
        SELECT doc_id, source, is_pos, unnest(t) AS tok FROM docs
    ),
    cnt AS (
        SELECT tok,
               sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS c_pos,
               sum(CASE WHEN is_pos THEN 0 ELSE 1 END) AS c_neg
        FROM toks GROUP BY tok
    ),
    norms AS (
        SELECT CAST(sum(c_pos) AS DOUBLE) AS n_pos,
               CAST(sum(c_neg) AS DOUBLE) AS n_neg,
               CAST(count(*) AS DOUBLE) AS v
        FROM cnt
    ),
    prior AS (
        SELECT ln((sum(CASE WHEN is_pos THEN 1 ELSE 0 END) + 1)
                  / CAST(sum(CASE WHEN is_pos THEN 0 ELSE 1 END) + 1
                         AS DOUBLE)) AS log_prior
        FROM docs
    ),
    llr AS (
        SELECT tok, ln((c_pos + 1) / (n_pos + v))
                        - ln((c_neg + 1) / (n_neg + v)) AS llr
        FROM cnt CROSS JOIN norms
    ),
    scored AS (
        SELECT doc_id, source, is_pos,
               round(sum(llr) + any_value(log_prior), 4) AS nb_score
        FROM toks JOIN llr USING (tok) CROSS JOIN prior
        GROUP BY doc_id, source, is_pos
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos_label,
           CAST(sum(CASE WHEN nb_score > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pred_pos,
           CAST(sum(CASE WHEN (nb_score > 0) = is_pos THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM scored
    GROUP BY source
    """,
)
def nb_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-and-self-score a Naive-Bayes quality classifier (the
    bag-of-words reduction of the fastText-style filters CCNet/LLaMA
    pipelines use), with "long document" (n_chars ≥ 300) as
    the positive label.  Per-source confusion counts: documents, true
    positives by label, predicted positives, and agreement.  The oracle
    refits the identical model, so training and scoring both carry the
    hard signal (see ``operators/selection.py::nb_token_scores``)."""
    d = table(spark, sf_dir, "documents", parallel=True)
    scored = nb_token_scores(
        d, F.col("n_chars") >= _NB_MIN_CHARS,
        keep=("doc_id", "source", "__is_pos"),
    )
    pred = F.col("nb_score") > 0
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("__is_pos"), 1).otherwise(0))
        .cast("bigint").alias("n_pos_label"),
        F.sum(F.when(pred, 1).otherwise(0)).cast("bigint")
        .alias("n_pred_pos"),
        F.sum(F.when(pred == F.col("__is_pos"), 1).otherwise(0))
        .cast("bigint").alias("n_correct"),
    )


_FUN_MIN_TOK, _FUN_MAX_TOK = 20, 180

# The funnel's persisted dedup-winner pool from the LAST invocation —
# unpersisted when the next invocation builds a fresh one, so repeated
# runs (bench, driver sweeps) hold at most one cached copy.
_FUNNEL_CACHED = None


@query(
    "curation_pipeline_funnel",
    oracle=f"""
    WITH docs0 AS (
        SELECT doc_id, lang,
               len(string_split({_NORM}, ' ')) AS n_tok,
               {_NORM} AS norm
        FROM documents
    ),
    s1 AS (SELECT * FROM docs0
           WHERE n_tok BETWEEN {_FUN_MIN_TOK} AND {_FUN_MAX_TOK}),
    s2 AS (SELECT * FROM s1 QUALIFY row_number() OVER (
               PARTITION BY md5(norm) ORDER BY doc_id) = 1),
    s3 AS (SELECT * FROM s2 WHERE lang <> 'zh'),
    g3 AS (
        SELECT doc_id, (lang = 'en') AS is_t,
               string_split(norm, ' ') AS t
        FROM s3
    ),
    grams AS (
        SELECT doc_id, is_t,
               {_hex8_to_int_sql("md5(t[i] || ' ' || t[i+1])")} % {_DSIR_B}
                   AS bucket
        FROM g3,
             LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
    ),
    bstats AS (
        SELECT bucket,
               sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS p_c,
               count(*) AS q_c
        FROM grams GROUP BY bucket
    ),
    btot AS (
        SELECT CAST(sum(p_c) AS DOUBLE) AS p_tot,
               CAST(sum(q_c) AS DOUBLE) AS q_tot
        FROM bstats
    ),
    lam AS (
        SELECT bucket,
               ln((p_c + 1) / (p_tot + {_DSIR_B}))
                   - ln((q_c + 1) / (q_tot + {_DSIR_B})) AS lam
        FROM bstats CROSS JOIN btot
    ),
    weights AS (
        SELECT doc_id, round(sum(lam), 4) AS w
        FROM grams JOIN lam USING (bucket)
        GROUP BY doc_id
    ),
    s4 AS (SELECT s3.* FROM s3 JOIN weights USING (doc_id) WHERE w > 0)
    SELECT * FROM (
        SELECT '0_ingest' AS stage, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM docs0
        UNION ALL
        SELECT '1_quality', count(*), CAST(sum(n_tok) AS BIGINT) FROM s1
        UNION ALL
        SELECT '2_dedup', count(*), CAST(sum(n_tok) AS BIGINT) FROM s2
        UNION ALL
        SELECT '3_lang', count(*), CAST(sum(n_tok) AS BIGINT) FROM s3
        UNION ALL
        SELECT '4_select', count(*), CAST(sum(n_tok) AS BIGINT) FROM s4
    )
    """,
)
def curation_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FineWeb-style end-to-end curation funnel as ONE composed
    DataFrame program — quality gate (token-count band) → exact content
    dedup (skew-safe min_by winners) → language gate → DSIR selection
    (model fit on the surviving pool, English target) — reporting the
    document/token counts surviving each stage.  The point is
    COMPOSABILITY: every stage is an operator this engine already
    hard-signal-verifies in isolation, chained here exactly the way a
    production pipeline chains them, and the oracle replays the whole
    funnel end-to-end.

    Scale (the round-6 advisory fix — this used to re-scan the corpus
    once per stage): the five stage aggregates are now CONDITIONAL sums
    over exactly TWO corpus reads.  Stage 0/1 counts come from one
    conditional aggregate directly over the scan; stages 2–4 all hang
    off the single dedup-winner shuffle (the one required corpus
    exchange), whose output is PERSISTED (memory-and-disk) because its
    three consumers (stage-2/3 aggregate, DSIR bucket stats, DSIR score
    groupBy) prune different column sets, so ReuseExchange cannot
    dedupe them — at 100 TB the corpus is read twice and shuffled once,
    and the winner pool (already dedup-reduced, three narrow columns
    plus text) is materialized once instead of recomputed three times.
    Each invocation unpersists the PREVIOUS invocation's pool, so the
    session never holds more than one cached copy (round-7 review:
    bench/driver runs invoke this repeatedly).
    ``tests/test_plan_shapes.py`` pins the ≤2-scan property."""
    from pyspark import StorageLevel

    from ..operators.text import fingerprint, token_count

    d = table(spark, sf_dir, "documents", parallel=True)
    base = d.select("doc_id", "lang", "text",
                    token_count("text").alias("__n_tok"))
    q = F.col("__n_tok").between(_FUN_MIN_TOK, _FUN_MAX_TOK)

    # stages 0 + 1: one conditional aggregate over the scan (no shuffle
    # beyond the single-row partial-agg exchange)
    a01 = base.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("__n_tok").cast("bigint").alias("t0"),
        F.count_if(q).alias("n1"),
        F.sum(F.when(q, F.col("__n_tok"))).cast("bigint").alias("t1"),
    )

    # the one corpus shuffle: exact-dedup winners of the quality pool
    # (inlined min_by shape of operators.dedup.exact_dedup so the winner
    # frame carries only the funnel columns, not the full row)
    row = F.struct("doc_id", "lang", "__n_tok", "text")
    w = (
        base.filter(q)
        .groupBy(fingerprint("text").alias("_fp"))
        .agg(F.min_by(row, F.col("doc_id")).alias("_row"))
        .select("_row.doc_id", "_row.lang", "_row.__n_tok", "_row.text")
    )
    # Unpersist the previous invocation's pool BEFORE persisting the new
    # one: with an identical plan (same sf_dir) the CacheManager dedupes
    # the two frames onto one cache entry, so unpersisting the old frame
    # AFTER would evict the new frame's cache too.
    global _FUNNEL_CACHED
    if _FUNNEL_CACHED is not None:
        try:
            _FUNNEL_CACHED.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — a dead prior session is fine
            pass
    w = w.persist(StorageLevel.MEMORY_AND_DISK)
    _FUNNEL_CACHED = w

    # stages 2 + 3: one conditional aggregate over the winner exchange
    zh = F.col("lang") != "zh"
    a23 = w.agg(
        F.count(F.lit(1)).alias("n2"),
        F.sum("__n_tok").cast("bigint").alias("t2"),
        F.count_if(zh).alias("n3"),
        F.sum(F.when(zh, F.col("__n_tok"))).cast("bigint").alias("t3"),
    )

    # stage 4: DSIR selection over the language-gated winners — its two
    # reads of the winner frame reuse the same exchange
    s4 = dsir_weights(
        w.filter(zh), F.col("lang") == "en", n_buckets=_DSIR_B,
        keep=("doc_id", "__n_tok"),
    ).filter(F.col("dsir_weight") > 0)
    a4 = s4.agg(
        F.count(F.lit(1)).alias("n4"),
        F.sum("__n_tok").cast("bigint").alias("t4"),
    )

    # three single-row frames → one row → stack to the funnel shape
    return (
        a01.crossJoin(F.broadcast(a23)).crossJoin(F.broadcast(a4))
        .select(F.expr(
            "stack(5, '0_ingest', n0, t0, '1_quality', n1, t1, "
            "'2_dedup', n2, t2, '3_lang', n3, t3, '4_select', n4, t4) "
            "AS (stage, n_docs, n_tokens)"))
    )


@query(
    "quality_score_calibration",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               round(percent_rank() OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id
               ), 6) AS calibrated
        FROM documents
    )
    SELECT doc_id, source, n_chars, calibrated,
           CAST(calibrated >= 0.5 AS INT) AS selected
    FROM ranked
    """,
)
def quality_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quality-score calibration: map each document's raw
    score (``n_chars`` stands in for the upstream quality model) to
    its within-source percent rank, so a single global threshold
    selects the same FRACTION from every domain — the standard fix for
    cross-domain score-scale mismatch before mixing (CCNet buckets its
    LM perplexities per language the same way, Wenzek 2020).

    One window per source partition over (score, doc_id) — fully
    tie-broken, so both engines assign identical ranks (rule 5's alias
    discipline plus a total order).  percent_rank is the exact
    rational (rank-1)/(n-1) — a single division, rounded at 6 dp.  At
    100 TB the per-domain sort is the cost; the documented alternative
    is broadcast approxQuantile cut points per domain, same topology
    as RFM's finisher.
    """
    d = table(spark, sf_dir, "documents", parallel=True)
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "doc_id", "source", "n_chars",
        F.round(F.percent_rank().over(w), 6).alias("calibrated"),
    )
    return ranked.withColumn(
        "selected", (F.col("calibrated") >= 0.5).cast("int"))
