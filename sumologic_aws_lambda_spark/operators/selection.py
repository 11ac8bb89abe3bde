"""Data-selection operators for training-data pipelines.

Two standard selection recipes, both expressed as pure DataFrame plans:

* DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  arXiv:2302.03169): score every raw document by the log-likelihood
  ratio of a *target* distribution vs the *raw* distribution under a
  hashed-bigram bag-of-ngrams model, then keep the top of the ranking.
  The feature space is a fixed number of hash buckets, so both models
  are tiny tables no matter the corpus size.

* Naive-Bayes quality classifier — the fastText-style linear quality
  filter used by CCNet/LLaMA-era pipelines reduces (for a bag-of-words
  model) to per-token log-likelihood ratios + a prior: training is one
  token-count aggregation, scoring is a vocabulary-sized broadcast join.

Scale notes (100 TB): both operators make exactly ONE corpus-sized
shuffle (the per-document score groupBy, partial-agg friendly).  Model
tables are `n_buckets` / vocabulary rows → always broadcast.  Nothing
here is iterative and nothing collects corpus-sized state.

Not present in the reference (SumoLogic runs curation server-side);
these are north-star additions alongside ``operators/text.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalize_text


def hashed_bigrams(df: DataFrame, text_col: str = "text",
                   n_buckets: int = 64,
                   keep: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """Explode ``text_col`` into hashed-bigram feature rows.

    One row per bigram occurrence with a ``bucket`` in
    ``[0, n_buckets)`` derived from the md5 of the bigram text (stable
    across engines and shard layouts — the same fingerprint family the
    dedup stack uses).  Narrow map stage: no shuffle here.
    """
    t = F.split(normalize_text(text_col), " ")
    # Bigram i pairs token i with token i+1 (1-based try_element_at);
    # the slice bound keeps every lookup in range.
    bigrams = F.expr(
        "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
        " (x, i) -> concat(x, ' ', try_element_at(t, i + 2)))"
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("bg")), 1, 8), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )
    return (
        df.select(*keep, t.alias("t"))
        .filter(F.size("t") >= 2)
        .select(*keep, F.explode(bigrams).alias("bg"))
        .select(*keep, bucket.alias("bucket"))
    )


def dsir_weights(df: DataFrame, is_target: Column,
                 text_col: str = "text", n_buckets: int = 64,
                 keep: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """Per-document DSIR importance weights.

    ``is_target`` marks the rows that define the target distribution
    (in production: a trusted high-quality corpus; here any boolean
    Column over ``df``).  Both the target and raw bag-of-bigrams models
    live in ``n_buckets`` hash buckets with add-1 smoothing, so the
    log-ratio table is broadcast-sized by construction.

    Returns one row per SCORED document (``keep`` columns) with:

    * ``n_grams`` — bigram occurrences in the document,
    * ``dsir_weight`` — Σ_grams  ln p̂_target(b) − ln p̂_raw(b),
      rounded to 4 dp (the cross-engine float-compare convention).

    Documents with fewer than 2 tokens carry no bigram evidence and are
    NOT scored (no output row — they can neither be ranked nor
    selected).  Callers aggregating per-source totals over this frame
    count scored docs; gate or union short docs explicitly if they must
    survive selection.

    Plan: feature explode (narrow) → bucket-count agg (n_buckets groups,
    map-side combined) → broadcast log-ratio join → ONE corpus-sized
    groupBy on the document key.  Resampling is then a pure row filter
    or a distributed top-k on ``dsir_weight`` — no extra shuffle.
    """
    feats = hashed_bigrams(
        df.withColumn("__is_target", is_target), text_col, n_buckets,
        keep=tuple(keep) + ("__is_target",),
    )
    stats = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("__is_target"), 1).otherwise(0)).alias("p_c"),
        F.count(F.lit(1)).alias("q_c"),
    )
    tot = stats.agg(
        F.sum("p_c").alias("p_tot"), F.sum("q_c").alias("q_tot"))
    lam = stats.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("p_c") + 1)
                  / (F.col("p_tot") + F.lit(n_buckets)).cast("double"))
            - F.log((F.col("q_c") + 1)
                    / (F.col("q_tot") + F.lit(n_buckets)).cast("double"))
        ).alias("lam"),
    )
    return (
        feats.join(F.broadcast(lam), "bucket")
        .groupBy(*keep)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.sum("lam"), 4).alias("dsir_weight"),
        )
    )


def nb_token_scores(df: DataFrame, is_pos: Column,
                    text_col: str = "text",
                    keep: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """Train-and-score a bag-of-words Naive-Bayes text classifier.

    The distributed reduction of the fastText-style quality filter:
    training a two-class NB model is ONE token-count aggregation
    (per-token positive/negative counts, Laplace +1), and scoring is a
    vocabulary-sized broadcast join back onto the token stream:

        score(d) = ln (D_pos+1)/(D_neg+1)
                 + Σ_tok  ln p̂(tok|pos) − ln p̂(tok|neg)

    Returns one row per document with ``n_tokens`` and ``nb_score``
    (rounded to 4 dp); ``nb_score > 0`` predicts the positive class.
    A NULL label counts as negative (coalesced up front, matching the
    oracle's CASE ELSE branch — a three-valued ``when`` would instead
    drop NULL-label docs from both classes and silently shift every
    llr).  Self-scoring the training corpus (as the registered query
    does) is the standard smoke-eval; production scores a disjoint
    corpus with the same broadcast table.
    """
    is_pos = F.coalesce(is_pos, F.lit(False))
    cols = list(keep) + (["__is_pos"] if "__is_pos" not in keep else [])
    toks = (
        df.withColumn("__is_pos", is_pos)
        .select(*cols,
                F.explode(F.split(normalize_text(text_col), " "))
                .alias("tok"))
    )
    cnt = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("__is_pos"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(~F.col("__is_pos"), 1).otherwise(0)).alias("c_neg"),
    )
    # Totals + vocabulary size + document prior: all scalar aggregates.
    norms = cnt.agg(
        F.sum("c_pos").alias("n_pos"),
        F.sum("c_neg").alias("n_neg"),
        F.count(F.lit(1)).alias("v"),
    )
    prior = (
        df.select(is_pos.alias("p"))
        .agg(
            F.sum(F.when(F.col("p"), 1).otherwise(0)).alias("d_pos"),
            F.sum(F.when(~F.col("p"), 1).otherwise(0)).alias("d_neg"),
        )
        .select(
            F.log((F.col("d_pos") + 1) / (F.col("d_neg") + 1).cast("double"))
            .alias("log_prior"))
    )
    llr = cnt.crossJoin(F.broadcast(norms)).select(
        "tok",
        (
            F.log((F.col("c_pos") + 1)
                  / (F.col("n_pos") + F.col("v")).cast("double"))
            - F.log((F.col("c_neg") + 1)
                    / (F.col("n_neg") + F.col("v")).cast("double"))
        ).alias("llr"),
    )
    return (
        toks.join(F.broadcast(llr), "tok")
        .groupBy(*keep)
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.sum("llr").alias("__sum_llr"))
        .crossJoin(F.broadcast(prior))
        .select(
            *keep,
            "n_tokens",
            F.round(F.col("__sum_llr") + F.col("log_prior"), 4)
            .alias("nb_score"),
        )
    )
