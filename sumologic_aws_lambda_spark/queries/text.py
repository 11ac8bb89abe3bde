"""Text-analysis queries over the ``documents`` table (north-star
LLM-pipeline operators; see ``operators/text.py``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.text import (
    detect_lang,
    fingerprint,
    normalize_text,
    quality_features,
    token_count,
)
from . import query

# DuckDB twin of operators.text.normalize_text (global-flag regexp).
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@query(
    "token_count_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           round(avg(len(string_split_regex(trim(text), '\\s+'))), 4)
               AS avg_tokens,
           round(avg(length(text)), 4) AS avg_chars
    FROM documents
    GROUP BY lang
    """,
)
def token_count_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting, aggregated per language."""
    d = table(spark, sf_dir, "documents", parallel=True)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(token_count("text")), 4).alias("avg_tokens"),
        F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
    )


@query(
    "quality_scores",
    oracle="""
    WITH feat AS (
        SELECT doc_id,
               length(text) AS n_chars,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               round(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g'))
                     / length(text), 4) AS punct_ratio,
               round(length(regexp_replace(text, '[a-zA-Z\\s]', '', 'g'))
                     / length(text), 4) AS nonalpha_ratio
        FROM documents
        WHERE doc_id < 100
    )
    SELECT doc_id, n_tokens,
           round((n_chars - n_tokens + 1) / n_tokens, 4) AS avg_token_len,
           punct_ratio, nonalpha_ratio
    FROM feat
    """,
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (length / punctuation / non-alpha
    ratios) — the building blocks of Gopher-style quality filters."""
    d = table(spark, sf_dir, "documents", parallel=True).filter(F.col("doc_id") < 100)
    return quality_features(d).select(
        "doc_id", "n_tokens", "avg_token_len", "punct_ratio", "nonalpha_ratio"
    )


@query(
    "lang_detect_matrix",
    oracle="""
    WITH scored AS (
        SELECT lang,
               len(regexp_extract_all(text, '\\b(the|a|of|and|to)\\b'))  AS s_en,
               len(regexp_extract_all(text, '\\b(der|die|das|und|ist)\\b')) AS s_de,
               len(regexp_extract_all(text, '\\b(el|la|los|que|y)\\b'))  AS s_es,
               len(regexp_extract_all(text, '\\b(le|la|les|et|est)\\b')) AS s_fr
        FROM documents
    ), pred AS (
        SELECT lang,
               CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                    WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                    WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
                    WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                    ELSE 'fr' END AS predicted
        FROM scored
    )
    SELECT lang, predicted, count(*) AS n
    FROM pred GROUP BY lang, predicted
    """,
)
def lang_detect_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (marker-word argmax) vs the labeled ``lang``
    column — a confusion matrix.  Priority order en>de>es>fr on ties,
    'und' when no marker fires."""
    d = table(spark, sf_dir, "documents", parallel=True)
    return (
        d.select("lang", detect_lang("text").alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "doc_fingerprints",
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT md5({_NORM_SQL})) AS n_unique
    FROM documents
    GROUP BY source
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 fingerprint over normalized text, engine-reproducible —
    the exact-dedup key.  Per-source uniqueness stats."""
    d = table(spark, sf_dir, "documents", parallel=True)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(fingerprint("text")).alias("n_unique"),
    )


@query(
    "curation_pipeline",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id, source, text,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               round(length(regexp_replace(text, '[a-zA-Z\\s]', '', 'g'))
                     / length(text), 4) AS nonalpha_ratio,
               len(regexp_extract_all(text, '\\b(the|a|of|and|to)\\b'))  AS s_en,
               len(regexp_extract_all(text, '\\b(der|die|das|und|ist)\\b')) AS s_de,
               len(regexp_extract_all(text, '\\b(el|la|los|que|y)\\b'))  AS s_es,
               len(regexp_extract_all(text, '\\b(le|la|les|et|est)\\b')) AS s_fr
        FROM documents
    ), curated AS (
        SELECT * FROM feat
        WHERE n_tokens >= 30 AND nonalpha_ratio <= 0.05
          AND greatest(s_en, s_de, s_es, s_fr) > 0
          AND s_en = greatest(s_en, s_de, s_es, s_fr)
    ), deduped AS (
        SELECT min(doc_id) AS doc_id, any_value(source) AS source,
               any_value(n_tokens) AS n_tokens
        FROM curated
        GROUP BY md5({_NORM_SQL})
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS kept_docs,
           round(avg(n_tokens), 4) AS avg_tokens
    FROM deduped GROUP BY source
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation: quality gate (Gopher-style
    token/non-alpha thresholds) → language filter (marker argmax = 'en')
    → exact dedup (md5 fingerprint, keep lowest id) → per-source stats.

    Plan shape at 100 TB: the whole filter chain is ONE narrow codegen
    stage over the scan (all predicates pushed/pipelined), then a single
    shuffle on the fingerprint for dedup and a map-side-combined rollup
    — two exchanges total for the full pipeline.  The dedup winner comes
    from a partial-aggregatable ``min(struct(doc_id, …))`` groupBy, not
    a content-hash window: every copy of a duplicated document shares
    one hash, so a window would serialize the hot document's copies into
    a single task while the groupBy combine absorbs them map-side."""
    d = table(spark, sf_dir, "documents", parallel=True)
    feat = quality_features(d).withColumn(
        "pred_lang", detect_lang("text")
    )
    curated = feat.filter(
        (F.col("n_tokens") >= 30)
        & (F.col("nonalpha_ratio") <= 0.05)
        & (F.col("pred_lang") == "en")
    )
    deduped = (
        curated.groupBy(fingerprint("text").alias("_fp"))
        .agg(F.min(F.struct(F.col("doc_id"),
                            F.col("source"),
                            F.col("n_tokens"))).alias("_w"))
        .select(F.col("_w.source").alias("source"),
                F.col("_w.n_tokens").alias("n_tokens"))
    )
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("kept_docs"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )


@query(
    "top_bigrams_per_source",
    oracle=f"""
    WITH docs AS (
        SELECT source, string_split({_NORM_SQL}, ' ') AS t FROM documents
    ), bg AS (
        SELECT source, array_to_string(list_slice(t, i, i + 1), ' ')
                   AS bigram
        FROM docs,
             LATERAL (SELECT unnest(generate_series(1,
                          greatest(len(t) - 1, 1))) AS i) g
    ), counts AS (
        SELECT source, bigram, count(*) AS _count
        FROM bg GROUP BY 1, 2
    ), ranked AS (
        SELECT source, bigram, _count,
               row_number() OVER (
                   PARTITION BY source ORDER BY _count DESC, bigram
               ) AS rank
        FROM counts
    )
    SELECT source, bigram, _count, rank FROM ranked WHERE rank <= 5
    """,
)
def top_bigrams_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram frequency table: top-5 word bigrams per source —
    the language-model-ish profiling pass a curation pipeline runs to
    spot boilerplate/templated content.  Gram generation is a pure
    expression fold (split → sequence → transform → explode); one
    map-side-combinable count shuffle plus a per-source window over the
    (tiny) distinct-bigram frame."""
    from pyspark.sql import Window

    from ..operators.text import with_word_ngrams

    d = table(spark, sf_dir, "documents", parallel=True)
    counts = (
        with_word_ngrams(d, "text", 2, keep=("source",))
        .select("source", F.explode("grams").alias("bigram"))
        .groupBy("source", "bigram")
        .agg(F.count(F.lit(1)).alias("_count"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("_count").desc(), F.col("bigram")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


@query(
    "pii_redaction",
    oracle=f"""
    WITH seeded AS (
        SELECT doc_id,
               text || ' contact user' || doc_id ||
               '@example.com from 10.0.' || (doc_id % 256) || '.7 token ' ||
               md5('secret-' || doc_id) AS text
        FROM documents WHERE doc_id % 20 = 0
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))
               AS INT) AS n_email,
           CAST(len(regexp_extract_all(text,
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b'))
               AS INT) AS n_ipv4,
           CAST(len(regexp_extract_all(text, '\\b[0-9a-f]{{32,}}\\b'))
               AS INT) AS n_hex_secret,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
               '<EMAIL>', 'g'),
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b',
               '<IPV4>', 'g'),
               '\\b[0-9a-f]{{32,}}\\b', '<HEX_SECRET>', 'g'))
               AS redacted_md5
    FROM seeded
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation scrub: emails / IPv4s / long hex secrets replaced with
    typed placeholders, per-category counts kept (see
    ``operators.text.redact_pii``).  Synthetic PII is seeded
    deterministically onto real document text so both engines redact the
    same content; the redacted text is compared via md5 to keep driver
    payloads small.  Pure narrow expressions — the scrub adds zero
    shuffles to whatever scan it rides."""
    from ..operators.text import redact_pii

    d = table(spark, sf_dir, "documents", parallel=True).filter(
        F.col("doc_id") % 20 == 0
    )
    seeded = d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"), F.col("doc_id"),
            F.lit("@example.com from 10.0."), F.col("doc_id") % 256,
            F.lit(".7 token "), F.md5(F.concat(F.lit("secret-"), F.col("doc_id"))),
        ).alias("text"),
    )
    out = redact_pii(seeded)
    return out.select(
        "doc_id",
        F.col("n_email").cast("int"),
        F.col("n_ipv4").cast("int"),
        F.col("n_hex_secret").cast("int"),
        F.md5("redacted").alias("redacted_md5"),
    )


@query(
    "repetition_ratios",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
        FROM documents WHERE doc_id % 10 = 0
    ),
    grams AS (
        SELECT doc_id,
               array_to_string(list_slice(t, i, i + 2), ' ') AS gram
        FROM docs,
             LATERAL (SELECT unnest(generate_series(1, greatest(len(t) - 2, 1)))
                      AS i) g
    )
    SELECT doc_id,
           round(1.0 - count(DISTINCT gram) / count(*), 4) AS rep_ratio
    FROM grams GROUP BY doc_id
    """,
)
def repetition_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (1 − distinct/total word trigrams) —
    the boilerplate/spam cut that complements ``quality_scores``.
    Narrow array math per row, no shuffle
    (``operators.text.repetition_ratio``)."""
    from ..operators.text import with_word_ngrams

    d = table(spark, sf_dir, "documents", parallel=True).filter(
        F.col("doc_id") % 10 == 0
    )
    # Staged gram array: the ratio references it twice (distinct + total),
    # and the unstaged Column form would evaluate the whole gram transform
    # twice per row.
    g = with_word_ngrams(d, "text", 3, keep=("doc_id",))
    return g.select(
        "doc_id",
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct("grams")) / F.size("grams"), 4
        ).alias("rep_ratio"),
    )


@query(
    "sequence_packing",
    oracle="""
    WITH toks AS (
        SELECT source, doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT source, doc_id, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
        FROM toks
    )
    SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(start_tok // 512 AS BIGINT) AS pack_id,
           CAST(start_tok % 512 AS BIGINT) AS pack_offset,
           (start_tok % 512) + n_tokens > 512 AS spills_over
    FROM cum
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous-fill sequence packing at budget 512: lay documents
    end-to-end per source in doc_id order, cut into fixed-size training
    sequences; each doc reports its pack, offset, and whether it
    straddles the boundary (``operators.text.pack_sequences``).  One
    window shuffle keyed by source — packing parallelizes across corpus
    partitions at 100 TB."""
    from ..operators.text import pack_sequences

    d = table(spark, sf_dir, "documents", parallel=True)
    return pack_sequences(d, budget=512, part_col="source")


# ---------------------------------------------------------------------------
# Benchmark decontamination: n-gram overlap with a held-out eval set
# ---------------------------------------------------------------------------


@query(
    "ngram_decontamination",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents
    ),
    g AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(t, i, i + 3), ' ') AS gram
        FROM docs,
             LATERAL (SELECT unnest(generate_series(1, greatest(len(t) - 3, 1)))
                      AS i) s
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0)
    SELECT g.doc_id, count(*) AS n_hit_grams
    FROM g JOIN bench USING (gram)
    WHERE g.doc_id % 17 != 0
    GROUP BY g.doc_id
    """,
)
def ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs sharing any word 4-gram with the
    held-out "benchmark" slice (doc_id % 17 = 0 stands in for an eval
    suite) are flagged with their distinct-overlap count — the standard
    pre-training hygiene pass.  The benchmark gram set is broadcast; the
    corpus is never shuffled (see ``operators.text.benchmark_ngram_hits``)."""
    from ..operators.text import benchmark_ngram_hits

    d = table(spark, sf_dir, "documents", parallel=True)
    return benchmark_ngram_hits(
        d.filter(F.col("doc_id") % 17 != 0),
        d.filter(F.col("doc_id") % 17 == 0),
        n=4,
    )


# ---------------------------------------------------------------------------
# Character-distribution entropy: degenerate-document quality cut
# ---------------------------------------------------------------------------

_ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz "


def _entropy_oracle() -> str:
    """DuckDB twin of operators.text.char_entropy: same counts, same
    left-associated summation order, so the IEEE double result matches
    Spark's to the rounding precision."""
    counts = ", ".join(
        f"length(s) - length(replace(s, '{c}', '')) AS c{i}"
        for i, c in enumerate(_ENTROPY_ALPHABET)
    )
    idx = range(len(_ENTROPY_ALPHABET))
    total = " + ".join(f"c{i}" for i in idx)
    terms = " + ".join(
        f"CASE WHEN c{i} > 0 THEN -(c{i} / tot) * ln(c{i} / tot) "
        "ELSE 0.0 END"
        for i in idx
    )
    return f"""
    WITH n AS (SELECT doc_id, {_NORM_SQL} AS s FROM documents),
    c AS (SELECT doc_id, {counts} FROM n),
    t AS (SELECT *, {total} AS tot FROM c)
    SELECT doc_id,
           CASE WHEN tot > 0 THEN round(0.0 + {terms}, 4)
                ELSE 0.0 END AS entropy_nats
    FROM t
    """


@query("char_entropy_scores", oracle=_entropy_oracle())
def char_entropy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document (nats) — the
    degenerate-document cut (char floods, padding) alongside
    ``repetition_ratios``.  Pure narrow expression; the oracle replays
    the identical fixed-order float sum
    (``operators.text.add_char_entropy``)."""
    from ..operators.text import add_char_entropy

    d = table(spark, sf_dir, "documents", parallel=True)
    return add_char_entropy(d).select("doc_id", "entropy_nats")


# ---------------------------------------------------------------------------
# TF-IDF: distinctive terms per document
# ---------------------------------------------------------------------------


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM toks GROUP BY doc_id, term
    ),
    dfreq AS (
        SELECT term, count(DISTINCT doc_id) AS dfreq
        FROM toks GROUP BY term
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               tf.tf * ln((SELECT n_docs FROM n) / dfreq.dfreq) AS score
        FROM tf JOIN dfreq USING (term)
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term
        ) AS rn
        FROM scored
    )
    SELECT doc_id, term, tf, round(score, 6) AS tfidf,
           CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= 5
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most distinctive terms per document by tf·idf — the
    classic signature/keyword extraction over a corpus.

    Scale shape: term frequencies are the one corpus-sized shuffle
    (map-side combined); document frequencies aggregate to a
    vocabulary-sized frame that **broadcasts** back; the per-doc top-k
    runs under WindowGroupLimit so only each partition's leaders reach
    the rank shuffle.  idf = ln(N/df) with N and df exact integers, so
    both engines divide the same longs.
    """
    from pyspark.sql import Window

    from ..operators.text import normalize_text

    d = table(spark, sf_dir, "documents", parallel=True)
    toks = d.select(
        "doc_id", F.explode(F.split(normalize_text("text"), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df(term) = row count over the tf frame (one row per distinct
    # (doc, term)): a plain count with map-side combine, vs the previous
    # count_distinct(doc_id) over raw toks which kept a per-term hash set
    # through the shuffle — ~20% on the sf0.1 bench and O(1) agg state.
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * F.log(F.col("n_docs") / F.col("dfreq")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "doc_id", "term", "tf",
            F.round("score", 6).alias("tfidf"), "rank",
        )
    )


@query(
    "gopher_quality_filters",
    oracle="""
    WITH feat AS (
        SELECT source,
               string_split_regex(trim(text), '\\s+') AS w,
               string_split(text, chr(10)) AS lines,
               length(regexp_replace(text, '\\s', '', 'g')) AS nonws_chars,
               length(text) - length(replace(text, '#', '')) AS n_hash,
               (length(text) - length(replace(text, '...', ''))) / 3
               + (length(text) - length(replace(text, '…', '')))
                   AS n_ellipsis
        FROM documents
    ),
    flags AS (
        SELECT source,
               (len(w) < 50 OR len(w) > 100000) AS f_wc,
               (nonws_chars / len(w) < 3.0
                OR nonws_chars / len(w) > 10.0) AS f_mwl,
               ((n_hash + n_ellipsis) / len(w) > 0.1) AS f_sym,
               (len(list_filter(lines,
                    x -> regexp_matches(trim(x), '^[-*•]'))) / len(lines)
                > 0.9) AS f_bullet,
               (len(list_filter(lines,
                    x -> ends_with(rtrim(x), '...')
                         OR ends_with(rtrim(x), '…'))) / len(lines)
                > 0.3) AS f_ellipsis,
               (len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
                / len(w) < 0.8) AS f_alpha,
               (len(list_intersect(list_transform(w, x -> lower(x)),
                    ['the','be','to','of','and','that','have','with'])) < 2)
                   AS f_stop
        FROM feat
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE f_wc) AS BIGINT) AS n_fail_word_count,
           CAST(count(*) FILTER (WHERE f_mwl) AS BIGINT)
               AS n_fail_mean_word_len,
           CAST(count(*) FILTER (WHERE f_sym) AS BIGINT)
               AS n_fail_symbol_ratio,
           CAST(count(*) FILTER (WHERE f_bullet) AS BIGINT)
               AS n_fail_bullet_lines,
           CAST(count(*) FILTER (WHERE f_ellipsis) AS BIGINT)
               AS n_fail_ellipsis_lines,
           CAST(count(*) FILTER (WHERE f_alpha) AS BIGINT)
               AS n_fail_alpha_words,
           CAST(count(*) FILTER (WHERE f_stop) AS BIGINT) AS n_fail_stopwords,
           CAST(count(*) FILTER (WHERE NOT (f_wc OR f_mwl OR f_sym
                OR f_bullet OR f_ellipsis OR f_alpha OR f_stop)) AS BIGINT)
               AS n_pass_all
    FROM flags GROUP BY source
    """,
)
def gopher_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality battery (Rae et al. 2021 Table A1 thresholds)
    rolled up per source: how many documents each rule rejects and how
    many survive all seven.  The flags are one narrow projection fused
    into the scan (``operators.text.gopher_rule_flags``); the rollup is a
    map-side-combined aggregation — two stages total at any scale."""
    from ..operators.text import gopher_rule_flags

    d = table(spark, sf_dir, "documents", parallel=True)
    flagged = gopher_rule_flags(d)
    cnt = lambda c: F.count_if(F.col(c)).cast("bigint")  # noqa: E731
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        cnt("fail_word_count").alias("n_fail_word_count"),
        cnt("fail_mean_word_len").alias("n_fail_mean_word_len"),
        cnt("fail_symbol_ratio").alias("n_fail_symbol_ratio"),
        cnt("fail_bullet_lines").alias("n_fail_bullet_lines"),
        cnt("fail_ellipsis_lines").alias("n_fail_ellipsis_lines"),
        cnt("fail_alpha_words").alias("n_fail_alpha_words"),
        cnt("fail_stopwords").alias("n_fail_stopwords"),
        F.count_if(F.col("pass_all")).cast("bigint").alias("n_pass_all"),
    )


@query(
    "bpe_merge_candidates",
    oracle=f"""
    WITH words AS (
        SELECT unnest(string_split({_NORM_SQL}, ' ')) AS w
        FROM documents WHERE doc_id % 20 = 0
    ),
    pairs AS (
        SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b
        FROM words,
             LATERAL (SELECT unnest(generate_series(1, length(w) - 1))
                      AS i) s
        WHERE length(w) >= 2
    )
    SELECT a, b, count(*) AS pair_count FROM pairs
    GROUP BY a, b
    ORDER BY pair_count DESC, a, b
    LIMIT 30
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training round: adjacent-symbol pair frequencies over the
    corpus vocabulary — the statistic each merge step of byte-pair
    encoding maximizes.  Plan: explode words (narrow), per-word pair
    fan-out via a sequence transform (no UDF, no per-character shuffle),
    ONE map-side-combined groupBy on the pair, then a top-30
    TakeOrderedAndProject.  Each further merge round is the same plan
    over re-tokenized text — the driver loop is O(vocab), the cluster
    work stays one aggregation per round."""
    d = table(spark, sf_dir, "documents", parallel=True).filter(
        F.col("doc_id") % 20 == 0
    )
    from ..operators.text import normalize_text

    words = d.select(
        F.explode(F.split(normalize_text("text"), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    # Adjacent pairs as zip_with over two shifted character arrays —
    # narrow, pure built-ins, no per-character shuffle.
    chars = F.split(F.col("w"), "")
    pairs = words.select(
        F.explode(
            F.zip_with(
                F.slice(chars, 1, F.length("w") - 1),
                F.slice(chars, 2, F.length("w") - 1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p")
    )
    return (
        pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "a", "b")
        .limit(30)
    )


@query(
    "zipf_spectrum",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok
        FROM documents
    ),
    cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    ranked AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r FROM cnt
    ),
    pts AS (SELECT ln(r) AS x, ln(c) AS y FROM ranked),
    s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * y) AS sxy, sum(x * x) AS sxx
          FROM pts),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS total_tokens FROM cnt)
    SELECT tot.total_tokens,
           CAST(s.n AS BIGINT) AS vocab_size,
           round((s.n * s.sxy - s.sx * s.sy)
                 / (s.n * s.sxx - s.sx * s.sx), 4) AS zipf_slope,
           round((s.sy - (s.n * s.sxy - s.sx * s.sy)
                         / (s.n * s.sxx - s.sx * s.sx) * s.sx) / s.n, 4)
               AS zipf_intercept
    FROM s CROSS JOIN tot
    """,
)
def zipf_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf spectrum of the corpus token distribution: least-squares
    slope/intercept of ln(count) against ln(rank) — the standard
    token-frequency health diagnostic (natural text sits near slope −1;
    synthetic/templated corpora flatten, boilerplate-heavy ones
    steepen).  Closed-form regression over the ranked vocabulary, so
    both engines compute identical arithmetic; requires ≥2 distinct
    tokens.

    Scale: corpus work is ONE token-count groupBy (map-side combined);
    ranking and the 5-term regression sums run on the VOCABULARY-sized
    frame (the unpartitioned rank window never sees corpus rows)."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents", parallel=True)
    toks = d.select(
        F.explode(F.split(normalize_text("text"), " ")).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    from ..planmarks import bounded_global_window

    w = bounded_global_window(
        F.col("c").desc(), "tok",
        bound="vocabulary frame — one row per distinct token, capped "
              "by the corpus vocabulary, not its row count")
    pts = cnt.select("c", F.row_number().over(w).alias("r")).select(
        F.log("r").alias("x"), F.log("c").alias("y"))
    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    tot = cnt.agg(F.sum("c").cast("bigint").alias("total_tokens"))
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return s.crossJoin(F.broadcast(tot)).select(
        "total_tokens",
        F.col("n").cast("bigint").alias("vocab_size"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4)
        .alias("zipf_intercept"),
    )


@query(
    "bm25_retrieval",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
        FROM documents
    ),
    clean AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    dl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS dlen
        FROM clean GROUP BY doc_id
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(dlen), 4) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        FROM clean WHERE tok IN ('dup', 'spark', 'vector')
        GROUP BY doc_id, tok
    ),
    df AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
    ),
    scored AS (
        SELECT t.doc_id,
               sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * (t.tf * 2.2)
                   / (t.tf + 1.2 * (0.25 + 0.75 * l.dlen / s.avgdl)))
                   AS score,
               CAST(count(*) AS BIGINT) AS matched
        FROM tf t
        JOIN df d USING (tok)
        JOIN dl l USING (doc_id)
        CROSS JOIN stats s
        GROUP BY t.doc_id
    ),
    ranked AS (
        SELECT doc_id, round(score, 4) AS bm25, matched,
               row_number() OVER (
                   ORDER BY round(score, 4) DESC, doc_id) AS rn
        FROM scored
    )
    SELECT doc_id, bm25, matched, rn AS rank
    FROM ranked WHERE rn <= 10
    """,
)
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval for a fixed query over ``documents``
    (Robertson-Sparck Jones weighting, k1=1.2, b=0.75, the
    Lucene-style non-negative ``ln(1 + ...)`` idf).

    The retrieval primitive for RAG-style corpus search: term stats
    (df, N, avgdl) are query-term- and scalar-sized, broadcast onto a
    per-doc tf frame that was filtered to query terms BEFORE its
    groupBy — the corpus is tokenized in one narrow pass and only
    matching postings ever shuffle.  At 100 TB the tf frame is the
    inverted-index slice for the query, exactly what a posting-list
    scan would produce.  Scores sum <= |query| float terms per doc and
    compare at 4 dp with doc_id tiebreak (rules 2/12).
    """
    terms = ("dup", "spark", "vector")
    d = table(spark, sf_dir, "documents", parallel=True)
    # tf and dlen are ROW properties: count them inside the token
    # array instead of exploding the corpus into per-token rows and
    # re-grouping.  The whole query then needs exactly ONE corpus
    # aggregate (n_docs / avgdl / per-term df in a single pass) and
    # the TakeOrdered head — the dl groupBy, the (doc, tok) tf groupBy
    # and the scored groupBy exchanges all disappear (r14, guide
    # §2.4; posting semantics unchanged: a doc with no tokens is
    # excluded from n_docs/avgdl exactly as the old explode dropped
    # it, and per-term w/df/tf values are byte-identical).
    toks = d.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                 lambda t: t != "").alias("_toks"),
    )
    def _is_term(trm: str):
        # factory, NOT a default-arg lambda: a 2-arg lambda would
        # receive the element index as its second positional arg
        return lambda t: t == trm

    base = toks.select(
        "doc_id",
        F.size("_toks").alias("dlen"),
        *[F.size(F.filter("_toks", _is_term(trm))).alias(f"tf_{i}")
          for i, trm in enumerate(terms)],
    )
    stats = base.agg(
        F.count_if(F.col("dlen") > 0).alias("n_docs"),
        F.round(F.avg(F.when(F.col("dlen") > 0, F.col("dlen"))), 4)
        .alias("avgdl"),
        *[F.count_if(F.col(f"tf_{i}") > 0).alias(f"df_{i}")
          for i in range(len(terms))],
    )
    def w(i: int):
        tf, dfc = F.col(f"tf_{i}"), F.col(f"df_{i}")
        return (
            F.log(1.0 + (F.col("n_docs") - dfc + 0.5) / (dfc + 0.5))
            * (tf * 2.2)
            / (tf + 1.2 * (0.25 + 0.75 * F.col("dlen")
                           / F.col("avgdl")))
        )
    matched = sum(
        F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)
        for i in range(len(terms)))
    score = sum(
        (F.when(F.col(f"tf_{i}") > 0, w(i)).otherwise(F.lit(0.0))
         for i in range(len(terms))), F.lit(0.0))
    scored = (
        base.crossJoin(F.broadcast(stats))
        .filter(matched > 0)
        .select("doc_id", score.alias("score"),
                matched.cast("bigint").alias("matched"))
    )
    from pyspark.sql import Window

    # Top-10 via orderBy+limit (lowers to TakeOrdered — distributed
    # partial top-k, no global sort); the rank window then runs over
    # the ≤10-row head only, never the full scored frame.
    head = scored.select(
        "doc_id", F.round("score", 4).alias("bm25"), "matched"
    ).orderBy(F.col("bm25").desc(), "doc_id").limit(10)
    rk = Window.orderBy(F.col("bm25").desc(), "doc_id")
    return head.select(
        "doc_id", "bm25", "matched",
        F.row_number().over(rk).alias("rank"))


@query(
    "pmi_collocations",
    oracle=f"""
    WITH docs AS (
        SELECT string_split({_NORM_SQL}, ' ') AS t FROM documents
    ),
    uni AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(t) AS w FROM docs) GROUP BY w
    ),
    nt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
    bg AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM docs,
             LATERAL (SELECT unnest(generate_series(1, len(t) - 1))
                      AS i) g
        WHERE len(t) >= 2
    ),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bg),
    bgc AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
        FROM bg GROUP BY 1, 2 HAVING count(*) >= 20
    )
    SELECT bgc.w1, bgc.w2, bgc.n_pair,
           round(ln((CAST(bgc.n_pair AS DOUBLE) / nb.b)
                    / ((CAST(u1.c AS DOUBLE) / nt.n)
                       * (CAST(u2.c AS DOUBLE) / nt.n))), 4) + 0.0
               AS pmi
    FROM bgc
    JOIN uni u1 ON u1.w = bgc.w1
    JOIN uni u2 ON u2.w = bgc.w2
    CROSS JOIN nt CROSS JOIN nb
    """,
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations: which adjacent word
    pairs co-occur MORE than their unigram frequencies predict —
    ``ln(p(xy) / (p(x) p(y)))`` over bigrams with support ≥ 20 (Church
    & Hanks 1990, public).  `top_bigrams_per_source` ranks raw counts;
    PMI is the association-strength view a phrase-mining / tokenizer-
    merge pipeline wants.

    Two partial-aggregatable count shuffles (unigrams, bigrams) over
    ONE tokenization pass each; totals are broadcast scalars and the
    PMI join runs on the vocabulary²-bounded bigram frame, never the
    corpus.  The PMI expression is single divisions of exact counts
    composed in the identical op order both engines, then ``ln`` +
    round(4) (rules 2/12).
    """
    d = table(spark, sf_dir, "documents", parallel=True)
    docs = d.select(F.split(normalize_text("text"), " ").alias("t"))
    uni = (
        docs.select(F.explode("t").alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    nt = uni.agg(F.sum("c").alias("n"))
    pairs = (
        docs.filter(F.size("t") >= 2)
        .select(F.expr(
            "explode(transform(sequence(1, size(t) - 1), "
            "i -> struct(t[i - 1] AS w1, t[i] AS w2)))").alias("p"))
        .select("p.w1", "p.w2")
    )
    nb = pairs.agg(F.count(F.lit(1)).alias("b"))
    bgc = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= 20)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        bgc.join(u1, "w1").join(u2, "w2")
        .crossJoin(F.broadcast(nt)).crossJoin(F.broadcast(nb))
        .select(
            "w1", "w2", "n_pair",
            # + 0.0 normalizes IEEE -0.0 (an exactly-independent pair
            # rounds to -0.0 in DuckDB, 0.0 in Spark)
            (F.round(F.log(
                (F.col("n_pair").cast("double") / F.col("b"))
                / ((F.col("c1").cast("double") / F.col("n"))
                   * (F.col("c2").cast("double") / F.col("n")))), 4)
             + 0.0).alias("pmi"),
        )
    )
