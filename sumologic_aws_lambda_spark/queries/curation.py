"""Round-6 data-curation wave: repeated-span dedup, vocabulary/OOV
coverage, unigram-LM quality scoring, and SemDeDup cluster pruning —
the remaining standard operators of a pre-training data pipeline
(Lee et al. 2022 ExactSubstr; CCNet LM filtering, Wenzek et al. 2020;
SemDeDup, Abbas et al. 2023)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import urls as _urlsmod
from ..operators import html as _htmlmod
from ..operators.text import normalize_text
from . import query

def _render_html_regexes(sql: str) -> str:
    """Substitute the SHARED element-strip / block-close regex constants
    from operators/html.py into an oracle template by NAME — one
    mapping, so reordering ELEMENT_STRIP_RES can never silently bind a
    placeholder to the wrong pattern (round-9 fifth-pass review)."""
    mapping = {
        "{strip_script}": _htmlmod.ELEMENT_STRIP_RES[0],
        "{strip_style}": _htmlmod.ELEMENT_STRIP_RES[1],
        "{strip_noscript}": _htmlmod.ELEMENT_STRIP_RES[2],
        "{strip_comment}": _htmlmod.ELEMENT_STRIP_RES[3],
        "{block_close}": _htmlmod.BLOCK_CLOSE_RE,
    }
    assert "script" in mapping["{strip_script}"]
    assert "style" in mapping["{strip_style}"]
    assert "noscript" in mapping["{strip_noscript}"]
    assert "<!--" in mapping["{strip_comment}"]
    for k, v in mapping.items():
        sql = sql.replace(k, v)
    return sql


# DuckDB twin of operators.text.normalize_text.
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_SPAN_K = 8


@query(
    "substring_dup_spans",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id,
               md5(array_to_string(
                   list_slice(t, i, i + {_SPAN_K} - 1), ' ')) AS span_hash
        FROM docs,
             LATERAL (SELECT unnest(generate_series(1, len(t) - {_SPAN_K} + 1))
                      AS i) g
        WHERE len(t) >= {_SPAN_K}
    ),
    per_span AS (
        SELECT span_hash,
               count(DISTINCT doc_id) AS n_docs,
               count(*) AS n_occ
        FROM grams GROUP BY span_hash
    )
    SELECT n_docs,
           count(*) AS n_spans,
           CAST(sum(n_occ) AS BIGINT) AS total_occurrences
    FROM per_span WHERE n_docs >= 2
    GROUP BY n_docs
    """,
)
def substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated k-token spans (the ExactSubstr
    approximation — see ``operators/dedup.py::duplicate_span_stats``),
    histogrammed by how many documents share each span.  The oracle
    replays the identical window + hash pipeline, so the span
    *generation* is hard-signal-checked, not just the counting."""
    from ..operators.dedup import duplicate_span_stats

    d = table(spark, sf_dir, "documents", parallel=True)
    spans = duplicate_span_stats(d, k=_SPAN_K)
    return spans.groupBy("n_docs").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("n_occ").alias("total_occurrences"),
    )


_VOCAB_N = 16


@query(
    "vocab_oov_rates",
    oracle=f"""
    WITH toks AS (
        SELECT source, unnest(string_split({_NORM}, ' ')) AS tok
        FROM documents
    ),
    cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    vocab AS (SELECT tok FROM cnt ORDER BY c DESC, tok LIMIT {_VOCAB_N})
    SELECT t.source,
           count(*) AS total_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS oov_tokens,
           round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 4) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY t.source
    """,
)
def vocab_oov_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the top-N token vocabulary
    from the corpus itself (count desc, token asc — a deterministic
    total order), then measure each source's out-of-vocabulary token
    rate.  The standard pre-tokenizer sanity check before committing a
    vocab size.  (N=16 against the fixture corpus's 31-token pool so
    the rate is non-degenerate; production N is 10⁴–10⁵ — same plan.)

    Plan shape: token counts are one partial-agg groupBy; the top-N cut
    is ``orderBy().limit()`` — Spark's TakeOrdered (distributed per-
    partition top-N + driver merge of N·partitions rows), never a
    global sort; membership is a BROADCAST left join of the N-row vocab
    against the exploded stream (integers only — exact on any engine).
    """
    d = table(spark, sf_dir, "documents", parallel=True)
    toks = d.select(
        "source", F.explode(F.split(normalize_text("text"), " ")).alias("tok")
    )
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        cnt.orderBy(F.desc("c"), "tok").limit(_VOCAB_N)
        .select("tok").withColumn("_in_vocab", F.lit(1))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_tokens"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
            .alias("oov_tokens"),
            F.round(
                F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
                / F.count(F.lit(1)), 4
            ).alias("oov_rate"),
        )
    )


@query(
    "unigram_lm_scores",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
    ),
    ex AS (SELECT doc_id, unnest(t) AS tok FROM docs),
    cnt AS (SELECT tok, count(*) AS c FROM ex GROUP BY tok),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM cnt)
    SELECT doc_id,
           count(*) AS n_tokens,
           round(log2(total) - sum(log2(c)) / count(*), 4)
               AS bits_per_token
    FROM ex JOIN cnt USING (tok) CROSS JOIN tot
    WHERE doc_id < 200
    GROUP BY doc_id, total
    """,
)
def unigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020), with the
    corpus's own unigram distribution as the LM: per-document
    cross-entropy in bits/token, −(1/n)·Σ log₂ p(tok) where
    p(tok) = count(tok)/total.  High bits/token = improbable text
    (noise, gibberish); CCNet buckets documents into quality tiers on
    exactly this score (there with an external KenLM — the plumbing is
    identical, the LM table is just bigger).

    Plan shape: the unigram table is vocabulary-sized → BROADCAST join
    against the exploded token stream; the corpus-total is a 1-row
    crossJoin.  Scoring is one partial-agg groupBy(doc_id).  At 100 TB
    swap the corpus vocab for a trained LM table — same broadcast join.
    Scored output is restricted to doc_id < 200 (like
    ``quality_scores``) to keep the compare surface per-doc exact."""
    d = table(spark, sf_dir, "documents", parallel=True)
    ex = d.select("doc_id",
                  F.explode(F.split(normalize_text("text"), " ")).alias("tok"))
    cnt = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").cast("double").alias("total"))
    return (
        ex.filter(F.col("doc_id") < 200)
        .join(F.broadcast(cnt), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "total")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.log2(F.col("total"))
                - F.sum(F.log2("c")) / F.count(F.lit(1)), 4
            ).alias("bits_per_token"),
        )
        .select("doc_id", "n_tokens", "bits_per_token")
    )


_SEM_K = 32         # coarse clusters (pair space ~ n²/k: k scales
                    # with the corpus so cluster sizes stay bounded)
_SEM_TAU = 0.2      # within-cluster duplicate threshold (fixture
                    # embeddings are random; production uses ~0.95+)
_SEM_COS = (
    "list_dot_product(v.e, c.ce) /"
    " (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c.ce, c.ce)))"
)


@query(
    "semdedup_prune",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), cent AS (
        SELECT vec_id AS cid, e AS ce FROM vecs WHERE vec_id < {_SEM_K}
    ), assign AS (
        SELECT vec_id, cluster_id FROM (
            SELECT v.vec_id, c.cid AS cluster_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {_SEM_COS} DESC, c.cid
                   ) AS rn
            FROM vecs v CROSS JOIN cent c
        ) WHERE rn = 1
    ), pruned AS (
        SELECT DISTINCT b.vec_id
        FROM assign a JOIN assign b USING (cluster_id)
        JOIN vecs x ON x.vec_id = a.vec_id
        JOIN vecs y ON y.vec_id = b.vec_id
        WHERE a.vec_id < b.vec_id
          AND round(list_dot_product(x.e, y.e) /
                    (sqrt(list_dot_product(x.e, x.e)) *
                     sqrt(list_dot_product(y.e, y.e))), 6) >= {_SEM_TAU}
    )
    SELECT a.cluster_id,
           count(*) AS n_members,
           CAST(sum(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pruned,
           CAST(count(*) - sum(CASE WHEN p.vec_id IS NOT NULL
                                    THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM assign a LEFT JOIN pruned p ON a.vec_id = p.vec_id
    GROUP BY a.cluster_id
    """,
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup pruning statistics per coarse cluster (see
    ``operators/similarity.py::semdedup_labels`` for algorithm and
    100 TB notes).  The oracle replays assignment → within-cluster
    pairing → prune rule end-to-end, so the whole pipeline — not just
    the final counts — is hard-signal-verified."""
    from ..operators.similarity import semdedup_labels

    emb = table(spark, sf_dir, "embeddings")
    labels = semdedup_labels(emb, n_centroids=_SEM_K, threshold=_SEM_TAU)
    return labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("n_pruned"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
    )


_MIX_ALPHA = 0.5    # temperature exponent (α→0 uniform, α=1 natural)


@query(
    "temperature_mixture_weights",
    oracle=f"""
    WITH tot AS (
        SELECT source,
               CAST(sum(len(string_split_regex(trim(text), '\\s+')))
                    AS BIGINT) AS src_tokens
        FROM documents GROUP BY source
    ),
    g AS (SELECT CAST(sum(src_tokens) AS DOUBLE) AS total FROM tot),
    powed AS (
        SELECT source, src_tokens,
               pow(src_tokens / total, {_MIX_ALPHA}) AS p_a
        FROM tot CROSS JOIN g
    ),
    z AS (SELECT sum(p_a) AS norm FROM powed)
    SELECT source, src_tokens,
           round(p_a / norm, 6) AS weight,
           round((p_a / norm) / (src_tokens / total), 4) AS epochs
    FROM powed CROSS JOIN z CROSS JOIN g
    """,
)
def temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing (the multilingual/LLaMA rule:
    sample domain d with weight ∝ p_d^α, α < 1 upweights small
    domains): per-source sampling weight and the implied number of
    epochs (weight / natural share — >1 means the domain is repeated).
    Complements ``domain_mixture_sample`` (the equal-token α→0 special
    case, which actually materializes the sample).

    Plan shape: everything after the one per-source token aggregation
    operates on a sources-sized frame (two scalar aggs, broadcast
    crossJoins) — the corpus is scanned once regardless of α."""
    from ..operators.text import token_count

    d = table(spark, sf_dir, "documents", parallel=True)
    totals = d.groupBy("source").agg(
        F.sum(token_count("text")).alias("src_tokens"))
    g = totals.agg(F.sum("src_tokens").cast("double").alias("total"))
    powed = totals.crossJoin(F.broadcast(g)).select(
        "source", "src_tokens", "total",
        F.pow(F.col("src_tokens") / F.col("total"), _MIX_ALPHA).alias("p_a"),
    )
    z = powed.agg(F.sum("p_a").alias("norm"))
    return powed.crossJoin(F.broadcast(z)).select(
        "source", "src_tokens",
        F.round(F.col("p_a") / F.col("norm"), 6).alias("weight"),
        F.round((F.col("p_a") / F.col("norm"))
                / (F.col("src_tokens") / F.col("total")), 4).alias("epochs"),
    )


# Deterministic synthetic snapshots carved from one fixture table: the
# OLD snapshot lacks doc_id % 7 == 0, the NEW snapshot lacks
# doc_id % 13 == 0 and rewrites the text of doc_id % 11 == 0 — so the
# diff has all four classes and both engines derive it identically.
_MANIFEST_CASES = """
        CASE
            WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.fp <> n.fp THEN 'changed'
            ELSE 'unchanged'
        END
"""


@query(
    "dataset_manifest_diff",
    oracle=f"""
    WITH old AS (
        SELECT doc_id, source,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS fp
        FROM documents WHERE doc_id % 7 <> 0
    ),
    new AS (
        SELECT doc_id, source,
               md5(trim(regexp_replace(lower(
                   CASE WHEN doc_id % 11 = 0 THEN text || ' v2'
                        ELSE text END), '\\s+', ' ', 'g'))) AS fp
        FROM documents WHERE doc_id % 13 <> 0
    )
    SELECT {_MANIFEST_CASES} AS change,
           count(*) AS n_docs
    FROM old o FULL OUTER JOIN new n USING (doc_id)
    GROUP BY 1
    """,
)
def dataset_manifest_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental snapshot diff — the bookkeeping step between two
    dataset versions: classify every document as added / removed /
    changed / unchanged by comparing content FINGERPRINTS (md5 of
    normalized text), not raw bytes, so a re-shard or re-encode that
    preserves content diffs as unchanged.

    Plan shape: each snapshot contributes (doc_id, fingerprint) — 24
    bytes a row — to ONE full-outer equi-join on the uniform doc id;
    the texts themselves never shuffle.  At 100 TB both manifests are
    naturally persisted (the shard exporter writes them), so the diff
    reads manifests, not corpora."""
    from ..operators.text import fingerprint

    d = table(spark, sf_dir, "documents", parallel=True)
    # Presence markers, not fingerprint nullity: fingerprint(NULL text)
    # is NULL, so classifying added/removed by `fp IS NULL` would call a
    # NULL-text document present in BOTH snapshots "added" — the oracle
    # keys on row presence (doc_id IS NULL after the full outer join)
    # and the Spark side must too.
    old = d.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", fingerprint("text").alias("ofp"),
        F.lit(1).alias("_in_old"))
    new = d.filter(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        fingerprint(
            F.when(F.col("doc_id") % 11 == 0,
                   F.concat(F.col("text"), F.lit(" v2")))
            .otherwise(F.col("text"))
        ).alias("nfp"),
        F.lit(1).alias("_in_new"),
    )
    j = old.join(new, "doc_id", "full_outer")
    change = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(F.col("ofp") != F.col("nfp"), "changed")
        .otherwise("unchanged")
    )
    return j.groupBy(change.alias("change")).agg(
        F.count(F.lit(1)).alias("n_docs"))


@query(
    "exactsubstr_removal_stats",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, source, string_split({_NORM}, ' ') AS t
        FROM documents
    ),
    occ AS (
        SELECT doc_id, i - 1 AS pos,
               md5(array_to_string(
                   list_slice(t, i, i + {_SPAN_K} - 1), ' ')) AS h
        FROM docs,
             LATERAL (SELECT unnest(generate_series(1, len(t) - {_SPAN_K} + 1))
                      AS i) g
        WHERE len(t) >= {_SPAN_K}
    ),
    ranked AS (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY h ORDER BY doc_id, pos)
                   AS rn,
               count(*) OVER (PARTITION BY h) AS c
        FROM occ
    ),
    losers AS (SELECT doc_id, pos FROM ranked WHERE c >= 2 AND rn >= 2),
    cov AS (
        SELECT doc_id, count(DISTINCT p) AS cut
        FROM losers,
             LATERAL (SELECT unnest(generate_series(pos, pos + {_SPAN_K} - 1))
                      AS p) u
        GROUP BY doc_id
    )
    SELECT d.source,
           CAST(count(*) FILTER (WHERE cov.cut IS NOT NULL) AS BIGINT)
               AS docs_affected,
           CAST(coalesce(sum(cov.cut), 0) AS BIGINT) AS tokens_removed,
           CAST(sum(len(d.t)) AS BIGINT) AS tokens_before
    FROM docs d LEFT JOIN cov USING (doc_id)
    GROUP BY d.source
    """,
)
def exactsubstr_removal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span REMOVAL (see
    ``operators/dedup.py::remove_duplicate_spans``) rolled up per
    source: documents touched, tokens cut, tokens before.  The oracle
    independently replays winner selection (first global occurrence)
    and position-coverage merging with window functions, so the
    keep-first semantics — not just the counts — are checked."""
    from ..operators.dedup import remove_duplicate_spans
    from ..operators.text import normalize_text as _nt

    d = table(spark, sf_dir, "documents", parallel=True)
    before = d.select(
        "doc_id", "source",
        F.size(F.split(_nt("text"), " ")).alias("_n_before"))
    cleaned = remove_duplicate_spans(d, k=_SPAN_K).select(
        "doc_id", "n_tokens_removed")
    return (
        before.join(cleaned, "doc_id")
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("n_tokens_removed") > 0, 1).otherwise(0))
            .alias("docs_affected"),
            F.sum("n_tokens_removed").alias("tokens_removed"),
            F.sum("_n_before").alias("tokens_before"),
        )
    )


_ILV_LIMIT = 200


@query(
    "domain_interleave_order",
    oracle=f"""
    WITH tot AS (
        SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ),
    ranked AS (
        SELECT d.doc_id, d.source,
               row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id)
                   AS rn,
               t.n_docs
        FROM documents d JOIN tot t USING (source)
    ),
    strided AS (
        SELECT doc_id, source,
               rn::DOUBLE / n_docs AS stride
        FROM ranked
    ),
    ordered AS (
        SELECT doc_id, source, stride,
               row_number() OVER (ORDER BY stride, source, doc_id)
                   AS order_idx
        FROM strided
    )
    SELECT CAST(order_idx AS BIGINT) AS order_idx, doc_id, source,
           round(stride, 6) AS stride
    FROM ordered WHERE order_idx <= {_ILV_LIMIT}
    """,
)
def domain_interleave_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order interleave: stride scheduling
    (deficit round-robin) assigns document k of domain d the stride
    k/|d|, and reading by ascending stride yields every domain at its
    proportional rate with no long same-domain runs — the data-ORDER
    half of mixture sampling (``temperature_mixture_weights`` chooses
    how much of each domain; this chooses the sequence).  Strides are
    one division of two exact integers, so the schedule is bit-identical
    on any engine; ties (equal proportions) break on (source, doc_id).

    Plan shape: one count agg (broadcast back), one per-domain
    row_number window (parallelism = #domains; at 100 TB swap the
    within-domain rank for the md5-fraction pseudo-rank used by the
    sampling family — same stride algebra, no window), and a
    distributed top-K on the stride for the emitted prefix
    (TakeOrdered, never a global sort)."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents", parallel=True)
    tot = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("source").orderBy("doc_id")
    strided = (
        d.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(tot), "source")
        .withColumn("stride",
                    F.col("rn").cast("double") / F.col("n_docs"))
    )
    head = strided.orderBy("stride", "source", "doc_id").limit(_ILV_LIMIT)
    ow = Window.orderBy("stride", "source", "doc_id")
    return head.select(
        F.row_number().over(ow).cast("bigint").alias("order_idx"),
        "doc_id", "source",
        F.round("stride", 6).alias("stride"),
    )


_CHUNK_C = 32   # tokens per chunk
_CHUNK_S = 24   # stride (overlap = 8)


@query(
    "document_chunking",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
    ),
    c AS (
        SELECT doc_id, t, len(t) AS n,
               CASE WHEN len(t) <= {_CHUNK_C} THEN 1
                    ELSE CAST(floor((len(t) - {_CHUNK_C} + {_CHUNK_S} - 1)
                              / CAST({_CHUNK_S} AS DOUBLE)) AS BIGINT) + 1
               END AS nc
        FROM docs
    ),
    ex AS (
        SELECT doc_id, t, i AS chunk_idx
        FROM c, LATERAL (SELECT unnest(generate_series(0, nc - 1)) AS i) g
    )
    SELECT doc_id, chunk_idx,
           chunk_idx * {_CHUNK_S} AS start_tok,
           len(list_slice(t, chunk_idx * {_CHUNK_S} + 1,
                          chunk_idx * {_CHUNK_S} + {_CHUNK_C}))
               AS n_chunk_tokens,
           array_to_string(list_slice(t, chunk_idx * {_CHUNK_S} + 1,
                                      chunk_idx * {_CHUNK_S} + {_CHUNK_C}),
                           ' ') AS chunk_text
    FROM ex
    """,
)
def document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking of every document into 32-token
    windows with 8-token overlap — the
    context-window step of an embedding/RAG/long-doc pipeline.  The
    oracle replays window arithmetic, slicing, and reassembly for EVERY
    chunk of every document (full per-chunk compare, no sampling).

    Plan: pure narrow expressions, zero shuffles
    (``operators/text.py::chunk_documents``)."""
    from ..operators.text import chunk_documents

    d = table(spark, sf_dir, "documents", parallel=True)
    out = chunk_documents(d, chunk_tokens=_CHUNK_C,
                          overlap=_CHUNK_C - _CHUNK_S)
    return out.select(
        "doc_id", "chunk_idx", "start_tok",
        F.col("n_chunk_tokens").cast("bigint").alias("n_chunk_tokens"),
        "chunk_text",
    )


@query(
    "bigram_lm_perplexity",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
    ),
    pairs AS (
        SELECT doc_id, t[i] AS prev, t[i + 1] AS cur
        FROM docs,
             LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
    ),
    uni AS (
        SELECT tok, count(*) AS c
        FROM (SELECT unnest(t) AS tok FROM docs) GROUP BY tok
    ),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM uni),
    bi AS (SELECT prev, cur, count(*) AS cb FROM pairs GROUP BY 1, 2)
    SELECT p.doc_id,
           count(*) AS n_transitions,
           round(-sum(log2(
               0.7 * cb / up.c + 0.3 * uc.c / total)) / count(*), 4)
               AS bits_per_token
    FROM pairs p
    JOIN bi ON bi.prev = p.prev AND bi.cur = p.cur
    JOIN uni up ON up.tok = p.prev
    JOIN uni uc ON uc.tok = p.cur
    CROSS JOIN tot
    WHERE p.doc_id < 200
    GROUP BY p.doc_id
    """,
)
def bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram LM quality scoring — the CCNet scorer
    (Wenzek et al. 2020) one order up from ``unigram_lm_scores``:
    per-document cross-entropy −(1/n)·Σ log₂ p(wᵢ|wᵢ₋₁) under
    p = λ·c(wᵢ₋₁wᵢ)/c(wᵢ₋₁) + (1−λ)·c(wᵢ)/total (λ = 0.7), corpus-
    trained.  Repetitive template text scores low bits/token, token
    soup scores near the unigram entropy — the discriminator CCNet's
    quality tiers threshold.

    Plan shape: bigram construction is NARROW (slice + arrays_zip per
    document, no shuffle); the bigram and unigram tables are
    vocabulary-bounded → broadcast joins onto the exploded transition
    stream; scoring is one partial-agg groupBy(doc_id).  At 100 TB the
    corpus-trained tables swap for a trained LM's top-M table with
    unigram backoff — identical plumbing, the (1−λ) term IS the
    backoff.  Scored output restricted to doc_id < 200 like its
    unigram twin."""
    d = table(spark, sf_dir, "documents", parallel=True)
    toks = F.split(normalize_text("text"), " ")
    n = F.size(toks)
    pairs_arr = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("prev"),
        F.slice(toks, 2, n - 1).alias("cur"),
    )
    pairs = d.select("doc_id", F.explode(pairs_arr).alias("p")) \
        .select("doc_id", F.col("p.prev").alias("prev"),
                F.col("p.cur").alias("cur"))
    ex = d.select(F.explode(toks).alias("tok"))
    uni = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = uni.agg(F.sum("c").cast("double").alias("total"))
    bi = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cb"))
    p = (
        F.lit(0.7) * F.col("cb") / F.col("c_prev")
        + F.lit(0.3) * F.col("c_cur") / F.col("total")
    )
    return (
        pairs.filter(F.col("doc_id") < 200)
        .join(F.broadcast(bi), ["prev", "cur"])
        .join(F.broadcast(uni.withColumnRenamed("tok", "prev")
                          .withColumnRenamed("c", "c_prev")), "prev")
        .join(F.broadcast(uni.withColumnRenamed("tok", "cur")
                          .withColumnRenamed("c", "c_cur")), "cur")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.round(-F.sum(F.log2(p)) / F.count(F.lit(1)), 4)
            .alias("bits_per_token"),
        )
    )


# --- round-7 filter wave: blocklist filtering + truncation planning ----

# The badwords list is a SUBSET of the fixture vocabulary so the filter
# exercises real matches (the public C4 pipeline uses the LDNOOBW word
# list the same way — exact token membership, not substring).
_BLOCKLIST = ("slow", "corrupt", "broken")
_BL_SQL = ", ".join(repr(t) for t in _BLOCKLIST)
_TRUNC_CAPS = (32, 64, 128)
_CAPS_SQL = ", ".join(str(c) for c in _TRUNC_CAPS)


@query(
    "blocklist_filter_stats",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               len(string_split_regex(trim(text), '\\s+')) AS n_tok,
               len(list_filter(string_split_regex(trim(text), '\\s+'),
                               t -> t IN ({_BL_SQL})))
                   AS n_bad
        FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(count_if(n_bad * 10 > n_tok) AS BIGINT) AS n_dropped,
           round(avg(n_bad / n_tok), 4) AS avg_bad_ratio,
           CAST(sum(n_bad) AS BIGINT)   AS total_bad_tokens
    FROM toks
    GROUP BY source
    """,
)
def blocklist_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist filter (the LDNOOBW badwords gate).

    The blocklist is a LITERAL set folded into a narrow ``filter()``
    higher-order expression — no explode, no join, no shuffle before
    the per-source aggregate: per-doc bad-token counts are computed
    inside whole-stage codegen and the only exchange is the final
    groupBy(source).  A doc drops when >10% of its tokens are
    blocklisted (the avg ratio and total counts are reported so the
    threshold can be re-tuned without re-scanning).  At 100 TB a real
    blocklist (thousands of terms) would broadcast as an array literal
    or ride ``F.lit(...).isin`` the same way — still shuffle-free.
    """
    from ..operators.text import tokens

    t = tokens("text")
    bad = F.filter(t, lambda x: x.isin(*_BLOCKLIST))
    per_doc = table(spark, sf_dir, "documents").select(
        "doc_id", "source",
        F.size(t).alias("n_tok"),
        F.size(bad).alias("n_bad"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("n_bad") * 10 > F.col("n_tok"))
            .alias("n_dropped"),
            F.round(F.avg(F.col("n_bad") / F.col("n_tok")), 4)
            .alias("avg_bad_ratio"),
            F.sum("n_bad").cast("bigint").alias("total_bad_tokens"),
        )
    )


@query(
    "truncation_waste",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_tok
        FROM documents
    ),
    caps AS (SELECT unnest([32, 64, 128]) AS cap)
    SELECT caps.cap,
           CAST(count_if(toks.n_tok > caps.cap) AS BIGINT) AS docs_truncated,
           CAST(sum(least(toks.n_tok, caps.cap)) AS BIGINT) AS tokens_kept,
           CAST(sum(greatest(toks.n_tok - caps.cap, 0)) AS BIGINT)
               AS tokens_lost,
           round(sum(greatest(toks.n_tok - caps.cap, 0))
                 / sum(toks.n_tok), 4) AS waste_ratio
    FROM toks, caps
    GROUP BY caps.cap
    """,
)
def truncation_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window truncation planning: tokens lost per candidate cap.

    One narrow scan computes each doc's token count; the tiny cap table
    (one row per candidate context length) cross-joins as a broadcast,
    so the corpus is read ONCE for every cap simultaneously — choosing
    a sequence length never needs a re-scan per candidate.  The
    ``sequence_packing`` registry entry is the downstream consumer of
    the chosen cap.
    """
    from ..operators.text import token_count

    toks = table(spark, sf_dir, "documents").select(
        token_count("text").alias("n_tok"))
    caps = spark.createDataFrame(
        [(c,) for c in _TRUNC_CAPS], "cap int")
    kept = F.least(F.col("n_tok"), F.col("cap"))
    lost = F.greatest(F.col("n_tok") - F.col("cap"), F.lit(0))
    return (
        toks.crossJoin(F.broadcast(caps))
        .groupBy("cap")
        .agg(
            F.count_if(F.col("n_tok") > F.col("cap")).alias("docs_truncated"),
            F.sum(kept).cast("bigint").alias("tokens_kept"),
            F.sum(lost).cast("bigint").alias("tokens_lost"),
            F.round(F.sum(lost) / F.sum("n_tok"), 4).alias("waste_ratio"),
        )
    )


# Deterministic messy-URL fixture: five raw variants per canonical page
# (uppercase host+scheme, www., default port, userinfo, tracking params,
# trailing slash, fragment), keyed by gid = doc_id div 5 so every group
# of five docs shares one canonical target.  The documents table has no
# URL column — the VARIANTS are synthesized; the CANONICALIZER under
# test (functions/urls.py) is the real operator.
_URL_VARIANT_SQL = """
    CASE doc_id % 5
      WHEN 0 THEN 'HTTPS://WWW.Example.COM:443/articles/' || {gid}
                  || '/?utm_source=feed&utm_campaign=x&id=' || {pid}
                  || '#section-2'
      WHEN 1 THEN 'https://example.com/articles/' || {gid}
                  || '?id=' || {pid} || '&gclid=abc123'
      WHEN 2 THEN 'https://crawler@example.com:443/articles/' || {gid}
                  || '/?fbclid=zzz&id=' || {pid}
      WHEN 3 THEN 'https://EXAMPLE.com:443/articles/' || {gid}
                  || '?ref=tw&id=' || {pid}
      ELSE 'https://www.example.com/articles/' || {gid}
           || '/?id=' || {pid} || '&utm_medium=email'
    END
"""


@query(
    "url_canonical_dedup",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               {variant} AS url
        FROM documents
    ),
    nofrag AS (
        SELECT doc_id, url, split_part(trim(url), '#', 1) AS u FROM raw
    ),
    parsed AS (
        SELECT doc_id, url, u,
               lower(regexp_extract(
                   u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               regexp_extract(
                   regexp_extract(
                       u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                   '([^@]*)$', 1) AS hostport,
               regexp_extract(
                   u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)',
                   1) AS path0,
               regexp_extract(u, '\\?([^#]*)', 1) AS q
        FROM nofrag
    ),
    hp AS (
        SELECT *, regexp_extract(hostport, ':([0-9]+)$', 1) AS port
        FROM parsed
    ),
    canon AS (
        SELECT doc_id, url,
               scheme || '://'
               || CASE WHEN h LIKE 'www.%' THEN substr(h, 5) ELSE h END
               || CASE WHEN port <> ''
                            AND NOT (scheme = 'http' AND port = '80')
                            AND NOT (scheme = 'https' AND port = '443')
                       THEN ':' || port ELSE '' END
               || CASE WHEN p <> '/' AND p LIKE '%/'
                       THEN substr(p, 1, length(p) - 1) ELSE p END
               || CASE WHEN qq <> '' THEN '?' || qq ELSE '' END
                   AS canonical_url
        FROM (
            SELECT doc_id, url, scheme, port,
                   lower(CASE WHEN port <> ''
                              THEN substr(hostport, 1,
                                          length(hostport)
                                          - length(port) - 1)
                              ELSE hostport END) AS h,
                   CASE WHEN path0 = '' THEN '/' ELSE path0 END AS p,
                   array_to_string(list_sort(list_filter(
                       string_split(q, '&'),
                       x -> x <> '' AND NOT regexp_matches(x,
                           '{track_re}'))), '&') AS qq
            FROM hp
        )
        WHERE scheme <> ''
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url) AS BIGINT) AS n_raw_variants,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
    FROM canon
    GROUP BY canonical_url
    """.replace("{variant}", _URL_VARIANT_SQL.format(
        gid="(doc_id // 5)", pid="((doc_id // 5) % 7)"))
    .replace("{track_re}", _urlsmod.TRACKING_PARAM_RE),
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup — stage 0 of the web-crawl curation funnel
    (C4 §2.2 / RefinedWeb §3.1 dedup by canonical URL BEFORE any
    content pass; the reference's URL handling stops at
    percent-decoding, s3/node.js/s3.js:83).  Five deterministic messy
    variants per page (case, www, default port, userinfo, tracking
    params, trailing slash, fragment) must collapse onto one canonical
    key; the output is the per-key dedup ledger (count, distinct raw
    forms, keeper = min doc_id — the same keeper rule as
    ``exact_dedup_stats``).

    Scale shape: :func:`functions.urls.canonicalize_url` is a pure
    column expression (whole-stage codegen on the scan projection —
    zero UDFs), and the dedup is ONE partial-agg shuffle on the
    canonical string.  At 100 TB this is the cheapest duplicate class
    to remove and runs before any text ever shuffles.
    """
    from ..functions.urls import with_canonical_url

    gid = (F.col("doc_id") - F.col("doc_id") % 5) / F.lit(5)
    gid = gid.cast("bigint").cast("string")
    pid = ((F.col("doc_id") - F.col("doc_id") % 5) / F.lit(5))\
        .cast("bigint") % 7
    pid = pid.cast("string")
    m = F.col("doc_id") % 5
    url = (
        F.when(m == 0, F.concat(
            F.lit("HTTPS://WWW.Example.COM:443/articles/"), gid,
            F.lit("/?utm_source=feed&utm_campaign=x&id="), pid,
            F.lit("#section-2")))
        .when(m == 1, F.concat(
            F.lit("https://example.com/articles/"), gid,
            F.lit("?id="), pid, F.lit("&gclid=abc123")))
        .when(m == 2, F.concat(
            F.lit("https://crawler@example.com:443/articles/"), gid,
            F.lit("/?fbclid=zzz&id="), pid))
        .when(m == 3, F.concat(
            F.lit("https://EXAMPLE.com:443/articles/"), gid,
            F.lit("?ref=tw&id="), pid))
        .otherwise(F.concat(
            F.lit("https://www.example.com/articles/"), gid,
            F.lit("/?id="), pid, F.lit("&utm_medium=email")))
    )
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", url.alias("url"))
    return (
        with_canonical_url(docs, "url", out_col="canonical_url",
                           drop_malformed=True)
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("url").alias("n_raw_variants"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


@query(
    "html_text_extraction",
    oracle=_render_html_regexes("""
    WITH h AS (
        SELECT doc_id,
               '<html><head><title>t</title><style>.m{color:red}</style>'
               || '<script>var s="' || source || '";</script></head>'
               || '<body><nav><a href="/">Home</a> '
               || '<a href="/about">About</a> '
               || '<a href="/contact">Contact</a></nav>'
               || '<p>' || substr(text, 1, 120) || '</p>'
               || '<div><a href="/x">read more</a> '
               || '<a href="/y">subscribe now</a></div>'
               || '<P>' || substr(text, 121, 200) || '</P>'
               || '<footer><a href="/priv">Privacy</a> '
               || '<a href="/terms">Terms</a> (c) corp</footer>'
               || '</body></html>' AS html
        FROM documents
    ),
    cleaned AS (
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(
                   regexp_replace(html,
                       '{strip_script}', '', 'g'),
                   '{strip_style}', '', 'g'),
                   '{strip_noscript}', '', 'g'),
                   '{strip_comment}', '', 'g') AS c
        FROM h
    ),
    seg AS (
        SELECT doc_id,
               string_split(regexp_replace(c,
                   '{block_close}',
                   chr(1), 'g'), chr(1)) AS segs
        FROM cleaned
    ),
    flat AS (
        SELECT doc_id, g.i, list_extract(segs, g.i) AS s
        FROM seg,
             LATERAL (SELECT unnest(generate_series(1, len(segs)))
                      AS i) g
    ),
    feats AS (
        SELECT doc_id, i,
               trim(regexp_replace(regexp_replace(
                   s, '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')) AS plain,
               coalesce(length(regexp_replace(array_to_string(
                   regexp_extract_all(s, '(?is)<a[^>]*>(.*?)</a>', 1),
                   ''), '<[^>]*>', '', 'g')), 0) AS link_len
        FROM flat
    ),
    cls AS (
        SELECT doc_id, i, plain, length(plain) AS plain_len, link_len
        FROM feats WHERE length(plain) > 0
    ),
    agg AS (
        SELECT doc_id,
               string_agg(plain, ' ' ORDER BY i)
                   FILTER (WHERE plain_len >= 30
                           AND link_len * 10 <= plain_len * 3)
                   AS extracted_text,
               count_if(plain_len >= 30
                        AND link_len * 10 <= plain_len * 3) AS n_kept,
               count(*) AS n_nonempty
        FROM cls GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.extracted_text, '') AS extracted_text,
           CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(coalesce(a.n_nonempty, 0) - coalesce(a.n_kept, 0)
                AS BIGINT) AS n_dropped,
           CAST(length(coalesce(a.extracted_text, '')) AS BIGINT)
               AS extracted_chars
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """),
)
def html_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate strip / main-text extraction (jusText-class
    length + link-density rule) — the step real curation funnels run
    BEFORE the plain-text quality battery: nav bars, read-more rows,
    and footers drop; body paragraphs survive.  The fixture wraps each
    document's text in a deterministic tag-soup page (head with
    script/style, link-saturated nav, two body paragraphs — one with
    an UPPERCASE closing tag — a read-more div, and a footer); the
    operator under test is :func:`operators.html.extract_main_text`.

    Scale shape: pure column expressions (regexp strips + higher-order
    array functions, zero UDFs) on one narrow projection — extraction
    fuses into the scan under whole-stage codegen, and nothing
    shuffles: the output is row-per-document.  The DuckDB oracle
    replays the identical rule (same regexes, same integer
    cross-product density compare) via LATERAL unnest + ordered
    string_agg.
    """
    from ..operators.html import extract_main_text

    docs = table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><head><title>t</title><style>.m{color:red}'
              '</style><script>var s="'), F.col("source"),
        F.lit('";</script></head><body><nav><a href="/">Home</a> '
              '<a href="/about">About</a> '
              '<a href="/contact">Contact</a></nav><p>'),
        F.substring("text", 1, 120),
        F.lit('</p><div><a href="/x">read more</a> '
              '<a href="/y">subscribe now</a></div><P>'),
        F.substring("text", 121, 200),
        F.lit('</P><footer><a href="/priv">Privacy</a> '
              '<a href="/terms">Terms</a> (c) corp</footer>'
              '</body></html>'),
    )
    return (
        docs.select("doc_id", extract_main_text(html).alias("r"))
        .select(
            "doc_id",
            F.col("r.extracted_text").alias("extracted_text"),
            F.col("r.n_kept").cast("bigint").alias("n_kept"),
            F.col("r.n_dropped").cast("bigint").alias("n_dropped"),
            F.col("r.extracted_chars").cast("bigint")
            .alias("extracted_chars"),
        )
    )


# Subdomain-sharded publisher fixture: 8 publishers (doc_id % 8), each
# serving its pages from 3 rotating subdomains ((doc_id // 8) % 3) —
# the exact sharding pattern (cdn0/cdn1/cdn2.pub.org) that defeats a
# host-keyed cap.  Publisher 5 sits under a multi-label public suffix
# (.co.uk), 6 is an IPv4 literal, 7 mixes case and a trailing FQDN dot
# so every registered_domain normalization path is oracle-exercised.
_CAP_HOST_SQL = """
    CASE doc_id % 8
      WHEN 5 THEN 'news' || ((doc_id // 8) % 3) || '.pub5.co.uk'
      WHEN 6 THEN '192.168.0.6'
      WHEN 7 THEN 'CDN' || ((doc_id // 8) % 3) || '.Pub7.ORG.'
      ELSE 'cdn' || ((doc_id // 8) % 3) || '.pub' || (doc_id % 8)
           || '.org'
    END
"""


def _cap_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_CAP_HOST_SQL`` — (doc_id, host) for the
    subdomain-sharded cap fixture, shared by ``url_domain_caps`` and
    ``registered_domain_psl_caps`` so the two queries' claim of 'the
    same fixture' is one definition, not a copy."""
    docs = table(spark, sf_dir, "documents")
    p = F.col("doc_id") % 8
    s = F.expr("(doc_id div 8) % 3").cast("string")
    host_fx = (
        F.when(p == 5, F.concat(F.lit("news"), s, F.lit(".pub5.co.uk")))
        .when(p == 6, F.lit("192.168.0.6"))
        .when(p == 7, F.concat(F.lit("CDN"), s, F.lit(".Pub7.ORG.")))
        .otherwise(F.concat(F.lit("cdn"), s, F.lit(".pub"),
                            p.cast("string"), F.lit(".org")))
    )
    url = F.concat(F.lit("https://"), host_fx, F.lit("/d/"),
                   F.col("doc_id").cast("string"))
    return docs.select(
        "doc_id",
        F.regexp_extract(url, "^https?://([^/:?#]+)", 1).alias("host"))


@query(
    "url_domain_caps",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               'https://' || {host} || '/d/' || doc_id AS url
        FROM documents
    ),
    hosts AS (
        SELECT doc_id,
               regexp_extract(url, '^https?://([^/:?#]+)', 1) AS host
        FROM raw
    ),
    reg AS (
        SELECT doc_id, host, {reg_dom} AS reg_dom FROM hosts
    ),
    ranked AS (
        SELECT doc_id, host, reg_dom,
               row_number() OVER (PARTITION BY reg_dom ORDER BY doc_id)
                   AS rn
        FROM reg
    )
    SELECT reg_dom,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count_if(rn <= 10) AS BIGINT) AS n_kept,
           CAST(count_if(rn > 10) AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN rn <= 10 THEN doc_id ELSE 0 END)
                AS BIGINT) AS kept_docid_sum
    FROM ranked
    GROUP BY reg_dom
    """.replace("{host}", _CAP_HOST_SQL)
    .replace("{reg_dom}", _urlsmod.registered_domain_sql("host")),
)
def url_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-REGISTERED-domain document caps — the anti-domination rule
    every web-curation pipeline applies after URL dedup (RefinedWeb
    §3.1 caps documents per registered domain so link farms and
    mirrors cannot dominate the corpus; C4 does the same at the page
    level).  The cap keys on ``registered_domain(host)`` — NOT the raw
    host — so a publisher sharding pages across cdn0/cdn1/cdn2
    subdomains (the fixture does exactly this, 3 shards per publisher)
    still gets ONE budget; ``n_hosts`` reports how many raw hosts each
    publisher key absorbed.  Keep the first ``cap`` docs per publisher
    in crawl order (doc_id); ``kept_docid_sum`` pins WHICH rows were
    kept, not just how many.

    Scale shape: one window partitioned by registered domain (millions
    of keys in production — the partition key IS the skew concern,
    which is why the cap exists: the pathological publisher is exactly
    the one with 10^8 rows.  The rank-then-filter form lets AQE
    skew-split the exchange; a TopK-per-key rewrite via ``min_by``
    arrays would bound it harder but caps are small).  Host extraction
    and the registered-domain fold both ride the scan projection —
    zero UDFs, zero extra shuffles vs the host-keyed form.
    """
    from ..functions.urls import registered_domain

    hosts = _cap_hosts(spark, sf_dir)
    reg = hosts.withColumn("reg_dom", registered_domain("host"))
    w = Window.partitionBy("reg_dom").orderBy("doc_id")
    ranked = reg.withColumn("rn", F.row_number().over(w))
    cap = 10
    return ranked.groupBy("reg_dom").agg(
        F.count_distinct(F.col("host")).alias("n_hosts"),
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("rn") <= cap).alias("n_kept"),
        F.count_if(F.col("rn") > cap).alias("n_dropped"),
        F.sum(F.when(F.col("rn") <= cap, F.col("doc_id"))
              .otherwise(F.lit(0))).alias("kept_docid_sum"),
    )


# Messy-URL fixture for the composed stage-0 funnel: five raw spellings
# per canonical page.  The host carries the PAGE GROUP's publisher
# (pub{gid % 20}.org — 20 publishers) behind a rotating subdomain shard
# (s{(gid // 20) % 3}) so each publisher serves its pages from up to 3
# raw hosts — the sharding pattern a host-keyed cap cannot see through
# and a registered-domain cap must.
_FUNNEL_URL_SQL = """
    CASE doc_id % 5
      WHEN 0 THEN 'HTTPS://WWW.S' || (((doc_id // 5) // 20) % 3)
                  || '.PUB' || ((doc_id // 5) % 20)
                  || '.ORG:443/d/' || (doc_id // 5)
                  || '/?utm_source=feed&id=' || ((doc_id // 5) % 7)
                  || '#top'
      WHEN 1 THEN 'https://s' || (((doc_id // 5) // 20) % 3)
                  || '.pub' || ((doc_id // 5) % 20)
                  || '.org/d/' || (doc_id // 5)
                  || '?id=' || ((doc_id // 5) % 7) || '&gclid=z'
      WHEN 2 THEN 'https://bot@s' || (((doc_id // 5) // 20) % 3)
                  || '.pub' || ((doc_id // 5) % 20)
                  || '.org:443/d/' || (doc_id // 5)
                  || '/?fbclid=q&id=' || ((doc_id // 5) % 7)
      WHEN 3 THEN 'https://S' || (((doc_id // 5) // 20) % 3)
                  || '.Pub' || ((doc_id // 5) % 20)
                  || '.ORG:443/d/' || (doc_id // 5)
                  || '?ref=tw&id=' || ((doc_id // 5) % 7)
      ELSE 'https://www.s' || (((doc_id // 5) // 20) % 3)
           || '.pub' || ((doc_id // 5) % 20)
           || '.org/d/' || (doc_id // 5)
           || '/?id=' || ((doc_id // 5) % 7) || '&utm_medium=email'
    END
"""

# Cap per REGISTERED DOMAIN.  3, not 10: at sf0.01 each publisher has
# exactly 5 keeper pages across its shards, so a cap of 3 BINDS (drops
# 2 per publisher) and a host-keyed cap would keep all 5 — the driver's
# own gate distinguishes publisher-keyed from host-keyed capping even
# at the smallest scale.
_FUNNEL_CAP = 3


def _funnel_fixture_url() -> Column:
    """The crawl funnels' messy-URL fixture, as a Column over ``doc_id``
    — five raw spellings per page (case/port/userinfo/tracking-param
    variants), subdomain-sharded across three hosts per publisher.
    Split out so the streaming stage-1 parity test feeds the sink the
    EXACT urls the batch funnel synthesizes (one definition)."""
    gid = F.expr("doc_id div 5").cast("string")
    pubn = F.expr("(doc_id div 5) % 20").cast("string")
    shard = F.expr("((doc_id div 5) div 20) % 3").cast("string")
    pid = F.expr("((doc_id div 5) % 7)").cast("string")
    m = F.col("doc_id") % 5
    url = (
        F.when(m == 0, F.concat(
            F.lit("HTTPS://WWW.S"), shard, F.lit(".PUB"), pubn,
            F.lit(".ORG:443/d/"), gid,
            F.lit("/?utm_source=feed&id="), pid, F.lit("#top")))
        .when(m == 1, F.concat(
            F.lit("https://s"), shard, F.lit(".pub"), pubn,
            F.lit(".org/d/"), gid,
            F.lit("?id="), pid, F.lit("&gclid=z")))
        .when(m == 2, F.concat(
            F.lit("https://bot@s"), shard, F.lit(".pub"), pubn,
            F.lit(".org:443/d/"), gid,
            F.lit("/?fbclid=q&id="), pid))
        .when(m == 3, F.concat(
            F.lit("https://S"), shard, F.lit(".Pub"), pubn,
            F.lit(".ORG:443/d/"), gid,
            F.lit("?ref=tw&id="), pid))
        .otherwise(F.concat(
            F.lit("https://www.s"), shard, F.lit(".pub"), pubn,
            F.lit(".org/d/"), gid,
            F.lit("/?id="), pid, F.lit("&utm_medium=email")))
    )
    return url


def _funnel_ranked_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared front end of the crawl funnels: messy-URL fixture →
    canonicalize → canonical-key dedup (keeper = min doc_id, group size
    carried) → registered-domain rank.  Returns (canonical_url,
    group_n, doc_id, text, host, reg_dom, rn) — stage-0 gates and the
    stage-1 near-dup both consume this one lineage.

    The publisher key is the FULL vendored 9,506-rule PSL snapshot
    (round-12: production curation defaults to the keying the round-11
    hash gate validated — on real crawl data the fixture tuple and the
    full list give DIFFERENT publishers; the oracles twin it with
    ``registered_domain_psl_sql``).  Membership is hybrid — broadcast
    joins for the two data-scale tiers, codegen'd set tests for the
    eight small ones (see ``with_registered_domain_psl``) — and rides
    AFTER the canonical groupBy, so it probes keeper rows only: zero
    shuffles of the fact side."""
    from ..functions.urls import (
        load_psl_file,
        with_canonical_url,
        with_registered_domain_psl,
    )

    # staged form: the fixture-url when-chain and each component regex
    # evaluate once per row instead of being re-inlined per reference
    # (round-14 optimization — measured 114 KB plan / 105 repeated
    # regexp_extract with the single-Column form on this front end)
    # malformed (NULL-canonical) rows leave the funnel up front, exactly
    # as the oracle's WHERE scheme <> '' does — without this a single
    # unparseable URL becomes a counted NULL group only on the Spark
    # side (round-9 fourth-pass review finding); drop_malformed filters
    # on the staged scheme column so pushdown cannot re-inline the
    # whole canonical tree into a scan-level Filter
    docs = with_canonical_url(
        table(spark, sf_dir, "documents").select("doc_id", "text"),
        _funnel_fixture_url(), out_col="canonical_url",
        drop_malformed=True)
    # keeper selection stays min_by(struct) — r14 tried the guide-§8
    # "decide slim, join text back" form (hash agg + doc_id join):
    # locally faster (no sort-agg codegen), but at 100 TB the keeper
    # set is corpus-scale, so the text-fetch join becomes a SECOND full
    # corpus shuffle where min_by's one sorted shuffle moves the text
    # exactly once with map-side combine absorbing duplicate groups —
    # the plan-shape test pinning 1 scan / 2 broadcasts / 2 exchanges
    # correctly rejected the rewrite (local-only wins don't count)
    keepers = (
        docs.groupBy("canonical_url")
        .agg(F.count(F.lit(1)).alias("group_n"),
             F.min_by(F.struct("doc_id", "text"), F.col("doc_id"))
             .alias("_k"))
        .select("canonical_url", "group_n",
                F.col("_k.doc_id").alias("doc_id"),
                F.col("_k.text").alias("text"))
        .withColumn("host", F.regexp_extract(
            "canonical_url", "^https?://([^/:?#]+)", 1))
    )
    keepers = with_registered_domain_psl(
        keepers, "host", out_col="reg_dom", suffix_rows=load_psl_file())
    w = Window.partitionBy("reg_dom").orderBy("doc_id")
    return keepers.withColumn("rn", F.row_number().over(w))


_FUNNEL_HTML_SQL = """
    '<html><head><style>.m{c:red}</style><script>var t=1;</script>'
    || '</head><body><nav><a href="/">Home</a> '
    || '<a href="/a">About</a></nav><p>' || substr(text, 1, 120)
    || '</p><div><a href="/x">read more</a></div><P>'
    || substr(text, 121, 200)
    || '</P><footer><a href="/p">Privacy</a> (c) corp</footer>'
    || '</body></html>'
"""


# Shared oracle front end of the crawl funnels — mirrors
# _funnel_ranked_keepers: messy-URL fixture → canonicalize → canonical
# dedup (keeper = min doc_id) → registered-domain rank.
_FUNNEL_FRONT_CTES = """
    raw AS (
        SELECT doc_id, text, {url} AS url FROM documents
    ),
    nofrag AS (
        SELECT doc_id, text, url, split_part(trim(url), '#', 1) AS u
        FROM raw
    ),
    parsed AS (
        SELECT doc_id, text, url, u,
               lower(regexp_extract(
                   u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               regexp_extract(
                   regexp_extract(
                       u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                   '([^@]*)$', 1) AS hostport,
               regexp_extract(
                   u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)',
                   1) AS path0,
               regexp_extract(u, '\\?([^#]*)', 1) AS q
        FROM nofrag
    ),
    hp AS (
        SELECT *, regexp_extract(hostport, ':([0-9]+)$', 1) AS port
        FROM parsed
    ),
    canon AS (
        SELECT doc_id, text,
               scheme || '://'
               || CASE WHEN h LIKE 'www.%' THEN substr(h, 5) ELSE h END
               || CASE WHEN port <> ''
                            AND NOT (scheme = 'http' AND port = '80')
                            AND NOT (scheme = 'https' AND port = '443')
                       THEN ':' || port ELSE '' END
               || CASE WHEN p <> '/' AND p LIKE '%/'
                       THEN substr(p, 1, length(p) - 1) ELSE p END
               || CASE WHEN qq <> '' THEN '?' || qq ELSE '' END
                   AS canonical_url
        FROM (
            SELECT doc_id, text, scheme, port,
                   lower(CASE WHEN port <> ''
                              THEN substr(hostport, 1,
                                          length(hostport)
                                          - length(port) - 1)
                              ELSE hostport END) AS h,
                   CASE WHEN path0 = '' THEN '/' ELSE path0 END AS p,
                   array_to_string(list_sort(list_filter(
                       string_split(q, '&'),
                       x -> x <> '' AND NOT regexp_matches(x,
                           '{track_re}'))), '&') AS qq
            FROM hp
        )
        WHERE scheme <> ''
    ),
    keepers AS (
        SELECT canonical_url,
               CAST(count(*) AS BIGINT) AS group_n,
               min(doc_id) AS doc_id
        FROM canon GROUP BY canonical_url
    ),
    krows AS (
        SELECT k.canonical_url, k.group_n, k.doc_id, c.text,
               regexp_extract(k.canonical_url,
                              '^https?://([^/:?#]+)', 1) AS host
        FROM keepers k
        JOIN canon c ON c.canonical_url = k.canonical_url
                    AND c.doc_id = k.doc_id
    ),
    kreg AS (
        SELECT *, {reg_dom} AS reg_dom FROM krows
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY reg_dom
                                     ORDER BY doc_id) AS rn
        FROM kreg
    )"""

# Shared oracle extraction chain — consumes a CTE named html(doc_id,
# rn, hx), yields ex(doc_id, xt); the DuckDB twin of
# operators/html.py::extract_main_text.
_FUNNEL_EXTRACT_CTES = """
    seg AS (
        SELECT doc_id, rn,
               string_split(regexp_replace(
                   regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(hx,
                           '{strip_script}', '', 'g'),
                           '{strip_style}', '', 'g'),
                           '{strip_noscript}', '', 'g'),
                           '{strip_comment}', '', 'g'),
                   '{block_close}',
                   chr(1), 'g'), chr(1)) AS segs
        FROM html
    ),
    feats AS (
        SELECT doc_id, rn, g.i,
               trim(regexp_replace(regexp_replace(
                   list_extract(segs, g.i), '<[^>]*>', ' ', 'g'),
                   '\\s+', ' ', 'g')) AS plain,
               coalesce(length(regexp_replace(array_to_string(
                   regexp_extract_all(list_extract(segs, g.i),
                                      '(?is)<a[^>]*>(.*?)</a>', 1),
                   ''), '<[^>]*>', '', 'g')), 0) AS link_len
        FROM seg,
             LATERAL (SELECT unnest(generate_series(1, len(segs)))
                      AS i) g
    ),
    ex AS (
        SELECT doc_id,
               coalesce(string_agg(plain, ' ' ORDER BY i)
                   FILTER (WHERE length(plain) >= 30
                           AND link_len * 10 <= length(plain) * 3),
                   '') AS xt
        FROM feats GROUP BY doc_id
    )"""

# Shared oracle near-dedup chain (stage-1 AND stage-2 — one template,
# so a band-key / seed-hash fix can never fork the two funnels'
# semantics): consumes a CTE ``{nd_src}(doc_id, xt)`` of gate
# survivors, yields ``nd(doc_id, first_seen)``.  ``{distinct}``
# renders to DISTINCT when the caller needs only signatures (min over
# a multiset equals min over its set) and to '' when the caller also
# derives per-doc gram counts from the same ``grams`` CTE.
_FUNNEL_NEARDUP_CTES = """
    docs2 AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(xt), '\\s+', ' ',
                                                'g')), ' ') AS t
        FROM {nd_src}
    ),
    grams AS (
        SELECT {distinct} doc_id,
               array_to_string(list_slice(t, i, i + 2), ' ') AS shingle
        FROM docs2,
             LATERAL (SELECT unnest(generate_series(
                          1, greatest(len(t) - 2, 1))) AS i) g
    ),
    sig AS (
        SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS minhash
        FROM grams CROSS JOIN (SELECT unnest(generate_series(0, 7))
                               AS seed) s
        GROUP BY doc_id, seed
    ),
    banded AS (
        SELECT doc_id, seed // 2 AS band,
               string_agg(minhash, '|' ORDER BY minhash) AS band_key
        FROM sig GROUP BY doc_id, seed // 2
    ),
    bf AS (
        SELECT doc_id,
               min(doc_id) OVER (PARTITION BY band, band_key)
                   AS bucket_first
        FROM banded
    ),
    nd AS (
        SELECT doc_id, min(bucket_first) AS first_seen
        FROM bf GROUP BY doc_id
    )"""


@query(
    "crawl_stage0_funnel",
    oracle=_render_html_regexes("""
    WITH {front},
    html AS (
        SELECT doc_id, rn, {html} AS hx FROM ranked WHERE rn <= {cap}
    ),
    {extract},
    flags AS (
        SELECT r.group_n, r.rn,
               length(coalesce(e.xt, '')) AS xchars,
               len(string_split_regex(trim(coalesce(e.xt, '')),
                                      '\\s+')) AS xtok
        FROM ranked r LEFT JOIN ex e USING (doc_id)
    )
    SELECT stage, n_docs FROM (
        SELECT 'a_raw' AS stage,
               CAST(sum(group_n) AS BIGINT) AS n_docs FROM flags
        UNION ALL
        SELECT 'b_url_dedup', CAST(count(*) AS BIGINT) FROM flags
        UNION ALL
        SELECT 'c_domain_cap', CAST(count_if(rn <= {cap}) AS BIGINT)
        FROM flags
        UNION ALL
        SELECT 'd_min_content',
               CAST(count_if(rn <= {cap} AND xchars >= 120) AS BIGINT)
        FROM flags
        UNION ALL
        SELECT 'e_token_band',
               CAST(count_if(rn <= {cap} AND xchars >= 120
                             AND xtok BETWEEN 15 AND 1000) AS BIGINT)
        FROM flags
    )
    """.replace("{front}", _FUNNEL_FRONT_CTES)
    .replace("{extract}", _FUNNEL_EXTRACT_CTES)
    .replace("{url}", _FUNNEL_URL_SQL)
    .replace("{html}", _FUNNEL_HTML_SQL)
    .replace("{track_re}", _urlsmod.TRACKING_PARAM_RE)
    .replace("{reg_dom}", _urlsmod.registered_domain_psl_sql(
        "host", _urlsmod.load_psl_file()))
    .replace("{cap}", str(_FUNNEL_CAP))),
)
def crawl_stage0_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed crawl stage-0 funnel — every round-9 operator
    chained the way a production web-curation pipeline chains them,
    reported as per-stage surviving-document counts:

    raw → canonical-URL dedup (keeper = min doc_id) → per-REGISTERED-
    domain cap (first ``_FUNNEL_CAP`` per publisher in crawl order —
    RefinedWeb §3.1's publisher-level rule, so the fixture's
    subdomain-sharded hosts s0/s1/s2.pubN.org share ONE budget) → HTML
    main-text extraction with a minimum-content gate (≥ 120 extracted
    chars) → token-count band on the EXTRACTED text (15–1000).

    Single-pass shape: the five counts are conditional aggregates over
    ONE lineage — the canonical-key groupBy (which carries each group's
    size for the raw count and min_by's keeper row), one
    publisher-window exchange for the cap rank (the registered-domain
    fold is a scan-side projection, no extra shuffle), and the
    zero-shuffle HTML extraction riding the same frame; the final
    five-row funnel is one stack over a single-row aggregate.  No
    stage re-scans the corpus.  The oracle replays the ENTIRE
    composition (canonicalization CTE chain, keeper join,
    registered-domain rank, segment extraction, conditional counts).
    """
    from ..operators.html import extract_main_text

    ranked = _funnel_ranked_keepers(spark, sf_dir)
    html = F.concat(
        F.lit('<html><head><style>.m{c:red}</style><script>var t=1;'
              '</script></head><body><nav><a href="/">Home</a> '
              '<a href="/a">About</a></nav><p>'),
        F.substring("text", 1, 120),
        F.lit('</p><div><a href="/x">read more</a></div><P>'),
        F.substring("text", 121, 200),
        F.lit('</P><footer><a href="/p">Privacy</a> (c) corp</footer>'
              '</body></html>'),
    )
    # extraction runs ONLY on capped survivors (codegen CASE WHEN
    # short-circuits per row): at sf0.1 the cap drops 80% of keepers,
    # and the dozen regexp passes are the funnel's dominant per-row
    # cost — paying them on rows the cap already killed inverts the
    # funnel's own ordering (round-9 fourth-pass review finding).  The
    # oracle mirrors this with WHERE rn <= _FUNNEL_CAP + a LEFT JOIN
    # back.
    xt = F.when(F.col("rn") <= _FUNNEL_CAP,
                extract_main_text(html)["extracted_text"]) \
        .otherwise(F.lit(""))
    flags = ranked.select(
        "group_n", "rn", xt.alias("xt"),
    ).select(
        "group_n", "rn",
        F.length("xt").alias("xchars"),
        F.size(F.split(F.trim("xt"), r"\s+")).alias("xtok"),
    )
    capped = F.col("rn") <= _FUNNEL_CAP
    content = capped & (F.col("xchars") >= 120)
    band = content & F.col("xtok").between(15, 1000)
    agg = flags.agg(
        F.sum("group_n").cast("bigint").alias("a_raw"),
        F.count(F.lit(1)).alias("b_url_dedup"),
        F.count_if(capped).alias("c_domain_cap"),
        F.count_if(content).alias("d_min_content"),
        F.count_if(band).alias("e_token_band"),
    )
    return agg.select(F.expr(
        "stack(5, 'a_raw', a_raw, 'b_url_dedup', b_url_dedup, "
        "'c_domain_cap', c_domain_cap, 'd_min_content', d_min_content, "
        "'e_token_band', e_token_band) AS (stage, n_docs)"))


def _funnel_neardup(flags: DataFrame, keys: tuple[str, ...],
                    with_counts: bool = False) -> DataFrame:
    """Shared near-dedup chain of the crawl funnels (stage 1 AND
    stage 2 — one definition, so a band-key or seed-hash fix can never
    fork the two funnels' semantics; the oracle twin is
    ``_FUNNEL_NEARDUP_CTES``).

    ``flags`` must carry ``doc_id``, ``gated``, ``xt`` and every name
    in ``keys`` (which must include ``doc_id`` and ``gated``).  Gate-
    failed rows ride the chain in singleton sentinel buckets
    ('doc:'-prefixed band keys that can never equal an
    md5-hex|md5-hex key) so the caller keeps ONE lineage — see the
    stage-1 docstring for why the join-back alternative re-scans the
    corpus.  Returns one row per doc: ``keys`` (+ ``total_g`` /
    ``distinct_g`` when ``with_counts`` — the gram stream then stays
    non-distinct, which changes no signature: min over a multiset
    equals min over its set) + ``first_seen``.
    """
    from ..operators.dedup import minhash_vector_expr
    from ..operators.text import with_word_ngrams

    staged = flags.withColumn(
        "_sig_text", F.when(F.col("gated"), F.col("xt"))
        .otherwise(F.concat(F.lit("doc "),
                            F.col("doc_id").cast("string"))))
    # Narrow signature chain (r14, guide §2.4 — same rewrite as
    # operators/dedup.py::minhash_vector): the per-doc MinHash vector,
    # gram total and distinct count are all ROW properties of the gram
    # array, so the explode → groupBy(min-over-string ×8) — which
    # planned as SortAggregate with two full sorts of the exploded
    # gram stream — is gone; the first exchange in the chain is now
    # the (band, band_key) bucket window itself.
    grammed = with_word_ngrams(
        staged, "_sig_text", 3, keep=keys,
        distinct=not with_counts,
    )
    sel = [F.col(k) for k in keys]
    extras: list[str] = []
    if with_counts:
        sel += [
            F.size("grams").cast("bigint").alias("total_g"),
            F.size(F.array_distinct("grams")).cast("bigint")
            .alias("distinct_g"),
        ]
        extras = ["total_g", "distinct_g"]
    per_doc = grammed.select(
        *sel, minhash_vector_expr("grams", 8).alias("_mh"))
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", F.sort_array(
                F.slice("_mh", 2 * b + 1, 2))).alias("_bk"),
        )
        for b in range(4)
    ])
    banded = per_doc.select(
        *keys, *extras, F.inline(band_structs)
    ).withColumn(
        "band_key",
        F.when(F.col("gated"), F.col("_bk"))
        .otherwise(F.concat(F.lit("doc:"),
                            F.col("doc_id").cast("string"))))
    bf = banded.withColumn(
        "bucket_first",
        F.min("doc_id").over(Window.partitionBy("band", "band_key")))
    return bf.groupBy(*keys, *extras).agg(
        F.min("bucket_first").alias("first_seen"))


# Stage-1 page fixture: each page's main content is a 40-word TEMPLATE
# paragraph shared by every page with the same template id (gid % 25 —
# the mirror-site / boilerplate-article duplicate class) plus a 5-word
# page-specific tail, so same-template pages are NEAR duplicates
# (Jaccard ≈ 0.8), never exact.  Pages where gid % 11 = 7 omit the
# template paragraph entirely — they fail the min-content gate, so the
# quality gates bind inside this funnel too.  All words are md5-derived
# (repo hashing rule) so the oracle regenerates them byte-for-byte.
def _s1_fixture_html() -> Column:
    """The stage-1 page-HTML fixture as a Column over ``doc_id`` (the
    Spark twin of ``_S1_HTML_SQL``).  Split out so the streaming
    stage-1 parity test renders the EXACT pages the batch funnel
    renders (one definition)."""
    gid_s = F.expr("doc_id div 5").cast("string")
    tid = F.expr("(doc_id div 5) % 25").cast("string")
    shared = F.array_join(F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda j: F.concat(F.lit("w"), F.substring(
            F.md5(F.concat(tid, F.lit(":"), j.cast("string"))),
            1, 6))), " ")
    tail = F.array_join(F.transform(
        F.sequence(F.lit(1), F.lit(5)),
        lambda j: F.concat(F.lit("p"), F.substring(
            F.md5(F.concat(F.lit("pg:"), gid_s, F.lit(":"),
                           j.cast("string"))), 1, 6))), " ")
    return F.concat(
        F.lit('<html><head><script>var t=1;</script></head><body>'
              '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'),
        F.when(F.expr("(doc_id div 5) % 11") == 7, F.lit(""))
        .otherwise(F.concat(F.lit("<p>"), shared, F.lit("</p>"))),
        F.lit("<P>"), tail,
        F.lit('</P><footer><a href="/p">Privacy</a> (c) corp</footer>'
              '</body></html>'),
    )


_S1_HTML_SQL = """
    '<html><head><script>var t=1;</script></head><body>'
    || '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
    || CASE WHEN (doc_id // 5) % 11 = 7 THEN ''
            ELSE '<p>' || array_to_string(list_transform(
                     generate_series(1, 40),
                     j -> 'w' || substr(md5(((doc_id // 5) % 25)
                                            || ':' || j), 1, 6)), ' ')
                 || '</p>' END
    || '<P>' || array_to_string(list_transform(
           generate_series(1, 5),
           j -> 'p' || substr(md5('pg:' || (doc_id // 5) || ':' || j),
                              1, 6)), ' ')
    || '</P><footer><a href="/p">Privacy</a> (c) corp</footer>'
    || '</body></html>'
"""


@query(
    "crawl_stage1_funnel",
    oracle=_render_html_regexes("""
    WITH {front},
    capped AS (
        SELECT doc_id, rn FROM ranked WHERE rn <= {cap}
    ),
    html AS (
        SELECT doc_id, rn, {s1html} AS hx FROM capped
    ),
    {extract},
    flags AS (
        SELECT c.doc_id,
               coalesce(e.xt, '') AS xt,
               length(coalesce(e.xt, '')) AS xchars,
               len(string_split_regex(trim(coalesce(e.xt, '')),
                                      '\\s+')) AS xtok
        FROM capped c LEFT JOIN ex e USING (doc_id)
    ),
    gate AS (
        SELECT doc_id, xt FROM flags
        WHERE xchars >= 120 AND xtok BETWEEN 15 AND 1000
    ),
    {neardup},
    merged AS (
        SELECT f.doc_id, f.xchars, f.xtok, n.first_seen
        FROM flags f LEFT JOIN nd n USING (doc_id)
    )
    SELECT stage, n_docs FROM (
        SELECT 'a_domain_cap' AS stage,
               CAST(count(*) AS BIGINT) AS n_docs FROM merged
        UNION ALL
        SELECT 'b_min_content', CAST(count_if(xchars >= 120) AS BIGINT)
        FROM merged
        UNION ALL
        SELECT 'c_token_band',
               CAST(count_if(first_seen IS NOT NULL) AS BIGINT)
        FROM merged
        UNION ALL
        SELECT 'd_near_dup',
               CAST(count_if(first_seen = doc_id) AS BIGINT)
        FROM merged
        UNION ALL
        SELECT 'e_kept_docid_sum',
               CAST(sum(CASE WHEN first_seen = doc_id THEN doc_id
                             ELSE 0 END) AS BIGINT)
        FROM merged
    )
    """.replace("{front}", _FUNNEL_FRONT_CTES)
    .replace("{extract}", _FUNNEL_EXTRACT_CTES)
    .replace("{neardup}", _FUNNEL_NEARDUP_CTES)
    .replace("{nd_src}", "gate")
    .replace("{distinct}", "DISTINCT")
    .replace("{url}", _FUNNEL_URL_SQL)
    .replace("{s1html}", _S1_HTML_SQL)
    .replace("{track_re}", _urlsmod.TRACKING_PARAM_RE)
    .replace("{reg_dom}", _urlsmod.registered_domain_psl_sql(
        "host", _urlsmod.load_psl_file()))
    .replace("{cap}", str(_FUNNEL_CAP))),
)
def crawl_stage1_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 1 of the crawl funnel — content near-dedup on the
    EXTRACTED text, composed downstream of the full stage-0 chain in
    production order (RefinedWeb §3: URL dedup → extraction → quality
    gates → FUZZY dedup):

    registered-domain cap survivors → HTML main-text extraction →
    min-content + token-band gates → MinHash-LSH near-dup with
    first-occurrence keep: a document survives iff it is the
    LOWEST-doc_id member of EVERY band bucket it occupies — i.e. it
    is dropped when any bucket holds an earlier-crawled document,
    surviving or already-dropped (A kills B, and B's later
    bucket-mate C dies too even if C never shares a bucket with A).
    Deliberately conservative and one-pass: stricter than
    drop-on-earlier-SURVIVOR, cheaper than full connected-component
    clustering (no iteration), and the oracle implements the
    identical rule.  ``e_kept_docid_sum`` pins WHICH documents
    survived, not just how many.

    Scale shape: ONE scan, one lineage — gate-failed rows ride the
    dedup chain in singleton sentinel buckets instead of a
    join-back-to-flags branch, because a self-join of two frames
    derived from the same front end re-computes the scan + canonical
    groupBy + cap window twice (the first cut of this query did
    exactly that; ``.explain`` showed two parquet scans).  The
    near-dup stage adds three exchanges beyond stage 0: the signature
    collapse (explode shingles → ONE map-side-combined groupBy(doc)
    computing all 8 mins, the ``operators/dedup.py::
    minhash_signatures`` algebra inlined to carry the gate flags; the
    band groupBy reuses its partitioning, no extra shuffle), the
    band-bucket window, and the per-doc collapse.  Buckets are
    md5-uniform except true duplicate clusters, whose size the
    stage-0 domain cap already bounds — the hot-bucket skew a raw
    crawl would have dies at the cap, which is exactly why production
    runs the cap first.  Extraction runs only on cap survivors and
    real MinHash work only on gate survivors.
    """
    from ..operators.html import extract_main_text

    html = _s1_fixture_html()
    capped = _funnel_ranked_keepers(spark, sf_dir) \
        .filter(F.col("rn") <= _FUNNEL_CAP).select("doc_id")
    xt = extract_main_text(html)["extracted_text"]
    flags = capped.select(
        "doc_id", F.coalesce(xt, F.lit("")).alias("xt"),
    ).select(
        "doc_id", "xt",
        F.length("xt").alias("xchars"),
        F.size(F.split(F.trim("xt"), r"\s+")).alias("xtok"),
    ).withColumn(
        "gated", (F.col("xchars") >= 120)
        & F.col("xtok").between(15, 1000))
    # ONE lineage, one scan: gate-FAILED rows ride through the dedup
    # chain instead of being joined back from a second branch (a
    # flags/nd self-join re-computes the whole front end — scan,
    # canonical groupBy, cap window — twice; at 100 TB that doubles
    # the dominant cost).  The chain itself is the shared
    # _funnel_neardup helper (one definition for both funnels).
    nd = _funnel_neardup(flags, ("doc_id", "gated", "xchars"))
    kept = F.col("gated") & (F.col("first_seen") == F.col("doc_id"))
    agg = nd.agg(
        F.count(F.lit(1)).alias("a_domain_cap"),
        F.count_if(F.col("xchars") >= 120).alias("b_min_content"),
        F.count_if(F.col("gated")).alias("c_token_band"),
        F.count_if(kept).alias("d_near_dup"),
        F.sum(F.when(kept, F.col("doc_id")).otherwise(F.lit(0)))
        .cast("bigint").alias("e_kept_docid_sum"),
    )
    return agg.select(F.expr(
        "stack(5, 'a_domain_cap', a_domain_cap, "
        "'b_min_content', b_min_content, 'c_token_band', c_token_band, "
        "'d_near_dup', d_near_dup, "
        "'e_kept_docid_sum', e_kept_docid_sum) AS (stage, n_docs)"))


@query(
    "registered_domain_psl_caps",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               'https://' || {host} || '/d/' || doc_id AS url
        FROM documents
    ),
    hosts AS (
        SELECT doc_id,
               regexp_extract(url, '^https?://([^/:?#]+)', 1) AS host
        FROM raw
    ),
    reg AS (
        SELECT doc_id, host, {reg_dom} AS reg_dom FROM hosts
    ),
    ranked AS (
        SELECT doc_id, host, reg_dom,
               row_number() OVER (PARTITION BY reg_dom ORDER BY doc_id)
                   AS rn
        FROM reg
    )
    SELECT reg_dom,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(length(reg_dom)
                - length(replace(reg_dom, '.', '')) AS BIGINT)
               AS n_dots,
           CAST(count_if(rn <= 5) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn <= 5 THEN doc_id ELSE 0 END)
                AS BIGINT) AS kept_docid_sum
    FROM ranked
    GROUP BY reg_dom
    """.replace("{host}", _CAP_HOST_SQL)
    .replace("{reg_dom}", _urlsmod.registered_domain_psl_sql(
        "host", _urlsmod.load_psl_file())),
)
def registered_domain_psl_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain caps through the PRODUCTION registered-domain path: the
    FULL vendored 9,506-rule Public Suffix List snapshot as
    broadcast-joined lookup tables (``functions/urls.py::
    with_registered_domain_psl`` + ``load_psl_file`` — round-12: the
    snapshot the round-11 hash gate validated is now what this
    production form actually loads, not the fixture tuple).  Same
    subdomain-sharded fixture as ``url_domain_caps`` but a tighter cap
    (5) and an ``n_dots`` column that pins the label-count of every
    publisher key, so a suffix-table miss (folding pub5.co.uk to
    co.uk-level or keeping 4 labels) is a value failure, not just a
    grouping change.

    Scale shape: identical to ``url_domain_caps`` plus per-tier
    broadcast hash joins against the suffix tables (build side = the
    PSL tiers, ~99 KB total — broadcast, zero shuffle of the fact
    side).  The oracle computes the registered domain with the same
    full-grammar rule set inlined (``registered_domain_psl_sql``) —
    the two paths provably agree under the hash gate, not just in
    pytest.
    """
    from ..functions.urls import load_psl_file, with_registered_domain_psl

    hosts = _cap_hosts(spark, sf_dir)
    reg = with_registered_domain_psl(hosts, "host", out_col="reg_dom",
                                     suffix_rows=load_psl_file())
    w = Window.partitionBy("reg_dom").orderBy("doc_id")
    ranked = reg.withColumn("rn", F.row_number().over(w))
    cap = 5
    grouped = ranked.groupBy("reg_dom").agg(
        F.count_distinct(F.col("host")).alias("n_hosts"),
        F.count_if(F.col("rn") <= cap).alias("n_kept"),
        F.sum(F.when(F.col("rn") <= cap, F.col("doc_id"))
              .otherwise(F.lit(0))).alias("kept_docid_sum"),
    )
    # n_dots is a function of the GROUP KEY — derive it after the
    # aggregate (round-10 second-pass review: two first() aggregates
    # duplicated the expression for no reason)
    n_dots = (F.length("reg_dom")
              - F.length(F.replace(F.col("reg_dom"), F.lit("."),
                                   F.lit("")))).cast("bigint")
    return grouped.select(
        "reg_dom", "n_hosts", n_dots.alias("n_dots"), "n_kept",
        "kept_docid_sum")


# Full-snapshot PSL fixture: 12 host classes (doc_id % 12), each chosen
# to force a DIFFERENT branch of the PSL §Algorithm against the real
# vendored 9,506-rule list — 1-label wildcard (*.ck), exception under it
# (!www.ck), 3-label exception under a 2-label wildcard
# (!city.kawasaki.jp / *.kawasaki.jp), the wildcard itself, an IDN rule
# in punycode host form (公司.cn → xn--55qx5d.cn), a 5-label
# private-section rule (s3.dualstack.us-east-1.amazonaws.com), a plain
# ICANN 2-label rule (co.uk), host-IS-suffix passthrough for both an
# exact (co.uk) and a wildcard (blog.kawasaki.jp) suffix, an IPv4
# literal, case + trailing-FQDN-dot normalization over a private rule
# (GitHub.IO.), and an unlisted TLD hitting the implicit default.
# Sharded subdomains ((doc_id // 12) % 3) keep the cap meaningful.
_PSL_SNAPSHOT_HOST_SQL = """
    CASE doc_id % 12
      WHEN 0 THEN 'cdn' || ((doc_id // 12) % 3) || '.news.foo.ck'
      WHEN 1 THEN 'cdn' || ((doc_id // 12) % 3) || '.www.ck'
      WHEN 2 THEN 'a' || ((doc_id // 12) % 3) || '.sub.city.kawasaki.jp'
      WHEN 3 THEN 'c' || ((doc_id // 12) % 3) || '.pub.blog.kawasaki.jp'
      WHEN 4 THEN 'shop' || ((doc_id // 12) % 3) || '.brand.xn--55qx5d.cn'
      WHEN 5 THEN 'b' || ((doc_id // 12) % 3)
                  || '.myapp.s3.dualstack.us-east-1.amazonaws.com'
      WHEN 6 THEN 'news' || ((doc_id // 12) % 3) || '.pub.co.uk'
      WHEN 7 THEN 'co.uk'
      WHEN 8 THEN '192.168.11.9'
      WHEN 9 THEN 'CDN' || ((doc_id // 12) % 3) || '.Pub.GitHub.IO.'
      WHEN 10 THEN 'cdn' || ((doc_id // 12) % 3) || '.site.zz-internal'
      ELSE 'blog.kawasaki.jp'
    END
"""


@query(
    "psl_snapshot_domains",
    oracle="""
    WITH hosts AS (
        SELECT doc_id, {host} AS host FROM documents
    ),
    reg AS (
        SELECT doc_id, host, {reg_dom} AS reg_dom FROM hosts
    ),
    ranked AS (
        SELECT doc_id, host, reg_dom,
               row_number() OVER (PARTITION BY reg_dom ORDER BY doc_id)
                   AS rn
        FROM reg
    )
    SELECT reg_dom,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(length(reg_dom)
                - length(replace(reg_dom, '.', '')) AS BIGINT)
               AS n_dots,
           CAST(count_if(rn <= 7) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn <= 7 THEN doc_id ELSE 0 END)
                AS BIGINT) AS kept_docid_sum
    FROM ranked
    GROUP BY reg_dom
    """.replace("{host}", _PSL_SNAPSHOT_HOST_SQL)
    .replace("{reg_dom}", _urlsmod.registered_domain_psl_sql(
        "host", _urlsmod.load_psl_file())),
)
def psl_snapshot_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain caps under the FULL vendored Public Suffix
    List snapshot — 9,506 rules (5,473/2,302/70/66 exact rules of
    2/3/4/5 labels, 107 wildcards, 8 exceptions, 466 IDN rules), the
    real-scale validation `registered_domain_psl_caps`'s fixture rule
    counts could not give.  The host fixture forces every branch of the
    PSL §Algorithm (see ``_PSL_SNAPSHOT_HOST_SQL``); the oracle twin
    interpolates the SAME rule set as ~270 KB of per-tier IN-lists
    (``registered_domain_psl_sql``), so wildcard occupancy, exception
    precedence, IDNA encoding and the implicit default are all
    value-checked under the driver's hash gate at real rule counts.

    Scale shape: ten per-tier BROADCAST hash joins (build sides 1–5,473
    rows — the full PSL broadcasts at ~99 KB of strings), zero
    shuffles of the fact side before the one cap-window exchange; the
    plan is the production plan, only the rule tables grow.  Broadcast
    tier sizes are pinned in tests/test_psl_snapshot.py and recorded in
    BASELINE.md.
    """
    from ..functions.urls import load_psl_file, with_registered_domain_psl

    docs = table(spark, sf_dir, "documents")
    p = F.col("doc_id") % 12
    s = F.expr("(doc_id div 12) % 3").cast("string")

    def _sub(prefix: str, suffix: str) -> Column:
        return F.concat(F.lit(prefix), s, F.lit(suffix))

    host_fx = (
        F.when(p == 0, _sub("cdn", ".news.foo.ck"))
        .when(p == 1, _sub("cdn", ".www.ck"))
        .when(p == 2, _sub("a", ".sub.city.kawasaki.jp"))
        .when(p == 3, _sub("c", ".pub.blog.kawasaki.jp"))
        .when(p == 4, _sub("shop", ".brand.xn--55qx5d.cn"))
        .when(p == 5, _sub(
            "b", ".myapp.s3.dualstack.us-east-1.amazonaws.com"))
        .when(p == 6, _sub("news", ".pub.co.uk"))
        .when(p == 7, F.lit("co.uk"))
        .when(p == 8, F.lit("192.168.11.9"))
        .when(p == 9, _sub("CDN", ".Pub.GitHub.IO."))
        .when(p == 10, _sub("cdn", ".site.zz-internal"))
        .otherwise(F.lit("blog.kawasaki.jp"))
    )
    hosts = docs.select("doc_id", host_fx.alias("host"))
    reg = with_registered_domain_psl(
        hosts, "host", out_col="reg_dom", suffix_rows=load_psl_file())
    w = Window.partitionBy("reg_dom").orderBy("doc_id")
    ranked = reg.withColumn("rn", F.row_number().over(w))
    cap = 7
    grouped = ranked.groupBy("reg_dom").agg(
        F.count_distinct(F.col("host")).alias("n_hosts"),
        F.count_if(F.col("rn") <= cap).alias("n_kept"),
        F.sum(F.when(F.col("rn") <= cap, F.col("doc_id"))
              .otherwise(F.lit(0))).alias("kept_docid_sum"),
    )
    n_dots = (F.length("reg_dom")
              - F.length(F.replace(F.col("reg_dom"), F.lit("."),
                                   F.lit("")))).cast("bigint")
    return grouped.select(
        "reg_dom", "n_hosts", n_dots.alias("n_dots"), "n_kept",
        "kept_docid_sum")


# Stage-2 page fixture: the stage-1 template/tail construction PLUS a
# spam class — pages where gid % 13 = 11 replace the 5-word tail with
# ONE word repeated 60 times (keyword-stuffing boilerplate), so the
# repetition-ratio quality gate has something real to kill.  Kept as
# its own literal so crawl_stage1_funnel's validated fixture is not
# churned.
def _s2_fixture_html() -> Column:
    """The stage-2 page-HTML fixture as a Column over ``doc_id`` (the
    Spark twin of ``_S2_HTML_SQL``) — split out of the funnel so the
    streaming stage-2 parity test renders the EXACT pages the batch
    funnel renders (one definition; the ``_s1_fixture_html``
    precedent)."""
    gid_s = F.expr("doc_id div 5").cast("string")
    tid = F.expr("(doc_id div 5) % 25").cast("string")
    shared = F.array_join(F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda j: F.concat(F.lit("w"), F.substring(
            F.md5(F.concat(tid, F.lit(":"), j.cast("string"))),
            1, 6))), " ")
    spam_word = F.concat(F.lit("p"), F.substring(
        F.md5(F.concat(F.lit("pg:"), gid_s, F.lit(":1"))), 1, 6))
    tail = F.when(
        F.expr("(doc_id div 5) % 13") == 11,
        F.array_join(F.array_repeat(spam_word, 60), " "),
    ).otherwise(F.array_join(F.transform(
        F.sequence(F.lit(1), F.lit(5)),
        lambda j: F.concat(F.lit("p"), F.substring(
            F.md5(F.concat(F.lit("pg:"), gid_s, F.lit(":"),
                           j.cast("string"))), 1, 6))), " "))
    return F.concat(
        F.lit('<html><head><script>var t=1;</script></head><body>'
              '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'),
        F.when(F.expr("(doc_id div 5) % 11") == 7, F.lit(""))
        .otherwise(F.concat(F.lit("<p>"), shared, F.lit("</p>"))),
        F.lit("<P>"), tail,
        F.lit('</P><footer><a href="/p">Privacy</a> (c) corp</footer>'
              '</body></html>'),
    )


_S2_HTML_SQL = """
    '<html><head><script>var t=1;</script></head><body>'
    || '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
    || CASE WHEN (doc_id // 5) % 11 = 7 THEN ''
            ELSE '<p>' || array_to_string(list_transform(
                     generate_series(1, 40),
                     j -> 'w' || substr(md5(((doc_id // 5) % 25)
                                            || ':' || j), 1, 6)), ' ')
                 || '</p>' END
    || '<P>' || CASE WHEN (doc_id // 5) % 13 = 11
            THEN array_to_string(list_transform(
                     generate_series(1, 60),
                     j -> 'p' || substr(md5('pg:' || (doc_id // 5)
                                            || ':1'), 1, 6)), ' ')
            ELSE array_to_string(list_transform(
                     generate_series(1, 5),
                     j -> 'p' || substr(md5('pg:' || (doc_id // 5)
                                            || ':' || j), 1, 6)), ' ')
            END
    || '</P><footer><a href="/p">Privacy</a> (c) corp</footer>'
    || '</body></html>'
"""


@query(
    "crawl_stage2_funnel",
    oracle=_render_html_regexes("""
    WITH {front},
    capped AS (
        SELECT doc_id, reg_dom, rn FROM ranked WHERE rn <= {cap}
    ),
    html AS (
        SELECT doc_id, rn, {s2html} AS hx FROM capped
    ),
    {extract},
    flags AS (
        SELECT c.doc_id, c.reg_dom,
               coalesce(e.xt, '') AS xt,
               length(coalesce(e.xt, '')) AS xchars,
               len(string_split_regex(trim(coalesce(e.xt, '')),
                                      '\\s+')) AS xtok
        FROM capped c LEFT JOIN ex e USING (doc_id)
    ),
    gated AS (
        SELECT *, (xchars >= 120 AND xtok BETWEEN 15 AND 1000)
                      AS is_gated
        FROM flags
    ),
    gate AS (
        SELECT doc_id, xt FROM gated WHERE is_gated
    ),
    {neardup},
    gstats AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS total_g,
               CAST(count(DISTINCT shingle) AS BIGINT) AS distinct_g
        FROM grams GROUP BY doc_id
    ),
    merged AS (
        SELECT g.doc_id, g.reg_dom, g.xtok, g.is_gated,
               n.first_seen, s.total_g, s.distinct_g,
               (g.is_gated AND n.first_seen = g.doc_id) AS nd_kept
        FROM gated g
        LEFT JOIN nd n USING (doc_id)
        LEFT JOIN gstats s USING (doc_id)
    ),
    scored AS (
        SELECT *,
               (nd_kept AND NOT
                ((total_g - distinct_g) * 2 > total_g)) AS quality,
               (nd_kept AND NOT
                ((total_g - distinct_g) * 2 > total_g)
                AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'b2')
                   AS sampled
        FROM merged
    ),
    budget AS (
        SELECT *,
               sum(CASE WHEN sampled THEN xtok ELSE 0 END)
                   OVER (PARTITION BY reg_dom ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum_tok
        FROM scored
    )
    SELECT stage, n_docs FROM (
        SELECT 'a_near_dup' AS stage,
               CAST(count_if(nd_kept) AS BIGINT) AS n_docs FROM budget
        UNION ALL
        SELECT 'b_quality', CAST(count_if(quality) AS BIGINT)
        FROM budget
        UNION ALL
        SELECT 'c_sampled', CAST(count_if(sampled) AS BIGINT)
        FROM budget
        UNION ALL
        SELECT 'd_token_budget',
               CAST(count_if(sampled AND cum_tok <= 100) AS BIGINT)
        FROM budget
        UNION ALL
        SELECT 'e_kept_docid_sum',
               CAST(sum(CASE WHEN sampled AND cum_tok <= 100
                             THEN doc_id ELSE 0 END) AS BIGINT)
        FROM budget
    )
    """.replace("{front}", _FUNNEL_FRONT_CTES)
    .replace("{extract}", _FUNNEL_EXTRACT_CTES)
    .replace("{neardup}", _FUNNEL_NEARDUP_CTES)
    .replace("{nd_src}", "gate")
    .replace("{distinct}", "")
    .replace("{url}", _FUNNEL_URL_SQL)
    .replace("{s2html}", _S2_HTML_SQL)
    .replace("{track_re}", _urlsmod.TRACKING_PARAM_RE)
    .replace("{reg_dom}", _urlsmod.registered_domain_psl_sql(
        "host", _urlsmod.load_psl_file()))
    .replace("{cap}", str(_FUNNEL_CAP))),
)
def crawl_stage2_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 2 of the crawl funnel — the selection wave a production
    pipeline runs AFTER fuzzy dedup (RefinedWeb/FineWeb order: dedup →
    quality filter → sampling/mixing → budget cut):

    stage-1 near-dup survivors → repetition-ratio quality gate (a
    keyword-stuffed page where over half the word 3-grams are repeats
    is boilerplate; the fixture's spam class — one word repeated 60
    times — exists to be killed by it) → deterministic ~70% hash
    sample (first md5 byte ≤ 0xb2: membership is a pure row property,
    reproducible on any engine/partitioning — the ``sample_by_hash``
    idiom) → per-publisher token budget (cumulative extracted-token
    count in crawl order capped at 100 — the balanced-mixing cut that
    stops one publisher's long pages from dominating the sampled
    corpus).

    Single lineage, ONE scan: the gram explosion feeds BOTH the
    MinHash signatures and the repetition counts (min() over a
    multiset equals min() over its set, so the non-distinct gram
    stream serves both; total/distinct ride the same groupBy), the
    repetition test is an exact integer cross-product
    ((total-distinct)*2 > total ⇔ ratio > 0.5 — no float boundary),
    and the budget cumsum is a conditional window sum over ALL rows
    (sampled rows contribute their tokens, others contribute 0) so no
    stage needs a second pass over the frame.  Measured plan: SAME
    exchange count as stage 1 (six) — the per-publisher budget
    window's new exchange is offset because ``reg_dom`` rides the
    signature groupBy keys, whose hash partitioning the band groupBy
    then reuses; dropping ``reg_dom`` from the keys would silently
    add a shuffle, which is why it is a key and not a rejoined
    column.
    """
    from ..operators.html import extract_main_text

    html = _s2_fixture_html()
    capped = _funnel_ranked_keepers(spark, sf_dir) \
        .filter(F.col("rn") <= _FUNNEL_CAP).select("doc_id", "reg_dom")
    xt = extract_main_text(html)["extracted_text"]
    flags = capped.select(
        "doc_id", "reg_dom", F.coalesce(xt, F.lit("")).alias("xt"),
    ).select(
        "doc_id", "reg_dom", "xt",
        F.length("xt").alias("xchars"),
        F.size(F.split(F.trim("xt"), r"\s+")).alias("xtok"),
    ).withColumn(
        "gated", (F.col("xchars") >= 120)
        & F.col("xtok").between(15, 1000))
    # one gram stream serves MinHash AND the repetition counts (the
    # shared _funnel_neardup chain with with_counts=True keeps the
    # gram stream non-distinct and adds total_g/distinct_g to the
    # same groupBy; the stage-1 sentinel trick keeps gate-failed rows
    # in the lineage)
    keys = ("doc_id", "reg_dom", "gated", "xtok")
    nd = _funnel_neardup(flags, keys, with_counts=True)
    nd_kept = F.col("gated") & (F.col("first_seen") == F.col("doc_id"))
    spammy = (F.col("total_g") - F.col("distinct_g")) * 2 \
        > F.col("total_g")
    quality = nd_kept & ~spammy
    sampled = quality & (F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 2) <= "b2")
    scored = nd.select(
        *keys, "total_g", "distinct_g",
        nd_kept.alias("nd_kept"), quality.alias("quality"),
        sampled.alias("sampled"))
    wb = Window.partitionBy("reg_dom").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    budget = scored.withColumn(
        "cum_tok",
        F.sum(F.when(F.col("sampled"), F.col("xtok"))
              .otherwise(F.lit(0))).over(wb))
    in_budget = F.col("sampled") & (F.col("cum_tok") <= 100)
    agg = budget.agg(
        F.count_if(F.col("nd_kept")).alias("a_near_dup"),
        F.count_if(F.col("quality")).alias("b_quality"),
        F.count_if(F.col("sampled")).alias("c_sampled"),
        F.count_if(in_budget).alias("d_token_budget"),
        F.sum(F.when(in_budget, F.col("doc_id")).otherwise(F.lit(0)))
        .cast("bigint").alias("e_kept_docid_sum"),
    )
    return agg.select(F.expr(
        "stack(5, 'a_near_dup', a_near_dup, 'b_quality', b_quality, "
        "'c_sampled', c_sampled, 'd_token_budget', d_token_budget, "
        "'e_kept_docid_sum', e_kept_docid_sum) AS (stage, n_docs)"))
