"""Text-analysis operators for training-data pipelines.

Not present in the reference (its per-record string ops are SURVEY §2.9);
these are the north-star additions: token counting, quality scoring,
language-ID heuristic, document fingerprinting.  All pure Column
expressions — JVM-side, codegen-friendly, no UDFs — so they run at
100 TB as narrow map stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker sets for the n-gram/stopword heuristic.  Real
# deployments swap in fastText/CLD3 via mapInPandas (see multimodal.py for
# the stub pattern); the heuristic keeps the plumbing testable.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|a|of|and|to)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "es": r"\b(el|la|los|que|y)\b",
    "fr": r"\b(le|la|les|et|est)\b",
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (the BPE-ish regex variant is
    ``bpe_ish_tokens``)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_tokens(col: Column | str) -> Column:
    """Subword-flavored tokenization: splits on whitespace AND
    letter/digit/punct boundaries — a cheap stand-in for a BPE pre-token
    pass, all in one regex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(
        c, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring feature block: length, token stats, punctuation /
    stopword / non-alpha ratios.  Composable with a downstream filter
    (e.g. Gopher-style rules)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = tokens(t)
    n_tokens = F.size(toks)
    # try_divide, not `/`: a scraped corpus always contains SOME empty
    # documents, and under Spark 4's default ANSI mode a 0-char/0-token
    # denominator would raise DIVIDE_BY_ZERO and fail the whole scan-
    # fused stage.  NULL ratios for empty text are the honest value.
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "avg_token_len",
            F.round(F.try_divide(n_chars - n_tokens + 1, n_tokens), 4),
        )
        .withColumn(
            "punct_ratio",
            F.round(
                F.try_divide(
                    F.length(F.regexp_replace(t, r"[^.,;:!?'\"]", "")),
                    n_chars), 4
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                F.try_divide(
                    F.regexp_count(t, F.lit(LANG_MARKERS["en"])),
                    n_tokens), 4
            ),
        )
        .withColumn(
            "nonalpha_ratio",
            F.round(
                F.try_divide(
                    F.length(F.regexp_replace(t, r"[a-zA-Z\s]", "")),
                    n_chars), 4
            ),
        )
    )


# Gopher repetition-free quality rules (Rae et al. 2021, Table A1 — public
# paper thresholds).  Stop-set is the paper's 8-word list.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rule_flags(df: DataFrame, text_col: str = "text",
                      min_words: int = 50, max_words: int = 100_000,
                      min_mean_word_len: float = 3.0,
                      max_mean_word_len: float = 10.0,
                      max_symbol_ratio: float = 0.1,
                      max_bullet_line_frac: float = 0.9,
                      max_ellipsis_line_frac: float = 0.3,
                      min_alpha_word_frac: float = 0.8,
                      min_stopwords: int = 2) -> DataFrame:
    """Gopher-style document quality rules as one narrow projection: each
    rule becomes a boolean ``fail_*`` column plus ``pass_all``.

    All pure Column expressions over one staged token array — no UDF, no
    shuffle; at 100 TB this is a map stage fused into the scan.  The
    thresholds are the paper's; callers tune per corpus.  Rules:

    * word count within [min_words, max_words]
    * mean word length within [3, 10]
    * symbol-to-word ratio (# and …) below 0.1
    * < 90% of lines bullet-started, < 30% ellipsis-ended
    * ≥ 80% of words contain an alphabetic character
    * ≥ 2 of the 8 Gopher stop words present
    """
    t = F.col(text_col)
    df = df.withColumn("_w", tokens(t))
    w = F.col("_w")
    n_words = F.size(w)
    # mean word length = non-whitespace chars / words
    mean_len = F.length(F.regexp_replace(t, r"\s", "")) / n_words
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    # Both ellipsis forms: the three-dot ASCII spelling and the single
    # U+2026 character (the common typographic form in scraped web text).
    n_ellipsis = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / 3 + (
        F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    )
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike(r"^[-*•]"))
    )
    ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda x: F.rtrim(x).endswith("...")
            | F.rtrim(x).endswith("…"),
        )
    )
    alpha_words = F.size(F.filter(w, lambda x: x.rlike("[a-zA-Z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.transform(w, F.lower),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    return (
        df.withColumn(
            "fail_word_count",
            (n_words < min_words) | (n_words > max_words),
        )
        .withColumn(
            "fail_mean_word_len",
            (mean_len < min_mean_word_len) | (mean_len > max_mean_word_len),
        )
        .withColumn(
            "fail_symbol_ratio",
            (n_hash + n_ellipsis) / n_words > max_symbol_ratio,
        )
        .withColumn(
            "fail_bullet_lines",
            bullet_lines / n_lines > max_bullet_line_frac,
        )
        .withColumn(
            "fail_ellipsis_lines",
            ellipsis_lines / n_lines > max_ellipsis_line_frac,
        )
        .withColumn(
            "fail_alpha_words",
            alpha_words / n_words < min_alpha_word_frac,
        )
        .withColumn("fail_stopwords", stop_hits < min_stopwords)
        .withColumn(
            "pass_all",
            ~(
                F.col("fail_word_count")
                | F.col("fail_mean_word_len")
                | F.col("fail_symbol_ratio")
                | F.col("fail_bullet_lines")
                | F.col("fail_ellipsis_lines")
                | F.col("fail_alpha_words")
                | F.col("fail_stopwords")
            ),
        )
        .drop("_w")
    )


def detect_lang(col: Column | str) -> Column:
    """Marker-count argmax language ID.  Ties break by fixed language
    order (en, de, es, fr), 'und' when nothing matches."""
    t = F.col(col) if isinstance(col, str) else col
    scores = [
        (lang, F.regexp_count(t, F.lit(pat)))
        for lang, pat in LANG_MARKERS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    for lang, s in reversed(scores):
        out = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(out)
    return out


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprint/dedup: lowercase + whitespace
    collapse + trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint over normalized text.  md5 (not
    xxhash64) so external engines can reproduce it byte-for-byte."""
    return F.md5(normalize_text(col))


def word_kgram_hash(toks_col: Column | str, i: Column, k: int) -> Column:
    """md5 of the k-token window starting at 0-based index ``i`` over a
    STAGED token-array column — THE span-fingerprint convention, defined
    once (round-9 review: three verbatim copies lived in
    ``duplicate_span_stats`` / ``remove_duplicate_spans`` / the
    split-decontamination audit; a tokenization or hashing change
    applied to one would silently desynchronize the dedup path from the
    audits and every DuckDB oracle built on
    ``md5(array_to_string(list_slice(t, i, i+k-1), ' '))``)."""
    return F.md5(F.concat_ws(" ", F.slice(toks_col, i + 1, k)))


# PII patterns kept RE2-compatible (no backrefs/lookaround) so the same
# pattern string runs identically under Java regex (Spark) and RE2-family
# engines (DuckDB oracle, Go/Rust scrubbers).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "hex_secret": r"\b[0-9a-f]{32,}\b",
}


def redact_pii(df: DataFrame, text_col: str = "text",
               patterns: dict[str, str] = PII_PATTERNS) -> DataFrame:
    """Training-data scrub: replace each PII category with a typed
    placeholder (``<EMAIL>`` …) and count occurrences per category.

    Pure ``regexp_replace``/``regexp_count`` expressions — one narrow
    codegen stage, no shuffle, so the scrub rides along any scan at
    100 TB.  Counts are computed on the ORIGINAL text (replacement order
    cannot mask a category)."""
    t = F.col(text_col)
    out = df
    redacted = t
    for name, pat in patterns.items():
        out = out.withColumn(f"n_{name}", F.regexp_count(t, F.lit(pat)))
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    return out.withColumn("redacted", redacted)


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """All word n-grams (NOT deduplicated — the dedup shingle variant is
    ``operators.dedup.word_shingles``).

    Documents shorter than ``n`` tokens yield their whole token list as
    one partial gram — ``try_element_at`` (NULL past the end, skipped by
    ``concat_ws``) rather than ``element_at``, which *throws* under
    ANSI semantics and would fail the whole job on the first short doc.
    Mirrors the truncating ``list_slice`` the DuckDB oracles use.

    NOTE the returned Column inlines the token split into every
    ``try_element_at`` reference — fine for one-shot use, but DataFrame
    pipelines should go through :func:`with_word_ngrams`, which stages the
    split as its own projection so it is evaluated once per row instead of
    ``n``× per gram."""
    toks = F.split(normalize_text(col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.try_element_at(toks, i + j + 1)
                                          for j in range(n)])
    )


def with_word_ngrams(df: DataFrame, text_col: str | Column, n: int,
                     out_col: str = "grams", keep: tuple[str, ...] = (),
                     distinct: bool = False) -> DataFrame:
    """``keep`` columns + the word n-gram ARRAY of ``text_col``, with the
    token split STAGED as its own projection.

    A single nested Column (``word_ngrams``) re-inlines the
    ``split(normalize_text(...))`` into every ``try_element_at`` — the
    split is then evaluated up to ``n``× per gram per row.  Aliasing the
    token array first and referencing the bound attribute keeps it to one
    evaluation: Catalyst's CollapseProject declines to merge the two
    projections because the alias is non-cheap and multiply-referenced
    (same mechanism as the staged char-entropy fold below; measured ~30%
    on the sf0.01 bigram profile).  Both stages stay narrow — no shuffle,
    one whole-stage-codegen span."""
    src = F.col(text_col) if isinstance(text_col, str) else text_col
    cols = list(keep)
    d = df.select(*cols, F.split(normalize_text(src), " ").alias("_toks"))
    idx = F.sequence(F.lit(0), F.greatest(F.size("_toks") - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.try_element_at("_toks", i + j + 1)
                                          for j in range(n)])
    )
    if distinct:
        grams = F.array_distinct(grams)
    return d.select(*cols, grams.alias(out_col))


def repetition_ratio(col: Column | str, n: int = 3) -> Column:
    """Within-document repetition: 1 − distinct/total word n-grams.
    High values flag boilerplate/spam — a standard quality cut alongside
    the ``quality_features`` ratios.  Narrow array math, no shuffle."""
    grams = word_ngrams(col, n)
    return F.round(
        F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams), 4
    )


def benchmark_ngram_hits(corpus: DataFrame, bench: DataFrame, n: int = 4,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: per corpus document, the number of
    distinct word ``n``-grams it shares with a held-out benchmark set.
    Docs with any overlap are dropped (or flagged) before training so
    eval numbers aren't inflated by memorized test items.

    Scale shape: eval suites are tiny relative to a 100 TB corpus, so the
    benchmark's distinct n-gram set is built once and **broadcast** — the
    corpus side is a narrow explode followed by a broadcast inner join
    that discards every non-matching gram immediately.  Only the hits
    (rare by construction) reach the ``groupBy(doc)`` — the corpus itself
    is never shuffled.  For suites too big to broadcast, swap the join
    for a bloom-filter pushdown; the operator contract is unchanged.
    """
    grams = lambda d: with_word_ngrams(  # noqa: E731
        d, text_col, n, keep=(id_col,), distinct=True
    ).select(F.col(id_col), F.explode("grams").alias("gram"))
    bench_grams = grams(bench).select("gram").distinct()
    return (
        grams(corpus)
        .join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )


def add_char_entropy(df: DataFrame, text_col: str = "text",
                     out_col: str = "entropy_nats",
                     alphabet: str = "abcdefghijklmnopqrstuvwxyz ",
                     ) -> DataFrame:
    """Shannon entropy (nats) of the character distribution over
    ``alphabet``, computed on normalized text.  Low entropy flags
    degenerate documents (single-char floods, padding); pairs with
    ``repetition_ratio`` as a quality cut.

    Staged as three projections — normalized text, per-char count array,
    entropy fold — so each is evaluated ONCE per row.  (A single nested
    Column would inline the 27 count subexpressions into every −p·ln p
    term: ~27² string ops per row, and the resulting expression tree
    overflows the 64 KB codegen method limit into interpreted eval —
    measured 10× slower.  Catalyst's CollapseProject keeps these stages
    separate because the aliased expressions are non-cheap and
    multiply-referenced.)  The fold is a fixed-order left-associated sum
    so any engine evaluating IEEE doubles in the same order reproduces
    the value to the last ULP.  No shuffle, no UDF.
    """
    counts = F.array(*[
        F.length(F.col("_ce_norm"))
        - F.length(F.replace(F.col("_ce_norm"), F.lit(ch), F.lit("")))
        for ch in alphabet
    ])
    total = F.aggregate(
        F.col("_ce_cnts"), F.lit(0), lambda acc, x: acc + x
    )
    tot = F.col("_ce_tot")
    h = F.aggregate(
        F.col("_ce_cnts"),
        F.lit(0.0),
        lambda acc, c: acc + F.when(
            c > 0, -(c / tot) * F.log(c / tot)
        ).otherwise(F.lit(0.0)),
    )
    return (
        df.withColumn("_ce_norm", normalize_text(text_col))
        .withColumn("_ce_cnts", counts)
        .withColumn("_ce_tot", total)
        .withColumn(
            out_col,
            F.when(tot > 0, F.round(h, 4)).otherwise(F.lit(0.0)),
        )
        .drop("_ce_norm", "_ce_cnts", "_ce_tot")
    )


def pack_sequences(df: DataFrame, budget: int = 512,
                   id_col: str = "doc_id", text_col: str = "text",
                   part_col: str | None = "source") -> DataFrame:
    """Contiguous-fill sequence packing: documents are laid end-to-end in
    deterministic ``id_col`` order and cut into fixed ``budget``-token
    training sequences (the GPT-style concat-then-chunk layout).  Each
    doc row gets the pack it STARTS in and its token offset within that
    pack; a doc may straddle into the next pack (``spills_over``).

    One window shuffle keyed by ``part_col`` (e.g. ``source``) — packing
    is embarrassingly parallel across corpus partitions, and a running
    cumsum is all the state needed, so 100 TB packs in one pass.  A true
    first-fit bin packer is inherently sequential; contiguous fill is
    what large-scale training pipelines actually use."""
    from pyspark.sql import Window

    n_tok = token_count(text_col)
    part = [part_col] if part_col else [F.lit(1)]
    w = Window.partitionBy(*part).orderBy(id_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum(n_tok).over(w)
    pack_id = F.floor((cum - n_tok) / budget)
    offset = (cum - n_tok) % budget
    out_cols = ([F.col(part_col)] if part_col else []) + [
        F.col(id_col),
        n_tok.alias("n_tokens"),
        pack_id.alias("pack_id"),
        offset.alias("pack_offset"),
        ((offset + n_tok) > budget).alias("spills_over"),
    ]
    return df.select(*out_cols)


def chunk_documents(df: DataFrame, chunk_tokens: int = 32,
                    overlap: int = 8, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Sliding-window document chunking: split each document into
    ``chunk_tokens``-token windows that overlap by ``overlap`` tokens —
    the context-window chunking step of an embedding/RAG/long-doc
    training pipeline (complements ``pack_sequences``, which
    concatenates SHORT docs; this splits LONG ones).

    One output row per chunk: ``chunk_idx`` (0-based), ``start_tok``
    (0-based token offset), ``n_chunk_tokens`` (the tail chunk may be
    short), and ``chunk_text``.  Documents shorter than one window
    yield exactly one chunk.

    Scale: pure narrow row-local expressions — tokenize, a sequence
    explode, an array slice; NO shuffle of any kind, so chunking 100 TB
    is a single map stage that AQE never has to think about."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        # A negative overlap would mean stride > chunk: tokens between
        # consecutive windows silently appear in NO chunk, breaking the
        # reconstruction invariant the property test pins.
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    t = F.split(normalize_text(text_col), " ")
    n = F.size(t)
    # ceil((n - chunk)/stride) + 1 extra windows beyond the first.
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - F.lit(chunk_tokens) + F.lit(stride) - 1)
                / F.lit(stride).cast("double")) + 1)
    start = F.col("chunk_idx") * stride
    chunk = F.slice(F.col("__t"), start + 1, chunk_tokens)
    return (
        df.select(id_col, t.alias("__t"), n_chunks.alias("__nc"))
        .select(
            id_col, "__t",
            F.explode(F.sequence(F.lit(0).cast("bigint"),
                                 F.col("__nc") - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            start.alias("start_tok"),
            F.size(chunk).alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def bpe_train(df: DataFrame, text_col: str = "text", n_merges: int = 10,
              vocab_cap: int = 1_000_000) -> list[tuple[str, str, int]]:
    """Byte-pair-encoding tokenizer training (Sennrich et al. 2016):
    learn ``n_merges`` merge rules from corpus word frequencies.

    Returns the ordered merge list ``[(left, right, pair_count), …]``.
    Ties break deterministically (count desc, then (left, right) asc) so
    two engines training on the same counts learn the same tokenizer.

    Scale split — the standard one for tokenizer training: the ONLY
    corpus-sized pass is the word-frequency aggregation (one
    map-side-combined groupBy; at 100 TB this is the same shape as any
    count agg).  Everything after operates on the VOCABULARY (distinct
    word, freq) — bounded, typically ≤ 10⁶ entries — so the merge loop
    runs driver-side over the collected counts, exactly like k-means
    collects k centroids: the driver state is O(vocab), never O(corpus).
    ``vocab_cap`` guards the collect; raise it deliberately, or pre-cut
    the vocabulary (min-frequency threshold) upstream for huge corpora —
    which is also what production BPE trainers do.
    """
    counts = (
        df.select(F.explode(F.split(normalize_text(text_col), " "))
                  .alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    rows = counts.limit(vocab_cap + 1).collect()
    if len(rows) > vocab_cap:
        raise ValueError(
            f"vocabulary exceeds vocab_cap={vocab_cap}; raise the cap or "
            f"apply a min-frequency cut before training"
        )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["w"]): r["c"] for r in rows
    }
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, freq in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + freq
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((a, b, cnt))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


def bpe_apply(col: Column | str, merges: list[tuple[str, str, int]],
              ) -> Column:
    """Tokenize ``col`` with a trained merge list, fully distributed:
    each word becomes its merged symbol sequence.

    The merge rules are applied IN TRAINING ORDER as nested higher-order
    array rewrites — pure built-ins on the executors (no UDF, no
    shuffle): each rule folds the symbol array left-to-right, joining
    adjacent (a, b) into ab.  Cost is O(rules × symbols) per word, the
    same as any sequential BPE encoder; for production rule counts
    (30k+) move the loop into a pandas UDF over the same word column —
    the training output feeds either form unchanged.
    """
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(normalize_text(c), " ")
    sym = F.transform(words, lambda w: F.split(w, ""))

    def apply_rule(arr: Column, a: str, b: str) -> Column:
        merged = a + b
        # left-to-right fold: emit the merge greedily, matching the
        # sequential reference encoder (chained merges like aa+a on
        # 'aaa' must resolve left-first).
        # try_element_at: NULL (not an ANSI error) on the empty initial
        # accumulator, and NULL == 'a' is false, so the first symbol
        # always appends.
        return F.aggregate(
            arr,
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.lit(merged))),
            ).otherwise(F.concat(acc, F.array(x))),
        )

    def rule_on_words(a: str, b: str):
        # closure factory: PySpark infers the lambda's ARITY from its
        # signature, so default-arg capture (lambda w, _a=a: …) would
        # make transform think this is a 3-arg lambda.
        return lambda w: apply_rule(w, a, b)

    for a, b, _ in merges:
        sym = F.transform(sym, rule_on_words(a, b))
    return F.flatten(sym)
