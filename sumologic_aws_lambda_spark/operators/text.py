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
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "avg_token_len",
            F.round((n_chars - n_tokens + 1) / n_tokens, 4),
        )
        .withColumn(
            "punct_ratio",
            F.round(
                F.length(F.regexp_replace(t, r"[^.,;:!?'\"]", "")) / n_chars, 4
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                F.regexp_count(t, F.lit(LANG_MARKERS["en"])) / n_tokens, 4
            ),
        )
        .withColumn(
            "nonalpha_ratio",
            F.round(
                F.length(F.regexp_replace(t, r"[a-zA-Z\s]", "")) / n_chars, 4
            ),
        )
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
