"""Unit tests for the Gopher quality-rule battery
(operators/text.py::gopher_rule_flags) — one crafted document per rule,
asserting the exact flag vector so rules can't cross-contaminate."""

from __future__ import annotations

from sumologic_aws_lambda_spark.operators.text import gopher_rule_flags

# A "good" base: 8 stopwords + filler, 64 words, mean word length ~4.
_GOOD = " ".join(
    ["the", "be", "to", "of", "and", "that", "have", "with"]
    + ["word"] * 56
)

_FLAGS = [
    "fail_word_count", "fail_mean_word_len", "fail_symbol_ratio",
    "fail_bullet_lines", "fail_ellipsis_lines", "fail_alpha_words",
    "fail_stopwords",
]


def _run(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id int, text string"
    )
    out = gopher_rule_flags(df, "text")
    return {r.doc_id: r for r in out.collect()}


def _fails(row):
    return [f for f in _FLAGS if getattr(row, f)]


def test_good_doc_passes_all(spark):
    rows = _run(spark, [_GOOD])
    assert _fails(rows[0]) == []
    assert rows[0].pass_all


def test_each_rule_fires_alone(spark):
    short = "the be to of and that have with word"           # 9 words
    # 56 two-char words + the 8 stopwords: mean length < 3
    tiny_words = " ".join(["ab"] * 56) + " the be to of and that have with"
    # 10 '#' tokens on top of the good base: symbol ratio 10/74 > 0.1
    symbols = _GOOD + " " + " ".join(["#"] * 10)
    # every line bullet-started (10 lines × 11 words)
    bullets = "\n".join(
        ["- then cats with dogs have run toward that park"] * 10
    )
    # 4 of 10 lines ellipsis-ended (> 30%)
    ell_line = "the cat and dog ran to the park with joy"
    ellipsis = "\n".join([ell_line + " ..."] * 4 + [ell_line] * 6)
    # 20 numeric tokens on top of 60 alpha words: alpha frac 75% < 80%
    numeric = _GOOD[: len(_GOOD)] + " " + " ".join(["123"] * 21)
    # 64 words, zero stopwords
    no_stop = " ".join(["cat", "dog", "runs", "fast"] * 16)

    docs = [short, tiny_words, symbols, bullets, ellipsis, numeric, no_stop]
    rows = _run(spark, docs)
    assert _fails(rows[0]) == ["fail_word_count"]
    assert _fails(rows[1]) == ["fail_mean_word_len"]
    assert _fails(rows[2]) == ["fail_symbol_ratio"]
    assert _fails(rows[3]) == ["fail_bullet_lines"]
    assert _fails(rows[4]) == ["fail_ellipsis_lines"]
    assert _fails(rows[5]) == ["fail_alpha_words"]
    assert _fails(rows[6]) == ["fail_stopwords"]
    assert not any(rows[i].pass_all for i in range(7))


def test_thresholds_are_tunable(spark):
    rows = _run(spark, ["the cat and dog ran to the park with joy"])
    assert _fails(rows[0]) == ["fail_word_count"]  # 10 words < 50
    df = spark.createDataFrame(
        [(0, "the cat and dog ran to the park with joy")],
        "doc_id int, text string",
    )
    out = gopher_rule_flags(df, "text", min_words=5).collect()[0]
    assert out.pass_all


def test_unicode_ellipsis_counts(spark):
    # 4 of 10 lines end with the single-character U+2026 ellipsis — the
    # typographic form — and must trip the ellipsis-line rule like '...'.
    line = "the cat and dog ran to the park with joy"
    doc = "\n".join([line + " w…"] * 4 + [line] * 6)
    rows = _run(spark, [doc])
    assert "fail_ellipsis_lines" in _fails(rows[0])
