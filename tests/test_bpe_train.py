"""BPE tokenizer training (operators/text.py::bpe_train / bpe_apply)
against an independent pure-Python Sennrich reference."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.operators.text import bpe_apply, bpe_train


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Independent Sennrich trainer over word frequencies."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        new = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + f
        vocab = new
    return merges, vocab


def test_bpe_train_classic_example(spark):
    # Sennrich's running example: low/lower/newest/widest
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame([(text,)], "text string")
    merges = bpe_train(df, n_merges=6)
    expect, _ = _reference_bpe(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 6
    )
    assert merges == expect
    # the famous first merges: (e,s) then (es,t) appear early
    assert ("e", "s", 9) in merges and ("es", "t", 9) in merges


def test_bpe_train_matches_reference_on_fixture(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sample = docs.filter(F.col("doc_id") < 40)
    merges = bpe_train(sample, n_merges=8)
    # rebuild word freqs independently and compare
    rows = (
        sample.select(
            F.explode(
                F.split(F.trim(F.regexp_replace(F.lower("text"),
                                                r"\s+", " ")), " ")
            ).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w").count().collect()
    )
    expect, _ = _reference_bpe({r["w"]: r["count"] for r in rows}, 8)
    assert merges == expect
    assert len(merges) == 8
    assert all(cnt > 0 for _, _, cnt in merges)


def test_bpe_apply_matches_reference_segmentation(spark):
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame([(text,)], "text string")
    merges = bpe_train(df, n_merges=6)
    # reference segmentation of each distinct word
    _, vocab = _reference_bpe(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 6
    )
    ref_seg = {"".join(sym): list(sym) for sym in vocab}
    out = spark.createDataFrame(
        [("low",), ("lower",), ("newest",), ("widest",)], "text string"
    ).select(bpe_apply("text", merges).alias("toks")).collect()
    got = {"".join(r["toks"]): list(r["toks"]) for r in out}
    assert got == ref_seg


def test_bpe_apply_greedy_left_first(spark):
    # rule (a,a): 'aaa' must segment [aa, a] (left-greedy), not [a, aa]
    df = spark.createDataFrame([("aaa",)], "text string")
    out = df.select(
        bpe_apply("text", [("a", "a", 1)]).alias("t")).collect()[0]["t"]
    assert out == ["aa", "a"]


def test_bpe_train_vocab_cap(spark):
    import pytest

    df = spark.createDataFrame([("a b c d e",)], "text string")
    with pytest.raises(ValueError, match="vocab_cap"):
        bpe_train(df, vocab_cap=2)
