"""Paragraph-level and incremental dedup semantics on constructed docs."""

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.operators.dedup import (
    incremental_dedup,
    paragraph_dedup,
)
from sumologic_aws_lambda_spark.operators.text import fingerprint

P1 = "a b c d"
P2 = "e f g h"
P3 = "i j k l"


def _docs(spark):
    rows = [
        (1, f"{P1} {P2}"),        # first occurrence of P1, P2
        (2, f"{P1} {P3}"),        # P1 repeated -> dropped here
        (3, f"{P2} {P2}"),        # P2 repeated twice -> both dropped
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_first_occurrence_survives(spark):
    out = {r.doc_id: r for r in paragraph_dedup(
        _docs(spark), tokens_per_para=4).collect()}
    assert out[1].n_paras == 2 and out[1].n_kept == 2
    assert out[1].text_kept == f"{P1} {P2}"
    assert out[2].n_kept == 1 and out[2].text_kept == P3
    assert out[3].n_kept == 0 and out[3].text_kept == ""


def test_order_preserved_after_drop(spark):
    rows = [(1, f"{P1} {P2} {P3}"), (2, f"{P2} {P1} {P3}")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r.text_kept
           for r in paragraph_dedup(df, tokens_per_para=4).collect()}
    assert out[1] == f"{P1} {P2} {P3}"
    assert out[2] == ""  # every paragraph already seen in doc 1


def test_incremental_dedup_drops_seen_content(spark):
    seen = spark.createDataFrame(
        [("x",), ("old doc",)], "text string"
    ).select(fingerprint("text").alias("fingerprint"))
    batch = spark.createDataFrame(
        [(10, "old  DOC"), (11, "brand new")],  # normalization collapses
        "doc_id int, text string",
    )
    out = incremental_dedup(batch, seen).collect()
    assert [r.doc_id for r in out] == [11]
    assert "_fp" not in incremental_dedup(batch, seen).columns


def test_paragraph_dedup_skew_safe_shape(spark):
    # The corpus is never self-joined corpus×corpus, and — the r4 lesson —
    # there is NO window partitioned by the paragraph content hash: every
    # copy of a hot boilerplate paragraph shares one hash value, so a
    # content-hash window serializes the C4 motivation case into a single
    # task.  The winner must come from a map-side-combinable groupBy.
    plan = paragraph_dedup(_docs(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
