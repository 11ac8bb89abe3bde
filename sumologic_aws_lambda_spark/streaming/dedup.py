"""Streaming incremental dedup: a ``foreachBatch`` stage that drops any
incoming document whose content fingerprint was already ingested, then
appends the survivors' fingerprints to a persistent store.

The batch operator is ``operators.dedup.incremental_dedup`` — the
streaming wrapper only adds the store lifecycle, so batch backfills and
the live stream share one code path (same principle as the CWL pipeline,
SURVEY §3.1).

Scale shape: the store is a parquet prefix keyed by fingerprint.  Each
micro-batch does one anti-join (batch side small → broadcast or AQE hash
join) and one append; within-batch duplicates are collapsed first with a
groupBy on the uniform 128-bit key.  Nothing is collected to the driver
and the store is never rewritten, only appended.  On a real deployment
the store would be bucketed by fingerprint (or a Delta/Hudi table with
merge) — the operator contract is unchanged.

Exactly-once caveat (same as every foreachBatch sink here): a batch
retried after appending but before checkpoint commit re-appends its
fingerprints; dedup semantics tolerate that (duplicate store rows only
make the anti-join match the same content twice).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import incremental_dedup
from ..operators.text import fingerprint


class IncrementalDedupSink:
    """foreachBatch callable: survivors → ``out_dir``, their fingerprints
    → ``store_dir``."""

    def __init__(self, spark: SparkSession, store_dir: str, out_dir: str,
                 text_col: str = "text"):
        self._spark = spark
        self._store = store_dir
        self._out = out_dir
        self._text = text_col
        self.batch_stats: list[tuple[int, int, int]] = []  # (id, in, kept)

    def _seen(self) -> DataFrame:
        if os.path.isdir(self._store) and any(
                f.endswith(".parquet") for f in os.listdir(self._store)):
            return self._spark.read.parquet(self._store)
        return self._spark.createDataFrame([], "fingerprint string")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        n_in = batch_df.count()
        # collapse within-batch duplicates (keep first by natural order of
        # the fingerprint groupBy — content-identical, so any row works)
        batch = batch_df.withColumn("_fp", fingerprint(self._text)) \
            .dropDuplicates(["_fp"]).drop("_fp")
        kept = incremental_dedup(batch, self._seen(), self._text)
        kept = kept.localCheckpoint()  # store append must not re-read input
        n_kept = kept.count()
        if n_kept:
            kept.write.mode("append").parquet(self._out)
            kept.select(fingerprint(self._text).alias("fingerprint")) \
                .write.mode("append").parquet(self._store)
        self.batch_stats.append((batch_id, n_in, n_kept))


class ParagraphDedupSink:
    """foreachBatch paragraph-level dedup (the streaming twin of
    ``operators.dedup.paragraph_dedup``): a paragraph survives only at
    its first occurrence across ALL batches seen so far.

    Per micro-batch: the batch operator resolves within-batch first
    occurrences (skew-safe groupBy winner per paragraph hash); survivors
    are then re-split and anti-joined against the persistent
    paragraph-hash store so anything seen in an earlier batch is dropped
    too, documents are reassembled, and the new paragraph hashes append
    to the store.  Store rows are md5 hex only — 32 bytes per distinct
    paragraph, never the text itself.

    Output parity with the batch operator: a document whose every
    paragraph was already seen (within the batch OR in earlier batches)
    is still emitted, with ``text_kept = ''`` — so a streaming run and a
    batch backfill over the same corpus produce the same doc_id set and
    per-doc text, batch boundaries only affecting which copy survives.
    ``batch_stats`` records ``kept`` as docs with non-empty text.
    """

    def __init__(self, spark: SparkSession, store_dir: str, out_dir: str,
                 text_col: str = "text", tokens_per_para: int = 12):
        self._spark = spark
        self._store = store_dir
        self._out = out_dir
        self._text = text_col
        self._k = tokens_per_para
        self.batch_stats: list[tuple[int, int, int]] = []  # (id, in, kept)

    def _seen(self) -> DataFrame:
        if os.path.isdir(self._store) and any(
                f.endswith(".parquet") for f in os.listdir(self._store)):
            return self._spark.read.parquet(self._store)
        return self._spark.createDataFrame([], "para_md5 string")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from ..operators.dedup import paragraph_dedup, paragraph_units

        within = paragraph_dedup(batch_df, self._text,
                                 tokens_per_para=self._k)
        paras = within.select(
            "doc_id",
            F.posexplode(paragraph_units("text_kept", self._k))
            .alias("pos", "para"),
        ).filter(F.col("para") != "")
        kept = paras.withColumn("para_md5", F.md5("para")).join(
            self._seen(), "para_md5", "left_anti").localCheckpoint()
        survivors = (
            kept.groupBy("doc_id")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s.getField("para")),
                " ").alias("text_kept"))
        )
        # Batch-operator parity: docs whose every paragraph was seen
        # before still emit a row with empty text (left join back to the
        # batch's full doc_id set), matching paragraph_dedup's output.
        docs = (
            within.select("doc_id")
            .join(survivors, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("text_kept", F.lit("")).alias("text_kept"))
        )
        n_in = batch_df.count()
        n_kept = survivors.count()
        if n_in:
            docs.write.mode("append").parquet(self._out)
        if n_kept:
            kept.select("para_md5").distinct().write.mode("append") \
                .parquet(self._store)
        self.batch_stats.append((batch_id, n_in, n_kept))


def run_incremental_dedup(spark: SparkSession, in_path: str, out_dir: str,
                          store_dir: str, checkpoint_dir: str,
                          available_now: bool = True):
    """Wire a json-lines document stream (``{"doc_id": ..., "text": ...}``)
    through the dedup sink.  Returns (StreamingQuery, sink)."""
    stream = (
        spark.readStream.format("json")
        .schema("doc_id long, text string")
        .load(in_path)
    )
    sink = IncrementalDedupSink(spark, store_dir, out_dir)
    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def run_paragraph_dedup(spark: SparkSession, in_path: str, out_dir: str,
                        store_dir: str, checkpoint_dir: str,
                        tokens_per_para: int = 12,
                        available_now: bool = True):
    """Wire a json-lines document stream through the paragraph-dedup
    sink.  Returns (StreamingQuery, sink)."""
    stream = (
        spark.readStream.format("json")
        .schema("doc_id long, text string")
        .load(in_path)
    )
    sink = ParagraphDedupSink(spark, store_dir, out_dir,
                              tokens_per_para=tokens_per_para)
    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink
