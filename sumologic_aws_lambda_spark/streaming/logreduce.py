"""Streaming template-novelty monitor: LogReduce signatures over a
message stream, alerting the first time a NEVER-SEEN template appears.

The operational companion of the ``logreduce``/``logcompare`` search
verbs (``plans/sumoql.py``): production teams run exactly this loop —
cluster live logs into templates, page when a brand-new template shows
up (a new error format, a new code path) rather than on raw volume.

Scale shape per micro-batch: masking is narrow; ONE signature groupBy
(map-side combined — the whole point of templates is that duplicates
collapse early); the known-template store is keyed by signature and the
novelty check is an anti-join (batch side is the distinct template set
— tiny — so it broadcasts).  Store rows are signatures only, never
messages.

Exactly-once (the ``streaming/dedup.py`` pattern): every write
overwrites the ``batch_id=N`` partition this batch owns, and the
novelty anti-join excludes store rows the same batch wrote — a
redelivered batch recomputes byte-identical alerts and overwrites them
in place.  Store/checkpoint lifecycles must travel together (see
``streaming/dedup.py`` module doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.sumoql import logreduce_signature
from .dedup import (
    _overwrite_batch_partition,
    _read_store,
    recover_batch_store,
)


class TemplateNoveltySink:
    """foreachBatch callable: per-batch template counts → novelty
    alerts in ``alerts_dir``, newly seen signatures → ``store_dir``."""

    def __init__(self, spark: SparkSession, store_dir: str,
                 alerts_dir: str, field: str = "line"):
        self._spark = spark
        self._store = store_dir
        self._alerts = alerts_dir
        self._field = field
        # startup compaction recovery (round-11 ADVICE; see
        # dedup.recover_batch_store) — the signature store is a
        # membership set, compactable with fingerprint_store_agg
        recover_batch_store(spark, store_dir)
        self.batch_stats: list[tuple[int, int, int]] = []  # (id, sigs, new)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        sigs = (
            batch_df
            .select(logreduce_signature(self._field).alias("_signature"))
            .groupBy("_signature")
            .agg(F.count(F.lit(1)).alias("_count"))
        )
        sigs = sigs.localCheckpoint()  # store write must not re-read input
        known = _read_store(self._spark, self._store, "_signature string",
                            exclude_batch=batch_id)
        new = sigs.join(known, "_signature", "left_anti")
        alerts = new.select(
            "_signature", "_count",
            F.lit(batch_id).alias("first_seen_batch"))
        alerts = alerts.localCheckpoint()
        _overwrite_batch_partition(alerts, self._alerts, batch_id)
        _overwrite_batch_partition(
            alerts.select("_signature"), self._store, batch_id)
        self.batch_stats.append(
            (batch_id, sigs.count(), alerts.count()))


def run_template_novelty(spark: SparkSession, in_path: str,
                         alerts_dir: str, store_dir: str,
                         checkpoint_dir: str,
                         available_now: bool = True):
    """Wire a json-lines message stream (``{"line": ...}``) through the
    novelty sink.  Returns (StreamingQuery, sink)."""
    sink = TemplateNoveltySink(spark, store_dir, alerts_dir)
    stream = (
        spark.readStream.format("json")
        .schema("line string")
        .load(in_path)
    )
    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink
