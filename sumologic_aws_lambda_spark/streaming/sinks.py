"""Delivery sinks with retry + dead-letter accounting (SURVEY §2.1 S12,
§2.6 A4, §2.8 T4/T5).

Reference semantics being reproduced:

- NDJSON delivery grouped by metadata key, optional gzip
  (``sumo-dlq-function-utils/lib/sumologsclient.js:44-109``: join "\\n",
  gzip :69, one request per bucket).
- Retry with backoff, 3 × 5000 ms defaults (``k2sl_lambda.js:15-16``,
  ``Promise.retryMax`` in ``utils.js:13-34``).
- Failure ⇒ the batch is *retained* for redelivery (DLQ at-least-once,
  ``DLQProcessor.js:47-66``): here a quarantine prefix re-ingested by the
  same job.
- Success/error accounting fold (``sumologsclient.js:81-108``).

Exactly-once *effect* on an at-least-once stream: output paths are
keyed by ``batch_id`` (deterministic across checkpoint recovery —
the reference's ``{ProductArn}-{request_id}`` object-key idea,
``securityhub_collector.py:19-32``), so redelivery overwrites rather
than duplicates.
"""

from __future__ import annotations

import time
from dataclasses import dataclass


@dataclass
class DeliveryReport:
    """A4 accounting: mirrors requestSuccessCnt / messageErrors."""

    batch_id: int
    attempts: int
    success: bool
    rows: int
    error: str | None = None


class NdjsonDeliverySink:
    """``foreachBatch`` writer: partitioned NDJSON with retry + quarantine.

    Parameters mirror the reference envelope: ``max_retries``/``backoff``
    default to 3 × 5 s; ``compress`` maps to the gzip content-encoding.
    ``partition_cols`` is the metadata routing key — at scale this is the
    shuffle-free ``partitionBy`` write replacing the per-bucket POST loop.
    """

    def __init__(self, out_dir: str, partition_cols=("source_category",),
                 compress: bool = True, max_retries: int = 3,
                 backoff_seconds: float = 5.0,
                 quarantine_dir: str | None = None,
                 sleep=time.sleep):
        self.out_dir = out_dir
        self.partition_cols = tuple(partition_cols)
        self.compress = compress
        self.max_retries = max_retries
        self.backoff_seconds = backoff_seconds
        self.quarantine_dir = quarantine_dir
        self.reports: list[DeliveryReport] = []
        self._sleep = sleep

    def _write(self, df, path: str) -> None:
        w = df.write.mode("overwrite")
        if self.partition_cols:
            cols = [c for c in self.partition_cols if c in df.columns]
            if cols:
                w = w.partitionBy(*cols)
        if self.compress:
            w = w.option("compression", "gzip")
        # keep null-valued fields EXPLICIT: Spark's JSON writer defaults
        # to ignoreNullFields=true, which silently omits the key —
        # downstream schemaless NDJSON consumers then can't distinguish
        # "null" from "absent", and record shape varies per record; the
        # reference's JSON.stringify preserves null fields (round-10
        # streaming review)
        w = w.option("ignoreNullFields", "false")
        w.json(path)  # Spark JSON writer == NDJSON (one object per line)

    def __call__(self, batch_df, batch_id: int) -> None:
        """The foreachBatch hook.  Retries the whole batch write with the
        reference's linear backoff (``exponentialBackoff(seed)=count*seed``,
        utils.js:28-34); after exhaustion the batch lands in quarantine
        for the DLQ loop instead of being lost."""
        from .dedup import _reject_batch_id_collision

        # out_dir and quarantine_dir are both batch_id-partitioned; a
        # user data column named batch_id would be shadowed on whole-
        # prefix read-back (round-10 ADVICE)
        _reject_batch_id_collision(batch_df)
        # persist: count + write are two actions over the same upstream
        # micro-batch transform (decode/parse/explode) — without this
        # the hot path recomputes it per action, and once more per
        # retry/quarantine (the QualityGateSink precedent)
        batch_df.persist()
        try:
            rows = batch_df.count()
            path = f"{self.out_dir}/batch_id={batch_id}"
            last_err: Exception | None = None
            for attempt in range(1, self.max_retries + 1):
                try:
                    self._write(batch_df, path)
                except Exception as exc:  # delivery failure → retry
                    last_err = exc
                    if attempt < self.max_retries:
                        self._sleep(self.backoff_seconds * attempt)
                    continue
                # Delivered.  Clear any STALE quarantine copy of this
                # batch: a crash mid-quarantine-write on a previous
                # delivery attempt leaves a truncated batch_id=N that a
                # later drain would redeliver OVER this complete
                # delivery (round-10 streaming review).  Hadoop FS API,
                # not shutil — the quarantine dir may be a remote URI
                # (the round-7 _store_has_data lesson).  The cleanup
                # lives OUTSIDE the retry try-block: a delete failure
                # must never be misclassified as a delivery failure —
                # that would re-write a delivered batch per retry,
                # stack phantom reports, and re-quarantine data that is
                # already out (round-10 ADVICE).  Worst case on a
                # swallowed delete error: the stale copy survives and a
                # later drain overwrites the same batch_id path —
                # idempotent by design.
                if self.quarantine_dir is not None:
                    try:
                        spark = batch_df.sparkSession
                        jvm = spark._jvm
                        hpath = jvm.org.apache.hadoop.fs.Path(
                            f"{self.quarantine_dir}/batch_id={batch_id}")
                        fs = hpath.getFileSystem(
                            spark._jsc.hadoopConfiguration())
                        if fs.exists(hpath):
                            fs.delete(hpath, True)
                    except Exception:  # noqa: BLE001 — cleanup only
                        pass
                self.reports.append(
                    DeliveryReport(batch_id, attempt, True, rows)
                )
                return
            self.reports.append(
                DeliveryReport(batch_id, self.max_retries, False, rows,
                               str(last_err))
            )
            if self.quarantine_dir is not None:
                batch_df.write.mode("overwrite").parquet(
                    f"{self.quarantine_dir}/batch_id={batch_id}"
                )
            else:
                raise RuntimeError(
                    f"batch {batch_id} failed after "
                    f"{self.max_retries} attempts"
                ) from last_err
        finally:
            batch_df.unpersist()
