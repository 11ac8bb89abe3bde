"""Streaming snapshot upsert: maintain a keyed latest-wins parquet
snapshot from a change stream (the foreachBatch MERGE-INTO pattern).

The batch surface (``queries/etl.py::cdc_snapshot_merge``) merges one
change batch against one snapshot; this sink runs that merge
CONTINUOUSLY — each micro-batch collapses to its per-key latest row,
merges against the stored snapshot, and atomically replaces it.  This
is the table-maintenance half of the reference's delivery tier: the
sinks move events, this keeps a queryable current-state table.

Correctness properties:

* latest-wins is total-ordered by (ts, _seq): event time first, then
  the monotonically increasing batch id, so a replayed or reordered
  delivery can never regress a key to an older state — replaying ANY
  batch is idempotent by value.
* the swap is crash-safe: the next snapshot is fully written to a
  staging directory, then swapped in with two renames; a crash leaves
  either the old snapshot or the new one, never a half-written mix.
  The previous snapshot directory is kept as ``_prev`` until the next
  batch, giving one generation of rollback.

Scale shape: the per-batch merge is ONE shuffle on the key (the batch
collapse and the merge groupBy share it); the snapshot is read
narrow (key + ts + _seq + payload) and never collected.  At 100 TB
the same code runs with the snapshot bucketed by key so the merge
co-partitions — swap ``parquet`` for a bucketed table; the algebra is
unchanged.
"""

from __future__ import annotations

import os
import re
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class SnapshotUpsertSink:
    """``foreachBatch`` hook maintaining a latest-wins keyed snapshot.

    ``key_cols`` identify the entity; ``ts_col`` orders versions
    (event time).  Rows where ``delete_col`` (optional, boolean) is
    true act as tombstones: the key is REMOVED from the snapshot when
    the tombstone is the key's latest version.

    LOCAL-FILESYSTEM-ONLY contract (round-9 advisor fix): the
    crash-safe swap is two ``os.rename`` calls, which are atomic only
    on a POSIX filesystem.  Object stores (s3://, gs://, abfss://)
    have neither atomic rename nor a driver-visible POSIX path, so the
    constructor rejects any URI scheme other than ``file`` — on an
    object store, run the same merge algebra against a table format
    with an atomic commit protocol (Delta/Iceberg MERGE) instead of
    this sink.
    """

    _LOCAL_SCHEMES = ("", "file")

    def __init__(self, path: str, key_cols: tuple[str, ...],
                 ts_col: str, delete_col: str | None = None):
        if not key_cols:
            raise ValueError("SnapshotUpsertSink needs key columns")
        # URI-aware guard (round-9 review findings: the naive '://'
        # split mangled file://host/path into a relative path and let
        # single-slash forms — file:/x, and worse hdfs:/x, s3a:/x —
        # through as literal local dirs).  ANY scheme-looking prefix
        # is parsed; a local dir whose name contains ':' must be
        # passed as ./name or an absolute path.
        if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", path):
            pr = urlparse(path)
            scheme = pr.scheme.lower()
            if scheme not in self._LOCAL_SCHEMES:
                raise ValueError(
                    f"SnapshotUpsertSink requires a local POSIX path; "
                    f"got scheme {scheme!r}. Its two-rename swap is "
                    f"not atomic on object stores — use a "
                    f"transactional table format (Delta/Iceberg "
                    f"MERGE) there.")
            if pr.netloc not in ("", "localhost"):
                raise ValueError(
                    f"SnapshotUpsertSink got a file:// URI with remote "
                    f"host {pr.netloc!r}; only file:///... and "
                    f"file://localhost/... resolve to this machine.")
            path = pr.path or "/"
        self.path = path
        self.key_cols = tuple(key_cols)
        self.ts_col = ts_col
        self.delete_col = delete_col
        self._current = os.path.join(path, "current")
        self._prev = os.path.join(path, "_prev")

    # -- snapshot access ------------------------------------------------

    def _recover(self) -> None:
        """Heal the rename window: a crash between the two swap renames
        leaves no ``current`` but an intact ``_prev`` — without this,
        the next batch would rebuild the snapshot from itself alone and
        silently drop every stored key (round-8 review finding).
        Promoting ``_prev`` back to ``current`` restores the pre-swap
        snapshot; the interrupted batch's staging dir is garbage (its
        batch will be replayed) and is swept by ``__call__``."""
        if (not os.path.exists(self._current)
                and os.path.exists(self._prev)):
            os.rename(self._prev, self._current)

    def snapshot(self, spark,
                 include_tombstones: bool = False) -> DataFrame | None:
        """The live snapshot frame, or None before the first batch.

        Deleted keys are filtered at READ time — their tombstone rows
        stay in storage so a late-arriving update OLDER than the
        delete can never resurrect the key (the merge would otherwise
        have nothing to outrank it).  ``include_tombstones=True``
        returns the raw table; production compacts tombstones out
        after a retention window (same TTL pattern as the streaming
        dedup store)."""
        self._recover()
        if not os.path.exists(self._current):
            return None
        df = spark.read.parquet(self._current)
        if self.delete_col and not include_tombstones:
            df = df.filter(
                ~F.coalesce(F.col(self.delete_col), F.lit(False)))
        return df

    # -- the merge ------------------------------------------------------

    def _latest_per_key(self, df: DataFrame) -> DataFrame:
        # Final tiebreak: a content hash of the full row.  Two updates
        # to the same key with EQUAL ts inside one batch share _seq
        # too, and row_number over tied sort keys picks an arbitrary
        # row — replay could then flip the survivor.  The hash makes
        # the resolution arbitrary-but-DETERMINISTIC for identical
        # batch content, preserving idempotent-by-value replays
        # (round-8 review finding).
        tie = F.md5(F.to_json(F.struct(*[
            F.col(c) for c in df.columns if c != "_seq"])))
        w = Window.partitionBy(*self.key_cols).orderBy(
            F.col(self.ts_col).desc(), F.col("_seq").desc(), tie.desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn")
        )

    def _sweep_staging(self) -> None:
        """Remove orphaned staging dirs from crashed/renumbered batches
        — foreachBatch calls are serialized per query, so anything
        matching ``_staging_*`` at batch start is dead (round-8 review
        finding: only the same batch_id's staging was cleaned, letting
        stale full-snapshot copies accumulate forever)."""
        if not os.path.isdir(self.path):
            return
        for name in os.listdir(self.path):
            if name.startswith("_staging_"):
                shutil.rmtree(os.path.join(self.path, name),
                              ignore_errors=True)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # '_seq' is part of the PERSISTED snapshot schema (it must
        # union with prior batches), so a user column of that name
        # cannot be renamed away — and it would silently be replaced
        # by the batch id, corrupting the user's own ordering signal;
        # '_rn' would be overwritten and dropped by the latest-per-key
        # window.  Case-insensitive, like Spark's resolution
        # (round-10 streaming review).
        reserved = {"_seq", "_rn"}
        clash = [c for c in batch_df.columns if c.lower() in reserved]
        if clash:
            raise ValueError(
                f"batch columns {clash} collide with the upsert sink's "
                f"reserved snapshot columns — rename them upstream")
        spark = batch_df.sparkSession
        self._recover()
        self._sweep_staging()
        staged = batch_df.withColumn("_seq", F.lit(int(batch_id)))
        current = self.snapshot(spark, include_tombstones=True)
        merged_input = (
            staged if current is None
            else current.unionByName(staged, allowMissingColumns=True)
        )
        # Tombstones are RETAINED (not filtered) so they keep
        # outranking any older update that arrives later; the read
        # view filters them (see snapshot()).
        merged = self._latest_per_key(merged_input)
        staging = os.path.join(self.path, f"_staging_{batch_id}")
        merged.write.mode("overwrite").parquet(staging)
        # two-rename swap: old current becomes _prev (one generation of
        # rollback), staging becomes current; a crash between the
        # renames leaves a readable snapshot at one of the two names.
        shutil.rmtree(self._prev, ignore_errors=True)
        if os.path.exists(self._current):
            os.rename(self._current, self._prev)
        os.rename(staging, self._current)
