"""Scheduled views: continuously materialized SumoQL aggregates.

Sumo's scheduled views (public product surface, queried as
``_view=<name>``; the saved searches the reference's benchmark content
packs install — e.g. ``cloudtrailbenchmark/template.yaml:316`` — are the
manual form of the same pre-aggregation) take an aggregate query, run it
continuously, and materialize the reduced results into their own index so
dashboards read slices instead of raw logs — with automatic backfill over
history.

Spark design:

* A view's definition is a SumoQL query that must reduce to
  ``timeslice + mergeable aggregates`` — the same restriction Sumo
  documents (scheduled views reject non-aggregate / non-deterministic
  queries).  Mergeable means re-aggregatable partials: ``count`` and
  ``sum`` merge by SUM, ``min``/``max`` by MIN/MAX.  ``avg``/
  ``percentile``/``values`` are rejected with a clear error — store
  sum+count and divide at read time instead (the classic partial-agg
  decomposition).
* **Backfill** is simply the compiled plan over history.
* **Refresh** aggregates ONLY the new batch (partial-agg shuffle over the
  increment, never the history) and merges it with the materialized frame
  by re-aggregating on (slice × group) with the per-column merge
  functions.  Incremental refresh == full recompute, exactly — the
  registered query ``scheduled_view_rollup`` hard-signal-checks that
  equality against DuckDB.
* **Storage** partitions by slice date; refresh rewrites only the dates
  the increment touched (dynamic partition overwrite), so a late batch
  costs O(touched slices), not O(view).  At 100 TB the view frame is
  slices × groups — orders of magnitude smaller than the fact table; the
  merge's shuffle is on the view, not the corpus.
* **Read** (``_view=name``): scan the materialized parquet, then apply
  any further pipe stages through the ordinary stage compiler — a
  dashboard rollup over a view is a second, tiny aggregation.
"""

from __future__ import annotations

import hashlib
import os
import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .sumoql import SumoQLError, SumoSchema, compile_query

#: materialized column-name prefix → merge aggregate
_MERGE_FNS = {
    "_count": F.sum,
    "_sum": F.sum,
    "_min": F.min,
    "_max": F.max,
    # HLL sketch partials merge register-wise: max of registers is
    # associative and commutative, so incremental union == one-shot
    # union bit-for-bit — the view-friendly distinct count.
    "_hll": F.hll_union_agg,
}

# NOTE: percentiles are compiled as `_pct_<arg>_<p>` (sumoql.py
# `_pct_{arg}_{p}`), so the prefix here must be `_pct` — `_pctl` never
# matched and percentile columns silently became GROUP KEYS, making the
# incremental refresh diverge from a full recompute.
_UNMERGEABLE = ("_avg", "_count_distinct", "_median", "_values", "_first",
                "_last", "_stddev", "_variance", "_pct")


def view_safe_name(*parts: str) -> str:
    """Canonical view-name derivation shared by every caller that names
    a view after other content (pack searches, dashboard panels) — one
    sanitizer, so derived names can't drift between entry points."""
    return re.sub(r"\W+", "_", "_".join(parts)).strip("_").lower()


@dataclass(frozen=True)
class ScheduledViewSpec:
    """One view: a name and the aggregate query that defines it."""

    name: str
    query: str

    def __post_init__(self) -> None:
        if not re.fullmatch(r"\w+", self.name):
            raise SumoQLError(f"bad view name {self.name!r}")


def _merge_exprs(df: DataFrame) -> tuple[list[str], list[Column]]:
    """(group keys, merge aggregates) for a materialized view frame.
    Aggregate columns are recognized by the compiler's ``_``-prefix
    naming; everything else (including ``_timeslice``) is a key."""
    def _prefixed(c: str, p: str) -> bool:
        return c == p or c.startswith(p + "_")

    keys, aggs = [], []
    for c in df.columns:
        if c == "_timeslice":
            keys.append(c)
            continue
        # Unmergeable check FIRST: `_count_distinct_x` also carries the
        # `_count_` prefix, and merging distinct-counts by SUM would
        # silently overcount shared values across batches.
        if any(_prefixed(c, p) for p in _UNMERGEABLE):
            raise SumoQLError(
                f"view column {c!r} is not mergeable — materialize the "
                "sum/count partials instead (e.g. 'sum(x), count' and "
                "divide at read time)"
            )
        hit = next(
            (fn for p, fn in _MERGE_FNS.items() if _prefixed(c, p)), None,
        )
        if hit is not None:
            aggs.append(hit(c).alias(c))
        else:
            keys.append(c)
    if "_timeslice" not in keys:
        raise SumoQLError(
            "a scheduled view must reduce by timeslice — add a "
            "'timeslice <dur>' stage and group by _timeslice"
        )
    if not aggs:
        raise SumoQLError("a scheduled view needs at least one aggregate")
    return keys, aggs


def materialize(df: DataFrame, spec: ScheduledViewSpec,
                schema: SumoSchema = SumoSchema()) -> DataFrame:
    """Backfill: the view's compiled plan over a history frame.  Also
    validates the query's shape (timeslice key + mergeable aggregates)."""
    out = compile_query(df, spec.query, schema)
    _merge_exprs(out)  # shape validation
    return out


def merge_increment(current: DataFrame, increment: DataFrame) -> DataFrame:
    """Merge a new batch's aggregate partials into the materialized
    frame: union + one re-aggregation on (slice × group).  Count/sum
    partials SUM, min/max partials MIN/MAX — so refresh(backfill(A), B)
    is bit-equal to backfill(A ∪ B) for any batch split."""
    if set(current.columns) != set(increment.columns):
        raise SumoQLError(
            f"view schema mismatch: {current.columns} vs "
            f"{increment.columns}"
        )
    keys, aggs = _merge_exprs(current)
    return (
        current.unionByName(increment)
        .groupBy(*keys)
        .agg(*aggs)
    )


class ScheduledViewStore:
    """Directory-backed store: one parquet dataset per view, partitioned
    by slice date so refreshes rewrite only the dates a batch touched."""

    def __init__(self, root: str) -> None:
        self.root = root
        self._specs: dict[str, ScheduledViewSpec] = {}

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def register(self, spec: ScheduledViewSpec) -> None:
        """Bind a spec without (re)backfilling — used when resuming
        maintenance of an existing view in a fresh process."""
        self._specs[spec.name] = spec

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def backfill(self, df: DataFrame, spec: ScheduledViewSpec,
                 schema: SumoSchema = SumoSchema()) -> None:
        """Create/replace the view from history.  Replacing also clears
        any streaming high-water marks — the new view has absorbed no
        batches, so stale marks must not suppress future refreshes."""
        self._specs[spec.name] = spec
        view = materialize(df, spec, schema).withColumn(
            "_slice_date", F.to_date("_timeslice")
        )
        (view.write.partitionBy("_slice_date")
         .mode("overwrite").parquet(self._path(spec.name)))
        import shutil

        shutil.rmtree(os.path.join(self.root, f"_applied_{spec.name}"),
                      ignore_errors=True)

    def refresh(self, spark: SparkSession, new_batch: DataFrame,
                name: str, schema: SumoSchema = SumoSchema()) -> None:
        """Incremental maintenance: aggregate ONLY the new batch, merge
        with the stored partials for the touched slice dates, rewrite
        those partitions (dynamic overwrite — untouched dates are never
        read or written).

        The increment is localCheckpointed (its lineage is an aggregation
        over the batch and it feeds both the touched-date collect and the
        merge), and the touched dates are collected to the driver — a
        batch touches O(slices) dates, small by contract — so the store
        scan filters on the PARTITION column ``_slice_date``: partition
        pruning skips every untouched date's files, keeping refresh I/O
        at O(touched slices) even on a years-deep view."""
        if name not in self._specs:
            from .sumoql import SumoQLError

            raise SumoQLError(
                f"view {name!r} not registered in this process — call "
                f"register(spec) before refresh() (specs are in-memory; "
                f"a fresh process must re-register even when the view's "
                f"data exists on disk)"
            )
        spec = self._specs[name]
        inc = materialize(new_batch, spec, schema).localCheckpoint()
        dates = [
            r[0] for r in inc.select(
                F.to_date("_timeslice").alias("d")
            ).distinct().collect()
        ]
        current = (
            spark.read.parquet(self._path(name))
            .filter(F.col("_slice_date").isin(dates))
            .drop("_slice_date")
        )
        merged = merge_increment(current, inc).withColumn(
            "_slice_date", F.to_date("_timeslice")
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (merged.write.partitionBy("_slice_date")
             .mode("overwrite").parquet(self._path(name)))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self._path(name)).drop("_slice_date")

    def query(self, spark: SparkSession, text: str,
              schema: SumoSchema = SumoSchema(),
              lookups=None) -> DataFrame:
        """``_view=<name> [extra scope] [| stages…]`` — scan the
        materialized view and apply any further pipe stages (dashboard
        rollups) through the shared prefixed-query compiler.
        ``lookups`` (optional) enables lookup/save/geoip stages."""
        from .sumoql import compile_prefixed_query

        return compile_prefixed_query(
            text, "_view", lambda n: self.read(spark, n), schema, lookups)


class ScheduledViewMaintainer:
    """``foreachBatch`` callable keeping one view continuously
    materialized: the first batch of a fresh view backfills, every later
    batch runs the incremental refresh (aggregate the batch, merge
    partials, rewrite touched dates).

    Retry safety: a batch retried after its rewrite but before the
    streaming checkpoint commits would re-merge its partials and double
    the retried slices' counts — so the maximum applied batch id is
    recorded as a HIGH-WATER MARK after each rewrite (one small file per
    (view, run), written via atomic rename — O(1) bookkeeping, not a
    marker per batch), and a batch at or below the mark is skipped on
    redelivery.  Batch ids are only meaningful within one streaming
    checkpoint INSTANCE, so the mark is keyed by the streaming query's
    persistent id read from the checkpoint's ``metadata`` file (Spark
    writes it at query start, before any batch): restarting on the same
    checkpoint keeps the id — marks survive and redelivered batches are
    skipped — while DELETING and recreating the checkpoint at the same
    path mints a new id, so batch ids restarting at 0 land under a fresh
    mark instead of being silently swallowed by the stale one.  The mark
    filename carries a hash of the raw key, so distinct keys can never
    collide after sanitization (``ck-1`` vs ``ck_1``).  A re-backfill
    clears every mark for the view.  (Crash BETWEEN rewrite and mark
    still re-merges — closing that last window needs a transactional
    table format.)
    """

    def __init__(self, spark: SparkSession, store: ScheduledViewStore,
                 spec: ScheduledViewSpec,
                 schema: SumoSchema = SumoSchema(),
                 run_id: str = "default",
                 checkpoint_dir: str | None = None) -> None:
        self._spark = spark
        self._store = store
        self._spec = spec
        self._schema = schema
        self._run_id = run_id
        self._checkpoint_dir = checkpoint_dir
        self._query_id: str | None = None
        store.register(spec)

    def _read_checkpoint_metadata(self) -> str | None:
        """The checkpoint's ``metadata`` file contents, via local read
        when possible, else through the Hadoop FileSystem API — the
        checkpoint may live on hdfs://, s3a://, dbfs:/ etc., where a
        silent local-open failure would fall back to path-keyed marks
        and quietly reopen the stale-mark bug this class exists to
        close."""
        path = os.path.join(self._checkpoint_dir, "metadata")
        try:
            with open(path) as fh:
                return fh.read()
        except OSError:
            pass
        try:
            jvm = self._spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(
                self._checkpoint_dir.rstrip("/") + "/metadata")
            fs = hpath.getFileSystem(
                self._spark._jsc.hadoopConfiguration())
            if not fs.exists(hpath):
                return None
            stream = fs.open(hpath)
            try:
                return jvm.org.apache.commons.io.IOUtils.toString(
                    stream, "UTF-8")
            finally:
                stream.close()
        except Exception:  # noqa: BLE001 — any gateway/FS failure
            import warnings

            warnings.warn(
                f"could not read streaming checkpoint metadata at "
                f"{path!r}; high-water marks fall back to the checkpoint "
                f"PATH as key — deleting and recreating this checkpoint "
                f"without clearing marks would skip early batches",
                stacklevel=3,
            )
            return None

    def _run_token(self) -> str:
        """The mark key: the checkpoint's persistent query id when
        available, else the caller-supplied run_id."""
        if self._query_id is not None:
            return self._query_id
        if self._checkpoint_dir is not None:
            import json

            raw = self._read_checkpoint_metadata()
            if raw is not None:
                try:
                    self._query_id = f"qid_{json.loads(raw)['id']}"
                    return self._query_id
                except (ValueError, KeyError):
                    pass  # malformed metadata: fall back
        return self._run_id

    def _mark_dir(self) -> str:
        d = os.path.join(self._store.root, f"_applied_{self._spec.name}")
        os.makedirs(d, exist_ok=True)
        return d

    def _hwm_path(self) -> str:
        token = self._run_token()
        safe = (re.sub(r"\W+", "_", token).strip("_") or "default")[-48:]
        digest = hashlib.sha1(token.encode()).hexdigest()[:12]
        return os.path.join(self._mark_dir(), f"{safe}-{digest}")

    def _legacy_hwm_path(self) -> str:
        """Pre-round-6 mark filename (sanitized run_id, no digest) —
        read as a fallback so an upgrade doesn't orphan existing marks
        and re-merge the last committed batch on restart."""
        safe = re.sub(r"\W+", "_", self._run_id).strip("_") or "default"
        return os.path.join(self._mark_dir(), safe)

    def _hwm(self) -> int:
        for path in (self._hwm_path(), self._legacy_hwm_path()):
            try:
                with open(path) as fh:
                    return int(fh.read().strip())
            except (OSError, ValueError):
                continue
        return -1

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if batch_id <= self._hwm():
            return  # redelivered batch: already merged
        if self._store.exists(self._spec.name):
            self._store.refresh(self._spark, batch_df, self._spec.name,
                                self._schema)
        else:
            self._store.backfill(batch_df, self._spec, self._schema)
        path = self._hwm_path()
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, path)
        # migrate away from the pre-round-6 filename: the new mark now
        # carries the state, so the legacy file must not linger (it
        # would shadow nothing — new path is read first — but would
        # resurrect a stale id if the new mark were ever cleared).
        legacy = self._legacy_hwm_path()
        if legacy != path:
            try:
                os.remove(legacy)
            except OSError:
                pass


def run_view_stream(spark: SparkSession, in_path: str,
                    store: ScheduledViewStore, spec: ScheduledViewSpec,
                    checkpoint_dir: str,
                    schema_ddl: str = "ts timestamp, cat string, v long",
                    schema: SumoSchema = SumoSchema(),
                    available_now: bool = True):
    """Wire a json-lines event stream into continuous view maintenance.
    Returns the StreamingQuery."""
    stream = (
        spark.readStream.format("json").schema(schema_ddl).load(in_path)
    )
    writer = (
        stream.writeStream
        .foreachBatch(ScheduledViewMaintainer(
            spark, store, spec, schema,
            # Batch ids are scoped to the checkpoint INSTANCE: the
            # maintainer keys the high-water mark by the persistent
            # query id inside this checkpoint's metadata file, so a
            # deleted-and-recreated checkpoint at the same path gets a
            # fresh mark.  The path is only the fallback key.
            run_id=checkpoint_dir,
            checkpoint_dir=checkpoint_dir,
        ))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
