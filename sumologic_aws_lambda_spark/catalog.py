"""Table catalog over the driver-generated parquet fixtures.

Mirrors the reference's catalog layer (collectors/sources registry,
``sumologic-app-utils/src/sumoresource.py:247-380``) in spirit: one place
that knows where data lands and what its schema is.  Here the "sources" are
the TESTDATA parquet tables.

At 100 TB these reads stay exactly the same calls — ``spark.read.parquet``
over a partitioned prefix — with partition pruning and predicate pushdown
handled by the parquet source; nothing below materializes or collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Small dimension tables that should always be broadcast when joined.
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier"})


def table(spark: SparkSession, sf_dir: str, name: str,
          parallel: bool = False) -> DataFrame:
    """Load a fixture table.

    SESSION-WIDE SIDE EFFECT: this call pins three runtime confs on the
    *caller's* session — ``spark.sql.session.timeZone=UTC``,
    ``spark.sql.legacy.parquet.nanosAsLong=true``, and appends
    ``InferFiltersFromGenerate`` to ``spark.sql.optimizer.excludedRules``
    — because the engine's timestamp/oracle contract requires them and
    the external driver hands us a bare session we cannot configure at
    build time.  They affect every subsequent query on that session, not
    just this read; a warning is emitted if the session timezone is
    actually being CHANGED (it was set to something other than UTC).
    Sessions built via ``session.get_spark`` already carry these confs,
    so the pin is a no-op there.

    ``parallel=True`` is for CPU-heavy narrow consumers (shingling,
    hashing, vector math): the fixture files are single-row-group parquet,
    which Spark cannot split, so the scan arrives as ONE partition and a
    codegen-heavy stage would run on one core.  When the scan has fewer
    partitions than ``defaultParallelism`` we repartition up front — the
    shuffle moves only the raw rows once and the exchange is reused by
    every downstream branch.  On production multi-split/multi-file data
    the condition is false and this is a no-op, so the extra shuffle
    never appears at scale.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    # events.parquet is physically TIMESTAMP(NANOS); Spark refuses that
    # type unless nanosAsLong is set.  session.py sets it at build time,
    # but table() must also work on a caller-provided SparkSession (the
    # external correctness driver builds its own).  The conf is
    # runtime-settable, so set it here — idempotent and cheap.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Timeslice/date-format semantics (and the NTZ→LTZ normalization
    # below) assume UTC — the engine contract session.py declares.  Pin it
    # for caller-provided sessions too: a driver machine with a non-UTC
    # default would silently shift every date_trunc bucket vs the oracle.
    # Warn when this actually flips an explicit non-UTC setting — the pin
    # changes timezone semantics for everything else on that session.
    prev_tz = spark.conf.get("spark.sql.session.timeZone", None)
    if prev_tz not in (None, "UTC"):
        import warnings

        warnings.warn(
            f"catalog.table() is pinning spark.sql.session.timeZone=UTC "
            f"on this session (was {prev_tz!r}); all subsequent queries "
            f"on the session use UTC semantics",
            stacklevel=2,
        )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # See session.DEFAULT_CONFS: the inferred size(generator)>0 filter gets
    # inlined below the parallelizing exchange and re-runs the whole gram
    # expression single-partition.  Runtime-settable, so pin it here too for
    # caller-provided sessions (the external driver builds its own).
    _RULE = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    current = spark.conf.get("spark.sql.optimizer.excludedRules", None)
    if not current:
        spark.conf.set("spark.sql.optimizer.excludedRules", _RULE)
    elif _RULE not in current:
        spark.conf.set("spark.sql.optimizer.excludedRules",
                       f"{current},{_RULE}")
    df = spark.read.parquet(path)
    if parallel and _worth_splitting(path):
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    if name == "events":
        # ts is physically timestamp[ns]; read as long nanos (see
        # session.DEFAULT_CONFS) and floor to µs.  Integer DIV, not /1000.0:
        # 1.7e18 ns exceeds double's 2^53 exact-integer range.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(ts DIV 1000)")
            )
    df = _normalize_ntz(df)
    return df


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-zone TIMESTAMP (LTZ).

    Fixture generations have flip-flopped between ``timestamp[ns]`` (read
    as long under nanosAsLong) and ``timestamp[us]`` with no UTC flag, which
    PySpark 4.x surfaces as TIMESTAMP_NTZ.  NTZ breaks epoch math —
    ``cast(ts as bigint)`` / ``unix_micros(ts)`` are illegal on NTZ — and
    every consumer (sessionize, sumoql transaction, timeslice) does epoch
    math, matching the reference's epoch-seconds handling
    (``sumologic-securityhub-connector/.../securityhub_forwarder.py:39-53``).
    The session timezone is pinned to UTC (session.DEFAULT_CONFS), so the
    wall-clock reinterpretation is the identity and DuckDB's ``epoch(ts)``
    oracle agrees.  Narrow per-row cast — no shuffle, survives any scale.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields
           if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def _worth_splitting(path: str, min_bytes: int = 256 * 1024) -> bool:
    """Below ~¼ MB the per-task scheduling overhead of a repartition
    outweighs any CPU parallelism — leave tiny inputs alone."""
    import os

    try:
        return os.path.getsize(path) >= min_bytes
    except OSError:
        return True  # unknown size (object store): assume worth it


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
