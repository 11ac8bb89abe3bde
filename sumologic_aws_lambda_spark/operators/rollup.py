"""Hypertable-style rollup hierarchy: multi-granularity pre-aggregation
with algebraic re-aggregation and a grain router.

The observability pattern behind Sumo's metrics/timeslice surface at
100 TB: raw events roll up once into a 1-minute table, coarser grains
re-aggregate from the next finer grain (never from raw), and a query
for [start, end) is routed to the coarsest grain that still yields the
requested resolution.  All aggregates kept are algebraic (count/sum/
min/max — avg derives as sum/count at read time), so every level is
exact, not an approximation.

Buckets are epoch arithmetic (``floor(epoch / g) * g``), identical to
``plans/metrics_service.py``, so grains nest exactly when the coarser
period is a multiple of the finer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAIN_SECONDS: dict[str, int] = {
    "1m": 60, "5m": 300, "1h": 3600, "1d": 86400,
}

def build_rollup(events: DataFrame, grain: str,
                 key_cols: tuple[str, ...] = ("event_type",),
                 ts_col: str = "ts",
                 value_col: str = "value") -> DataFrame:
    """Raw events → one rollup level: (bucket_start, keys, n/sum/min/max)."""
    g = GRAIN_SECONDS[grain]
    bucket = (F.floor(F.unix_timestamp(ts_col) / g) * g).cast("long")
    return events.groupBy(bucket.alias("bucket_start"), *key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def coarsen(rollup: DataFrame, from_grain: str, to_grain: str,
            key_cols: tuple[str, ...] = ("event_type",)) -> DataFrame:
    """Finer grain → coarser grain by re-aggregating the partials —
    never rescans raw data.  Requires the coarser period to be a
    multiple of the finer (checked)."""
    f, t = GRAIN_SECONDS[from_grain], GRAIN_SECONDS[to_grain]
    if t % f != 0:
        raise ValueError(f"{to_grain} is not a multiple of {from_grain}")
    bucket = (F.floor(F.col("bucket_start") / t) * t).cast("long")
    return rollup.groupBy(bucket.alias("bucket_start"), *key_cols).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def route_grain(start_epoch: int, end_epoch: int,
                max_points: int = 1000,
                grains: dict[str, int] = GRAIN_SECONDS) -> str:
    """Coarsest grain whose bucket count over [start, end) stays useful,
    finest that stays under ``max_points`` — the hypertable read path."""
    span = max(1, end_epoch - start_epoch)
    for name, g in sorted(grains.items(), key=lambda kv: kv[1]):
        if span / g <= max_points:
            return name
    return max(grains, key=grains.get)


def read_rollup(rollup: DataFrame, start_epoch: int,
                end_epoch: int) -> DataFrame:
    """Range read with derived avg — partition-prunable on bucket_start
    when the rollup table is written partitioned by day."""
    return rollup.filter(
        (F.col("bucket_start") >= start_epoch)
        & (F.col("bucket_start") < end_epoch)
    ).withColumn("avg_value", F.col("sum_value") / F.col("n"))
