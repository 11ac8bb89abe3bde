"""Behavioral-analytics operator bodies shared by the registered
queries (``queries/behavior.py``) and the scale probes
(``tools/scale_probe.py``) — one implementation per plan so the probe
always measures exactly the plan the query ships.

Scale shapes (see the query docstrings for the full stories): funnel
stages co-partition on the user key; path n-grams share one window
shuffle; range bucketing broadcasts a boundary array and assigns
shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RANGE_FRACS: tuple[float, ...] = (
    0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875,
)


def funnel_stage_times(events: DataFrame,
                       stages: Sequence[str] = (
                           "signup", "click", "purchase"),
                       user_col: str = "user_id",
                       ts_col: str = "ts",
                       type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel stage completion times per user.

    Stage i keeps only events strictly after the user's stage-(i-1)
    completion; every join and groupBy keys on ``user_col``.  Returns
    one row per user who completed stage 1, with nullable timestamp
    columns t1..tn.
    """
    frames: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, stage in enumerate(stages, 1):
        f = events.filter(F.col(type_col) == stage)
        if prev is None:
            g = f.groupBy(user_col).agg(F.min(ts_col).alias(f"t{i}"))
        else:
            g = (
                f.join(prev, user_col)
                .filter(F.col(ts_col) > F.col(f"t{i - 1}"))
                .groupBy(user_col).agg(F.min(ts_col).alias(f"t{i}"))
            )
        frames.append(g)
        prev = g
    out = frames[0]
    for g in frames[1:]:
        out = out.join(g, user_col, "left")
    return out


def path_ngram_counts(events: DataFrame, n: int = 3,
                      user_col: str = "user_id",
                      ts_col: str = "ts",
                      id_col: str = "event_id",
                      node_col: str = "event_type") -> DataFrame:
    """Counts of length-``n`` event paths per user sequence.

    All n-1 lags share ONE window sort on (user, ts, id); the groupBy
    runs over at most |node values|ⁿ path keys with map-side combine.
    Returns (path, n) with path joined by '>'.
    """
    if n < 2:
        raise ValueError(
            f"path_ngram_counts needs n >= 2 (a length-1 'path' is a "
            f"plain groupBy on {node_col!r}); got n={n}")
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    lag_names = [f"p{k}" for k in range(n - 1, 0, -1)]
    seq = events.select(
        *[F.lag(node_col, k).over(w).alias(f"p{k}")
          for k in range(n - 1, 0, -1)],
        F.col(node_col),
    ).filter(F.col(f"p{n - 1}").isNotNull())
    return (
        seq.select(F.concat_ws(">", *lag_names, node_col).alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def range_bucket_stats(df: DataFrame, value_col: str = "value",
                       fracs: Sequence[float] = RANGE_FRACS,
                       round_digits: int | None = 6) -> DataFrame:
    """Range-partition audit: percentile boundaries over ``value_col``
    assign each row to a contiguous bucket; returns per-bucket
    (bucket, n_rows, lo, hi) with lo/hi unrounded.

    The boundary array is a 1-row broadcast; assignment is a narrow
    projection (no shuffle); the audit groupBy has len(fracs)+1 keys.
    ``round_digits`` rounds the *boundaries* (pre-assignment) so an
    external replay with independently-computed percentiles lands in
    identical buckets.
    """
    pct = F.percentile(value_col, F.array(*[F.lit(f) for f in fracs]))
    if round_digits is not None:
        digits = round_digits
        pct = F.transform(pct, lambda x: F.round(x, digits))
    bounds = df.agg(pct.alias("bs"))
    assigned = df.crossJoin(F.broadcast(bounds)).select(
        value_col,
        F.size(
            F.filter(F.col("bs"), lambda x: F.col(value_col) >= x)
        ).cast("long").alias("bucket"),
    )
    return assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
    )
