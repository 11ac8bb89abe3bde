"""As-of (point-in-time) join — SURVEY §2.5 '(absent)' row.

The reference has only lookup-style left joins; an engine replacing it
needs the temporal join its search surface implies (latest config/dim
value at event time).  Spark has no built-in as-of join, so this is the
canonical scale-path composition:

    union(left tagged 1, right tagged 0 with right_cols packed in a struct)
      → window last(struct, ignorenulls)
          over (partition by key order by ts, tag rows unbounded preceding)
      → keep tag 1, unpack the struct

One shuffle on the join key, per-partition sort, no theta join and no
per-key collect.  At 100 TB this beats the naive ``a.ts >= b.ts`` range
join (which Spark executes as a broadcast-nested-loop or a cartesian
per key) by orders of magnitude; skewed keys fall under AQE skew-split
like any other window shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    *,
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach the most recent right row whose
    timestamp is ``<=`` (or ``<`` when ``strict``) the left timestamp,
    per join key.  ``right_cols`` must not collide with left columns.
    Timestamp columns may be any orderable type (timestamp, long epoch).
    """
    keys = [on] if isinstance(on, str) else list(on)
    for c in right_cols:
        if c in left.columns:
            raise ValueError(f"right column {c!r} collides with left")

    # Right rows sort before left at equal ts for <= semantics; after for <.
    right_tag, left_tag = (0, 1) if not strict else (1, 0)
    l_tagged = left.withColumn(_TAG, F.lit(left_tag)).withColumn(
        _TS, F.col(left_ts)
    )
    # Pack right_cols into ONE struct before the union: per-column
    # last(ignorenulls) would skip a legitimately-NULL right value and
    # back-fill it from an OLDER right row — and different columns could
    # then come from different right rows, attaching a row that never
    # existed.  last() of the whole struct carries the most recent right
    # ROW atomically; its fields unpack after the window (NULL fields
    # stay NULL).
    _ROW = "__asof_row"
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.struct(*[F.col(c) for c in right_cols]).alias(_ROW),
    ).withColumn(_TAG, F.lit(right_tag))

    l_tagged = l_tagged.withColumn(
        _ROW, F.lit(None).cast(r_tagged.schema[_ROW].dataType))
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(_TS, _TAG)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn(_ROW, F.last(_ROW, ignorenulls=True).over(w))
    is_left = F.col(_TAG) == left_tag
    picked = u.filter(is_left)
    for c in right_cols:
        picked = picked.withColumn(c, F.col(f"{_ROW}.{c}"))
    return picked.drop(_TAG, _TS, _ROW)


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          left_start: str, left_end: str,
                          right_start: str, right_end: str,
                          on: str | list[str] | None = None,
                          bucket: int = 3600) -> DataFrame:
    """Overlap join of half-open intervals — every (l, r) pair with
    ``l.start < r.end AND r.start < l.end`` (optionally also matching
    the ``on`` equi-keys) — via the BUCKETIZED equi-join pattern, the
    only interval-join shape that scales: a raw theta join is a
    broadcast nested loop (corpus² at 100 TB).

    Each interval explodes into the coarse time buckets it touches
    (``sequence(floor(start/b), floor((end-1)/b))`` — fan-out is
    interval_length/bucket, so pick ``bucket`` near the typical interval
    length); the pair space is then an EQUI-join on (keys…, bucket)
    with the exact overlap predicate as a post-filter.  A pair
    overlapping several buckets is emitted exactly once — kept only in
    the first bucket both intervals share (``bucket ==
    floor(greatest(l.start, r.start)/b)``) — so no distinct shuffle is
    needed.  Empty/degenerate intervals (end <= start) match nothing
    and are dropped up front.

    Fractional bounds are safe: the last bucket a half-open interval
    touches is ``floor((ceil(end) - 1) / b)`` — for integral ``end``
    this is exactly ``floor((end-1)/b)``, and for fractional ``end``
    (where ``end - 1 < start`` would make ``sequence`` descend and
    emit wrong buckets) it is ``floor`` of the last instant strictly
    inside the interval's ceiling, which covers every touched bucket.
    The exact post-filter then discards any false candidates the
    ceiling admitted.
    """
    keys = [on] if isinstance(on, str) else list(on or [])
    clash = (set(left.columns) & set(right.columns)) - set(keys)
    if clash:
        raise ValueError(f"rename overlapping columns first: {clash}")
    reserved = {"__bucket"} & (set(left.columns) | set(right.columns))
    if reserved:
        # withColumn would silently overwrite it and the final drop
        # would delete the caller's column.
        raise ValueError(f"rename reserved column first: {reserved}")

    def bucketed(df: DataFrame, start: str, end: str) -> DataFrame:
        return (
            df.filter(F.col(end) > F.col(start))
            .withColumn(
                "__bucket",
                F.explode(F.sequence(
                    F.floor(F.col(start) / bucket),
                    F.greatest(
                        F.floor(F.col(start) / bucket),
                        F.floor((F.ceil(F.col(end)) - 1) / bucket),
                    ),
                )),
            )
        )

    joined = bucketed(left, left_start, left_end).join(
        bucketed(right, right_start, right_end), keys + ["__bucket"])
    first_shared = F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / bucket)
    return (
        joined.filter(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
            & (F.col("__bucket") == first_shared))
        .drop("__bucket")
    )
