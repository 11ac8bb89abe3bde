"""Ingest budgets: per-key byte quotas enforced at ingest.

Sumo's ingest budgets (public product surface; they govern exactly the
collector fleets the reference deploys) assign a byte budget to a field
scope — e.g. per ``_sourceCategory`` per day — and stop or flag ingest
once the scope exceeds it.

Skew-aware two-phase plan — the naive form (a cumulative-sum window
over EVERY key) serializes each hot category into one task, and hot
categories are precisely why budgets exist:

1. **Phase 1** — bytes per key: a map-side-combined aggregate.  Keys
   UNDER budget keep every row — no window ever touches them (the vast
   majority of keys on a healthy pipeline).
2. **Phase 2** — only the over-budget keys' rows (a broadcast semi-join
   on the small hot-key set) run the cumulative-sum window that finds
   each key's cutoff row.  The window cost is bounded by the data of
   keys that actually blew their budget.

Determinism: the cutoff depends on row order, so callers supply a total
order (timestamp + a unique tiebreaker) — the same contract Sumo's
"first N bytes of the day" semantics implies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def apply_ingest_budget(df: DataFrame, budget_bytes: int,
                        key_cols: list[str],
                        order_cols: list[str],
                        size: Column) -> DataFrame:
    """Flag every row past its key's byte budget.

    Adds ``_bytes`` (the row's accounted size) and ``_over_budget``
    (True once the key's cumulative bytes, in ``order_cols`` order,
    exceed ``budget_bytes``).  Callers drop or quarantine flagged rows;
    flagging (Sumo's "keep and mark" action) preserves the audit trail.
    """
    if budget_bytes <= 0:
        raise ValueError("budget_bytes must be positive")
    if not key_cols or not order_cols:
        raise ValueError("key_cols and order_cols are required")
    sized = df.withColumn("_bytes", size.cast("bigint"))
    totals = sized.groupBy(*key_cols).agg(
        F.sum("_bytes").alias("_total_bytes")
    )
    over_keys = totals.filter(
        F.col("_total_bytes") > budget_bytes
    ).select(*[F.col(k).alias(f"__ok_{k}") for k in key_cols])

    # NULL-SAFE key matching: groupBy puts NULL keys in one group, so a
    # NULL key CAN be over budget — plain equality joins would never
    # match it and every NULL-key row would silently bypass enforcement.
    cond = None
    for k in key_cols:
        e = F.col(k).eqNullSafe(F.col(f"__ok_{k}"))
        cond = e if cond is None else (cond & e)
    under = sized.join(F.broadcast(over_keys), cond, "left_anti") \
        .withColumn("_over_budget", F.lit(False))
    # ROWS frame, not the default RANGE frame: under RANGE, rows tying
    # on order_cols are frame PEERS and all receive the sum including
    # every peer — two 60-byte rows sharing a timestamp against a
    # 100-byte budget would BOTH flag, though the first fits.  ROWS
    # makes the cutoff row-accurate regardless of ties (the tie-break
    # between equal-ordered rows is then arbitrary but the flagged
    # BYTE COUNT is exact, which is the enforcement contract).
    w = (
        Window.partitionBy(*key_cols).orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    over = (
        sized.join(F.broadcast(over_keys), cond, "left_semi")
        .withColumn("_cum", F.sum("_bytes").over(w))
        .withColumn("_over_budget", F.col("_cum") > budget_bytes)
        .drop("_cum")
    )
    return under.unionByName(over)
