"""Streaming distribution-drift monitor: PSI per micro-batch against a
fixed reference distribution.

The batch surface (``queries/drift.py::psi_drift_score``) compares two
halves of a table at rest; this is its streaming twin — the feature-
drift gate an inference or ingestion pipeline runs continuously.  The
reference distribution (category → share) is computed ONCE from a
reference frame and carried as plain driver state (category-cardinality
sized — the same bounded-model-state contract as the LSH planes and PQ
codebooks); each micro-batch is collapsed by ONE partial-aggregatable
groupBy to category counts, and the PSI fold runs on that tiny frame
driver-side.  An alert fires when PSI crosses the threshold (0.2 is the
conventional "significant drift" bar); like the quality gate, nothing
is dropped — alerts are a monitor signal, delivery is untouched.

Smoothing: Laplace +1 on BOTH the reference and batch counts, so a
category absent from one side contributes a finite, well-defined term
(the batch surface documents the same production knob).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class DriftReport:
    batch_id: int
    rows: int
    psi: float
    drifted: bool
    terms: dict[str, float] = field(default_factory=dict)


def _category_counts(df: DataFrame, col: str) -> dict[str, int]:
    """One partial-aggregatable groupBy → {category: count}.  NULLs
    coalesce to the ``(null)`` sentinel BEFORE grouping (repo rule 10):
    a None key would otherwise crash the sorted() category union in
    the PSI fold — and the same snippet must be used for the reference
    AND every batch or the two sides of the compare drift."""
    rows = df.groupBy(
        F.coalesce(F.col(col).cast("string"), F.lit("(null)"))
        .alias("k")
    ).agg(F.count(F.lit(1)).alias("n")).collect()
    return {r["k"]: int(r["n"]) for r in rows}


def reference_shares(ref: DataFrame, col: str) -> dict[str, int]:
    """Collapse a reference frame to category COUNTS (one
    partial-aggregatable groupBy; the result is category-cardinality
    sized).  Counts, not shares, so the monitor can apply the same
    Laplace smoothing to both sides."""
    return _category_counts(ref, col)


class PsiDriftMonitor:
    """``foreachBatch`` hook: score each micro-batch's category
    distribution against the reference; record a report per batch and
    raise the alert flag on threshold crossings.

    PSI = Σ (q_i − p_i) ln(q_i / p_i) over the union of categories,
    with +1 Laplace smoothing on both count vectors.  The per-batch
    Spark work is ONE groupBy over the micro-batch; the fold runs on
    ≤ |categories| numbers in the driver.
    """

    def __init__(self, reference: dict[str, int], col: str,
                 threshold: float = 0.2):
        if not reference:
            raise ValueError("PsiDriftMonitor needs a non-empty "
                             "reference distribution")
        self.reference = dict(reference)
        self.col = col
        self.threshold = threshold
        self.reports: list[DriftReport] = []

    def _psi(self, batch_counts: dict[str, int]) -> dict[str, float]:
        cats = sorted(set(self.reference) | set(batch_counts))
        ref_t = sum(self.reference.get(c, 0) + 1 for c in cats)
        cur_t = sum(batch_counts.get(c, 0) + 1 for c in cats)
        terms = {}
        for c in cats:
            p = (self.reference.get(c, 0) + 1) / ref_t
            q = (batch_counts.get(c, 0) + 1) / cur_t
            terms[c] = (q - p) * math.log(q / p)
        return terms

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        counts = _category_counts(batch_df, self.col)
        n = sum(counts.values())
        terms = self._psi(counts)
        psi = sum(terms.values())
        self.reports.append(DriftReport(
            batch_id, n, round(psi, 6), psi >= self.threshold,
            {k: round(v, 6) for k, v in terms.items()}))

    @property
    def drifted_batches(self) -> list[int]:
        return [r.batch_id for r in self.reports if r.drifted]
