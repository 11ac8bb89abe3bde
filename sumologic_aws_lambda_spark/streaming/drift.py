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


@dataclass
class CentroidDriftReport:
    batch_id: int
    rows: int
    # label -> (cosine vs reference, mean-norm ratio, cumulative n)
    labels: dict[str, tuple[float, float, int]]
    drifted_labels: list[str]


def _label_sums(df: DataFrame, label_col: str,
                vec_col: str) -> dict[str, tuple[list[float], int]]:
    """One posexplode → (label, dim) partial-agg SUM collapse + a
    per-label count — the identical algebra as the batch surface
    (``queries/similarity.py::embedding_centroid_drift``); the
    collected frame is |labels| × dim, bounded model-state size, never
    per-row vectors.  NULL labels coalesce to the ``(null)`` sentinel
    (repo rule 10) so they accumulate instead of crashing the union."""
    key = F.coalesce(F.col(label_col).cast("string"), F.lit("(null)"))
    dims = (
        df.select(key.alias("k"),
                  F.posexplode(F.col(vec_col).cast("array<double>"))
                  .alias("dim", "x"))
        .groupBy("k", "dim").agg(F.sum("x").alias("s"),
                                 F.count(F.lit(1)).alias("n"))
        .collect()
    )
    out: dict[str, tuple[list[float], int]] = {}
    by_label: dict[str, dict[int, float]] = {}
    counts: dict[str, dict[int, int]] = {}
    for r in dims:
        # SUM over a cell whose every element is NULL returns NULL —
        # coalesce to 0.0 (a NULL element contributes nothing to the
        # centroid sum) instead of letting float(None) kill the batch.
        by_label.setdefault(r["k"], {})[r["dim"]] = (
            0.0 if r["s"] is None else float(r["s"]))
        counts.setdefault(r["k"], {})[r["dim"]] = int(r["n"])
    for k, d in by_label.items():
        # CONTRACT: vectors are fixed-dimension per label.  The label
        # count below is only well-defined then — with ragged vectors
        # the per-dim row counts diverge and "rows for this label" is
        # ambiguous (the short dims silently undercount).  Refuse
        # loudly rather than corrupt the running state.
        per_dim = set(counts[k].values())
        if len(per_dim) != 1:
            raise ValueError(
                f"ragged vectors for label {k!r}: per-dim row counts "
                f"{sorted(per_dim)} differ — fixed-dimension input is "
                "required")
        out[k] = ([d[i] for i in sorted(d)], per_dim.pop())
    return out


def reference_centroids(ref: DataFrame, label_col: str,
                        vec_col: str) -> dict[str, tuple[list[float], int]]:
    """Collapse a reference frame to per-label (sum-vector, count) —
    the fixed side of the streaming cosine compare.  Sums, not means,
    so the monitor folds new batches into its running state with plain
    addition (the same reason ``reference_shares`` returns counts)."""
    return _label_sums(ref, label_col, vec_col)


class CentroidDriftMonitor:
    """``foreachBatch`` hook: maintain RUNNING per-label centroid sums
    across micro-batches and alert when a label's running centroid
    turns away from its reference centroid — the streaming twin of
    ``embedding_centroid_drift`` (PSI catches categorical volume
    shift; this catches SEMANTIC shift at unchanged volume).

    Per-batch Spark work is ONE partial-aggregatable (label, dim)
    groupBy over the micro-batch; the fold into the running sums and
    the |labels| cosines run driver-side on bounded state (labels ×
    dim floats — the same contract as the PSI category map).  Cosine
    is computed on sum vectors (scale-invariant); the emitted
    norm_ratio divides each side's norm by its count first, the
    round-9 mean-centroid convention of the batch surface.

    ``threshold``: alert when cosine < threshold (1.0 = identical
    direction; 0.98 is a conservative production bar for normalized
    sentence embeddings).  Labels never seen in the reference alert
    immediately (cosine undefined → treated as full drift), mirroring
    the PSI novel-category behavior of contributing signal rather
    than being dropped.
    """

    def __init__(self, reference: dict[str, tuple[list[float], int]],
                 label_col: str, vec_col: str,
                 threshold: float = 0.98):
        if not reference:
            raise ValueError("CentroidDriftMonitor needs a non-empty "
                             "reference centroid map")
        self.reference = {k: (list(v), int(n))
                          for k, (v, n) in reference.items()}
        self.label_col = label_col
        self.vec_col = vec_col
        self.threshold = threshold
        self.state: dict[str, tuple[list[float], int]] = {}
        self.reports: list[CentroidDriftReport] = []

    @staticmethod
    def _cosine(a: list[float], b: list[float]) -> float | None:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0.0 or nb == 0.0:
            return None
        return dot / (na * nb)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        batch = _label_sums(batch_df, self.label_col, self.vec_col)
        rows = 0
        # validate EVERY label's dimension against stored state BEFORE
        # mutating any — raising mid-fold would leave earlier labels
        # already added, and the engine's retry of the same batch would
        # then double-count them silently (round-10 second-pass review)
        for k, (sums, _n) in batch.items():
            if k in self.state and len(self.state[k][0]) != len(sums):
                # zip() would silently truncate to the shorter vector
                # and corrupt the running centroid with no alert — a
                # dimension change mid-stream is a pipeline bug, not
                # drift; refuse loudly.
                raise ValueError(
                    f"label {k!r}: micro-batch delivered "
                    f"{len(sums)}-dim vectors but running state is "
                    f"{len(self.state[k][0])}-dim — fixed-dimension "
                    "input is required")
        for k, (sums, n) in batch.items():
            rows += n
            if k in self.state:
                old_s, old_n = self.state[k]
                self.state[k] = ([a + b for a, b in zip(old_s, sums)],
                                 old_n + n)
            else:
                self.state[k] = (list(sums), n)
        labels: dict[str, tuple[float, float, int]] = {}
        drifted: list[str] = []
        for k, (sums, n) in sorted(self.state.items()):
            ref = self.reference.get(k)
            if ref is None or n == 0:
                labels[k] = (float("nan"), float("nan"), n)
                # A reference-unknown label alerts only on batches that
                # actually DELIVERED rows for it — it stays visible in
                # the per-label report, but one stray row must not flag
                # every subsequent batch forever (round-9 review
                # finding: the monitor could never read healthy again).
                if k in batch:
                    drifted.append(k)
                continue
            ref_s, ref_n = ref
            if len(ref_s) != len(sums):
                # reference built against a different embedding
                # dimension than the stream delivers — _cosine's zip
                # would silently truncate; surface it as a standing
                # per-label alert instead (the reference is fixed, so
                # this can never heal and must stay visible).
                labels[k] = (float("nan"), float("nan"), n)
                drifted.append(k)
                continue
            cos = self._cosine(ref_s, sums)
            na = math.sqrt(sum(x * x for x in ref_s)) / max(ref_n, 1)
            nb = math.sqrt(sum(x * x for x in sums)) / max(n, 1)
            ratio = nb / na if na > 0 else float("nan")
            # Asymmetric alert persistence, deliberately: a MEASURED
            # below-threshold cosine re-alerts every batch (the running
            # centroid direction is still wrong — a standing
            # condition), but an UNMEASURABLE cosine (zero-norm side)
            # is only an event — it alerts on delivering batches,
            # matching the novel-label rule, so one zero vector cannot
            # flag every healthy batch forever (round-9 second-pass
            # review finding).
            if cos is None:
                if k in batch:
                    drifted.append(k)
            elif cos < self.threshold:
                drifted.append(k)
            labels[k] = (round(cos, 6) if cos is not None
                         else float("nan"), round(ratio, 6), n)
        self.reports.append(
            CentroidDriftReport(batch_id, rows, labels, drifted))

    @property
    def drifted_batches(self) -> list[int]:
        return [r.batch_id for r in self.reports if r.drifted_labels]
