"""Streaming data-quality gate: declarative constraints per micro-batch.

The batch surface (``queries/profiling.py::data_quality_checks``)
validates a table at rest; this is its streaming twin — the Deequ
"VerificationSuite on a stream" pattern (Schelter et al., VLDB 2018).
Every micro-batch is scored by ONE conditional aggregate (all rules in
a single pass, map-side combinable — rule count never adds scans); a
clean batch is delivered, a violating batch is quarantined WHOLE with a
machine-readable violation report, mirroring the reference's DLQ
contract (``cloudwatchlogs-with-dlq/DLQProcessor`` semantics: nothing
is silently dropped, exhausted work parks where an operator can replay
it).  Quarantined batches are NOT retried by ``drain_quarantine`` —
they failed validation, not delivery — so the drain helper SKIPS any
batch directory carrying a ``_violations.json`` marker; an operator
resolves them by fixing and re-ingesting.

Each check maps a name to an AGGREGATE expression that returns the
VIOLATION COUNT (0 = pass).  Builders for the common rules are
provided; anything expressible as an aggregate Column works.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


def not_null(col: str) -> Column:
    """Violations = rows where ``col`` is NULL (completeness)."""
    return F.count_if(F.col(col).isNull())


def unique(col: str) -> Column:
    """Violations = surplus duplicate rows of ``col`` (uniqueness)."""
    return F.count(F.col(col)) - F.count_distinct(F.col(col))


def in_range(col: str, lo, hi) -> Column:
    """Violations = non-NULL rows outside ``[lo, hi]``."""
    c = F.col(col)
    return F.count_if(c.isNotNull() & ~c.between(lo, hi))


def in_set(col: str, values) -> Column:
    """Violations = non-NULL rows outside the allowed value set."""
    c = F.col(col)
    return F.count_if(c.isNotNull() & ~c.isin(*values))


def matches(col: str, pattern: str) -> Column:
    """Violations = non-NULL rows not FULLY matching ``pattern`` — the
    pattern is anchored (rlike alone is a substring search, which would
    pass partially-matching garbage)."""
    c = F.col(col)
    return F.count_if(c.isNotNull() & ~c.rlike(f"^(?:{pattern})$"))


@dataclass
class QualityReport:
    batch_id: int
    rows: int
    passed: bool
    violations: dict[str, int] = field(default_factory=dict)


class QualityGateSink:
    """``foreachBatch`` hook: validate → deliver or quarantine.

    ``checks`` maps rule name → violation-count aggregate Column.  The
    whole suite evaluates as one ``agg`` over the micro-batch (a single
    job; adding rules adds expressions, not passes).  Clean batches
    write parquet to ``out_dir``; violating batches write the batch AND
    a ``_violations.json`` report to ``quarantine_dir`` using the same
    batch-owned-directory overwrite pattern as the delivery sinks, so a
    replayed batch_id is idempotent.
    """

    def __init__(self, checks: dict[str, Column], out_dir: str,
                 quarantine_dir: str,
                 partition_cols: tuple[str, ...] = ()):
        if not checks:
            raise ValueError("QualityGateSink needs at least one check")
        self.checks = dict(checks)
        self.out_dir = out_dir
        self.quarantine_dir = quarantine_dir
        self.partition_cols = tuple(partition_cols)
        self.reports: list[QualityReport] = []

    def _metrics(self, batch_df) -> tuple[int, dict[str, int]]:
        aggs = [F.count(F.lit(1)).alias("__rows")] + [
            expr.cast("bigint").alias(name)
            for name, expr in self.checks.items()
        ]
        row = batch_df.agg(*aggs).collect()[0].asDict()
        rows = row.pop("__rows")
        return rows, {n: int(v or 0) for n, v in row.items()}

    def __call__(self, batch_df, batch_id: int) -> None:
        from .dedup import _reject_batch_id_collision

        # out_dir and quarantine_dir are both batch_id-partitioned; a
        # user data column named batch_id would be shadowed on whole-
        # prefix read-back (round-10 ADVICE)
        _reject_batch_id_collision(batch_df)
        # persist: the batch feeds two actions (the validation aggregate
        # and the delivery/quarantine write) — without it the micro-batch
        # input is read and re-transformed twice.
        batch_df.persist()
        try:
            rows, metrics = self._metrics(batch_df)
            violations = {n: v for n, v in metrics.items() if v > 0}
            passed = not violations
            if passed:
                w = batch_df.write.mode("overwrite")
                cols = [c for c in self.partition_cols
                        if c in batch_df.columns]
                if cols:
                    w = w.partitionBy(*cols)
                w.parquet(f"{self.out_dir}/batch_id={batch_id}")
            else:
                # Stage into a tmp dir whose name the drain regex can
                # NEVER match, add the marker, then rename into place —
                # a crash at any point leaves either no visible batch
                # dir or a complete one WITH its marker; the old
                # parquet-then-marker order had a window where a crash
                # left a marker-less dir that drain_quarantine would
                # redeliver as if it had merely failed delivery.
                import shutil

                final = f"{self.quarantine_dir}/batch_id={batch_id}"
                tmp = f"{self.quarantine_dir}/_staging_{batch_id}"
                shutil.rmtree(tmp, ignore_errors=True)
                batch_df.write.mode("overwrite").parquet(tmp)
                with open(f"{tmp}/_violations.json", "w",
                          encoding="utf-8") as fh:
                    json.dump({"batch_id": batch_id, "rows": rows,
                               "violations": violations}, fh,
                              sort_keys=True)
                shutil.rmtree(final, ignore_errors=True)
                os.rename(tmp, final)
        finally:
            batch_df.unpersist()
        self.reports.append(
            QualityReport(batch_id, rows, passed, violations))
