"""SLOs — Sumo Logic's reliability-management surface (public feature:
SLOs with error budgets and burn-rate alerting, built on the monitors
library the reference provisions, ``sumologic-app-utils/src/
sumoresource.py:1503``) re-expressed as a compiled plan.

An SLO is {good-event condition, total condition, target, compliance
slice}: the engine compiles it into a per-slice series of good/total
counts, the SLI ratio, cumulative error-budget consumption over the
compliance window, and the per-slice burn rate — the inputs every
burn-rate alert policy (fast-burn/slow-burn) evaluates.

Scale shape: ONE conditional-count groupBy on the time slice (map-side
combined) — the corpus is never scanned twice for good vs total — and
the cumulative/burn math runs on the slice-count series (window over
~days of rows, never corpus rows).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..planmarks import bounded_global_window
from .sumoql import SumoQLError, SumoSchema, _rewrite_expr


@dataclass(frozen=True)
class SloSpec:
    """Declarative SLO: Sumo-style conditions over the bound schema."""

    name: str
    good_condition: str           # Sumo-ish boolean expr (rewrites apply)
    total_condition: str = "true"
    target: float = 0.99          # SLI target in (0, 1)
    slice_: str = "1d"            # compliance slice (timeslice grammar)


_SLICE_TRUNC = {"1h": "hour", "1d": "day", "1w": "week"}


def evaluate_slo(df: DataFrame, spec: SloSpec,
                 schema: SumoSchema) -> DataFrame:
    """Compile the SLO into its error-budget series.

    One row per compliance slice: ``_timeslice``, ``good``, ``total``,
    ``sli`` (rounded ratio), ``cum_consumed`` / ``cum_budget`` (error
    events so far vs the budget the target allows on the traffic so
    far), ``budget_remaining`` (fraction of budget left, negative =
    blown), and ``burn_rate`` (this slice's error rate as a multiple of
    the budgeted rate — the quantity fast/slow-burn alerts threshold).
    """
    if not 0.0 < spec.target < 1.0:
        raise SumoQLError(f"SLO target must be in (0,1): {spec.target}")
    if spec.slice_ not in _SLICE_TRUNC:
        raise SumoQLError(f"unsupported SLO slice: {spec.slice_!r}")
    try:
        good = F.expr(_rewrite_expr(spec.good_condition))
        total = F.expr(_rewrite_expr(spec.total_condition))
        # Column expressions parse lazily — force analysis now so a
        # malformed condition fails here with the SLO's name attached,
        # not deep inside the budget plan.
        df.select(good.cast("boolean"), total.cast("boolean")).schema
    except Exception as exc:
        raise SumoQLError(f"bad SLO condition in {spec.name!r}") from exc
    ts = F.date_trunc(_SLICE_TRUNC[spec.slice_], F.col(schema.ts_col))
    # Slices where NO row satisfies total_condition carry no SLI signal
    # and are EXCLUDED rather than emitted with 0/0 → NULL ratios (a
    # NULL burn_rate silently passes every downstream threshold check).
    # Cumulative sums are unaffected — zero-traffic slices contribute
    # nothing to either side.
    per = (
        df.groupBy(ts.alias("_timeslice"))
        .agg(
            F.sum(F.when(total & good, 1).otherwise(0)).alias("good"),
            F.sum(F.when(total, 1).otherwise(0)).alias("total"),
        )
        .filter(F.col("total") > 0)
    )
    w = bounded_global_window(
        "_timeslice",
        bound="post-aggregation timeslice series — one row per slice "
              "of the SLO evaluation range",
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bad_frac = 1.0 - spec.target
    cum_good = F.sum("good").over(w)
    cum_total = F.sum("total").over(w)
    consumed = (cum_total - cum_good).cast("double")
    budget = cum_total * F.lit(bad_frac)
    return per.select(
        "_timeslice", "good", "total",
        F.round(F.col("good") / F.col("total"), 6).alias("sli"),
        (cum_total - cum_good).alias("cum_consumed"),
        F.round(budget, 6).alias("cum_budget"),
        F.round(1.0 - consumed / budget, 6).alias("budget_remaining"),
        F.round((F.col("total") - F.col("good"))
                / (F.col("total") * F.lit(bad_frac)), 6)
        .alias("burn_rate"),
    )


def burn_rate_windows(df: DataFrame, spec: SloSpec, schema: SumoSchema,
                      long_hours: int = 6,
                      threshold: float = 1.0) -> DataFrame:
    """Multiwindow burn-rate alerting (the fast-burn/slow-burn policy
    pattern from the public SRE workbook, the policy Sumo's SLO
    monitors implement): the short window (one compliance slice, here
    1 h) catches fast burns, the long trailing window (``long_hours``)
    keeps the alert from flapping on a single bad slice — the alert
    fires only when BOTH windows burn above ``threshold``.

    One row per hour: good/total, ``burn_1h``, ``burn_long`` (an
    event-time RANGE window over trailing epoch seconds, so gap hours
    with no traffic still age out correctly), and the combined
    ``fast_burn`` flag.

    Scale: the corpus collapses to the hourly series in ONE
    conditional-count groupBy; both burn windows run over the ~window-
    count series rows, never corpus rows."""
    if spec.slice_ != "1h":
        raise SumoQLError("burn_rate_windows needs an hourly slice")
    per = evaluate_slo(df, spec, schema).select(
        "_timeslice", "good", "total")
    epoch = F.unix_timestamp("_timeslice")
    series = per.withColumn("slice_epoch", epoch)
    w = bounded_global_window(
        "slice_epoch",
        bound="post-aggregation hourly-slice series — one row per "
              "hour of the SLO evaluation range",
    ).rangeBetween(-(long_hours * 3600 - 1), 0)
    bad_frac = F.lit(1.0 - spec.target)
    bad = F.col("total") - F.col("good")
    burn_1h = bad / (F.col("total") * bad_frac)
    burn_long = (
        F.sum(bad).over(w).cast("double")
        / (F.sum("total").over(w) * bad_frac)
    )
    return series.select(
        "slice_epoch", "good", "total",
        F.round(burn_1h, 6).alias("burn_1h"),
        F.round(burn_long, 6).alias("burn_long"),
        ((F.round(burn_1h, 6) >= threshold)
         & (F.round(burn_long, 6) >= threshold)).alias("fast_burn"),
    )
