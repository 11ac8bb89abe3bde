"""Time-series stages for the SumoQL compiler.

Sumo's search language layers ordered, post-aggregation operators on top
of timesliced results (the dashboards the reference's "benchmark" content
packs configure are built from exactly these — e.g. the panel queries in
``/root/reference/cloudtrailbenchmark/template.yaml:316,335`` and
``cloudwatchevents/guarddutybenchmark/template_v2.yaml:157`` reference
saved searches that pipe ``timeslice | count by`` into rollup/outlier
panels).  The language surface here follows Sumo's public operator docs:

    accum <f> [as a] [by g,...]          running total         -> _accum
    total <f> [as a] [by g,...]          grand total per group -> _total
    backshift <f>[, n] [as a] [by g,...] value n rows earlier  -> _backshift
    diff <f> [as a] [by g,...]           delta vs previous row -> _diff
    smooth <f>[, w] [as a] [by g,...]    trailing mean, window w  -> _smooth
    rollingstd <f>[, w] [as a] [by g,...] trailing stddev      -> _rollingstd
    fillmissing timeslice(<dur>) [by g,...]  dense time axis, zero-fill
    outlier <f> [by g,...] [window=n] [threshold=k]  -> _mu _sigma _violation
    transpose row <r> column <c> as v1, v2, ...      explicit-domain pivot
    predict <f>[, n] [by g,...]          linear forecast       -> _predicted

Scale notes (100 TB stance):

* Every stage here runs AFTER aggregation — the input is a timesliced
  series (thousands of rows per group, not the fact table), so a window
  shuffle on the group key is the right physical plan; partitions are
  tiny by construction.
* Ordering is explicit: ``_timeslice`` when present, else the bound
  timestamp column — never arrival order, which is undefined under
  distributed reads.
* Float-summing window aggregates (smooth/rollingstd/outlier/predict)
  use DECIMAL sufficient statistics — decimal addition is exact and
  order-independent, so results are reproducible across partitionings
  (and bit-identical to the DuckDB oracle).
* ``transpose`` takes an EXPLICIT column domain (the ``as`` list): an
  implicit pivot runs a distinct-discovery job over the input first —
  never acceptable on a fact table.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..planmarks import bounded_global_window
from .sumoql import SumoQLError, SumoSchema, _UNIT_SECONDS

# `<field>[, <n>] [as <alias>] [by g1, g2]`
_TS_STAGE_RE = re.compile(
    r"^([\w]+)(?:\s*,\s*(\d+))?(?:\s+as\s+(\w+))?(?:\s+by\s+([\w,\s]+))?$",
    re.IGNORECASE,
)


def _parse_ts_stage(rest: str, default_n: int | None = None):
    m = _TS_STAGE_RE.match(rest.strip())
    if not m:
        raise SumoQLError(f"bad time-series stage args: {rest!r}")
    field, n, alias, by = m.groups()
    groups = [g.strip() for g in by.split(",")] if by else []
    return field, (int(n) if n else default_n), alias, groups


def _order_col(df: DataFrame, schema: SumoSchema) -> str:
    """The deterministic ordering column for sequential stages."""
    if "_timeslice" in df.columns:
        return "_timeslice"
    if schema.ts_col in df.columns:
        return schema.ts_col
    raise SumoQLError(
        "time-series stage needs a '_timeslice' (run 'timeslice' first) "
        f"or the bound timestamp column {schema.ts_col!r}"
    )


def _seq_window(df: DataFrame, schema: SumoSchema, groups: list[str]):
    if groups:
        return Window.partitionBy(*groups).orderBy(_order_col(df, schema))
    return bounded_global_window(
        _order_col(df, schema),
        bound="post-aggregation timeslice series — one row per slice "
              "of the query time range (sumoql accum/outlier stages "
              "run after `timeslice | count by`)")


_DEC = "decimal(28,6)"


def stage_accum(df: DataFrame, rest: str, schema: SumoSchema) -> DataFrame:
    field, _, alias, groups = _parse_ts_stage(rest)
    w = _seq_window(df, schema, groups).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = F.sum(F.col(field).cast(_DEC)).over(w).cast("double")
    return df.withColumn(alias or "_accum", run)


def stage_total(df: DataFrame, rest: str, schema: SumoSchema) -> DataFrame:
    field, _, alias, groups = _parse_ts_stage(rest)
    w = Window.partitionBy(*groups) if groups else Window.partitionBy()
    tot = F.sum(F.col(field).cast(_DEC)).over(w).cast("double")
    return df.withColumn(alias or "_total", tot)


def stage_backshift(df: DataFrame, rest: str, schema: SumoSchema) -> DataFrame:
    field, n, alias, groups = _parse_ts_stage(rest, default_n=1)
    w = _seq_window(df, schema, groups)
    return df.withColumn(alias or "_backshift", F.lag(field, n).over(w))


def stage_diff(df: DataFrame, rest: str, schema: SumoSchema) -> DataFrame:
    field, _, alias, groups = _parse_ts_stage(rest)
    w = _seq_window(df, schema, groups)
    return df.withColumn(
        alias or "_diff", F.col(field) - F.lag(field, 1).over(w)
    )


def _trailing_stats(df: DataFrame, field: str, schema: SumoSchema,
                    groups: list[str], window: int, end: int = 0):
    """(s, sq, n) decimal sufficient stats over a trailing row frame."""
    w = _seq_window(df, schema, groups).rowsBetween(-(window - 1) + end, end)
    dec = F.col(field).cast(_DEC)
    s = F.sum(dec).over(w).cast("double")
    sq = F.sum(dec * dec).over(w).cast("double")
    n = F.count(field).over(w).cast("double")
    return s, sq, n


def stage_smooth(df: DataFrame, rest: str, schema: SumoSchema) -> DataFrame:
    field, window, alias, groups = _parse_ts_stage(rest, default_n=10)
    s, _, n = _trailing_stats(df, field, schema, groups, window)
    return df.withColumn(alias or "_smooth", s / n)


def stage_rollingstd(df: DataFrame, rest: str,
                     schema: SumoSchema) -> DataFrame:
    field, window, alias, groups = _parse_ts_stage(rest, default_n=10)
    s, sq, n = _trailing_stats(df, field, schema, groups, window)
    std = F.when(
        n >= 2,
        F.sqrt(F.greatest((sq - s * s / n) / (n - 1), F.lit(0.0))),
    )
    return df.withColumn(alias or "_rollingstd", std)


_FILL_RE = re.compile(
    r"^timeslice\s*\(\s*(\d+)([smhd])\s*\)(?:\s+by\s+([\w,\s]+))?$",
    re.IGNORECASE,
)


def stage_fillmissing(df: DataFrame, rest: str,
                      schema: SumoSchema) -> DataFrame:
    """Densify the ``_timeslice`` axis from per-group min to max; numeric
    measure columns zero-fill (a missing slice means zero events).

    Physical shape: per-group min/max agg (tiny), ``sequence`` +
    ``explode`` to build the dense axis, then a join back.  The axis side
    is small (slices × groups); Catalyst broadcasts it when under the
    threshold.
    """
    m = _FILL_RE.match(rest.strip())
    if not m:
        raise SumoQLError(f"bad fillmissing stage: {rest!r}")
    n, unit, by = m.groups()
    step = int(n) * _UNIT_SECONDS[unit]
    groups = [g.strip() for g in by.split(",")] if by else []
    if "_timeslice" not in df.columns:
        raise SumoQLError("fillmissing requires a prior 'timeslice' stage")

    bounds = (df.groupBy(*groups) if groups else df.groupBy()).agg(
        F.min("_timeslice").alias("_lo"), F.max("_timeslice").alias("_hi")
    )
    axis = bounds.select(
        *groups,
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"interval {step} seconds"))
        ).alias("_timeslice"),
    )
    joined = axis.join(df, on=[*groups, "_timeslice"], how="left")
    filled = [
        F.coalesce(F.col(c), F.lit(0)).alias(c)
        if isinstance(t, str) and t in
        ("bigint", "int", "double", "float", "long", "smallint")
        else F.col(c)
        for c, t in joined.dtypes
        if c not in groups and c != "_timeslice"
    ]
    return joined.select(*groups, "_timeslice", *filled)


_OUTLIER_RE = re.compile(
    r"^([\w]+)(?:\s+by\s+([\w,\s]+?))?"
    r"((?:\s+\w+\s*=\s*[-+\d.]+)*)$",
    re.IGNORECASE,
)


def stage_outlier(df: DataFrame, rest: str, schema: SumoSchema) -> DataFrame:
    """Trailing-baseline anomaly flag; frame ends at 1 PRECEDING so a
    point never contaminates its own baseline (same construction as the
    standalone ``outlier_detection`` query).  ``direction=+`` flags only
    upward deviations, ``direction=-`` only downward (Sumo's option;
    default both)."""
    m = _OUTLIER_RE.match(rest.strip())
    if not m:
        raise SumoQLError(f"bad outlier stage: {rest!r}")
    field, by, opts_text = m.groups()
    groups = [g.strip() for g in by.split(",")] if by else []
    opts = dict(re.findall(r"(\w+)\s*=\s*([-+\d.]+)", opts_text or ""))
    window = int(opts.get("window", 10))
    threshold = float(opts.get("threshold", 3.0))
    direction = opts.get("direction", "+-")
    s, sq, n = _trailing_stats(df, field, schema, groups, window, end=-1)
    mu = s / n
    sigma = F.when(
        n >= 2,
        F.sqrt(F.greatest((sq - s * s / n) / (n - 1), F.lit(0.0))),
    )
    dev = F.col(field) - F.col("_mu")
    if direction == "+":
        breach = dev > F.lit(threshold) * F.col("_sigma")
    elif direction == "-":
        breach = -dev > F.lit(threshold) * F.col("_sigma")
    else:
        breach = F.abs(dev) > F.lit(threshold) * F.col("_sigma")
    return (
        df.withColumn("_mu", mu)
        .withColumn("_sigma", sigma)
        .withColumn(
            "_violation",
            F.when(
                F.col("_sigma").isNotNull() & breach, F.lit(1)
            ).otherwise(F.lit(0)),
        )
    )


_TRANSPOSE_RE = re.compile(
    r"^row\s+(\w+)\s+column\s+(\w+)\s+as\s+([\w,\s]+)$", re.IGNORECASE
)


def stage_transpose(df: DataFrame, rest: str,
                    schema: SumoSchema) -> DataFrame:
    """``transpose row r column c as v1, v2, …`` — the ``as`` list IS the
    pivot domain (explicit, so no distinct-discovery pre-job); the cell
    value is the single remaining measure column."""
    m = _TRANSPOSE_RE.match(rest.strip())
    if not m:
        raise SumoQLError(f"bad transpose stage: {rest!r}")
    row_key, col_key, domain_text = m.groups()
    domain = [d.strip() for d in domain_text.split(",")]
    measures = [c for c in df.columns if c not in (row_key, col_key)]
    if len(measures) != 1:
        raise SumoQLError(
            f"transpose needs exactly one measure column, got {measures}"
        )
    out = (
        df.groupBy(row_key)
        .pivot(col_key, domain)
        .agg(F.max(measures[0]))
    )
    return out.select(
        row_key,
        *[F.coalesce(F.col(d), F.lit(0)).alias(d) for d in domain],
    )


def stage_predict(df: DataFrame, rest: str, schema: SumoSchema) -> DataFrame:
    """``predict <f>[, n] [by g,...]`` — ordinary-least-squares linear
    model per group over (epoch(order), f); emits the observed rows with
    the fitted value plus ``n`` forecast rows (field null, ``_predicted``
    populated) at the trailing slice cadence.

    Slope/intercept come from decimal sufficient stats (n, Σx, Σy, Σxy,
    Σx²) — exact, order-independent sums, reproducible across engines —
    rather than float ``regr_slope`` whose summation order varies.
    """
    field, horizon, alias, groups = _parse_ts_stage(rest, default_n=3)
    ord_col = _order_col(df, schema)
    out_col = alias or "_predicted"

    x = F.unix_timestamp(F.col(ord_col)).cast(_DEC)
    y = F.col(field).cast(_DEC)
    gb = df.groupBy(*groups) if groups else df.groupBy()
    big = "decimal(38,6)"
    fit = gb.agg(
        F.count(field).cast("double").alias("_n"),
        F.sum(x).cast("double").alias("_sx"),
        F.sum(y).cast("double").alias("_sy"),
        F.sum((x * y).cast(big)).cast("double").alias("_sxy"),
        F.sum((x * x).cast(big)).cast("double").alias("_sxx"),
        F.max(ord_col).alias("_xmax"),
        F.max(F.unix_timestamp(F.col(ord_col))).alias("_xmax_epoch"),
        # trailing cadence: (max-min)/(n-1); degenerate single-point
        # series forecast flat at 1-step = 1 second
        ((F.max(F.unix_timestamp(F.col(ord_col)))
          - F.min(F.unix_timestamp(F.col(ord_col))))
         / F.greatest(F.count(field) - 1, F.lit(1))).alias("_step"),
    ).withColumn(
        "_slope",
        F.when(
            F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx") != 0,
            (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
            / (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")),
        ).otherwise(F.lit(0.0)),
    ).withColumn(
        "_intercept",
        (F.col("_sy") - F.col("_slope") * F.col("_sx")) / F.col("_n"),
    )

    on = groups if groups else None
    observed = (
        (df.join(F.broadcast(fit), on=on) if on
         else df.crossJoin(F.broadcast(fit)))
        .withColumn(
            out_col,
            F.col("_intercept")
            + F.col("_slope")
            * F.unix_timestamp(F.col(ord_col)).cast("double"),
        )
    )
    keep = [*df.columns, out_col]
    observed = observed.select(*keep)

    steps = F.sequence(F.lit(1), F.lit(horizon))
    future = (
        fit.select(
            *groups, "_xmax_epoch", "_step", "_slope", "_intercept",
            F.explode(steps).alias("_i"),
        )
        .withColumn(
            "_x",
            (F.col("_xmax_epoch")
             + F.col("_i") * F.greatest(F.col("_step"), F.lit(1.0)))
            .cast("long"),
        )
        .withColumn(ord_col, F.timestamp_seconds(F.col("_x")))
        .withColumn(
            out_col,
            F.col("_intercept") + F.col("_slope") * F.col("_x").cast("double"),
        )
        .withColumn(field, F.lit(None).cast(dict(df.dtypes)[field]))
    )
    missing = [c for c in df.columns if c not in future.columns]
    for c in missing:
        future = future.withColumn(c, F.lit(None).cast(dict(df.dtypes)[c]))
    return observed.unionByName(future.select(*keep))


_COMPARE_RE = re.compile(
    r"^(?:with\s+)?timeshift\s+(\d+)([smhd])(?:\s+(\d+))?$",
    re.IGNORECASE,
)


def stage_compare(df: DataFrame, rest: str, schema: SumoSchema) -> DataFrame:
    """``compare [with] timeshift <dur> [N]`` — Sumo's period-over-period
    comparison: every aggregate column ``X`` of a timesliced series gains
    ``X_<dur>`` holding the value one ``<dur>`` earlier (with ``N``:
    ``X_<dur>_avg``, the mean of the N previous periods).

    Physical shape: the input is an already-aggregated series, so the
    shifted replica is built by adding the offset to ``_timeslice`` (for
    ``N`` periods: a ``sequence`` explode — N small copies of the
    aggregated frame, never the fact table) and equi-joined back on
    ``(_timeslice, group keys)``.  AQE broadcasts the shifted side when
    small; there is no window, so nothing serializes on a single task.
    """
    m = _COMPARE_RE.match(rest.strip())
    if not m:
        raise SumoQLError(f"bad compare stage: {rest!r}")
    n_units, unit, periods = int(m.group(1)), m.group(2), m.group(3)
    shift_s = n_units * _UNIT_SECONDS[unit.lower()]
    n_periods = int(periods) if periods else 1
    if "_timeslice" not in df.columns:
        raise SumoQLError("compare requires a timesliced series "
                          "(run `timeslice` + an aggregate first)")
    spec = f"{n_units}{unit.lower()}"
    # Key/measure split, in preference order: (1) the agg stage marks
    # its group-by columns in column metadata (`_sumo_group_key`) — the
    # structural signal: everything else numeric (including eval-derived
    # columns like `_count/86400 as rate`) is a measure; (2) without
    # metadata (hand-built series) prefer `_`-prefixed aggregate names;
    # (3) last resort, numeric dtype.  Pure dtype sniffing alone is
    # wrong after the compiler: a numeric group-by key (`count by
    # user_id`) would be classified as a measure, collapsing the prior
    # period to one arbitrary group's value via first().
    def _numeric(t: str) -> bool:
        return (t in ("bigint", "int", "double", "float", "long",
                      "smallint", "tinyint")
                or t.startswith("decimal"))

    marked_keys = {
        f.name for f in df.schema.fields
        if f.metadata.get("_sumo_group_key")
    }
    if marked_keys:
        measures = [c for c, t in df.dtypes
                    if c != "_timeslice" and c not in marked_keys
                    and _numeric(t)]
    else:
        measures = [c for c, t in df.dtypes
                    if c != "_timeslice" and c.startswith("_")
                    and _numeric(t)]
        if not measures:
            measures = [c for c, t in df.dtypes
                        if c != "_timeslice" and _numeric(t)]
    if not measures:
        raise SumoQLError(
            "compare needs at least one numeric aggregate column — "
            "run an aggregation first"
        )
    keys = [c for c in df.columns if c != "_timeslice" and c not in measures]
    suffix = f"_{spec}" + ("_avg" if n_periods > 1 else "")

    shifted = df.select(
        F.explode(F.sequence(F.lit(1), F.lit(n_periods))).alias("_i"),
        F.col("_timeslice").alias("_ts0"),
        *keys,
        *[F.col(c) for c in measures],
    ).select(
        (F.col("_ts0") + F.make_dt_interval(
            secs=F.col("_i").cast("double") * shift_s)).alias("_timeslice"),
        *keys,
        *[F.col(c) for c in measures],
    )
    prev = shifted.groupBy("_timeslice", *keys).agg(*[
        F.avg(c).alias(c + suffix) if n_periods > 1
        else F.first(c).alias(c + suffix)
        for c in measures
    ])
    return df.join(prev, on=["_timeslice", *keys], how="left")


STAGES = {
    "compare": stage_compare,
    "accum": stage_accum,
    "total": stage_total,
    "backshift": stage_backshift,
    "diff": stage_diff,
    "smooth": stage_smooth,
    "rollingstd": stage_rollingstd,
    "fillmissing": stage_fillmissing,
    "outlier": stage_outlier,
    "transpose": stage_transpose,
    "predict": stage_predict,
}
