"""Distribution-drift monitoring: PSI between time halves and a
Benford first-digit audit.

The reference's monitor tier alerts on threshold breaches
(``monitor_threshold_alerts``, ``ewma_drift_alerts``); these two add
the DISTRIBUTION-level checks an ML-ops pipeline runs on features and
a forensic DQ pipeline runs on amounts:

* PSI (population stability index) — the standard feature-drift score
  between a reference and a current window.  Categorical form here
  (event-type shares between the stream's two halves); the numeric
  form is the same algebra after decile bucketing (see
  ``value_percentile_bands`` for the bucketer).
* Benford — first-significant-digit frequencies of a monetary column
  against log10(1 + 1/d), the classic fabricated-data screen
  (Benford 1938, public).

Scale: each is one partial-aggregatable groupBy over the facts plus
arithmetic on a ≤10-row frame; totals ride as one broadcast scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query


@query(
    "psi_drift_score",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS e
        FROM events
    ),
    bounds AS (SELECT (min(e) + max(e)) // 2 AS mid FROM e),
    per_type AS (
        SELECT event_type,
               CAST(count(*) FILTER (WHERE e.e < b.mid) AS BIGINT)
                   AS ref_n,
               CAST(count(*) FILTER (WHERE e.e >= b.mid) AS BIGINT)
                   AS cur_n
        FROM e, bounds b GROUP BY event_type
    ),
    tot AS (
        SELECT CAST(sum(ref_n) AS BIGINT) AS ref_t,
               CAST(sum(cur_n) AS BIGINT) AS cur_t
        FROM per_type
    )
    SELECT p.event_type, p.ref_n, p.cur_n,
           round(CAST(p.ref_n AS DOUBLE) / t.ref_t, 6) AS ref_share,
           round(CAST(p.cur_n AS DOUBLE) / t.cur_t, 6) AS cur_share,
           round((CAST(p.cur_n AS DOUBLE) / t.cur_t
                  - CAST(p.ref_n AS DOUBLE) / t.ref_t)
                 * ln((CAST(p.cur_n AS DOUBLE) / t.cur_t)
                      / (CAST(p.ref_n AS DOUBLE) / t.ref_t)), 6)
               AS psi_term
    FROM per_type p CROSS JOIN tot t
    """,
)
def psi_drift_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between the stream's two epoch
    halves, per event type: share in the reference window vs the
    current window and the per-category PSI term
    ``(q - p) * ln(q / p)`` (sum ≥ 0.2 is the conventional
    "significant drift" alert).

    ONE conditional-count groupBy collapses the facts to a
    category-cardinality frame (the split predicate rides the
    aggregate — the corpus is scanned once, not twice); category
    totals are a second tiny aggregate broadcast back.  Shares are
    single divisions of exact counts and ``ln`` on identical doubles
    agrees across engines (rules 2/12); every category present in the
    fixture appears in both halves, so no smoothing term is needed at
    oracle scale (production adds Laplace +1 to both numerators —
    same algebra).
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.unix_timestamp("ts").alias("e"))
    bounds = ev.agg(F.expr("(min(e) + max(e)) div 2").alias("mid"))
    per_type = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("e") < F.col("mid"), 1)).alias("ref_n"),
            F.count(F.when(F.col("e") >= F.col("mid"), 1)).alias("cur_n"),
        )
    )
    tot = per_type.agg(F.sum("ref_n").alias("ref_t"),
                       F.sum("cur_n").alias("cur_t"))
    p = F.col("ref_n").cast("double") / F.col("ref_t")
    q = F.col("cur_n").cast("double") / F.col("cur_t")
    return (
        per_type.crossJoin(F.broadcast(tot))
        .select(
            "event_type", "ref_n", "cur_n",
            F.round(p, 6).alias("ref_share"),
            F.round(q, 6).alias("cur_share"),
            F.round((q - p) * F.log(q / p), 6).alias("psi_term"),
        )
    )


@query(
    "benford_digit_audit",
    oracle="""
    WITH digits AS (
        SELECT CAST(floor(o_totalprice
                    / pow(10, floor(log10(o_totalprice)))) AS BIGINT)
                   AS d
        FROM orders WHERE o_totalprice > 0
    ),
    counts AS (
        SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts)
    SELECT c.d AS digit, c.n,
           round(CAST(c.n AS DOUBLE) / t.t, 6) AS obs_share,
           round(log10(1.0 + 1.0 / c.d), 6) AS benford_share,
           round(t.t * pow(CAST(c.n AS DOUBLE) / t.t
                           - log10(1.0 + 1.0 / c.d), 2)
                 / log10(1.0 + 1.0 / c.d), 4) AS chi2_term
    FROM counts c CROSS JOIN tot t
    """,
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed vs
    expected ``log10(1 + 1/d)`` share per leading digit, with the
    per-digit chi-square contribution — the classic screen for
    fabricated or truncated monetary data.

    The leading digit is pure column math (``floor(x / 10^floor(
    log10 x))`` — no string formatting, which differs across engines);
    one groupBy collapses the facts to ≤9 rows and the total is one
    broadcast scalar.  ``log10``/``pow`` on identical doubles agree
    across engines (rule 12); shares are single divisions of exact
    counts (rule 2).
    """
    digits = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.floor(F.col("o_totalprice")
                    / F.pow(F.lit(10.0),
                            F.floor(F.log10("o_totalprice"))))
            .cast("long").alias("d"))
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("t"))
    obs = F.col("n").cast("double") / F.col("t")
    exp = F.log10(1.0 + 1.0 / F.col("d"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("digit"), "n",
            F.round(obs, 6).alias("obs_share"),
            F.round(exp, 6).alias("benford_share"),
            F.round(F.col("t") * F.pow(obs - exp, 2) / exp, 4)
            .alias("chi2_term"),
        )
    )
