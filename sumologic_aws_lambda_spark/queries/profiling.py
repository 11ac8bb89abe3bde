"""Data profiling and rule-based data-quality validation.

The reference trusts its inputs (Lambda sources validate shape only —
e.g. the ASFF gate, ``securityhub/src`` per SURVEY §2.4 F7).  A 100 TB
ingestion engine cannot: before a corpus feeds training or dashboards,
operators profile it and gate it on declarative quality constraints
(the Deequ/Great-Expectations pattern — Schelter et al., VLDB 2018,
"Automating Large-Scale Data Quality Verification").

Two surfaces:

- ``table_profile`` — one long-form row per column: row/null/distinct
  counts and string-cast min/max.  All per-column aggregates ride ONE
  ``agg`` over ONE scan; the multi-column exact ``count(DISTINCT)``
  plans as a single Expand (k× row multiplication, k = column count)
  feeding one partial+final aggregate — the exact-profile cost is k
  map-side copies, never k scans.  At 100 TB swap the exact distincts
  for ``approx_count_distinct`` (HLL, no Expand) — the
  ``approx_count_distinct_parts`` registry entry is that path.
- ``data_quality_checks`` — a constraint suite evaluated as ONE
  conditional aggregate per table plus one anti-join per referential
  rule: completeness, key uniqueness, value ranges, set membership,
  referential integrity.  Emits (check_name, metric, status) so a
  scheduler can alert on any failed row — the monitor surface
  (plans/monitors.py) consumes exactly this shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query

_PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderpriority",
)


@query(
    "table_profile",
    oracle="""
    WITH prof AS (
        SELECT
            count(*) AS n_rows,
            count(o_orderkey)      AS nn_o_orderkey,
            count(o_custkey)       AS nn_o_custkey,
            count(o_orderstatus)   AS nn_o_orderstatus,
            count(o_totalprice)    AS nn_o_totalprice,
            count(o_orderpriority) AS nn_o_orderpriority,
            count(DISTINCT o_orderkey)      AS nd_o_orderkey,
            count(DISTINCT o_custkey)       AS nd_o_custkey,
            count(DISTINCT o_orderstatus)   AS nd_o_orderstatus,
            count(DISTINCT o_totalprice)    AS nd_o_totalprice,
            count(DISTINCT o_orderpriority) AS nd_o_orderpriority,
            CAST(min(o_orderkey) AS VARCHAR)      AS mn_o_orderkey,
            CAST(min(o_custkey) AS VARCHAR)       AS mn_o_custkey,
            CAST(min(o_orderstatus) AS VARCHAR)   AS mn_o_orderstatus,
            CAST(round(min(o_totalprice), 2) AS VARCHAR) AS mn_o_totalprice,
            CAST(min(o_orderpriority) AS VARCHAR) AS mn_o_orderpriority,
            CAST(max(o_orderkey) AS VARCHAR)      AS mx_o_orderkey,
            CAST(max(o_custkey) AS VARCHAR)       AS mx_o_custkey,
            CAST(max(o_orderstatus) AS VARCHAR)   AS mx_o_orderstatus,
            CAST(round(max(o_totalprice), 2) AS VARCHAR) AS mx_o_totalprice,
            CAST(max(o_orderpriority) AS VARCHAR) AS mx_o_orderpriority
        FROM orders
    )
    SELECT u.column_name,
           prof.n_rows,
           u.n_nulls,
           u.n_distinct,
           u.min_value,
           u.max_value
    FROM prof, LATERAL (
        SELECT * FROM (VALUES
            ('o_orderkey',      prof.n_rows - prof.nn_o_orderkey,
             prof.nd_o_orderkey, prof.mn_o_orderkey, prof.mx_o_orderkey),
            ('o_custkey',       prof.n_rows - prof.nn_o_custkey,
             prof.nd_o_custkey, prof.mn_o_custkey, prof.mx_o_custkey),
            ('o_orderstatus',   prof.n_rows - prof.nn_o_orderstatus,
             prof.nd_o_orderstatus, prof.mn_o_orderstatus,
             prof.mx_o_orderstatus),
            ('o_totalprice',    prof.n_rows - prof.nn_o_totalprice,
             prof.nd_o_totalprice, prof.mn_o_totalprice,
             prof.mx_o_totalprice),
            ('o_orderpriority', prof.n_rows - prof.nn_o_orderpriority,
             prof.nd_o_orderpriority, prof.mn_o_orderpriority,
             prof.mx_o_orderpriority)
        ) v(column_name, n_nulls, n_distinct, min_value, max_value)
    ) u
    """,
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler over ``orders``.

    One wide ``agg`` computes every per-column statistic; the stack()
    pivot to long form runs on the resulting SINGLE row.  min/max are
    emitted as strings so one schema serves heterogeneous columns
    (floats rounded before the cast for hash stability).
    """
    o = table(spark, sf_dir, "orders")
    # One Expand-free global agg for counts/min/max, plus one
    # partial-agg distinct count per column, cross-joined as 1-row
    # frames.  Mixing five count_distincts into the single agg planned
    # an Expand (each input row duplicated once per distinct branch —
    # 6× the rows) and, because the min/max-over-string buffers force
    # the whole aggregate onto the SortAggregate path, TWO full sorts
    # of the expanded stream.  Split this way the global agg needs no
    # sort at all (no grouping keys) and each distinct shuffles only
    # its distinct values after map-side partial aggregation (r14,
    # guide §2.3/§2.4; measured 3.4 → ~1 s at sf0.1).
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        col = F.col(c)
        is_float = c == "o_totalprice"
        mn = F.round(F.min(col), 2) if is_float else F.min(col)
        mx = F.round(F.max(col), 2) if is_float else F.max(col)
        aggs += [
            F.count(col).alias(f"nn_{c}"),
            mn.cast("string").alias(f"mn_{c}"),
            mx.cast("string").alias(f"mx_{c}"),
        ]
    wide = o.agg(*aggs)
    for c in _PROFILE_COLS:
        nd = (
            o.groupBy(c).agg(F.lit(1))
            .agg(F.count(F.when(F.col(c).isNotNull(), 1))
                 .alias(f"nd_{c}"))
        )
        wide = wide.crossJoin(F.broadcast(nd))
    stack_args = ", ".join(
        f"'{c}', n_rows - nn_{c}, nd_{c}, mn_{c}, mx_{c}"
        for c in _PROFILE_COLS
    )
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
    ).select(
        "column_name", "n_rows", "n_nulls", "n_distinct",
        "min_value", "max_value",
    )


@query(
    "data_quality_checks",
    oracle="""
    WITH base AS (
        SELECT
            count(*) AS n_rows,
            count(*) - count(o_custkey)    AS null_custkey,
            count(*) - count(o_totalprice) AS null_totalprice,
            count(*) - count(DISTINCT o_orderkey) AS dup_orderkey,
            CAST(count_if(o_totalprice <= 0) AS BIGINT) AS nonpos_price,
            CAST(count_if(o_orderpriority NOT IN
                ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'))
                AS BIGINT) AS bad_priority,
            CAST(count_if(o_orderdate < TIMESTAMP '1990-01-01'
                       OR o_orderdate >= TIMESTAMP '2005-01-01')
                AS BIGINT) AS bad_orderdate
        FROM orders
    ),
    orphans AS (
        SELECT CAST(count(*) AS BIGINT) AS orphan_orders
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    )
    SELECT v.check_name, v.metric,
           CASE WHEN v.metric = 0 THEN 'pass' ELSE 'fail' END AS status
    FROM base, orphans, LATERAL (
        SELECT * FROM (VALUES
            ('complete_custkey',      base.null_custkey),
            ('complete_totalprice',   base.null_totalprice),
            ('unique_orderkey',       base.dup_orderkey),
            ('positive_totalprice',   base.nonpos_price),
            ('priority_in_domain',    base.bad_priority),
            ('orderdate_in_range',    base.bad_orderdate),
            ('fk_orders_customer',    orphans.orphan_orders)
        ) t(check_name, metric)
    ) v
    """,
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative constraint suite over ``orders``.

    Every in-table rule (completeness, uniqueness, range, domain) is a
    conditional aggregate inside ONE scan; the referential rule is one
    LEFT ANTI join counted.  The result is the violation COUNT per rule
    with a pass/fail status — zero violations means the table gates
    clean.  At 100 TB this stays two jobs regardless of rule count.
    """
    o = table(spark, sf_dir, "orders")
    domain = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    base = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("null_custkey"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).alias("null_totalprice"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("dup_orderkey"),
        F.count_if(F.col("o_totalprice") <= 0).alias("nonpos_price"),
        F.count_if(~F.col("o_orderpriority").isin(*domain)).alias("bad_priority"),
        F.count_if(
            (F.col("o_orderdate") < "1990-01-01")
            | (F.col("o_orderdate") >= "2005-01-01")
        ).alias("bad_orderdate"),
    )
    c = table(spark, sf_dir, "customer").select("c_custkey")
    orphans = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_orders"))
    )
    checks = base.crossJoin(F.broadcast(orphans)).select(
        F.expr(
            "stack(7, "
            "'complete_custkey', null_custkey, "
            "'complete_totalprice', null_totalprice, "
            "'unique_orderkey', dup_orderkey, "
            "'positive_totalprice', nonpos_price, "
            "'priority_in_domain', bad_priority, "
            "'orderdate_in_range', bad_orderdate, "
            "'fk_orders_customer', orphan_orders) "
            "AS (check_name, metric)"
        )
    )
    return checks.select(
        "check_name", "metric",
        F.when(F.col("metric") == 0, "pass").otherwise("fail").alias("status"),
    )
