"""Skew-mitigation operators: salted aggregation and salted broadcast
join.

At 100 TB the routing key (`source_category`, SURVEY §2.6 A1) is
Zipf-distributed — a handful of hot categories dominate.  AQE's skew
handling only splits *join* partitions; a skewed high-cardinality
``groupBy`` still funnels each hot key through one reducer.  The
standard fix is two-phase aggregation with a salt:

    groupBy(key, salt) partial-agg   → uniform shuffle (fan_out× keys)
    groupBy(key) final-agg           → tiny second shuffle (one row per
                                       key per salt)

Only algebraic aggregates (sum/count/min/max, and avg as sum+count)
can be salted this way; the wrappers below expose exactly those.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, fan_out: int = 16,
              salt_col: str = "_salt") -> DataFrame:
    """Uniform salt derived from a per-row random draw.  ``rand`` is
    seeded per-partition by Spark; for engine-reproducible tests prefer
    ``salt_from`` on an existing unique column."""
    return df.withColumn(
        salt_col, (F.rand() * fan_out).cast("int")
    )


def salt_from(col: Column | str, fan_out: int = 16) -> Column:
    """Deterministic salt from a unique column.

    ``pmod``, NOT ``abs(hash) % n``: ``abs(Integer.MIN_VALUE)`` is still
    negative (non-ANSI two's-complement), and Spark's ``%`` keeps the
    dividend's sign — so for any ``fan_out`` not dividing 2³¹ a
    1-in-2³² row would get a NEGATIVE salt, which silently misses every
    dim replica (0..fan_out-1) in :func:`replicated_join`.  ``pmod`` is
    non-negative by definition."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.hash(c), F.lit(fan_out)).cast("int")


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, str],
               salt: Column) -> DataFrame:
    """Two-phase skew-safe aggregation.  The ``salt`` column fully
    determines the fan-out (build it with :func:`salt_from` /
    :func:`with_salt`).

    ``aggs`` maps output column → ``"fn(col)"`` with fn ∈ sum | count |
    min | max | avg (``count(*)`` included).  avg decomposes into
    sum+count across the phases (a plain avg-of-avgs would weight salt
    buckets wrongly).
    """
    import re

    partial_cols, final_cols = [], []
    for out, spec in aggs.items():
        # \w+ OR the literal * — count(*) is the most common aggregate
        # and the '*' branch below handles it
        m = re.match(r"^(sum|count|min|max|avg)\((\w+|\*)\)$", spec)
        if not m:
            raise ValueError(f"unsupported salted aggregate: {spec!r}")
        fn, col = m.groups()
        if fn == "avg":
            partial_cols += [F.sum(col).alias(f"__s_{out}"),
                             F.count(col).alias(f"__c_{out}")]
            final_cols.append(
                (F.sum(f"__s_{out}") / F.sum(f"__c_{out}")).alias(out)
            )
        elif fn == "count":
            partial_cols.append(F.count(col if col != "*" else F.lit(1))
                                .alias(f"__p_{out}"))
            final_cols.append(F.sum(f"__p_{out}").cast("long").alias(out))
        else:
            partial_cols.append(getattr(F, fn)(col).alias(f"__p_{out}"))
            # sum re-sums; min/max re-min/re-max — all algebraic
            refn = F.sum if fn == "sum" else getattr(F, fn)
            final_cols.append(refn(f"__p_{out}").alias(out))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partial_cols)
    )
    return partial.groupBy(*keys).agg(*final_cols)


def replicated_join(facts: DataFrame, dim: DataFrame, on: str,
                    fan_out: int = 16,
                    fact_salt: Column | None = None) -> DataFrame:
    """Skewed fact ⋈ dim via salt replication.  (For a *small* dim just
    broadcast — salting is the resort when both sides must shuffle.)

    The dim side explodes across all ``fan_out`` salts; each fact row
    picks ONE salt — random by default, which is what actually splits a
    hot key across reducers (salting by the join key itself would send
    the whole hot key to one salt again).  Pass a deterministic
    ``fact_salt`` (e.g. ``salt_from("row_id")``) for reproducible tests.
    """
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(fan_out - 1)))
    )
    salt = fact_salt if fact_salt is not None \
        else (F.rand() * fan_out).cast("int")
    salted_facts = facts.withColumn("__salt", salt)
    return salted_facts.join(
        salted_dim, on=[on, "__salt"], how="left"
    ).drop("__salt")
