"""Query/operator registry — the driver-facing surface.

Every implemented operator from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with an ANSI
SQL oracle string that DuckDB runs over the same parquet tables.  Column
names are aliased identically on both sides — the driver sorts columns by
name before hashing values.

Registration is decorator-based; importing this package imports every
query module so the registry is fully populated.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query callable and (optionally) its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check —
    reserved for genuinely non-SQL-expressible operators (approx sketches,
    binary decode, custom stateful streaming).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _import_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _import_all()
    return dict(_ORACLES)


_IMPORTED = False


def _import_all() -> None:
    global _IMPORTED
    if _IMPORTED:
        return
    # Imported for registration side effects.
    from . import (  # noqa: F401
        relational,
        windows,
        parsing,
        ingest,
        text,
        dedup,
        similarity,
        sumoql_queries,
        catalog_ops,
        extensions,
        ingest_gap,
        advanced,
        timeseries,
        sampling,
    )
    _IMPORTED = True
