"""Every oracle-paired query must match DuckDB on sf0.001 — the same
comparison the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from sumologic_aws_lambda_spark import queries as registry

from .conftest import SF_DIR
from .oracle_check import compare

_ORACLES = registry.all_oracles()
_QUERIES = registry.all_queries()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, duck, name):
    df = _QUERIES[name](spark, SF_DIR)
    rel = duck.sql(_ORACLES[name])
    ok, msg = compare(df, rel)
    assert ok, f"{name}: {msg}"


_ROWS_ONLY = sorted(set(_QUERIES) - set(_ORACLES))


@pytest.mark.skipif(
    not _ROWS_ONLY,
    reason="every registry query is oracle-paired (the strong check in "
           "test_oracle_parity covers all of them); this weaker "
           "rows-only smoke exists only for future non-SQL-expressible "
           "queries — an EMPTY parameter set here is the healthy state",
)
@pytest.mark.parametrize("name", _ROWS_ONLY or ["<none>"])
def test_rows_only_queries_run(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
