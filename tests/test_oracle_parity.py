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


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
