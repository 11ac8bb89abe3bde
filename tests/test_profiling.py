"""Tests for the profiling/data-quality wave: value sanity plus the
single-scan plan property the module docstring claims."""

from __future__ import annotations

import os

import pytest

from sumologic_aws_lambda_spark import queries as registry
from sumologic_aws_lambda_spark.catalog import table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def qs():
    return registry.all_queries()


def _scan_count(df, fragment: str) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count(fragment)


def test_table_profile_values(spark, qs):
    rows = {r["column_name"]: r
            for r in qs["table_profile"](spark, SF_DIR).collect()}
    n = table(spark, SF_DIR, "orders").count()
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderpriority",
    }
    for r in rows.values():
        assert r["n_rows"] == n
        assert 0 <= r["n_nulls"] <= n
        assert 1 <= r["n_distinct"] <= n
    # the primary key profiles as fully distinct and fully non-null
    pk = rows["o_orderkey"]
    assert pk["n_nulls"] == 0 and pk["n_distinct"] == n


def test_table_profile_single_scan(spark, qs):
    df = qs["table_profile"](spark, SF_DIR)
    assert _scan_count(df, "orders.parquet") == 1


def test_data_quality_all_pass_on_clean_data(spark, qs):
    rows = qs["data_quality_checks"](spark, SF_DIR).collect()
    assert len(rows) == 7
    assert all(r["status"] == "pass" and r["metric"] == 0 for r in rows)


def test_data_quality_two_scans_max(spark, qs):
    # one conditional-aggregate scan + one anti-join probe scan
    df = qs["data_quality_checks"](spark, SF_DIR)
    assert _scan_count(df, "orders.parquet") <= 2
