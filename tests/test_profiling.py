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


def test_table_profile_pruned_scans(spark, qs):
    """Pins the r14 rewrite (OPTIMIZATION_r14.md item 4): the old single
    scan fed an Expand ×6 whose min/max-over-string buffers forced the
    whole 6×-expanded stream through SortAggregate; the new shape is ONE
    full-width global-agg scan plus FIVE per-column distinct-count
    scans, each ReadSchema-pruned to exactly the profiled column, glued
    by 1-row broadcast joins.  (The old `== 1` single-scan pin predated
    that rewrite; the r14 verify run aborted at an earlier failure and
    never reached this file — caught and repinned in r15.)"""
    df = qs["table_profile"](spark, SF_DIR)
    assert _scan_count(df, "orders.parquet") == 6
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    # each distinct-count scan reads exactly one column
    fp = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    import re
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", fp)
    single = [s for s in schemas if s.count(",") == 0]
    assert len(schemas) == 6 and len(single) == 5, schemas


def test_data_quality_all_pass_on_clean_data(spark, qs):
    rows = qs["data_quality_checks"](spark, SF_DIR).collect()
    assert len(rows) == 7
    assert all(r["status"] == "pass" and r["metric"] == 0 for r in rows)


def test_data_quality_two_scans_max(spark, qs):
    # one conditional-aggregate scan + one anti-join probe scan
    df = qs["data_quality_checks"](spark, SF_DIR)
    assert _scan_count(df, "orders.parquet") <= 2
