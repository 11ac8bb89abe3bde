"""Blocked entity resolution: correctness of the best-match contract
and the no-cartesian plan shape."""

from __future__ import annotations

import pytest

from sumologic_aws_lambda_spark import queries as registry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return registry.all_queries()


def test_exact_suffix_matches_at_distance_zero(spark, qs):
    rows = qs["blocked_name_matching"](spark, SF_DIR).collect()
    assert rows
    # Distance 0 means the padded ids are identical strings, so the
    # matched keys must be numerically equal.
    zero = [r for r in rows if r.distance == 0]
    assert zero
    for r in zero:
        assert r.c_custkey == r.s_suppkey


def test_one_best_match_per_customer(spark, qs):
    df = qs["blocked_name_matching"](spark, SF_DIR)
    total = df.count()
    distinct_cust = df.select("c_custkey").distinct().count()
    assert total == distinct_cust


def test_blocked_join_is_not_cartesian(spark, qs):
    plan = (
        qs["blocked_name_matching"](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
