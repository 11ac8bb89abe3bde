"""Entity hierarchies / AWS Explorer analog (``sumoresource.py:884``):
level-spec parsing, conditional-level rollup compilation, ragged
branches, and the reference's CRUD contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.plans.hierarchies import (
    Hierarchy,
    HierarchyCatalog,
    HierarchyLevel,
    explorer_rollup,
)

SPEC = {
    "entityType": "account",
    "nextLevelsWithConditions": [],
    "nextLevel": {
        "entityType": "region",
        "nextLevelsWithConditions": [],
        "nextLevel": {"entityType": "namespace",
                      "nextLevelsWithConditions": []},
    },
}


def test_level_spec_roundtrip_and_depth():
    lvl = HierarchyLevel.from_dict(SPEC)
    assert lvl.entity_type == "account"
    assert lvl.max_depth() == 3
    assert lvl.to_dict() == SPEC


def test_explorer_rollup_three_unconditional_levels(spark):
    df = spark.createDataFrame(
        [("a1", "us-east-1", "ec2"), ("a1", "us-east-1", "rds"),
         ("a1", "us-west-2", "ec2"), ("a2", "us-east-1", "ec2")],
        "account string, region string, namespace string")
    out = explorer_rollup(
        df, HierarchyLevel.from_dict(SPEC),
        dims={c: F.col(c) for c in ("account", "region", "namespace")},
    )
    rows = {r["path"]: (r["depth"], r["entity_type"], r["n_events"])
            for r in out.collect()}
    assert rows["a1"] == (1, "account", 3)
    assert rows["a1/us-east-1"] == (2, "region", 2)
    assert rows["a1/us-east-1/ec2"] == (3, "namespace", 1)
    assert rows["a2/us-east-1/ec2"] == (3, "namespace", 1)
    assert len(rows) == 2 + 3 + 4         # no grand-total row


def test_explorer_rollup_conditional_and_ragged_branches(spark):
    # 'error' rows explore one level deeper (by code); other types stop
    # at depth 1 — ragged: their depth-2 slot must produce NO node and
    # no double-counted depth-1 row.
    spec = HierarchyLevel.from_dict({
        "entityType": "kind",
        "nextLevelsWithConditions": [
            {"condition": "error", "level": {"entityType": "code"}},
        ],
    })
    df = spark.createDataFrame(
        [("error", "500"), ("error", "503"), ("view", "200"),
         ("view", "200")],
        "kind string, code string")
    out = explorer_rollup(df, spec, dims={
        "kind": F.col("kind"), "code": F.col("code")})
    rows = {r["path"]: (r["depth"], r["entity_type"], r["n_events"])
            for r in out.collect()}
    assert rows["error"] == (1, "kind", 2)
    assert rows["view"] == (1, "kind", 2)      # exactly once (no dup)
    assert rows["error/500"] == (2, "code", 1)
    assert rows["error/503"] == (2, "code", 1)
    assert len(rows) == 4                      # no view/* node


def test_explorer_rollup_is_one_shuffle(spark):
    df = spark.createDataFrame(
        [("a", "b", "c")], "account string, region string, "
        "namespace string")
    out = explorer_rollup(
        df, HierarchyLevel.from_dict(SPEC),
        dims={c: F.col(c) for c in ("account", "region", "namespace")})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange ") <= 1        # expand + ONE rollup agg
    assert "CartesianProduct" not in plan


def test_catalog_duplicate_create_updates_in_place(tmp_path):
    p = tmp_path / "h.json"
    cat = HierarchyCatalog(str(p))
    h1 = cat.create_hierarchy("AWS Explorer", SPEC, {"key": "account"})
    # reference :905-916 — duplicate-name create recovers into update
    h2 = cat.create_hierarchy(
        "AWS Explorer", {"entityType": "region",
                         "nextLevelsWithConditions": []})
    assert h2.hierarchy_id == h1.hierarchy_id
    assert h2.level.entity_type == "region"
    assert len(cat.get_entity_hierarchies()) == 1

    cat2 = HierarchyCatalog(str(p))            # persistence round-trip
    assert cat2.get_explorer_id("AWS Explorer") == h1.hierarchy_id
    got = cat2.get_entity_hierarchies()[0]
    assert isinstance(got, Hierarchy)
    assert got.level.entity_type == "region"


def test_catalog_missing_name_raises_and_delete_honors_flag(tmp_path):
    cat = HierarchyCatalog(str(tmp_path / "h.json"))
    with pytest.raises(KeyError, match="not found"):
        cat.get_explorer_id("nope")
    h = cat.create_hierarchy("X", SPEC)
    assert cat.delete_hierarchy(
        h.hierarchy_id, remove_on_delete_stack=False) is False
    assert cat.get_entity_hierarchies()        # still there
    assert cat.delete_hierarchy(h.hierarchy_id) is True
    assert cat.get_entity_hierarchies() == []


def test_unknown_entity_type_raises(spark):
    df = spark.createDataFrame([("a",)], "account string")
    with pytest.raises(KeyError, match="entityType"):
        explorer_rollup(
            df, HierarchyLevel.from_dict(SPEC),
            dims={"account": F.col("account")})
