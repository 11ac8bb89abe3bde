"""Partition/index routing tests (plans/partitions.py)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.plans.partitions import (
    DEFAULT_INDEX,
    IndexStore,
    PartitionSpec,
    assign_index,
)
from sumologic_aws_lambda_spark.plans.sumoql import SumoQLError, SumoSchema

SCHEMA = SumoSchema(raw_col="msg", meta_cols={"_sourceCategory": "cat"})

SPECS = [
    PartitionSpec("security", "_sourceCategory=auth*"),
    PartitionSpec("errors", "ERROR"),
]


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        (1, "auth/login", "ok"),
        (2, "auth/sso", "ERROR bad token"),   # first match wins → security
        (3, "web", "ERROR 500"),
        (4, "web", "fine"),
    ]
    return spark.createDataFrame(rows, "id int, cat string, msg string")


def test_assign_index_first_match_and_default(logs):
    out = {r.id: r._index for r in
           assign_index(logs, SPECS, SCHEMA).collect()}
    assert out == {1: "security", 2: "security", 3: "errors",
                   4: DEFAULT_INDEX}


def test_store_layout_and_pruned_query(spark, logs, tmp_path):
    store = IndexStore(str(tmp_path), SPECS)
    store.ingest(logs, SCHEMA)
    dirs = {d for d in os.listdir(tmp_path) if d.startswith("_index=")}
    assert dirs == {"_index=errors", f"_index={DEFAULT_INDEX}",
                    "_index=security"}
    out = store.query(spark, "_index=security | count by cat", SCHEMA)
    assert {r.cat: r._count for r in out.collect()} == \
        {"auth/login": 1, "auth/sso": 1}
    # extra scope terms after the index filter
    only = store.query(spark, "_index=security ERROR", SCHEMA)
    assert [r.id for r in only.collect()] == [2]


def test_query_plan_reads_single_partition_dir(spark, logs, tmp_path):
    store = IndexStore(str(tmp_path), SPECS)
    store.ingest(logs, SCHEMA)
    files = store.read_index(spark, "errors").inputFiles()
    assert files and all("_index=errors" in f for f in files)


def test_errors(spark, logs, tmp_path):
    store = IndexStore(str(tmp_path), SPECS)
    with pytest.raises(SumoQLError, match="already exists"):
        store.add_partition(PartitionSpec("errors", "x"))
    with pytest.raises(SumoQLError, match="bad partition name"):
        PartitionSpec("no spaces", "x")
    store.ingest(logs, SCHEMA)
    with pytest.raises(SumoQLError, match="unknown index"):
        store.read_index(spark, "nope")
    with pytest.raises(SumoQLError, match="must start with _index="):
        store.query(spark, "* | count")
