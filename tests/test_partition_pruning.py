"""Partition-layout regression tests: the curated-output write pattern
(partitionBy on low-cardinality routing keys) must yield reads that
PRUNE — a predicate on a partition column shows up as PartitionFilters
and excludes non-matching directories from the scan entirely.  At
100 TB this is the difference between listing/reading one lang's
directories and a full-table scan; nothing else in the suite pinned
it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.catalog import table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curated_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curated") / "docs")
    (
        table(spark, SF_DIR, "documents")
        .write.mode("overwrite")
        .partitionBy("lang", "source")
        .parquet(out)
    )
    return out


def test_partition_filter_reaches_scan(spark, curated_dir):
    df = spark.read.parquet(curated_dir).filter(F.col("lang") == "en")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters")[1].split("]")[0]
    # the predicate must NOT degrade to a post-scan data filter
    pushed = plan.split("PartitionFilters")[1]
    assert "isnotnull(lang" in pushed or "(lang" in pushed


def test_pruned_read_touches_only_matching_files(spark, curated_dir):
    """input_file_name() is evaluated DURING execution, so it reports
    the files the pruned scan actually read (DataFrame.inputFiles()
    lists the pre-pruning relation and cannot show pruning)."""
    df = spark.read.parquet(curated_dir).filter(F.col("lang") == "en")
    files = [r[0] for r in df.select(
        F.input_file_name()).distinct().collect()]
    assert files and all("lang=en" in f for f in files)
    all_files = [r[0] for r in spark.read.parquet(curated_dir).select(
        F.input_file_name()).distinct().collect()]
    assert len(all_files) > len(files)


def test_partition_values_roundtrip(spark, curated_dir):
    """partitionBy moves the columns into the directory layout; reading
    back restores them with identical value sets and row counts."""
    src = table(spark, SF_DIR, "documents")
    back = spark.read.parquet(curated_dir)
    assert back.count() == src.count()
    assert (
        {tuple(r) for r in back.select("lang", "source").distinct().collect()}
        == {tuple(r) for r in src.select("lang", "source").distinct().collect()}
    )


def test_combined_partition_and_data_filter(spark, curated_dir):
    """A mixed predicate splits correctly: the lang half prunes
    partitions, the n_chars half pushes to the parquet row groups."""
    df = spark.read.parquet(curated_dir).filter(
        (F.col("lang") == "en") & (F.col("n_chars") > 200))
    plan = df._jdf.queryExecution().executedPlan().toString()
    part = plan.split("PartitionFilters")[1].split("PushedFilters")[0]
    assert "lang" in part and "n_chars" not in part
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "n_chars" in pushed
    touched = [r[0] for r in df.select(
        F.input_file_name()).distinct().collect()]
    assert touched and all("lang=en" in f for f in touched)
