"""Training-shard export semantics (operators/shards.py)."""

from __future__ import annotations

import glob
import gzip
import json
import os

import pytest

from sumologic_aws_lambda_spark.operators.shards import (
    shard_assignments,
    shard_manifest,
    write_training_shards,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc {i} body with some tokens number {i * 7}")
            for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_assignment_deterministic_and_in_range(docs):
    a1 = {r.doc_id: r.shard
          for r in shard_assignments(docs, 4).collect()}
    a2 = {r.doc_id: r.shard
          for r in shard_assignments(docs, 4).collect()}
    assert a1 == a2
    assert set(a1.values()) <= set(range(4))
    # 40 uniform docs over 4 shards: every shard populated.
    assert len(set(a1.values())) == 4


def test_manifest_checksum_is_order_independent(docs, spark):
    m1 = {r.shard: r.content_checksum
          for r in shard_manifest(shard_assignments(docs, 4)).collect()}
    shuffled = docs.orderBy("text").repartition(7)
    m2 = {r.shard: r.content_checksum
          for r in shard_manifest(shard_assignments(shuffled, 4)).collect()}
    assert m1 == m2


def test_write_round_trip(docs, tmp_path):
    out = str(tmp_path / "export")
    manifest = write_training_shards(docs, out, n_shards=4)
    disk = json.load(open(os.path.join(out, "manifest.json")))
    assert disk == json.loads(json.dumps(manifest))   # what we returned
    assert disk["total_rows"] == 40
    assert disk["n_shards"] == 4

    # One gzip JSONL file per shard directory; rows match the manifest.
    got_rows = 0
    for entry in disk["shards"]:
        files = glob.glob(os.path.join(out, f"shard={entry['shard']}",
                                       "*.json.gz"))
        assert len(files) == 1
        with gzip.open(files[0], "rt") as fh:
            lines = [json.loads(line) for line in fh]
        assert len(lines) == entry["n_rows"]
        got_rows += len(lines)
        # Rows are sorted by id within the shard (reproducible bytes).
        ids = [r["doc_id"] for r in lines]
        assert ids == sorted(ids)
    assert got_rows == 40


def test_rejects_bad_shard_count(docs):
    with pytest.raises(ValueError, match="n_shards"):
        shard_assignments(docs, 0)


# -------------------------------------------------------------- z-order

def test_morton_code_known_values(spark):
    from sumologic_aws_lambda_spark.operators.shards import morton_code
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (63, 63)], "x long, y long")
    got = [r["m"] for r in df.select(
        morton_code("x", "y").alias("m")).collect()]

    def py_morton(x, y):
        return sum((((x >> i) & 1) << (2 * i))
                   + (((y >> i) & 1) << (2 * i + 1)) for i in range(6))

    assert got == [py_morton(x, y)
                   for x, y in [(0, 0), (1, 0), (0, 1), (3, 5), (63, 63)]]
    assert got[-1] == 4095          # full 12-bit code


def test_zorder_cells_bound_both_dimensions(spark):
    from sumologic_aws_lambda_spark.operators.shards import morton_code
    from pyspark.sql import functions as F

    pts = spark.range(64 * 32).select(
        (F.col("id") % 64).alias("u"), (F.col("id") % 31 + 1).alias("d"))
    cells = (
        pts.select("u", "d",
                   F.shiftright(morton_code("u", "d"), 8).alias("cell"))
        .groupBy("cell")
        .agg(F.min("u").alias("mnu"), F.max("u").alias("mxu"),
             F.min("d").alias("mnd"), F.max("d").alias("mxd"))
        .collect()
    )
    # Every 4-bit-prefix cell is a quadtree quadrant: both dimensions'
    # ranges are bounded by 16 — the data-skipping property.
    for r in cells:
        assert r["mxu"] - r["mnu"] <= 15
        assert r["mxd"] - r["mnd"] <= 15
