"""Training-data export: deterministic JSONL shards + manifest.

The last mile of a curation pipeline: write the corpus as N compressed
JSONL shards with stable membership (re-running the export reproduces
byte-identical shard assignment) and a manifest recording per-shard row
counts, token totals, and an order-independent content checksum — what a
downstream trainer needs to verify a transfer and to resume mid-epoch.

Scale stance: shard membership is a pure row expression (md5-mod), the
write is ``partitionBy(shard)`` so Spark lays out one directory per
shard with no driver involvement, and the manifest is an N-row
aggregate (N = shard count, a config constant — collecting it is O(N),
not O(corpus)).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import normalize_text, token_count


def shard_assignments(df: DataFrame, n_shards: int,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Deterministic shard membership + per-row export metadata.

    ``shard = md5(id) mod n_shards`` — stable across runs, engines, and
    partitionings (the same contract as the hash split/sample family in
    ``queries/sampling.py``).  Narrow projection; no shuffle.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # First 8 hex chars -> 32-bit int, mod N: md5 is uniform, so shards
    # are balanced to ~sqrt(n/N) like any hash partitioner.  A NULL id
    # is pinned to a sentinel so it gets a REAL shard — md5(NULL) is
    # NULL, which would route the row to Hive's default partition and
    # crash the manifest sort on a None shard.
    id_str = F.coalesce(F.col(id_col).cast("string"), F.lit("\x00null"))
    bucket = F.conv(
        F.substring(F.md5(id_str), 1, 8), 16, 10
    ).cast("bigint") % n_shards
    return df.select(
        F.col(id_col),
        F.col(text_col),
        bucket.cast("int").alias("shard"),
        token_count(normalize_text(F.col(text_col))).alias("n_tokens"),
    )


def shard_manifest(assigned: DataFrame) -> DataFrame:
    """Per-shard manifest rows: count, token sum, and an
    order-independent content checksum (sum of per-row 32-bit content
    hashes — commutative, so any write order / partitioning yields the
    same value; a downstream reader can re-derive it shard by shard).
    """
    row_hash = F.conv(
        F.substring(
            F.md5(F.concat_ws("\x1f", F.col("shard"),
                              F.col("doc_id").cast("string"),
                              F.col("text"))), 1, 8),
        16, 10,
    ).cast("bigint")
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum(row_hash).cast("bigint").alias("content_checksum"),
        )
    )


def write_training_shards(df: DataFrame, out_dir: str, n_shards: int = 8,
                          id_col: str = "doc_id", text_col: str = "text",
                          compression: str = "gzip") -> dict:
    """Export the corpus as ``out_dir/shard=K/*.json[.gz]`` plus
    ``out_dir/manifest.json``.

    One ``partitionBy(shard)`` write — executors stream rows straight to
    their shard directories; ``repartition(shard)`` first so each shard
    is one file (deterministic layout), sorted by id within the shard so
    shard bytes are reproducible run to run.  Returns the manifest dict.
    """
    # Persisted across the two actions: the shard write and the manifest
    # rollup both consume the full assignment lineage (scan + md5 +
    # normalize + token_count over every row) — without the persist the
    # corpus would be scanned and re-hashed twice.
    assigned = shard_assignments(df, n_shards, id_col, text_col).persist()
    try:
        (
            assigned.repartition(n_shards, "shard")
            .sortWithinPartitions("shard", id_col)
            .write.mode("overwrite")
            .partitionBy("shard")
            .option("compression", compression)
            .json(out_dir)
        )
        manifest_rows = sorted(
            (r.asDict() for r in shard_manifest(assigned).collect()),
            key=lambda r: r["shard"],
        )
    finally:
        assigned.unpersist()
    manifest = {
        "n_shards": n_shards,
        "total_rows": sum(r["n_rows"] for r in manifest_rows),
        "total_tokens": sum(r["n_tokens"] for r in manifest_rows),
        "shards": manifest_rows,
    }
    _write_text(df.sparkSession, os.path.join(out_dir, "manifest.json"),
                json.dumps(manifest, indent=1, sort_keys=True))
    return manifest


def _write_text(spark, path: str, text: str) -> None:
    """Write a small text file next to the shards.  Plain ``open()``
    only works for local paths; an ``s3a://``/``hdfs://`` out_dir (which
    the Spark shard write itself handles fine) goes through the Hadoop
    FileSystem API so the manifest lands beside the data it describes."""
    if "://" not in path and not path.startswith("dbfs:"):
        with open(path, "w") as fh:
            fh.write(text)
        return
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.create(hpath, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def morton_code(x, y, bits: int = 6):
    """Z-order (Morton) interleave of two non-negative ``bits``-bit
    Columns: x's bit i lands at position 2i, y's at 2i+1.  A pure
    integer-bit expression (codegen, no UDF) — the multi-dimensional
    clustering key behind data-skipping layouts (Delta/Iceberg
    ``OPTIMIZE ZORDER BY``): sorting or prefix-bucketing by the code
    keeps rows close in EVERY interleaved dimension, so per-file
    min/max stats prune reads on any of them.

    Values WRAP modulo 2**bits (only the low ``bits`` bits
    interleave): two inputs ``2**bits`` apart share a code, which
    trades locality for bounded width exactly like any hash bucket.
    Callers that need true locality on a wider domain must pre-bucket
    into range (e.g. ``col % 64`` / ``col >> shift``, as
    ``zorder_cell_stats`` does) rather than rely on the wrap."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    code = F.lit(0).cast("bigint")
    for i in range(bits):
        code = (
            code
            + F.shiftleft(F.shiftright(xc, i).bitwiseAND(1), 2 * i)
            + F.shiftleft(F.shiftright(yc, i).bitwiseAND(1), 2 * i + 1)
        )
    return code
