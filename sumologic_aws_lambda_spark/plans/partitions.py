"""Partitions (Sumo indexes): routing expressions → physical layout.

Sumo's partitions route ingested messages into separate indexes by a
routing expression (a scope query: metadata equalities + full-text
terms); searches scoped ``_index=<name>`` read only that partition.
The reference provisions sources that target partitions via their
``category`` fields; the analytics analog is a registry of routing
expressions compiled to Column predicates plus a partitioned write.

Physical design (the whole point of partitions at 100 TB):

* **Ingest** is ONE pass: a chained ``when`` over the registered
  routing predicates assigns each row its index name (first match wins,
  Sumo's documented precedence; unmatched rows land in the default
  index), then a single ``partitionBy(_index)`` write lays data out so
  partition pruning is a directory skip.
* **Query** ``_index=name | stages…`` reads exactly one partition
  directory — the scan never touches other indexes' files — and applies
  further stages through the ordinary compiler.
* Routing predicates are ordinary Column expressions, so Catalyst can
  also push them into scans when routing is evaluated virtually
  (``assign_index`` without a write — the query-time form used by the
  registered ``index_routing_stats`` check).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .sumoql import (
    SumoQLError,
    SumoSchema,
    compile_prefixed_query,
    scope_predicate,
)

DEFAULT_INDEX = "sumologic_default"


@dataclass(frozen=True)
class PartitionSpec:
    """One partition: a name and its routing expression (scope syntax)."""

    name: str
    routing: str

    def __post_init__(self) -> None:
        if not re.fullmatch(r"\w+", self.name):
            raise SumoQLError(f"bad partition name {self.name!r}")

    def predicate(self, schema: SumoSchema) -> Column:
        return scope_predicate(self.routing, schema)


def assign_index(df: DataFrame, specs: list[PartitionSpec],
                 schema: SumoSchema = SumoSchema()) -> DataFrame:
    """Add ``_index``: first matching partition's name, else the default
    index — one chained-when projection, no shuffle."""
    expr = None
    for spec in specs:
        cond = spec.predicate(schema)
        expr = (F.when(cond, spec.name) if expr is None
                else expr.when(cond, spec.name))
    expr = (expr.otherwise(DEFAULT_INDEX) if expr is not None
            else F.lit(DEFAULT_INDEX))
    return df.withColumn("_index", expr)


class IndexStore:
    """Directory-backed partition layout: ``root/_index=<name>/…``."""

    def __init__(self, root: str,
                 specs: list[PartitionSpec] | None = None) -> None:
        self.root = root
        self.specs: list[PartitionSpec] = []
        # route through add_partition so the constructor enforces the
        # same name-uniqueness rule — a duplicated name would silently
        # shadow its twin (first-match routing) instead of erroring
        for spec in specs or []:
            self.add_partition(spec)

    def add_partition(self, spec: PartitionSpec) -> None:
        if any(s.name == spec.name for s in self.specs):
            raise SumoQLError(f"partition {spec.name!r} already exists")
        self.specs.append(spec)

    def ingest(self, df: DataFrame,
               schema: SumoSchema = SumoSchema()) -> None:
        """Route and append one batch — a single pass + partitioned
        write; at scale this is the only job that sees all indexes."""
        routed = assign_index(df, self.specs, schema)
        (routed.write.partitionBy("_index")
         .mode("append").parquet(self.root))

    def read_index(self, spark: SparkSession, name: str) -> DataFrame:
        """One partition's rows — a pruned scan (directory skip), never
        a filter over the full store.

        Existence check: fast local ``isdir`` when the root is a plain
        path, else the Hadoop FileSystem API — ``os.path.isdir`` is
        always False for ``s3a://``/``hdfs://`` roots, which would make
        every remote read fail 'unknown index' despite the partition
        existing (the module's whole design targets object stores)."""
        path = os.path.join(self.root, f"_index={name}")
        if not self._exists(spark, path):
            raise SumoQLError(f"unknown index {name!r}")
        return spark.read.parquet(path)

    @staticmethod
    def _exists(spark: SparkSession, path: str) -> bool:
        if os.path.isdir(path):
            return True
        if "://" not in path and not path.startswith("dbfs:"):
            return False    # plain local path: isdir was authoritative
        try:
            jvm = spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(path)
            fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
            return bool(fs.exists(hpath))
        except Exception:  # noqa: BLE001 — unreachable FS: treat as absent
            return False

    def query(self, spark: SparkSession, text: str,
              schema: SumoSchema = SumoSchema(),
              lookups=None) -> DataFrame:
        """``_index=<name> [rest-of-scope] [| stages…]``."""
        return compile_prefixed_query(
            text, "_index", lambda n: self.read_index(spark, n), schema,
            lookups)
