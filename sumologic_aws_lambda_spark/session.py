"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` but every default here is chosen so the
same plans survive a 1000-executor / 100 TB deployment:

- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast).
- UTC session timezone so timestamp semantics match the DuckDB oracle and
  are cluster-location independent.
- Arrow transfer on for the few pandas-UDF paths (gzip-of-column decode,
  multimodal stubs).
- ``shuffle.partitions`` sized for the local harness; on a real cluster AQE
  coalesces from an intentionally high initial number, so we leave
  ``spark.sql.adaptive.coalescePartitions.enabled`` at its default (on).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    # Parquet predicate pushdown / pruning are on by default; pin them so a
    # misconfigured cluster profile can't silently turn scans into full reads.
    "spark.sql.parquet.filterPushdown": "true",
    # events.parquet carries timestamp[ns]; Spark's reader rejects nanos.
    # Read them as long and normalize to µs timestamps in catalog.table().
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # InferFiltersFromGenerate adds `size(arr) > 0` before every explode;
    # filter pushdown then INLINES the whole generator expression (for
    # word n-grams: split+regexp re-evaluated per element, O(tokens²) per
    # row) into a Filter below the parallelizing exchange, where it runs
    # single-partition.  Measured 9× on top_bigrams_per_source at sf0.1
    # (7.2 s → 0.8 s).  Our generators (gram/shingle/band arrays) are
    # non-empty by construction, so the inferred filter prunes nothing.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    # 10 MB default is conservative; dims here (region/nation/eni/queries)
    # are tiny and we broadcast explicitly where it matters anyway.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "sumologic-aws-lambda-spark",
              master: str | None = None,
              extra_confs: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``) so bench and tests share one code path.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    builder = builder.config("spark.driver.memory",
                             os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
    for k, v in {**DEFAULT_CONFS, **(extra_confs or {})}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
