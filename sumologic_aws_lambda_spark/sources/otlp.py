"""CloudWatch Metric Stream records in OpenTelemetry 0.7 format
(SURVEY §1.1 'metric stream record', §2.1 S15).

The reference configures Firehose to emit OTLP 0.7
(``kinesis-firehose-cloudwatch-collection/metrics/
KinesisFirehoseCWMetrics.template.yaml:419``) and never parses it — the
platform does.  Our engine IS the platform half, so this source turns
the OTLP resourceMetrics JSON into the flat (ts, metric, dims, value)
shape that ``plans/metrics_service.py`` and ``operators/rollup.py``
consume.

Spark-first: one ``from_json`` with a typed core schema + two
``explode``s (metrics[], datapoints[]) — all narrow; attribute maps stay
``map<string,string>``.  Summary datapoints carry CloudWatch's
min/max/sum/count statistics set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# OTLP 0.7 resourceMetrics core, trimmed to what metric streams emit:
# resource attributes (namespace, account, region) + summary datapoints.
OTLP_CORE = (
    "struct<resourceMetrics: array<struct<"
    " resource: struct<attributes: map<string,string>>,"
    " instrumentationLibraryMetrics: array<struct<"
    "   metrics: array<struct<"
    "     name: string,"
    "     unit: string,"
    "     doubleSummary: struct<dataPoints: array<struct<"
    "       labels: map<string,string>,"
    "       timeUnixNano: long,"
    "       count: long,"
    "       sum: double,"
    "       quantileValues: array<struct<quantile: double, value: double>>"
    "     >>>"
    "   >>"
    " >>"
    ">>>"
)


def parse_otlp_records(df: DataFrame, json_col: str = "body") -> DataFrame:
    """OTLP JSON → one row per (metric, datapoint):
    (ts, metric, dims map, n, total, min_value, max_value).

    CloudWatch encodes min/max as the 0.0/1.0 quantiles of a
    doubleSummary; dims merge resource attributes under the datapoint
    labels (labels win on collision — they are the finer scope)."""
    parsed = df.withColumn("_otlp", F.from_json(F.col(json_col), OTLP_CORE))
    rm = parsed.select(
        F.explode("_otlp.resourceMetrics").alias("rm")
    ).select(
        F.col("rm.resource.attributes").alias("res_attrs"),
        F.explode("rm.instrumentationLibraryMetrics").alias("ilm"),
    ).select(
        "res_attrs", F.explode("ilm.metrics").alias("m")
    ).select(
        "res_attrs",
        F.col("m.name").alias("metric"),
        F.col("m.unit").alias("unit"),
        F.explode("m.doubleSummary.dataPoints").alias("dp"),
    )
    # try_element_at: a summary point missing a quantile key yields NULL
    # for that column rather than an ANSI map-key error.
    quantile = lambda q: F.try_element_at(  # noqa: E731
        F.map_from_entries(F.transform(
            "dp.quantileValues",
            lambda e: F.struct(e.quantile.alias("k"), e.value.alias("v")),
        )), F.lit(q),
    )
    return rm.select(
        F.timestamp_micros(
            (F.col("dp.timeUnixNano") / 1000).cast("long")
        ).alias("ts"),
        "metric",
        "unit",
        F.map_zip_with(
            "res_attrs", F.col("dp.labels"),
            lambda _, r, l: F.coalesce(l, r),
        ).alias("dims"),
        F.col("dp.count").alias("n"),
        F.col("dp.sum").alias("total"),
        quantile(0.0).alias("min_value"),
        quantile(1.0).alias("max_value"),
    )
