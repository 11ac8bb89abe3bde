"""Kinesis stream source (SURVEY §2.1 S2).

Reference: ``kinesis/node.js/k2sl_lambda.js:170-254`` — each Lambda event
carries ``Records[].kinesis.data``, base64 of a gzipped CWL envelope; the
per-record pipeline is the same as the CWL path (including the
``lastRequestID`` carry that the reference threads across records within
one invoke, :197-211).

Spark-first: in production this is ``readStream.format("kinesis")`` (or
the Kinesis→Firehose→S3 landing pattern the reference's own templates
use); logically it reduces to the CWL pipeline after one extra explode —
which is what this module provides, so the same code tests against file
fixtures and runs against a live connector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cwl import CwlConfig, cwl_pipeline

KINESIS_EVENT_SCHEMA = (
    "struct<Records:array<struct<eventID:string,"
    " kinesis:struct<partitionKey:string, sequenceNumber:string,"
    " data:string>>>>"
)


def explode_kinesis_records(df: DataFrame,
                            event_col: str = "event_json") -> DataFrame:
    """Lambda-event JSON → one row per kinesis record with its base64
    payload (``k2sl_lambda.js:183-190``)."""
    parsed = F.from_json(F.col(event_col), KINESIS_EVENT_SCHEMA)
    return (
        df.withColumn("record", F.explode(parsed.getField("Records")))
        .select(
            F.col("record.eventID").alias("kinesis_event_id"),
            F.col("record.kinesis.partitionKey").alias("partition_key"),
            F.col("record.kinesis.sequenceNumber").alias("sequence_number"),
            F.col("record.kinesis.data").alias("payload"),
        )
    )


def kinesis_pipeline(df: DataFrame, config: CwlConfig = CwlConfig(),
                     event_col: str = "event_json") -> DataFrame:
    """Full S2 path: explode kinesis records → shared CWL pipeline."""
    return cwl_pipeline(explode_kinesis_records(df, event_col), config)
