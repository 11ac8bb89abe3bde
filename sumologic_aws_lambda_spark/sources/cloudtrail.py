"""CloudTrail S3 source (SURVEY §2.1 S4, §2.4 F5).

Reference: ``cloudtrail_s3/cloudtrail_s3_to_sumo.js`` — fetch S3 object,
gunzip, ``JSON.parse``, explode ``Records[]`` (:57-62), skipping
CloudTrail-Digest keys (:40-43).

Spark-first: ``spark.read.json`` (codec inference handles .gz natively at
file level) + ``explode``; digest skip is a ``pathGlobFilter`` so pruning
happens at listing time — at 100 TB the digest objects are never opened.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The envelope is {"Records": [...]} with deeply nested, evolving structs;
# keep the projection minimal-and-typed and the rest schema-on-read.
CLOUDTRAIL_RECORD_CORE = (
    "array<struct<eventVersion:string, eventTime:string, eventSource:string,"
    " eventName:string, awsRegion:string, sourceIPAddress:string,"
    " userIdentity:struct<type:string, principalId:string, arn:string,"
    " accountId:string, userName:string>, requestID:string, eventID:string>>"
)


def read_cloudtrail(spark: SparkSession, path: str) -> DataFrame:
    """CloudTrail scan with digest skip (F5) + native file-level gunzip.

    ``CloudTrail-Digest`` is a *directory* component of the key, so the
    skip is expressed on ``input_file_name`` — rows from digest objects
    are dropped before the explode.  (``pathGlobFilter`` only matches the
    leaf name; for true listing-time pruning a deployment passes digest-
    free prefixes, which is how AWS partitions the bucket anyway.)
    """
    df = spark.read.option("recursiveFileLookup", "true").json(path)
    return df.filter(~F.input_file_name().rlike("CloudTrail-Digest"))


def explode_records(df: DataFrame, records_col: str = "Records") -> DataFrame:
    """S4: one output row per CloudTrail record (:57-62)."""
    return df.select(F.explode(records_col).alias("record")).select("record.*")


def explode_records_from_string(df: DataFrame,
                                json_col: str = "body") -> DataFrame:
    """Same, from a raw JSON-string column (the DLQ/requeue path):
    ``from_json`` with the typed core schema, then explode."""
    return (
        df.withColumn(
            "records",
            F.from_json(
                F.get_json_object(json_col, "$.Records"), CLOUDTRAIL_RECORD_CORE
            ),
        )
        .select(F.explode("records").alias("record"))
        .select("record.*")
        .withColumn("event_ts", F.to_timestamp("eventTime"))
    )


def skip_digest_keys(df: DataFrame, key_col: str = "key") -> DataFrame:
    """F5 as a row-level predicate for key streams
    (``cloudtrail_s3_to_sumo.js:40-43``)."""
    return df.filter(~F.col(key_col).rlike("CloudTrail-Digest"))


def url_decode_key(df: DataFrame, key_col: str = "key") -> DataFrame:
    """P15: S3 keys arrive URL-encoded with '+' for space
    (``s3.js:83``, ``cloudtrail_s3_to_sumo.js:77``)."""
    return df.withColumn(
        key_col, F.url_decode(F.regexp_replace(key_col, r"\+", " "))
    )
