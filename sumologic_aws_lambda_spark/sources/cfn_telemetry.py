"""CloudFormation stack-event telemetry.

Reference: ``cloudformation-telemetry/lambda_function.py`` — polls
``describe_stack_events`` while the stack deploys and forwards each
*new* (resource, status) transition to the telemetry endpoint:

- per-resource status dedup: a status is sent only the first time it is
  seen for that ``PhysicalResourceId`` (:108-113, the
  ``all_resource_statuses`` defaultdict).
- record shape: ``{requestid, timestamp(iso ms), data:{stackId,
  resourceType, resourceName, resourceID, status, details}}``
  (:114-126).
- static enrichment: solution profile merged onto every record
  (``awsoTelemetry.enrich_telemetry_data`` :151-167).
- completion: the stack is done when no child resource (excluding the
  telemetry trigger itself) has a ``*_IN_PROGRESS`` status (:95-103).

Spark shape: the poll loop becomes a stream/batch of stack events; the
"first time seen" dedup is a row_number window keyed by
(stack, resource, status) ordered by event time — one shuffle on a key
whose cardinality is resources × statuses, never skewed.  Completion is
an aggregation over each resource's *latest* status (``max_by``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STACK_EVENT_SCHEMA = (
    "stack_id string, logical_resource_id string,"
    " physical_resource_id string, resource_type string,"
    " resource_status string, resource_status_reason string,"
    " event_ts timestamp"
)


def telemetry_records(events: DataFrame, request_id: str,
                      profile: dict[str, str] | None = None) -> DataFrame:
    """First occurrence of every (resource, status) transition as a
    telemetry record (lambda_function.py:105-127).

    ``profile`` adds the static solution columns the AWSO variant merges
    onto every record (:151-167).
    """
    w = Window.partitionBy(
        "stack_id", "physical_resource_id", "resource_status"
    ).orderBy("event_ts", "logical_resource_id")
    out = (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.lit(request_id).alias("requestid"),
            # date_format renders in the SESSION timezone; the engine
            # pins sessions to UTC (session.py / catalog.table), so the
            # 'Z' designator is truthful here and keeps the reference's
            # UTC ISO-ms contract explicit for downstream parsers.
            F.date_format(
                "event_ts", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
            ).alias("timestamp"),
            F.col("stack_id").alias("stackId"),
            F.col("resource_type").alias("resourceType"),
            F.col("logical_resource_id").alias("resourceName"),
            F.col("physical_resource_id").alias("resourceID"),
            F.col("resource_status").alias("status"),
            F.coalesce("resource_status_reason", F.lit("")).alias("details"),
        )
    )
    for k, v in (profile or {}).items():
        out = out.withColumn(k, F.lit(v))
    return out


def stack_in_progress(events: DataFrame,
                      exclude_logical_id: str | None = None) -> DataFrame:
    """Per-stack completion check (lambda_function.py:95-103): a stack is
    still in progress while any resource's LATEST status ends with
    ``_IN_PROGRESS``; the telemetry trigger resource itself is excluded
    so it cannot deadlock the check (:97-99)."""
    df = events
    if exclude_logical_id is not None:
        df = df.filter(F.col("logical_resource_id") != exclude_logical_id)
    latest = df.groupBy("stack_id", "physical_resource_id").agg(
        F.max_by("resource_status", "event_ts").alias("last_status")
    )
    return latest.groupBy("stack_id").agg(
        F.max(
            F.col("last_status").endswith("_IN_PROGRESS").cast("int")
        ).cast("boolean").alias("in_progress"),
        F.count(F.lit(1)).alias("n_resources"),
    )
