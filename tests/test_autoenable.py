"""Unit tests for the awsautoenableS3Logging and cloudformation-telemetry
analogs (sources/autoenable.py, sources/cfn_telemetry.py) — the paths the
driver queries don't exercise: the user filter regex and the per-stack
completion check."""

from __future__ import annotations

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.sources.autoenable import (
    DETAIL_SCHEMA,
    plan_s3_logging_actions,
)
from sumologic_aws_lambda_spark.sources.cfn_telemetry import stack_in_progress


def _events(spark, details: list[str]):
    return spark.createDataFrame(
        [(i, d) for i, d in enumerate(details)], "id int, detail_json string"
    ).withColumn("detail", F.from_json("detail_json", DETAIL_SCHEMA))


def test_filter_regex_drops_unmatched_resources(spark):
    df = _events(spark, [
        '{"eventName":"CreateBucket","awsRegion":"us-east-1",'
        '"requestParameters":{"bucketName":"prod-data"}}',
        '{"eventName":"CreateBucket","awsRegion":"us-east-1",'
        '"requestParameters":{"bucketName":"dev-scratch"}}',
    ])
    out = plan_s3_logging_actions(
        df, bucket="central", prefix="p/", filter_regex='"bucketName":"prod'
    )
    assert [r.resource_id for r in out.collect()] == ["prod-data"]


def test_actions_are_narrow_no_shuffle(spark):
    df = _events(spark, [
        '{"eventName":"CreateVpc","awsRegion":"eu-west-1",'
        '"responseElements":{"vpc":{"vpcId":"vpc-1"}}}',
    ])
    out = plan_s3_logging_actions(df, bucket="central", prefix="p/")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stack_in_progress_uses_latest_status_and_exclusion(spark):
    rows = [
        # stk-1: bucket finished, Primerinvoke still in progress but
        # excluded (the reference removes it from the check, :97-99)
        ("stk-1", "Bucket", "b-1", "CREATE_IN_PROGRESS", "2024-03-01 10:00:00"),
        ("stk-1", "Bucket", "b-1", "CREATE_COMPLETE", "2024-03-01 10:00:30"),
        ("stk-1", "Primerinvoke", "p-1", "CREATE_IN_PROGRESS",
         "2024-03-01 10:00:12"),
        # stk-2: table still in progress
        ("stk-2", "Table", "t-1", "CREATE_IN_PROGRESS", "2024-03-01 11:00:00"),
    ]
    df = spark.createDataFrame(
        rows,
        "stack_id string, logical_resource_id string,"
        " physical_resource_id string, resource_status string, ts string",
    ).select(
        "stack_id", "logical_resource_id", "physical_resource_id",
        F.lit("t").alias("resource_type"),
        "resource_status",
        F.lit(None).cast("string").alias("resource_status_reason"),
        F.to_timestamp("ts").alias("event_ts"),
    )
    got = {
        r.stack_id: r.in_progress
        for r in stack_in_progress(df, exclude_logical_id="Primerinvoke").collect()
    }
    assert got == {"stk-1": False, "stk-2": True}


def test_plan_tag_actions_untag_and_filter(spark):
    """TagAWSResources delete path: untag batches carry only the tag
    KEYS (awsresource.py:497-500); the filter regex drops non-matching
    resources before chunking."""
    import json

    from pyspark.sql import functions as F

    from sumologic_aws_lambda_spark.sources.autoenable import (
        TAG_DETAIL_SCHEMA,
        plan_tag_actions,
    )

    rows = [
        (1, '{"eventName":"CreateBucket","awsRegion":"us-east-1",'
            '"requestParameters":{"bucketName":"team-a-data"}}'),
        (2, '{"eventName":"CreateBucket","awsRegion":"us-east-1",'
            '"requestParameters":{"bucketName":"other"}}'),
    ]
    events = spark.createDataFrame(rows, "id int, raw string").select(
        F.from_json("raw", TAG_DETAIL_SCHEMA).alias("detail"))
    out = plan_tag_actions(
        events, {"team": "sre", "env": "prod"}, account_id="1",
        filter_regex="team-a", delete=True).collect()
    assert len(out) == 1
    r = out[0]
    assert r["action"] == "untag_resources"
    assert json.loads(r["tags"]) == ["env", "team"]   # keys only, sorted
    assert r["arns"] == "arn:aws:s3:::team-a-data"
