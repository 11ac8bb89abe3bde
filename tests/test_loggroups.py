"""Log-group connector: matcher (F6) + subscribe-action planner.

Reference: ``loggroup-lambda-connector/src/loggroup-lambda-connector.js``
— name-regex OR tag match (:43-78), putSubscriptionFilter parameter
construction (:81-98) where ``roleArn`` is included only for non-Lambda
destinations.
"""

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.sources.loggroups import (
    match_loggroups,
    subscription_plan,
)


def _groups(spark):
    rows = [
        ("/aws/lambda/prod-api", {"team": "sre"}),
        ("/aws/lambda/dev-api", {"team": "dev"}),
        ("/aws/eks/batch", {"team": "data"}),
    ]
    return spark.createDataFrame(
        rows, "log_group string, tags map<string,string>")


def test_match_name_or_tag(spark):
    got = {r.log_group for r in match_loggroups(
        _groups(spark), "lambda.*prod", ("team=data",)).collect()}
    assert got == {"/aws/lambda/prod-api", "/aws/eks/batch"}


def test_plan_lambda_destination_omits_role(spark):
    # Lambda destinations authorize via resource policy; the reference
    # builds params WITHOUT roleArn (:82-88).
    plan = subscription_plan(
        _groups(spark), "lambda.*prod",
        destination_arn="arn:aws:lambda:us-east-1:123:function:sumo",
        role_arn="arn:aws:iam::123:role/ignored",
    ).collect()
    assert len(plan) == 1
    row = plan[0]
    assert row.log_group_name == "/aws/lambda/prod-api"
    assert row.filter_name == "SumoLGLBDFilter"
    assert row.filter_pattern == ""
    assert row.role_arn is None


def test_plan_firehose_destination_includes_role(spark):
    plan = subscription_plan(
        _groups(spark), None,
        destination_arn="arn:aws:firehose:us-east-1:123:deliverystream/x",
        role_arn="arn:aws:iam::123:role/cwl",
        tags=("team=data",),
    ).collect()
    assert {r.log_group_name for r in plan} == {"/aws/eks/batch"}
    assert all(r.role_arn == "arn:aws:iam::123:role/cwl" for r in plan)


def test_plan_is_narrow(spark):
    # One pushed-down filter + projection — no exchange at fleet scale.
    plan = subscription_plan(
        _groups(spark), "lambda", destination_arn="arn:aws:lambda:x")
    assert "Exchange" not in plan._jdf.queryExecution().executedPlan().toString()
