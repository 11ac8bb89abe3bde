"""Auto-enable S3 logging for newly created AWS resources.

Reference: ``awsautoenableS3Logging/sumologic-s3-logging-auto-enable.yaml``
(CloudTrail create-events → Lambda) with the logic in
``sumologic-app-utils/src/awsresource.py``:

- ``enable_s3_logs(event, context)`` (:387-426) — dispatch on
  ``detail.eventName``; ``CreateLoadBalancer`` with a
  ``requestParameters.loadBalancerName`` is the classic-ELB variant
  (:400-403).
- event→service map ``AWSResourcesAbstract.event_resource_map``
  (:431-443).
- per-type resource-id extraction from the CloudTrail event:
  S3 ``requestParameters.bucketName`` (:1000-1005), VPC
  ``responseElements.vpc.vpcId`` (:1091-1096), ALB
  ``responseElements.loadBalancers[].loadBalancerArn`` (:871-878),
  classic ELB ``requestParameters.loadBalancerName`` (:1206-1212).
- user ``Filter`` regex applied with ``re.search`` over the resource
  blob (:456-473).
- the destination: S3 bucket-logging {TargetBucket, TargetPrefix}
  (:1010-1022), VPC flow logs to ``arn:aws:s3:::bucket/prefix``
  (:1101-1110), ALB/ELB access-log attributes (:885-890, :1219-1229);
  a bucket never logs to itself (:1015).

Spark shape: the AWS API calls are the *sink* — the decision logic is a
single narrow pass over the CloudTrail event stream (classify → extract
ids → filter → emit action rows), so it runs identically as a batch
backfill over archived CloudTrail or inside ``foreachBatch`` on the live
stream.  No shuffle anywhere: per-event id extraction is an array
``explode`` of an already-computed per-row array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# awsresource.py:431-443 — subset that participates in S3-log auto-enable
# (the full map also routes tagging events).
EVENT_RESOURCE_MAP: dict[str, str] = {
    "CreateBucket": "s3",
    "CreateVpc": "vpc",
    "CreateLoadBalancer": "elbv2",
    "ELBClassicCreate": "elb",
}

# CloudTrail detail schema for the four create events we act on.
DETAIL_SCHEMA = (
    "struct<eventName:string, awsRegion:string,"
    " requestParameters:struct<bucketName:string,"
    "   loadBalancerName:string>,"
    " responseElements:struct<"
    "   vpc:struct<vpcId:string>,"
    "   loadBalancers:array<struct<loadBalancerArn:string>>>>"
)


def classify_event(detail: Column) -> Column:
    """``eventName`` → resource type, with the classic-ELB sniff: a
    CreateLoadBalancer carrying ``requestParameters.loadBalancerName``
    is ELB classic (awsresource.py:400-403)."""
    name = detail["eventName"]
    return (
        F.when(
            (name == "CreateLoadBalancer")
            & detail["requestParameters"]["loadBalancerName"].isNotNull(),
            F.lit("elb"),
        )
        .when(name == "CreateLoadBalancer", F.lit("elbv2"))
        .when(name == "CreateBucket", F.lit("s3"))
        .when(name == "CreateVpc", F.lit("vpc"))
    )


def _resource_ids(detail: Column, rtype: Column) -> Column:
    """Per-type id array (ALB events can carry several load balancers)."""
    return (
        F.when(rtype == "s3",
               F.array(detail["requestParameters"]["bucketName"]))
        .when(rtype == "vpc",
              F.array(detail["responseElements"]["vpc"]["vpcId"]))
        .when(rtype == "elbv2",
              F.transform(detail["responseElements"]["loadBalancers"],
                          lambda x: x["loadBalancerArn"]))
        .when(rtype == "elb",
              F.array(detail["requestParameters"]["loadBalancerName"]))
    )


def plan_s3_logging_actions(events: DataFrame, bucket: str, prefix: str,
                            filter_regex: str | None = None,
                            detail_col: str = "detail") -> DataFrame:
    """CloudTrail create-events → logging-config action rows.

    Output one row per (event, resource): ``resource_type``,
    ``resource_id``, ``region``, ``action`` and the computed
    ``log_destination`` (``s3://bucket/prefix`` for bucket logging and
    access logs; the flow-log ARN form for VPCs, awsresource.py:1108).
    The actual AWS mutation is the caller's sink (``foreachPartition``
    with the chunked/backoff discipline of T4/A5); everything decidable
    from the event alone is decided here, declaratively.
    """
    detail = F.col(detail_col)
    rtype = classify_event(detail).alias("resource_type")
    df = events.withColumn("resource_type", rtype)
    df = df.filter(F.col("resource_type").isNotNull())
    if filter_regex:
        # Reference applies re.search over the stringified resource
        # (awsresource.py:456-473); the JSON rendering of the detail
        # struct is the column-level equivalent.
        df = df.filter(F.to_json(detail).rlike(filter_regex))
    df = df.withColumn(
        "resource_id",
        F.explode(_resource_ids(detail, F.col("resource_type"))),
    ).filter(F.col("resource_id").isNotNull())
    # A bucket must not log to itself (awsresource.py:1015).
    df = df.filter(
        ~((F.col("resource_type") == "s3") & (F.col("resource_id") == bucket))
    )
    destination = F.when(
        F.col("resource_type") == "vpc",
        F.lit(f"arn:aws:s3:::{bucket}/{prefix}"),
    ).otherwise(F.lit(f"s3://{bucket}/{prefix}"))
    return df.select(
        "resource_type",
        "resource_id",
        detail["awsRegion"].alias("region"),
        F.lit("enable_s3_logs").alias("action"),
        destination.alias("log_destination"),
    )


# awsresource.py:431-443 — the tagging flow additionally routes
# RunInstances; its ids live in responseElements.instancesSet.items.
TAG_DETAIL_SCHEMA = DETAIL_SCHEMA.replace(
    "   loadBalancers:array<struct<loadBalancerArn:string>>>>",
    "   loadBalancers:array<struct<loadBalancerArn:string>>,"
    "   instancesSet:struct<items:array<struct<instanceId:string>>>>>",
)


def classify_tag_event(detail: Column) -> Column:
    """``classify_event`` plus the tagging-only route: ``RunInstances``
    → ec2 (awsresource.py:432).  Kept separate so the S3-logging plan
    never starts emitting actions for types it cannot enable."""
    return F.when(
        detail["eventName"] == "RunInstances", F.lit("ec2")
    ).otherwise(classify_event(detail))


def _arn(rtype: Column, rid: Column, region: Column,
         account_id: str) -> Column:
    """Reference ``get_arn_list_cloud_trail_event`` per type: S3 ARNs
    are global, ELBv2 events already carry full ARNs, EC2/VPC/classic-
    ELB build from (region, account)."""
    return (
        F.when(rtype == "s3", F.concat(F.lit("arn:aws:s3:::"), rid))
        .when(rtype == "elbv2", rid)
        .when(rtype == "ec2",
              F.concat(F.lit("arn:aws:ec2:"), region,
                       F.lit(f":{account_id}:instance/"), rid))
        .when(rtype == "vpc",
              F.concat(F.lit("arn:aws:ec2:"), region,
                       F.lit(f":{account_id}:vpc/"), rid))
        .when(rtype == "elb",
              F.concat(F.lit("arn:aws:elasticloadbalancing:"), region,
                       F.lit(f":{account_id}:loadbalancer/"), rid))
    )


def plan_tag_actions(events: DataFrame, tags: dict[str, str],
                     account_id: str, filter_regex: str | None = None,
                     delete: bool = False, chunk_size: int = 20,
                     detail_col: str = "detail") -> DataFrame:
    """``TagAWSResources`` (awsresource.py:111) as a declarative plan:
    CloudTrail create-events → per-resource ARNs → the user filter
    regex (``re.search`` over the stringified resource, :456-473) →
    tag/untag batches of ``chunk_size`` ARNs per (type, region) — the
    exact 20-ARN chunking the resourcegroupstaggingapi calls use
    (:491-507).  One output row per API call the sink will make:
    ``(resource_type, region, chunk, n_arns, arns, action, tags)``.

    Scale: classification/extraction/ARN build are narrow; the only
    shuffle is the per-(type, region) window that assigns chunk
    numbers — at CloudTrail volumes the create-event stream is already
    tiny relative to the corpus, and the window key spreads across
    type×region."""
    from pyspark.sql import Window

    import json as _json

    detail = F.col(detail_col)
    df = events.withColumn(
        "resource_type", classify_tag_event(detail)
    ).filter(F.col("resource_type").isNotNull())
    if filter_regex:
        df = df.filter(F.to_json(detail).rlike(filter_regex))
    rtype = F.col("resource_type")
    ids = F.when(
        rtype == "ec2",
        F.transform(detail["responseElements"]["instancesSet"]["items"],
                    lambda x: x["instanceId"]),
    ).otherwise(_resource_ids(detail, rtype))
    df = (
        df.withColumn("resource_id", F.explode(ids))
        .filter(F.col("resource_id").isNotNull())
        .withColumn("region", detail["awsRegion"])
        .withColumn("arn", _arn(rtype, F.col("resource_id"),
                                F.col("region"), account_id))
    )
    w = Window.partitionBy("resource_type", "region").orderBy("arn")
    chunked = df.withColumn(
        "chunk",
        F.floor((F.row_number().over(w) - 1) / chunk_size).cast("bigint"),
    )
    action = "untag_resources" if delete else "tag_resources"
    # untag sends only the keys (:497-500); tag sends the full map
    payload = (sorted(tags) if delete
               else {k: tags[k] for k in sorted(tags)})
    return (
        chunked.groupBy("resource_type", "region", "chunk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_arns"),
            F.concat_ws(",", F.sort_array(F.collect_list("arn")))
            .alias("arns"),
        )
        .withColumn("action", F.lit(action))
        .withColumn("tags", F.lit(_json.dumps(payload)))
    )
