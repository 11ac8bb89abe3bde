"""Log-group subscription matcher (SURVEY §2.4 F6).

Reference: ``loggroup-lambda-connector/src/loggroup-lambda-connector.js``
— subscribe a log group to the collector when its name matches
``LOG_GROUP_PATTERN`` case-insensitively (:60-66) **or** any of its tags
matches a ``k=v`` entry in ``LOG_GROUP_TAGS`` (:43-58).  This is the
catalog-layer predicate deciding which sources feed the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def loggroup_matcher(pattern: str | None,
                     tags: tuple[str, ...] = ()) -> Column:
    """Predicate over (log_group string, tags map<string,string>) rows.

    ``tags`` entries are ``key=value`` strings (the env-var format,
    :43-47); a group matches if its name matches the regex OR any tag
    pair matches exactly.
    """
    cond = F.lit(False)
    if pattern:
        cond = cond | F.col("log_group").rlike(f"(?i){pattern}")
    for entry in tags:
        if "=" not in entry:
            continue
        k, v = entry.split("=", 1)
        cond = cond | (F.col("tags").getItem(k.strip()) == v.strip())
    return cond


def match_loggroups(df: DataFrame, pattern: str | None,
                    tags: tuple[str, ...] = ()) -> DataFrame:
    return df.filter(loggroup_matcher(pattern, tags))


def subscription_plan(df: DataFrame, pattern: str | None,
                      destination_arn: str, role_arn: str | None = None,
                      tags: tuple[str, ...] = ()) -> DataFrame:
    """The connector's actual job: derive the ``putSubscriptionFilter``
    action row for every matching log group
    (``loggroup-lambda-connector/src/loggroup-lambda-connector.js:81-98``).

    Mirrors the reference parameter construction exactly: fixed filter
    name ``SumoLGLBDFilter``, empty filter pattern, and ``roleArn`` only
    when the destination is NOT a Lambda ARN (:82-96 — Lambda
    destinations use resource policy, Kinesis/Firehose need the role).
    Narrow filter + projection — at fleet scale (millions of log groups)
    this is one pushed-down scan, no shuffle.
    """
    dest_is_lambda = destination_arn.startswith("arn:aws:lambda")
    return match_loggroups(df, pattern, tags).select(
        F.col("log_group").alias("log_group_name"),
        F.lit(destination_arn).alias("destination_arn"),
        F.lit("SumoLGLBDFilter").alias("filter_name"),
        F.lit("").alias("filter_pattern"),
        (F.lit(None).cast("string") if dest_is_lambda or role_arn is None
         else F.lit(role_arn)).alias("role_arn"),
    )
