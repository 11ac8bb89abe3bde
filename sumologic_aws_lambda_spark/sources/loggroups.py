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
