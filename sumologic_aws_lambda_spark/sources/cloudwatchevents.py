"""CloudWatch Events / GuardDuty source (SURVEY §2.1 S6, §2.3 P14).

Reference: ``cloudwatchevents/src/cloudwatchevents.js:122-141`` — the
whole event object is one record; for ``source == 'aws.guardduty'`` the
``detail`` payload is unwrapped and shipped alone (:134-138).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CW_EVENT_SCHEMA = (
    "struct<version:string, id:string, `detail-type`:string, source:string,"
    " account:string, time:string, region:string, resources:array<string>,"
    " detail:string>"
)


def unwrap_guardduty(df: DataFrame, source_col: str = "source",
                     detail_col: str = "detail",
                     raw_col: str = "raw") -> DataFrame:
    """P14: guardduty events ship only their ``detail``; everything else
    ships whole (:134-138).  Payloads are JSON strings (schema-on-read)."""
    return df.withColumn(
        "payload",
        F.when(F.col(source_col) == "aws.guardduty", F.col(detail_col))
        .otherwise(F.col(raw_col)),
    )
