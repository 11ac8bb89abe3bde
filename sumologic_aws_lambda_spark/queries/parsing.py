"""Parsing / scalar-transform queries: JSON sniffing, regex extraction,
timestamp normalization, timeslicing.

These are the query-side twins of the reference's per-record mutations
(SURVEY §2.3): JSON auto-detect parse (P5, ``cloudwatchlogs_lambda.js:
64-70``), regex extract (P2), timestamp-format normalization (P12/P18) and
the search-language ``timeslice`` (§2.8 T10).

Scale notes: all expressions are built-in Column functions — they stay
inside whole-stage codegen, and JSON fields are extracted lazily with
``get_json_object`` instead of materializing a parsed struct for every
row (the schema-on-read stance of the reference, SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query


@query(
    "json_extract_props",
    oracle="""
    SELECT event_type,
           count(*)                                            AS n_events,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
                                                               AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy JSON field extraction (P5's query-side form): keep the payload
    as a string, pull typed fields on demand with ``get_json_object``."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "json_autodetect_parse",
    oracle="""
    SELECT CASE WHEN json_valid(props) THEN 'json' ELSE 'text' END AS kind,
           count(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def json_autodetect_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON auto-detect (P5, ``cloudwatchlogs_lambda.js:64-70``): classify
    each payload as parseable JSON vs free text.  Spark side uses
    ``from_json`` with a permissive schema + null check — the same
    try-parse-else-keep-text semantics without a UDF."""
    ev = table(spark, sf_dir, "events")
    parsed = F.from_json("props", "map<string,string>")
    return (
        ev.select(
            F.when(parsed.isNotNull(), F.lit("json"))
            .otherwise(F.lit("text"))
            .alias("kind")
        )
        .groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "regexp_extract_docs",
    oracle="""
    SELECT regexp_extract(text, '(spark|stream|batch)', 1) AS first_kw,
           count(*) AS n_docs
    FROM documents
    GROUP BY 1
    """,
)
def regexp_extract_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex capture-group extraction (P2, regex at
    ``cloudwatchlogs_lambda.js:17``): first engine keyword per document;
    no-match yields '' in both engines."""
    d = table(spark, sf_dir, "documents", parallel=True)
    return (
        d.select(
            F.regexp_extract("text", "(spark|stream|batch)", 1).alias("first_kw")
        )
        .groupBy("first_kw")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "timeslice_5m",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS slice_epoch,
           event_type,
           count(*)             AS n,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY 1, 2
    """,
)
def timeslice_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``timeslice 5m`` (Sumo search op; SURVEY §2.8 T10) as a tumbling
    window.  ``window()`` is the same construct Structured Streaming uses,
    so this plan is batch/stream portable."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.unix_timestamp(F.window("ts", "5 minutes").start).alias(
                "slice_epoch"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "timeslice_daily_active",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           count(DISTINCT user_id)  AS dau,
           count(*)                 AS n_events
    FROM events
    GROUP BY 1
    """,
)
def timeslice_daily_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-active-users rollup — date_trunc + exact distinct.  At 100 TB
    the distinct becomes ``approx_count_distinct`` (see
    ``approx_count_distinct_parts``)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "epoch_normalize",
    oracle="""
    WITH raw(id, epoch_val) AS (
        VALUES (1, '1704067200'),       -- seconds
               (2, '1704067200123'),    -- 13-digit millis
               (3, '1706745600'),
               (4, '1706745600999')
    )
    SELECT id,
           strftime(
               to_timestamp(CAST(epoch_val AS BIGINT) //
                   (CASE WHEN length(epoch_val) >= 13 THEN 1000 ELSE 1 END))
                   AT TIME ZONE 'UTC',
               '%Y-%m-%dT%H:%M:%SZ') AS iso_ts
    FROM raw
    """,
)
def epoch_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch→ISO normalization with the reference's 13-digit-millis sniff
    (P12, ``securityhub_forwarder.py:39-53``): divide by 1000 only when the
    value has ≥13 digits, then format RFC3339."""
    rows = [(1, "1704067200"), (2, "1704067200123"),
            (3, "1706745600"), (4, "1706745600999")]
    df = spark.createDataFrame(rows, "id int, epoch_val string")
    secs = F.when(
        F.length("epoch_val") >= 13,
        (F.col("epoch_val").cast("bigint") / 1000).cast("bigint"),
    ).otherwise(F.col("epoch_val").cast("bigint"))
    return df.select(
        "id",
        F.date_format(F.timestamp_seconds(secs), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        .alias("iso_ts"),
    )


@query(
    "timestamp_locator_extract",
    oracle="""
    WITH raw(id, message) AS (
        VALUES (1, '{"evt":"a","updatedAt":"2024-03-01T08:30:15.123Z"}'),
               (2, '{"evt":"b","updatedAt":"2024-03-02T09:45:00.000Z"}'),
               (3, 'no timestamp here')
    )
    SELECT id,
           CASE WHEN regexp_extract(message, '"updatedAt":"(.*?)"', 1) <> ''
                THEN CAST(strptime(
                         regexp_extract(message, '"updatedAt":"(.*?)"', 1),
                         '%Y-%m-%dT%H:%M:%S.%gZ') AS TIMESTAMP)
           END AS event_ts
    FROM raw
    """,
)
def timestamp_locator_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source ``defaultDateFormats`` {format, locator} normalization (P18,
    ``sumoresource.py:272-275``; locator example ``template_v2.yaml:
    149-150``): regex-locate the timestamp string, then parse it with the
    configured format."""
    rows = [(1, '{"evt":"a","updatedAt":"2024-03-01T08:30:15.123Z"}'),
            (2, '{"evt":"b","updatedAt":"2024-03-02T09:45:00.000Z"}'),
            (3, "no timestamp here")]
    df = spark.createDataFrame(rows, "id int, message string")
    located = F.regexp_extract("message", '"updatedAt":"(.*?)"', 1)
    return df.select(
        "id",
        F.when(
            located != "",
            F.to_timestamp(located, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"),
        ).alias("event_ts"),
    )
