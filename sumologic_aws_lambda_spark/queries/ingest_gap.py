"""Gap-filling ingestion operators from SURVEY §2 not yet in the registry:
S4 CloudTrail explode, F1 control-message skip, F2 logstream prefix filter
(with P16 regex-escape), F5 digest skip, F8/F9 include-exclude ingest
rules, F11 corrupt-payload discard, J4 metadata override, A2/S13 finding
grouping, A4 delivery accounting, A5 fixed-size chunking, P13 ISO
serialization.

Inline fixtures mirror the reference's envelope shapes; queries that can
run on the shared TPC-H-ish tables do so (scale path exercised for real).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..sources.cloudtrail import (
    CLOUDTRAIL_RECORD_CORE,
    skip_digest_keys,
)
from . import query

# ---------------------------------------------------------------------------
# S4 + F5: CloudTrail object → records
# ---------------------------------------------------------------------------

_CT_BODY_1 = (
    '{"Records": ['
    '{"eventVersion": "1.08", "eventTime": "2024-01-05T10:00:00Z",'
    ' "eventSource": "s3.amazonaws.com", "eventName": "PutObject",'
    ' "awsRegion": "us-east-1", "sourceIPAddress": "203.0.113.5",'
    ' "userIdentity": {"type": "IAMUser", "userName": "alice"},'
    ' "eventID": "e-1"},'
    '{"eventVersion": "1.08", "eventTime": "2024-01-05T10:01:00Z",'
    ' "eventSource": "ec2.amazonaws.com", "eventName": "RunInstances",'
    ' "awsRegion": "us-west-2", "sourceIPAddress": "203.0.113.6",'
    ' "userIdentity": {"type": "IAMUser", "userName": "bob"},'
    ' "eventID": "e-2"}'
    "]}"
)
_CT_BODY_2 = (
    '{"Records": ['
    '{"eventVersion": "1.08", "eventTime": "2024-01-05T11:00:00Z",'
    ' "eventSource": "iam.amazonaws.com", "eventName": "CreateUser",'
    ' "awsRegion": "us-east-1", "sourceIPAddress": "203.0.113.7",'
    ' "userIdentity": {"type": "Root", "userName": "root"},'
    ' "eventID": "e-3"}'
    "]}"
)

_CT_ROWS = [
    (1, "AWSLogs/1/CloudTrail/us-east-1/2024/01/05/a.json.gz", _CT_BODY_1),
    (2, "AWSLogs/1/CloudTrail-Digest/us-east-1/2024/01/05/d.json.gz", _CT_BODY_2),
    (3, "AWSLogs/1/CloudTrail/us-east-1/2024/01/05/b.json.gz", _CT_BODY_2),
]

_CT_VALUES = ",\n               ".join(
    "({}, '{}', '{}')".format(i, k, b) for i, k, b in _CT_ROWS
)


@query(
    "cloudtrail_records_explode",
    oracle=f"""
    WITH raw(obj_id, key, body) AS (
        VALUES {_CT_VALUES}
    ), kept AS (
        SELECT obj_id, body,
               CAST(json_array_length(body, '$.Records') AS INT) AS cnt
        FROM raw WHERE NOT regexp_matches(key, 'CloudTrail-Digest')
    ), idx AS (
        SELECT obj_id, body, unnest(generate_series(0, cnt - 1)) AS i
        FROM kept
    )
    SELECT obj_id, CAST(i AS INT) AS record_index,
           json_extract_string(body, '$.Records[' || i || '].eventName')
               AS event_name,
           json_extract_string(body, '$.Records[' || i || '].awsRegion')
               AS region,
           json_extract_string(
               body, '$.Records[' || i || '].userIdentity.userName')
               AS user_name
    FROM idx
    """,
)
def cloudtrail_records_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+F5: skip digest keys, parse the object body once, explode
    ``Records[]`` one row per API event
    (``cloudtrail_s3_to_sumo.js:40-43,57-62``).  from_json parses each
    body exactly once per row; posexplode keeps the in-object order as an
    explicit column so downstream is order-independent."""
    df = spark.createDataFrame(_CT_ROWS, "obj_id int, key string, body string")
    recs = (
        skip_digest_keys(df)
        .withColumn(
            "records",
            F.from_json(
                F.get_json_object("body", "$.Records"), CLOUDTRAIL_RECORD_CORE
            ),
        )
        .select("obj_id", F.posexplode("records").alias("record_index", "r"))
    )
    return recs.select(
        "obj_id",
        "record_index",
        F.col("r.eventName").alias("event_name"),
        F.col("r.awsRegion").alias("region"),
        F.col("r.userIdentity.userName").alias("user_name"),
    )


# ---------------------------------------------------------------------------
# F1 + F2 (+P16): envelope-level filters
# ---------------------------------------------------------------------------

_ENV_ROWS = [
    (1, "DATA_MESSAGE", "api-prod-1"),
    (2, "CONTROL_MESSAGE", "api-prod-1"),
    (3, "DATA_MESSAGE", "WEB-frontend"),
    (4, "DATA_MESSAGE", "batch-worker"),
    (5, "DATA_MESSAGE", "Api-canary"),
    (6, "CONTROL_MESSAGE", "batch-worker"),
]

_ENV_VALUES = ",\n               ".join(
    f"({i}, '{mt}', '{ls}')" for i, mt, ls in _ENV_ROWS
)


def _prefix_regex(csv: str) -> str:
    """P16: escape user-supplied prefixes, join with '|' alternation
    (``cloudwatchlogs_lambda.js:107-110,130-132``)."""
    parts = [re.escape(p.strip()) for p in csv.split(",") if p.strip()]
    return "^(" + "|".join(parts) + ")"


@query(
    "control_message_skip",
    oracle=f"""
    WITH raw(env_id, message_type, log_stream) AS (
        VALUES {_ENV_VALUES}
    )
    SELECT env_id, log_stream FROM raw
    WHERE message_type <> 'CONTROL_MESSAGE'
    """,
)
def control_message_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: CWL CONTROL_MESSAGE envelopes carry no log events and are
    dropped before any decode work
    (``cloudwatchlogs_lambda.js:171-172``, ``k2sl_lambda.js:192-195``)."""
    df = spark.createDataFrame(
        _ENV_ROWS, "env_id int, message_type string, log_stream string"
    )
    return df.filter(F.col("message_type") != "CONTROL_MESSAGE").select(
        "env_id", "log_stream"
    )


@query(
    "logstream_prefix_filter",
    oracle=f"""
    WITH raw(env_id, message_type, log_stream) AS (
        VALUES {_ENV_VALUES}
    )
    SELECT env_id, log_stream FROM raw
    WHERE regexp_matches(log_stream, '^(api\\-|web)', 'i')
    """,
)
def logstream_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2+P16: case-insensitive ^(p1|p2) built from a comma list of
    user prefixes, each regex-escaped first
    (``cloudwatchlogs_lambda.js:107-110`` build, :173-174 apply)."""
    df = spark.createDataFrame(
        _ENV_ROWS, "env_id int, message_type string, log_stream string"
    )
    rx = "(?i)" + _prefix_regex("api-,web")
    return df.filter(F.col("log_stream").rlike(rx)).select(
        "env_id", "log_stream"
    )


# ---------------------------------------------------------------------------
# F8 + F9: declarative include/exclude ingest rules, on the events table
# ---------------------------------------------------------------------------


@query(
    "ingest_include_exclude_rules",
    oracle="""
    SELECT event_id, event_type
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
      AND regexp_matches(props, '"k": [0-9]*[02468]}')
      AND NOT regexp_matches(props, '"k": 4[0-9]}')
    ORDER BY event_id
    """,
)
def ingest_include_exclude_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8+F9: namespace include-filter (``isin`` —
    ``KinesisFirehoseCWMetrics.template.yaml:396-405``) composed with
    source processing rules: include-regexp then exclude-regexp over the
    payload (``sumoresource.py:277-281``).  All three predicates are
    Catalyst filters on one scan — pushdown-eligible, zero shuffle."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("click", "view", "purchase"))
        .filter(F.col("props").rlike('"k": [0-9]*[02468]}'))
        .filter(~F.col("props").rlike('"k": 4[0-9]}'))
        .select("event_id", "event_type")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# F11: corrupt / non-payload message discard
# ---------------------------------------------------------------------------

_DLQ_ROWS = [
    (1, '{"awslogs": {"data": "H4sIAAAA"}}'),
    (2, '{"detail": "no awslogs key"}'),
    (3, "not json at all"),
    (4, '{"awslogs": {}}'),
    (5, '{"awslogs": {"data": "H4sIBBBB"}}'),
]

_DLQ_VALUES = ",\n               ".join(
    "({}, '{}')".format(i, b) for i, b in _DLQ_ROWS
)


@query(
    "corrupt_payload_discard",
    oracle=f"""
    WITH raw(msg_id, body) AS (
        VALUES {_DLQ_VALUES}
    )
    SELECT msg_id,
           json_extract_string(body, '$.awslogs.data') AS payload
    FROM raw
    WHERE json_valid(body)
      AND json_extract_string(body, '$.awslogs.data') IS NOT NULL
    """,
)
def corrupt_payload_discard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: DLQ messages lacking ``awslogs.data`` are deleted without
    processing (``DLQProcessor.js:36-43``) — expressed as the
    corrupt-record-drop pattern: parse, null-check, filter."""
    df = spark.createDataFrame(_DLQ_ROWS, "msg_id int, body string")
    payload = F.get_json_object("body", "$.awslogs.data")
    return (
        df.withColumn("payload", payload)
        .filter(F.col("payload").isNotNull())
        .select("msg_id", "payload")
    )


# ---------------------------------------------------------------------------
# J4: per-record _sumo_metadata override merged over env defaults
# ---------------------------------------------------------------------------

_META_ROWS = [
    (1, '{"_sumo_metadata": {"category": "prod/api", "host": "h1"}, "msg": "a"}'),
    (2, '{"msg": "b"}'),
    (3, '{"_sumo_metadata": {"category": "prod/web"}, "msg": "c"}'),
]

_META_VALUES = ",\n               ".join(
    "({}, '{}')".format(i, b) for i, b in _META_ROWS
)


@query(
    "metadata_override_merge",
    oracle=f"""
    WITH raw(rec_id, body) AS (
        VALUES {_META_VALUES}
    )
    SELECT rec_id,
           coalesce(json_extract_string(body, '$._sumo_metadata.category'),
                    'default/cat') AS source_category,
           coalesce(json_extract_string(body, '$._sumo_metadata.host'),
                    'default-host') AS source_host,
           json_extract_string(body, '$.msg') AS msg
    FROM raw
    """,
)
def metadata_override_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: embedded ``_sumo_metadata`` overrides env-derived defaults
    per record, then the field is removed from the payload
    (``sumologsclient.js:28-40``, ``k2sl_lambda.js:82-94``)."""
    df = spark.createDataFrame(_META_ROWS, "rec_id int, body string")
    meta = lambda k: F.get_json_object("body", f"$._sumo_metadata.{k}")  # noqa: E731
    return df.select(
        "rec_id",
        F.coalesce(meta("category"), F.lit("default/cat")).alias(
            "source_category"
        ),
        F.coalesce(meta("host"), F.lit("default-host")).alias("source_host"),
        F.get_json_object("body", "$.msg").alias("msg"),
    )


# ---------------------------------------------------------------------------
# A2 + S13: group findings per ProductArn, deterministic object key
# ---------------------------------------------------------------------------

_FINDING_ROWS = [
    (1, "arn:aws:p/one", "f-1"),
    (2, "arn:aws:p/one", "f-2"),
    (3, "arn:aws:p/two", "f-3"),
    (4, "arn:aws:p/one", "f-4"),
    (5, "arn:aws:p/two", "f-5"),
]

_FINDING_VALUES = ",\n               ".join(
    f"({i}, '{arn}', '{fid}')" for i, arn, fid in _FINDING_ROWS
)


@query(
    "securityhub_group_findings",
    oracle=f"""
    WITH raw(row_id, product_arn, finding_id) AS (
        VALUES {_FINDING_VALUES}
    )
    SELECT product_arn,
           CAST(count(*) AS BIGINT) AS n_findings,
           string_agg(finding_id, chr(10) || chr(10) ORDER BY finding_id)
               AS payload,
           product_arn || '-' || 'req-001' AS object_key
    FROM raw GROUP BY product_arn
    """,
)
def securityhub_group_findings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+S13: bucket findings per ProductArn, join with blank lines,
    write one object keyed ``{ProductArn}-{request_id}``
    (``securityhub_collector.py:19-32,39-47``).  sort_array before the
    join makes the payload deterministic under any task ordering —
    required for the idempotent at-least-once sink."""
    df = spark.createDataFrame(
        _FINDING_ROWS, "row_id int, product_arn string, finding_id string"
    )
    return df.groupBy("product_arn").agg(
        F.count(F.lit(1)).alias("n_findings"),
        F.concat_ws("\n\n", F.sort_array(F.collect_list("finding_id"))).alias(
            "payload"
        ),
        F.concat(F.col("product_arn"), F.lit("-req-001")).alias("object_key"),
    )


# ---------------------------------------------------------------------------
# securityhub-org: multi-account (AWS Organizations) findings rollup
# ---------------------------------------------------------------------------

_ORG_FINDING_ROWS = [
    # (row_id, aws_account_id, product_arn, finding_id, severity)
    (1, "111111111111", "arn:aws:p/guardduty", "of-1", 30),
    (2, "111111111111", "arn:aws:p/guardduty", "of-2", 70),
    (3, "111111111111", "arn:aws:p/inspector", "of-3", 20),
    (4, "222222222222", "arn:aws:p/guardduty", "of-4", 90),
    (5, "222222222222", "arn:aws:p/guardduty", "of-5", 10),
    (6, "333333333333", "arn:aws:p/inspector", "of-6", 55),
]

_ORG_FINDING_VALUES = ",\n               ".join(
    f"({i}, '{acct}', '{arn}', '{fid}', {sev})"
    for i, acct, arn, fid, sev in _ORG_FINDING_ROWS
)


@query(
    "securityhub_org_findings",
    oracle=f"""
    WITH raw(row_id, aws_account_id, product_arn, finding_id, severity) AS (
        VALUES {_ORG_FINDING_VALUES}
    )
    SELECT aws_account_id,
           product_arn,
           CAST(count(*) AS BIGINT) AS n_findings,
           CAST(max(severity) AS INTEGER) AS max_severity,
           string_agg(finding_id, chr(10) || chr(10) ORDER BY finding_id)
               AS payload
    FROM raw GROUP BY aws_account_id, product_arn
    """,
)
def securityhub_org_findings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """securityhub-org collector: findings fan in from every member
    account of an AWS Organization and roll up per (account, product)
    (``securityhub-org/sumologic-securityhub-collector-awsorg/src/
    securityhub_collector_org.py:30-48``; account dimension from the ASFF
    ``AwsAccountId`` field).  One hash agg on the two-column key; the
    extra dimension raises key cardinality, so the org fan-in *reduces*
    reducer skew versus product-only grouping."""
    df = spark.createDataFrame(
        _ORG_FINDING_ROWS,
        "row_id int, aws_account_id string, product_arn string,"
        " finding_id string, severity int",
    )
    return df.groupBy("aws_account_id", "product_arn").agg(
        F.count(F.lit(1)).alias("n_findings"),
        F.max("severity").alias("max_severity"),
        F.concat_ws("\n\n", F.sort_array(F.collect_list("finding_id"))).alias(
            "payload"
        ),
    )


# ---------------------------------------------------------------------------
# A4: delivery success/error accounting fold
# ---------------------------------------------------------------------------

_DELIVERY_ROWS = [
    ("bucket-a", "SUCCESS", "k1"),
    ("bucket-a", "SUCCESS", "k2"),
    ("bucket-a", "FAILED", "k3"),
    ("bucket-b", "SUCCESS", "k4"),
    ("bucket-b", "FAILED", "k5"),
    ("bucket-b", "FAILED", "k6"),
    ("bucket-c", "SUCCESS", "k7"),
]

_DELIVERY_VALUES = ",\n               ".join(
    f"('{b}', '{s}', '{k}')" for b, s, k in _DELIVERY_ROWS
)


@query(
    "delivery_accounting",
    oracle=f"""
    WITH raw(bucket, status, key) AS (
        VALUES {_DELIVERY_VALUES}
    )
    SELECT bucket,
           CAST(count(*) FILTER (WHERE status = 'SUCCESS') AS BIGINT)
               AS success_cnt,
           CAST(count(*) FILTER (WHERE status <> 'SUCCESS') AS BIGINT)
               AS error_cnt,
           coalesce(string_agg(key, ',' ORDER BY key)
                        FILTER (WHERE status <> 'SUCCESS'), '')
               AS failed_keys
    FROM raw GROUP BY bucket
    """,
)
def delivery_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: fold per-bucket delivery results into success/error counts and
    the retained failed-key list (``sumologsclient.js:81-108``,
    ``k2sl_lambda.js:100-122``) — conditional aggregation, one shuffle."""
    df = spark.createDataFrame(
        _DELIVERY_ROWS, "bucket string, status string, key string"
    )
    failed = F.when(F.col("status") != "SUCCESS", F.col("key"))
    return df.groupBy("bucket").agg(
        F.sum(F.when(F.col("status") == "SUCCESS", 1).otherwise(0)).alias(
            "success_cnt"
        ),
        F.sum(F.when(F.col("status") != "SUCCESS", 1).otherwise(0)).alias(
            "error_cnt"
        ),
        F.concat_ws(",", F.sort_array(F.collect_list(failed))).alias(
            "failed_keys"
        ),
    )


# ---------------------------------------------------------------------------
# A5: fixed-size chunking over a real table
# ---------------------------------------------------------------------------


@query(
    "chunked_batches",
    oracle="""
    WITH numbered AS (
        SELECT s_suppkey,
               row_number() OVER (ORDER BY s_suppkey) - 1 AS rn
        FROM supplier
    )
    SELECT CAST(rn // 20 AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n,
           min(s_suppkey) AS first_key,
           max(s_suppkey) AS last_key
    FROM numbered GROUP BY 1
    """,
)
def chunked_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: fixed-size chunking (20 ARNs per tag-API call,
    ``awsresource.py:491-507``) as a deterministic row_number bucket.
    The global window is fine for dimension-sized inputs; at 100 TB the
    same effect comes from ``foreachPartition`` local batching (see
    ``streaming/api_sink.py``) — no global sort ever needed."""
    from ..planmarks import bounded_global_window

    sup = table(spark, sf_dir, "supplier")
    rn = F.row_number().over(bounded_global_window(
        "s_suppkey",
        bound="dimension-sized input — one row per supplier; the "
              "100 TB path is foreachPartition local batching")) - 1
    return (
        sup.select("s_suppkey", rn.alias("rn"))
        .groupBy((F.col("rn") / 20).cast("long").alias("chunk_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("s_suppkey").alias("first_key"),
            F.max("s_suppkey").alias("last_key"),
        )
    )


# ---------------------------------------------------------------------------
# P13: datetime → ISO-8601 serialization over a real table
# ---------------------------------------------------------------------------


@query(
    "datetime_iso_serialize",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts
    FROM orders WHERE o_orderkey % 97 = 0
    """,
)
def datetime_iso_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13: datetime → ``%Y-%m-%dT%H:%M:%SZ`` JSON serialization
    (``inspector.py:114-120``) via built-in ``date_format`` — stays in
    whole-stage codegen, and the modulo filter is pushed to the scan."""
    orders = table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
            "iso_ts"
        ),
    )


# ---------------------------------------------------------------------------
# P19: Field Extraction Rules applied at ingest
# ---------------------------------------------------------------------------


@query(
    "fer_registry_apply",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'click'
                THEN json_extract_string(props, '$.k') END AS click_k,
           CASE WHEN event_type = 'error'
                THEN nullif(regexp_extract(props, '"k": (\\d+)', 1), '')
           END AS err_code,
           coalesce(
               CASE WHEN event_type = 'click'
                    THEN json_extract_string(props, '$.k') END,
               CASE WHEN event_type = 'purchase'
                    THEN json_extract_string(props, '$.k') END
           ) AS shared_k
    FROM events
    WHERE event_type IN ('click', 'error', 'purchase')
    ORDER BY event_id
    """,
)
def fer_registry_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P19: a three-rule FER registry over the event stream — JSON and
    regex extractions, each masked by its scope predicate, two rules
    coalescing into one shared column (``sumoresource.py:1147-1177``).
    All rules fuse into a single codegen projection; rows never drop."""
    from ..plans.fer import FieldExtractionRule, apply_fers
    from ..plans.sumoql import SumoSchema

    schema = SumoSchema(raw_col="props",
                        meta_cols={"_sourceCategory": "event_type"})
    rules = [
        FieldExtractionRule(
            "click-k", "_sourceCategory=click", 'json "k" as click_k'),
        FieldExtractionRule(
            "err-code", "_sourceCategory=error",
            'parse regex "(?<errcode>\\d+)"'),
        FieldExtractionRule(
            "shared-click", "_sourceCategory=click",
            'json "k" as shared_k'),
        FieldExtractionRule(
            "shared-purchase", "_sourceCategory=purchase",
            'json "k" as shared_k'),
        FieldExtractionRule(
            "disabled", "_sourceCategory=view",
            'json "k" as never_there', enabled=False),
    ]
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error", "purchase")
    )
    out = apply_fers(ev, rules, schema)
    assert "never_there" not in out.columns
    return out.select(
        "event_id", "click_k", F.col("errcode").alias("err_code"), "shared_k"
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# S15: OTLP 0.7 metric-stream record parse
# ---------------------------------------------------------------------------

_OTLP_BODY = (
    '{"resourceMetrics": [{"resource": {"attributes":'
    ' {"cloud.account.id": "123", "cloud.region": "us-east-1",'
    ' "aws.exporter.arn": "arn:stream"}},'
    ' "instrumentationLibraryMetrics": [{"metrics": ['
    '{"name": "amazonaws.com/AWS/EC2/CPUUtilization", "unit": "Percent",'
    ' "doubleSummary": {"dataPoints": ['
    '{"labels": {"InstanceId": "i-1", "cloud.region": "eu-west-1"},'
    ' "timeUnixNano": 1704067200000000000, "count": 5, "sum": 250.0,'
    ' "quantileValues": [{"quantile": 0.0, "value": 10.0},'
    ' {"quantile": 1.0, "value": 90.0}]},'
    '{"labels": {"InstanceId": "i-2"},'
    ' "timeUnixNano": 1704067260000000000, "count": 2, "sum": 60.0,'
    ' "quantileValues": [{"quantile": 0.0, "value": 20.0},'
    ' {"quantile": 1.0, "value": 40.0}]}]}},'
    '{"name": "amazonaws.com/AWS/EC2/NetworkIn", "unit": "Bytes",'
    ' "doubleSummary": {"dataPoints": ['
    '{"labels": {"InstanceId": "i-1"},'
    ' "timeUnixNano": 1704067200000000000, "count": 1, "sum": 1024.0,'
    ' "quantileValues": [{"quantile": 0.0, "value": 1024.0},'
    ' {"quantile": 1.0, "value": 1024.0}]}]}}]}]}]}'
)


@query(
    "otlp_metric_parse",
    oracle="""
    WITH expected(metric, unit, epoch_s, instance_id, region, n, total,
                  min_value, max_value) AS (
        VALUES
        ('amazonaws.com/AWS/EC2/CPUUtilization', 'Percent',
         CAST(1704067200 AS BIGINT), 'i-1', 'eu-west-1',
         CAST(5 AS BIGINT), 250.0, 10.0, 90.0),
        ('amazonaws.com/AWS/EC2/CPUUtilization', 'Percent',
         CAST(1704067260 AS BIGINT), 'i-2', 'us-east-1',
         CAST(2 AS BIGINT), 60.0, 20.0, 40.0),
        ('amazonaws.com/AWS/EC2/NetworkIn', 'Bytes',
         CAST(1704067200 AS BIGINT), 'i-1', 'us-east-1',
         CAST(1 AS BIGINT), 1024.0, 1024.0, 1024.0)
    )
    SELECT * FROM expected
    """,
)
def otlp_metric_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15: OTLP 0.7 metric-stream decode (the format Firehose emits,
    ``KinesisFirehoseCWMetrics.template.yaml:419``) → flat datapoints
    feeding the metrics service / rollups.  Datapoint labels override
    resource attributes on collision (finer scope wins); min/max come
    from the 0.0/1.0 quantile summary.  Fixture is deterministic, so the
    oracle pins the expected rows."""
    from ..sources.otlp import parse_otlp_records

    df = spark.createDataFrame([(_OTLP_BODY,)], "body string")
    out = parse_otlp_records(df)
    return out.select(
        "metric", "unit",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.col("dims")["InstanceId"].alias("instance_id"),
        F.col("dims")["cloud.region"].alias("region"),
        "n", "total", "min_value", "max_value",
    )


@query(
    "ingest_budget_enforcement",
    oracle="""
    WITH sized AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               length(props) AS b,
               sum(length(props)) OVER (
                   PARTITION BY event_type, date_trunc('day', ts)
                   ORDER BY ts, event_id
               ) AS cum
        FROM events
    )
    SELECT event_type, day,
           CAST(count(*) FILTER (WHERE cum <= 600) AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (WHERE cum > 600) AS BIGINT) AS n_dropped,
           CAST(coalesce(sum(b) FILTER (WHERE cum <= 600), 0) AS BIGINT)
               AS kept_bytes
    FROM sized GROUP BY event_type, day
    """,
)
def ingest_budget_enforcement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest budgets: a 600-byte daily quota per event_type; rows past
    the cutoff (cumulative bytes in (ts, event_id) order) are flagged.
    Two-phase skew-aware plan — under-budget keys never see a window,
    only the over-budget keys' rows pay the cumulative sum
    (``operators/budgets.py::apply_ingest_budget``)."""
    from ..operators.budgets import apply_ingest_budget

    ev = table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts"))
    flagged = apply_ingest_budget(
        ev, budget_bytes=600,
        key_cols=["event_type", "day"],
        order_cols=["ts", "event_id"],
        size=F.length("props"),
    )
    return flagged.groupBy("event_type", "day").agg(
        F.count_if(~F.col("_over_budget")).cast("bigint").alias("n_kept"),
        F.count_if(F.col("_over_budget")).cast("bigint").alias("n_dropped"),
        F.coalesce(
            F.sum(F.when(~F.col("_over_budget"), F.col("_bytes"))),
            F.lit(0),
        ).cast("bigint").alias("kept_bytes"),
    )
