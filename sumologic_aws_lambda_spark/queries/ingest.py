"""Ingestion-operator queries, oracle-checked over inline fixtures.

The ingestion half operates on envelope/record payloads, not the TPC-H
tables, so each query embeds a deterministic fixture — the same literal
rows appear as ``createDataFrame`` input on the Spark side and as a
``VALUES`` CTE in the DuckDB oracle.  The gzip/base64 envelope path can't
be oracle-checked (DuckDB has no gunzip) and is covered by the golden
pytest in ``tests/test_cwl.py`` plus a rows-only entry here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.cwl import CwlConfig, cwl_pipeline
from ..sources.firehose import transform_records
from ..sources.vpc import discard_internal_traffic, enrich_security_groups, parse_vpc_message
from . import query

# Deterministic VPC flow lines (vpcutils.js:8-29 layout).  eni-1/eni-2 are
# in subnet-a, eni-3 in subnet-b; 10.0.* is the "internal" CIDR.
_VPC_LINES = [
    (1, "2 123456789010 eni-1 10.0.0.1 10.0.0.2 49152 443 6 10 840 1600000000 1600000060 ACCEPT OK"),
    (2, "2 123456789010 eni-2 10.0.0.2 10.0.0.1 443 49152 6 8 672 1600000000 1600000060 ACCEPT OK"),
    (3, "2 123456789010 eni-1 203.0.113.5 10.0.0.1 49153 443 6 20 1680 1600000010 1600000070 ACCEPT OK"),
    (4, "2 123456789010 eni-3 10.0.1.9 203.0.113.7 49154 80 6 5 420 1600000020 1600000080 REJECT OK"),
    (5, "2 123456789010 eni-3 - - - - - - - 1600000030 1600000090 - NODATA"),
]

_VPC_VALUES = ",\n               ".join(
    f"({i}, '{line}')" for i, line in _VPC_LINES
)

_ENI_ROWS = [
    ("eni-1", ["sg-a", "sg-b"], "10.0.0.1", "subnet-a", "vpc-1", "us-east-1"),
    ("eni-2", ["sg-c"], "10.0.0.2", "subnet-a", "vpc-1", "us-east-1"),
    ("eni-3", ["sg-d"], "10.0.1.9", "subnet-b", "vpc-1", "us-east-1"),
]


def _vpc_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_VPC_LINES, "row_id int, message string")


@query(
    "vpc_flow_parse",
    oracle=f"""
    WITH raw(row_id, message) AS (
        VALUES {_VPC_VALUES}
    ), parts AS (
        SELECT row_id, string_split(message, ' ') AS p FROM raw
    )
    SELECT row_id,
           CAST(p[1] AS INT)              AS version,
           p[3]                           AS interface_id,
           nullif(p[4], '-')              AS srcaddr,
           nullif(p[5], '-')              AS dstaddr,
           CAST(nullif(p[6], '-') AS INT) AS srcport,
           CAST(nullif(p[7], '-') AS INT) AS dstport,
           CAST(nullif(p[9], '-') AS BIGINT)  AS packets,
           CAST(nullif(p[10], '-') AS BIGINT) AS bytes,
           CAST(p[11] AS BIGINT)          AS start_ts,
           nullif(p[13], '-')             AS action,
           p[14]                          AS log_status
    FROM parts
    """,
)
def vpc_flow_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: positional VPC parse with typed casts and '-' → NULL for
    NODATA/SKIPDATA placeholder fields (``vpcutils.js:8-29,37-39``)."""
    return parse_vpc_message(_vpc_df(spark)).select(
        "row_id", "version", "interface_id", "srcaddr", "dstaddr",
        "srcport", "dstport", "packets", "bytes", "start_ts", "action",
        "log_status",
    )


@query(
    "vpc_internal_filter",
    oracle=f"""
    WITH raw(row_id, message) AS (
        VALUES {_VPC_VALUES}
    ), parts AS (
        SELECT row_id, string_split(message, ' ') AS p FROM raw
    )
    SELECT row_id
    FROM parts
    WHERE NOT (starts_with(nullif(p[4],'-'), '10.0.0.')
               AND starts_with(nullif(p[5],'-'), '10.0.0.'))
          OR p[4] = '-'
    """,
)
def vpc_internal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: drop flows where BOTH endpoints are internal
    (``vpcutils.js:31-48``); NODATA rows (null addrs) pass through."""
    parsed = parse_vpc_message(_vpc_df(spark))
    out = discard_internal_traffic(parsed, ("10.0.0.",))
    return out.select("row_id")


@query(
    "vpc_eni_enrichment",
    oracle=f"""
    WITH raw(row_id, message) AS (
        VALUES {_VPC_VALUES}
    ), flows AS (
        SELECT row_id,
               string_split(message, ' ')[3] AS interface_id,
               nullif(string_split(message, ' ')[4], '-') AS srcaddr,
               nullif(string_split(message, ' ')[5], '-') AS dstaddr
        FROM raw
    ), eni(interface_id, ip_address, subnet_id, vpc_id) AS (
        VALUES ('eni-1', '10.0.0.1', 'subnet-a', 'vpc-1'),
               ('eni-2', '10.0.0.2', 'subnet-a', 'vpc-1'),
               ('eni-3', '10.0.1.9', 'subnet-b', 'vpc-1')
    )
    SELECT f.row_id, e.subnet_id, e.vpc_id,
           CASE WHEN e.ip_address IS NULL THEN NULL
                WHEN f.dstaddr = e.ip_address THEN
                     CASE WHEN se.subnet_id = e.subnet_id THEN 'internal'
                          ELSE 'inbound' END
                ELSE
                     CASE WHEN de.subnet_id = e.subnet_id THEN 'internal'
                          ELSE 'outbound' END
           END AS direction
    FROM flows f
    LEFT JOIN eni e  ON f.interface_id = e.interface_id
    LEFT JOIN eni se ON f.srcaddr = se.ip_address
    LEFT JOIN eni de ON f.dstaddr = de.ip_address
    """,
)
def vpc_eni_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J2: broadcast ENI-dimension join + direction classification
    (``vpcutils.js:117-152``)."""
    flows = parse_vpc_message(_vpc_df(spark)).select(
        "row_id", "interface_id", "srcaddr", "dstaddr"
    )
    eni = spark.createDataFrame(
        _ENI_ROWS,
        "interface_id string, security_group_ids array<string>,"
        " ip_address string, subnet_id string, vpc_id string,"
        " aws_region string",
    )
    out = enrich_security_groups(flows, eni)
    return out.select("row_id", "subnet_id", "vpc_id", "direction")


_GD_EVENTS = [
    (1, "aws.guardduty", '{"findingType":"Recon:EC2/PortProbe","severity":5}',
     '{"source":"aws.guardduty","detail":{"findingType":"Recon:EC2/PortProbe","severity":5}}'),
    (2, "aws.ec2", '{"state":"running"}',
     '{"source":"aws.ec2","detail":{"state":"running"}}'),
    (3, "aws.guardduty", '{"findingType":"Backdoor:EC2/DNS","severity":8}',
     '{"source":"aws.guardduty","detail":{"findingType":"Backdoor:EC2/DNS","severity":8}}'),
]


@query(
    "guardduty_unwrap",
    oracle="""
    WITH raw(id, source, detail, whole) AS (
        VALUES (1, 'aws.guardduty', '{"findingType":"Recon:EC2/PortProbe","severity":5}',
                '{"source":"aws.guardduty","detail":{"findingType":"Recon:EC2/PortProbe","severity":5}}'),
               (2, 'aws.ec2', '{"state":"running"}',
                '{"source":"aws.ec2","detail":{"state":"running"}}'),
               (3, 'aws.guardduty', '{"findingType":"Backdoor:EC2/DNS","severity":8}',
                '{"source":"aws.guardduty","detail":{"findingType":"Backdoor:EC2/DNS","severity":8}}')
    )
    SELECT id,
           CASE WHEN source = 'aws.guardduty' THEN detail ELSE whole END
               AS payload,
           json_extract_string(
               CASE WHEN source = 'aws.guardduty' THEN detail ELSE whole END,
               '$.findingType') AS finding_type
    FROM raw
    """,
)
def guardduty_unwrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14: guardduty events ship only ``detail``
    (``cloudwatchevents.js:134-138``)."""
    from ..sources.cloudwatchevents import unwrap_guardduty

    df = spark.createDataFrame(
        _GD_EVENTS, "id int, source string, detail string, raw string"
    )
    out = unwrap_guardduty(df)
    return out.select(
        "id", "payload",
        F.get_json_object("payload", "$.findingType").alias("finding_type"),
    )


@query(
    "firehose_transform",
    oracle="""
    WITH raw(record_id, data) AS (
        VALUES (1, to_base64(encode('{"a":"1","b":"x"}'))),
               (2, to_base64(encode('plain text line'))),
               (3, CAST(NULL AS VARCHAR))
    )
    SELECT record_id,
           CASE WHEN data IS NULL THEN 'ProcessingFailed' ELSE 'Ok' END
               AS result,
           CASE WHEN data IS NULL THEN NULL
                ELSE to_base64(encode(decode(from_base64(data)) || chr(10)))
           END AS data_out
    FROM raw
    """,
)
def firehose_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/P10: Firehose transform — base64 roundtrip, newline delimiter
    append, Ok/ProcessingFailed status
    (``kinesisfirehose-processor.js:9-15,30-57``)."""
    rows = [(1, '{"a":"1","b":"x"}'), (2, "plain text line"), (3, None)]
    df = spark.createDataFrame(rows, "record_id int, payload string").select(
        "record_id", F.base64(F.encode("payload", "UTF-8")).alias("data")
    )
    return transform_records(df).select("record_id", "result", "data_out")


@query(
    "asff_validation_gate",
    oracle="""
    WITH raw(id, severity, compliance_status, title, finding_type, resource_id) AS (
        VALUES (1, 42,  'PASSED',  'ok finding',  'Software/CVE', 'arn:r1'),
               (2, 101, 'PASSED',  'too severe',  'Software/CVE', 'arn:r2'),
               (3, 10,  'MAYBE',   'bad status',  'Software/CVE', 'arn:r3'),
               (4, 55,  'WARNING', NULL,          'Software/CVE', 'arn:r4'),
               (5, 0,   'FAILED',  'edge ok',     'Software/CVE', 'arn:r5')
    )
    SELECT id,
           COALESCE((severity BETWEEN 0 AND 100)
           AND compliance_status IN ('PASSED','WARNING','FAILED','NOT_AVAILABLE')
           AND title IS NOT NULL AND finding_type IS NOT NULL
           AND resource_id IS NOT NULL, FALSE) AS valid
    FROM raw
    """,
)
def asff_validation_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: ASFF param validation — severity 0-100, compliance enum,
    required fields (``securityhub_forwarder.py:92-116``).  Invalid rows
    are flagged, not dropped (error side-channel)."""
    from ..sources.securityhub import validate_findings

    rows = [
        (1, 42, "PASSED", "ok finding", "Software/CVE", "arn:r1"),
        (2, 101, "PASSED", "too severe", "Software/CVE", "arn:r2"),
        (3, 10, "MAYBE", "bad status", "Software/CVE", "arn:r3"),
        (4, 55, "WARNING", None, "Software/CVE", "arn:r4"),
        (5, 0, "FAILED", "edge ok", "Software/CVE", "arn:r5"),
    ]
    df = spark.createDataFrame(
        rows,
        "id int, severity int, compliance_status string, title string,"
        " finding_type string, resource_id string",
    )
    return validate_findings(df).select("id", F.col("_valid").alias("valid"))


@query(
    "multiline_assembly",
    oracle="""
    WITH expected(record_index, message) AS (
        VALUES (0, '2024-03-01 10:00:00 INFO starting up'),
               (1, '2024-03-01 10:00:01 ERROR boom' || chr(10) ||
                   'Traceback (most recent call last):' || chr(10) ||
                   'ValueError: nope'),
               (2, '2024-03-01 10:00:02 INFO recovered')
    )
    SELECT record_index, message FROM expected
    """,
)
def multiline_assembly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9: fold continuation lines (stack traces) into their boundary
    record (``sumoresource.py:287-291`` multiline flags) — per-object
    array fold, no shuffle.  Oracle pins the expected assembled records."""
    from ..sources.s3 import assemble_multiline

    content = (
        "2024-03-01 10:00:00 INFO starting up\n"
        "2024-03-01 10:00:01 ERROR boom\n"
        "Traceback (most recent call last):\n"
        "ValueError: nope\n"
        "2024-03-01 10:00:02 INFO recovered\n"
    )
    df = spark.createDataFrame([(content, "k1")],
                               "content string, s3_key string")
    return assemble_multiline(df).select("record_index", "message")


_CWL_GOLDEN_ORACLE = """
    WITH expected(envelope_id, event_index, ts, request_id, message,
                  log_group, log_stream, metadata_key) AS (VALUES
      ('03ddeb86cbc06e0acad53d52c332a9a62219fe31b52e886c6dda4b7b0b4af11c', 0,
       TIMESTAMP '2024-01-23 08:53:20', '11111111-aaaa-bbbb-cccc-222222222222',
       'START RequestId: 11111111-aaaa-bbbb-cccc-222222222222 Version: $LATEST',
       '/aws/lambda/fn-a', '2024/01/23/[$LATEST]abc123',
       '2024/01/23/[$LATEST]abc123::/aws/lambda/fn-a:'),
      ('03ddeb86cbc06e0acad53d52c332a9a62219fe31b52e886c6dda4b7b0b4af11c', 1,
       TIMESTAMP '2024-01-23 08:53:21', '11111111-aaaa-bbbb-cccc-222222222222',
       'handling request',
       '/aws/lambda/fn-a', '2024/01/23/[$LATEST]abc123',
       '2024/01/23/[$LATEST]abc123::/aws/lambda/fn-a:'),
      ('03ddeb86cbc06e0acad53d52c332a9a62219fe31b52e886c6dda4b7b0b4af11c', 2,
       TIMESTAMP '2024-01-23 08:53:22', '11111111-aaaa-bbbb-cccc-222222222222',
       'plain continuation line',
       '/aws/lambda/fn-a', '2024/01/23/[$LATEST]abc123',
       '2024/01/23/[$LATEST]abc123::/aws/lambda/fn-a:'),
      ('03ddeb86cbc06e0acad53d52c332a9a62219fe31b52e886c6dda4b7b0b4af11c', 3,
       TIMESTAMP '2024-01-23 08:53:23', '11111111-aaaa-bbbb-cccc-222222222222',
       '{"level":"info","msg":"structured"}',
       '/aws/lambda/fn-a', '2024/01/23/[$LATEST]abc123',
       '2024/01/23/[$LATEST]abc123::/aws/lambda/fn-a:'),
      ('03ddeb86cbc06e0acad53d52c332a9a62219fe31b52e886c6dda4b7b0b4af11c', 5,
       TIMESTAMP '2024-01-23 08:53:25', '11111111-aaaa-bbbb-cccc-222222222222',
       'END RequestId: 11111111-aaaa-bbbb-cccc-222222222222',
       '/aws/lambda/fn-a', '2024/01/23/[$LATEST]abc123',
       '2024/01/23/[$LATEST]abc123::/aws/lambda/fn-a:'),
      ('754ff7161c32b21fb5021687ead7f59cf04cca2a5c0bf008642d7e713f9794f9', 0,
       TIMESTAMP '2024-01-23 08:53:20', NULL,
       '{"_sumo_metadata":{"category":"override/cat"},"payload":"x"}',
       '/aws/app/service-b', 'stream-b',
       'stream-b:override/cat:/aws/app/service-b:'),
      ('754ff7161c32b21fb5021687ead7f59cf04cca2a5c0bf008642d7e713f9794f9', 1,
       TIMESTAMP '2024-01-23 08:53:21', NULL,
       'free text with trailing newline',
       '/aws/app/service-b', 'stream-b', 'stream-b::/aws/app/service-b:'),
      ('1499243ce0d18c8dd501df96f107e36ce136e1a602f2bd18910d50b812add180', 0,
       TIMESTAMP '2024-01-23 08:53:20', NULL, 'app log line 0',
       '/aws/app/service-c', 'stream-c', 'stream-c::/aws/app/service-c:'),
      ('1499243ce0d18c8dd501df96f107e36ce136e1a602f2bd18910d50b812add180', 1,
       TIMESTAMP '2024-01-23 08:53:21', NULL, 'app log line 1',
       '/aws/app/service-c', 'stream-c', 'stream-c::/aws/app/service-c:'),
      ('1499243ce0d18c8dd501df96f107e36ce136e1a602f2bd18910d50b812add180', 2,
       TIMESTAMP '2024-01-23 08:53:22', NULL, 'app log line 2',
       '/aws/app/service-c', 'stream-c', 'stream-c::/aws/app/service-c:'),
      ('d86b0ffc0e29c7719ddac21be9544cb9e84dc5eac423796a062a8791636ca313', 0,
       TIMESTAMP '2024-01-23 08:53:20', NULL, 'other line 0',
       '/aws/app/service-d', 'other-d', 'other-d::/aws/app/service-d:'),
      ('d86b0ffc0e29c7719ddac21be9544cb9e84dc5eac423796a062a8791636ca313', 1,
       TIMESTAMP '2024-01-23 08:53:21', NULL, 'other line 1',
       '/aws/app/service-d', 'other-d', 'other-d::/aws/app/service-d:')
    )
    SELECT * FROM expected
    """


@query("cwl_decode_pipeline", oracle=_CWL_GOLDEN_ORACLE)
def cwl_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+D1/D2+P1-P7: the full CWL hot path on deterministic synthetic
    envelopes (shapes mirror ``cwlfixtures.json``).  The decode is fully
    deterministic (fixed fixtures, sha256 envelope ids, epoch-ms event
    times), so the expected 12-row output is pinned as a DuckDB ``VALUES``
    oracle — the same golden rows ``tests/test_cwl.py`` asserts."""
    from ..testing.fixtures import synthetic_cwl_payloads

    payloads = synthetic_cwl_payloads()
    df = spark.createDataFrame([(p,) for p in payloads], "payload string")
    cfg = CwlConfig(include_log_info=True)
    return cwl_pipeline(df, cfg).select(
        "envelope_id", "event_index", "ts", "request_id", "message",
        "log_group", "log_stream", "metadata_key",
    )


@query(
    "pii_masking_rules",
    oracle="""
    SELECT doc_id,
           md5(list_aggregate(list_transform(
               string_split(
                   regexp_replace(
                       regexp_replace(text, 'customer', '#####', 'g'),
                       '\\b(?:join|merge)\\b',
                       chr(0) || '\\0' || chr(0), 'g'),
                   chr(0)),
               s -> CASE WHEN regexp_full_match(s, '\\b(?:join|merge)\\b')
                         THEN md5(s) ELSE s END),
               'string_agg', '')) AS masked_md5,
           CAST(length(regexp_extract_all(text, 'customer')) AS BIGINT)
               AS n_masked,
           CAST(length(regexp_extract_all(text, '\\b(?:join|merge)\\b'))
               AS BIGINT) AS n_hashed
    FROM documents
    """,
)
def pii_masking_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/Mask processing rules — the redaction half of the F9
    processing-rule surface (public Sumo rule types; the reference
    provisions the filter list verbatim, ``sumoresource.py:277-281``)
    applied at ingest: a Mask rule blanks matches with its mask string,
    a Hash rule replaces each match with its md5 so redacted values
    stay joinable.  Narrow projection over the corpus (regexp_replace
    + a distinct-match fold; no UDF, no shuffle) — at 100 TB this is a
    pure map stage fused into the scan."""
    from ..catalog import table
    from ..provisioning import CatalogStore, Source

    src = Source(name="docs", collector_id="c0", filters=[
        {"filterType": "Mask", "name": "m1",
         "regexp": "customer", "mask": "#####"},
        {"filterType": "Hash", "name": "h1",
         "regexp": r"\b(?:join|merge)\b"},
    ])
    d = table(spark, sf_dir, "documents")
    masked = CatalogStore.source_mask_transform(src, "text")
    return d.select(
        "doc_id",
        F.md5(masked).alias("masked_md5"),
        F.size(F.regexp_extract_all("text", F.lit("customer"), 0))
        .cast("bigint").alias("n_masked"),
        F.size(F.regexp_extract_all(
            "text", F.lit(r"\b(?:join|merge)\b"), 0))
        .cast("bigint").alias("n_hashed"),
    )
