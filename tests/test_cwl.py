"""Golden test for the CWL hot path (SURVEY §3.1) — the value-level
complement of the rows-only ``cwl_decode_pipeline`` driver entry."""

from __future__ import annotations

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.sources.cwl import (
    CwlConfig,
    create_records,
    cwl_pipeline,
    decode_envelopes,
    explode_events,
)
from sumologic_aws_lambda_spark.testing.fixtures import synthetic_cwl_payloads

REQ = "11111111-aaaa-bbbb-cccc-222222222222"


def _payload_df(spark):
    return spark.createDataFrame(
        [(p,) for p in synthetic_cwl_payloads()], "payload string"
    )


def test_decode_and_explode(spark):
    env = decode_envelopes(_payload_df(spark))
    events = explode_events(env)
    # control-message envelope dropped whole: 6 + 2 + 3 + 2 events remain
    assert events.count() == 13
    row = events.filter(
        (F.col("log_stream") == "stream-b") & (F.col("event_index") == 1)
    ).first()
    assert row.message == "free text with trailing newline\n"
    assert row.ts.isoformat().startswith("2024-01-23T08:53:21")


def test_control_message_skip(spark):
    env = decode_envelopes(_payload_df(spark))
    groups = {r.log_group for r in explode_events(env)
              .select("log_group").distinct().collect()}
    assert "/aws/app/service-c" in groups  # data envelope kept
    streams = explode_events(env).filter(
        F.col("message").contains("CONTROL")).count()
    assert streams == 0


def test_log_stream_prefix_filter(spark):
    cfg = CwlConfig(log_stream_prefixes=("stream-", "2024/"))
    env = decode_envelopes(_payload_df(spark), config=cfg)
    events = explode_events(env, cfg)
    streams = {r.log_stream for r in events.select("log_stream").distinct().collect()}
    assert streams == {"2024/01/23/[$LATEST]abc123", "stream-b", "stream-c"}


def test_create_records_semantics(spark):
    cfg = CwlConfig(include_log_info=True)
    records = create_records(
        explode_events(decode_envelopes(_payload_df(spark), config=cfg), cfg),
        cfg,
    )
    lam = {r.event_index: r for r in records.filter(
        F.col("log_group") == "/aws/lambda/fn-a").collect()}

    # F3: empty message (index 4) dropped
    assert set(lam) == {0, 1, 2, 3, 5}
    # P2: START line carries RequestId
    assert lam[0].request_id == REQ
    # P3: console-format line has its prefix stripped and requestID taken
    assert lam[1].message == "handling request"
    assert lam[1].request_id == REQ
    # P4: bare continuation line inherits the carried requestID
    assert lam[2].request_id == REQ
    # P5: JSON message detected and parsed as sibling column
    assert lam[3].message_json is not None
    assert lam[3].message_json["msg"] == "structured"
    # P1: trailing newline stripped
    svc = {r.event_index: r for r in records.filter(
        F.col("log_group") == "/aws/app/service-b").collect()}
    assert svc[1].message == "free text with trailing newline"


def test_vpc_format_nulls_timestamp(spark):
    cfg = CwlConfig(log_format="VPC-RAW")
    records = create_records(
        explode_events(decode_envelopes(_payload_df(spark), config=cfg), cfg),
        cfg,
    )
    assert records.filter(F.col("ts").isNotNull()).count() == 0


def test_metadata_override_and_key(spark):
    cfg = CwlConfig(include_log_info=True, source_category_override="default/cat")
    out = cwl_pipeline(_payload_df(spark), cfg)
    svc = {r.event_index: r for r in out.filter(
        F.col("source_host") == "/aws/app/service-b").collect()}
    # _sumo_metadata category override beats the env default (J4)
    assert svc[0].source_category == "override/cat"
    assert svc[1].source_category == "default/cat"
    assert svc[1].metadata_key == "stream-b:default/cat:/aws/app/service-b:"


def test_include_log_info_off_drops_columns(spark):
    out = create_records(explode_events(decode_envelopes(_payload_df(spark))))
    assert "log_group" not in out.columns and "log_stream" not in out.columns


def test_gunzip_udf_routes_corrupt_member_to_null(spark):
    """A truncated payload behind a valid gzip magic must become NULL
    (the DLQ/null-drop path), never a task-killing exception."""
    import gzip as _gzip

    from sumologic_aws_lambda_spark.functions.codecs import gunzip_udf

    good = _gzip.compress(b"hello world")
    corrupt = good[:8]                      # magic ok, member truncated
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(corrupt)), (3, None)],
        "id int, payload binary",
    )
    out = {r.id: r.out for r in
           df.select("id", gunzip_udf("payload").alias("out")).collect()}
    assert bytes(out[1]) == b"hello world"
    assert out[2] is None and out[3] is None
