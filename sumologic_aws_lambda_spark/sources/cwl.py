"""CloudWatch Logs subscription source — the reference's hot path
(SURVEY §3.1) as a single declarative Catalyst plan.

Reference semantics reproduced (all in
``cloudwatchlogs-with-dlq/cloudwatchlogs_lambda.js``):

- envelope: base64(gzip(JSON)) with ``{messageType, owner, logGroup,
  logStream, subscriptionFilters[], logEvents[{id, timestamp, message}]}``
  (decode at :158-176, fixture shapes in ``cwlfixtures.json``)
- CONTROL_MESSAGE skip (:171-172), logStream prefix filter (:107-110,
  :173-174)
- per-event pipeline ``createRecords`` (:42-88): trailing-newline strip,
  RequestId regex (:17), lambda-console-format detect+strip (:14),
  stateful lastRequestID carry-forward (:44-63), JSON auto-detect (:64-70),
  drops (:71-76), optional logStream/logGroup attach (:78-81), falsy-
  message drop (:82-85)
- metadata routing key + per-record ``_sumo_metadata`` override
  (``sumo-dlq-function-utils/lib/sumologsclient.js:28-40,111-131``)

Scale notes: the whole pipeline is narrow — zero shuffles.  Even the
stateful carry-forward is an array fold *inside* each envelope row
(exactly the reference's state scope: ``lastRequestID`` resets per
invoke, :44), so it runs identically in batch and Structured Streaming.
The only Python is the gzip UDF, Arrow-batched.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.codecs import unbase64_gunzip

# Faithful ports of the two regexes at cloudwatchlogs_lambda.js:14,17
# (JS \w == [A-Za-z0-9_]; Spark RE2-compatible syntax).
REQUEST_ID_RE = r"(?:RequestId:|Z)\s+([\w\-]+)"
CONSOLE_FORMAT_RE = (
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}.\d{3}Z\s"
    r"(\w+?-\w+?-\w+?-\w+?-\w+)\s(?:INFO|ERROR|WARN|DEBUG)?"
)

CWL_ENVELOPE_SCHEMA = (
    "struct<messageType:string, owner:string, logGroup:string,"
    " logStream:string, subscriptionFilters:array<string>,"
    " logEvents:array<struct<id:string, timestamp:long, message:string>>>"
)


@dataclass(frozen=True)
class CwlConfig:
    """Engine twin of ``getConfig`` (cloudwatchlogs_lambda.js:90-128)."""

    source_category_override: str = ""
    source_host_override: str = ""
    source_name_override: str = ""
    source_fields_override: str = ""
    encoding: str = "UTF-8"
    log_format: str = "Others"          # "VPC-*" enables VPC semantics
    include_log_info: bool = False
    log_stream_prefixes: tuple[str, ...] = field(default=())
    vpc_cidr_prefixes: tuple[str, ...] = field(default=())
    sumo_url: str = ""                  # delivery endpoint (SumoURL)

    @classmethod
    def from_env(cls, env, parameter_store=None, **overrides) -> "CwlConfig":
        """``getConfig``'s endpoint chain (cloudwatchlogs_lambda.js:112-126):
        env SUMO_ENDPOINT, else the SSM secure-string, else a hard error;
        the resolved URL is https-validated either way."""
        from ..streaming.endpoint import resolve_endpoint

        return cls(
            sumo_url=resolve_endpoint(env, parameter_store),
            source_category_override=env.get("SOURCE_CATEGORY_OVERRIDE", ""),
            source_host_override=env.get("SOURCE_HOST_OVERRIDE", ""),
            source_name_override=env.get("SOURCE_NAME_OVERRIDE", ""),
            source_fields_override=env.get("SOURCE_FIELDS_OVERRIDE", ""),
            encoding=env.get("ENCODING", "UTF-8"),
            log_format=env.get("LOG_FORMAT", "Others"),
            include_log_info=env.get("INCLUDE_LOG_INFO", "") == "true",
            log_stream_prefixes=tuple(
                p for p in env.get("LOG_STREAM_PREFIX", "").split(",") if p),
            **overrides,
        )


def decode_envelopes(df: DataFrame, payload_col: str = "payload",
                     config: CwlConfig = CwlConfig()) -> DataFrame:
    """base64(gzip(JSON)) payload column → typed envelope struct.

    Adds ``envelope_id`` — the deterministic per-envelope identity that
    scopes the carry-forward state (SURVEY §7 'hard parts': order is
    meaningful only within an envelope).
    """
    return df.withColumn(
        "envelope",
        F.from_json(unbase64_gunzip(payload_col, config.encoding),
                    CWL_ENVELOPE_SCHEMA),
    ).withColumn("envelope_id", F.sha2(F.col(payload_col), 256))


def _own_request_id(msg: Column) -> Column:
    """P2+P3 requestID detection on a (trailing-newline-stripped) message:
    the console-format capture wins over the plain RequestId capture
    (:50-60); '' capture means no match."""
    m = F.regexp_replace(msg, r"\n$", "")
    req_plain = F.nullif(F.regexp_extract(m, REQUEST_ID_RE, 1), F.lit(""))
    req_console = F.nullif(F.regexp_extract(m, CONSOLE_FORMAT_RE, 1), F.lit(""))
    return F.coalesce(req_console, req_plain)


def explode_events(env_df: DataFrame, config: CwlConfig = CwlConfig()) -> DataFrame:
    """Envelope → one row per log event, preserving arrival order.

    Applies the envelope-level filters first (CONTROL_MESSAGE :171-172,
    logStream prefix :173-174) so dropped envelopes never explode —
    filter-before-work, which Catalyst keeps pushed down.

    The P4 ``lastRequestID`` carry-forward (:44, :51-63) is computed HERE,
    as an array fold over ``logEvents`` *before* the explode: the
    reference's state is per-invoke (one envelope), so the fold is exactly
    its state machine — and being a narrow per-row expression it needs no
    shuffle and runs unchanged under Structured Streaming (a row-window
    version would be rejected by the streaming planner and would shuffle
    in batch).
    """
    df = env_df.filter(F.col("envelope.messageType") != "CONTROL_MESSAGE")
    if config.log_stream_prefixes:
        # getConfig builds ^(p1|p2|...) case-insensitive (:107-110).
        import re

        pattern = "(?i)^(" + "|".join(
            re.escape(p) for p in config.log_stream_prefixes
        ) + ")"
        df = df.filter(F.col("envelope.logStream").rlike(pattern))

    own_ids = F.transform(
        F.col("envelope.logEvents"), lambda ev: _own_request_id(ev.message)
    )
    # carried[i] = last non-null own_id in [0..i]  (left fold)
    carried = F.aggregate(
        own_ids,
        F.lit(None).cast("array<string>"),
        lambda acc, x: F.concat(
            F.coalesce(acc, F.array().cast("array<string>")),
            F.array(F.coalesce(x, F.try_element_at(acc, F.lit(-1)))),
        ),
    )
    return df.withColumn("_carried_ids", carried).select(
        "envelope_id",
        F.col("envelope.owner").alias("owner"),
        F.col("envelope.logGroup").alias("log_group"),
        F.col("envelope.logStream").alias("log_stream"),
        "_carried_ids",
        F.posexplode("envelope.logEvents").alias("event_index", "ev"),
    ).select(
        "envelope_id", "owner", "log_group", "log_stream", "event_index",
        F.col("ev.id").alias("event_id"),
        F.timestamp_millis(F.col("ev.timestamp")).alias("ts"),
        F.col("ev.message").alias("message"),
        F.try_element_at("_carried_ids", F.col("event_index") + 1).alias(
            "request_id"
        ),
    )


def create_records(events_df: DataFrame,
                   config: CwlConfig = CwlConfig()) -> DataFrame:
    """The per-event pipeline P1-P7 (``createRecords``, :42-88) as one
    narrow select chain (carry-forward already computed upstream).

    Output columns: ``ts, request_id, message, message_json, log_group,
    log_stream`` (+ ordering keys).  ``message_json`` is the JSON
    auto-detect result (null when the message is free text) — schema-on-
    read, materialized lazily instead of mutating the record like the
    reference does.
    """
    # P1 trailing-newline strip (:49).  P4 carry-forward already arrived
    # from explode_events as ``request_id`` (array fold, see there).
    msg = F.regexp_replace("message", r"\n$", "")

    # P3 console-format detect (:56-60): matched prefix is stripped.
    req_console = F.nullif(
        F.regexp_extract(msg, CONSOLE_FORMAT_RE, 1), F.lit("")
    )
    stripped = F.when(
        req_console.isNotNull(),
        F.regexp_replace(msg, CONSOLE_FORMAT_RE, ""),
    ).otherwise(msg)

    df = events_df.withColumn("message", stripped)

    # P5 JSON auto-detect (:64-70): keep trimmed text; parsed form exposed
    # as a lazy sibling column rather than a type-changing mutation.
    df = df.withColumn("message", F.trim("message")).withColumn(
        "message_json",
        F.when(F.col("message").rlike(r"^[\[{]"),
               F.from_json("message", "map<string,string>")),
    )

    # P6 drops (:71-76): id always; timestamp for VPC formats.
    drop_cols = ["event_id"]
    if config.log_format.startswith("VPC"):
        df = df.withColumn("ts", F.lit(None).cast("timestamp"))

    # P7 log info attach (:78-81) — gated columns, else dropped.
    if not config.include_log_info:
        drop_cols += ["log_group", "log_stream"]

    # F3 falsy-message drop (:82-85).  The reference attempts
    # JSON.parse on EVERY message (cloudwatchlogs_lambda.js:65-70,
    # unconditional try/catch), so the plain-text line "0" parses to the
    # number 0 — falsy — and IS dropped there too; only a parse *failure*
    # leaves the (truthy) string.  Matching that exactly: '', and the
    # JSON scalars 0/false/null.  (Reviewed r6: NOT an over-drop.)
    falsy = F.col("message").isin("", "0", "false", "null")
    return df.filter(~falsy).drop(*drop_cols)


def attach_metadata(records: DataFrame,
                    config: CwlConfig = CwlConfig()) -> DataFrame:
    """Metadata routing dimensions + per-record ``_sumo_metadata`` override
    (J4/A1; ``sumologsclient.js:28-40,111-113``).

    ``metadata_key = name:category:host[:fields]`` becomes the partition/
    groupBy key of the delivery sink — at scale this is a ``partitionBy``
    on write, not a driver-side hash map.
    """
    # _sumo_metadata is a nested object inside the message JSON
    # (sumologsclient.js:28-29); extract lazily from the raw string so the
    # map-schema of message_json doesn't constrain it.  The reference
    # deletes the field from the message after applying it (:39) — here
    # the delivery sink serializes records without it instead.
    def meta_item(key: str) -> Column:
        return F.get_json_object("message", f"$._sumo_metadata.{key}")

    # Per-record override map beats env-derived defaults (:29-40).
    name = F.coalesce(
        meta_item("sourceName"),
        F.lit(config.source_name_override or None),
        F.col("log_stream") if "log_stream" in records.columns else F.lit(None),
        F.lit(""),
    )
    category = F.coalesce(
        meta_item("category"),
        F.lit(config.source_category_override or None), F.lit(""),
    )
    host = F.coalesce(
        meta_item("sourceHost"),
        F.lit(config.source_host_override or None),
        F.col("log_group") if "log_group" in records.columns else F.lit(None),
        F.lit(""),
    )
    fields = F.coalesce(
        meta_item("sourceFieldsOverride"),
        F.lit(config.source_fields_override or None), F.lit(""),
    )
    return (
        records.withColumn("source_name", name)
        .withColumn("source_category", category)
        .withColumn("source_host", host)
        .withColumn("source_fields", fields)
        .withColumn(
            "metadata_key",
            F.concat_ws(":", "source_name", "source_category", "source_host",
                        "source_fields"),
        )
    )


def cwl_pipeline(payload_df: DataFrame, config: CwlConfig = CwlConfig(),
                 payload_col: str = "payload") -> DataFrame:
    """Full §3.1 hot path: decode → explode → createRecords → metadata."""
    env = decode_envelopes(payload_df, payload_col, config)
    events = explode_events(env, config)
    records = create_records(events, config)
    return attach_metadata(records, config)
