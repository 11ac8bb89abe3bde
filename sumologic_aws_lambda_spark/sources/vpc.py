"""VPC flow-log operators (SURVEY §2.3 P8, §2.4 F4, §2.5 J1/J2).

Reference: ``cloudwatchlogs-with-dlq/vpcutils.js`` — 14 positional
space-delimited fields (:8-29), internal-traffic discard (:31-48), ENI
security-group enrichment via one batched DescribeNetworkInterfaces then a
per-record lookup (:56-75, :102-152), and direction classification
(:131-139).

Spark-first shape: the enrichment is a **broadcast hash join** against an
ENI dimension DataFrame.  The dim provider is pluggable (tests inject a
fixture frame; production would build it per-batch from the distinct IPs
exactly like the reference dedupes before its one API call, :118-124).
At 100 TB the fact side never shuffles — the dim broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# vpcutils.js:8-29 field layout, in order.
VPC_FIELDS: tuple[tuple[str, str], ...] = (
    ("version", "int"), ("account_id", "string"), ("interface_id", "string"),
    ("srcaddr", "string"), ("dstaddr", "string"), ("srcport", "int"),
    ("dstport", "int"), ("protocol", "int"), ("packets", "long"),
    ("bytes", "long"), ("start_ts", "long"), ("end_ts", "long"),
    ("action", "string"), ("log_status", "string"),
)


def parse_vpc_message(df: DataFrame, message_col: str = "message") -> DataFrame:
    """P8: positional split → full typed 14-column projection
    (``vpcutils.js:37-39,120-127`` only ever indexes 2/3/4; the query side
    wants all of them typed)."""
    parts = F.split(F.col(message_col), " ")
    out = df
    for i, (name, typ) in enumerate(VPC_FIELDS):
        col = parts.getItem(i)
        # 'NODATA'/'SKIPDATA' rows carry '-' placeholders → null casts.
        out = out.withColumn(
            name, F.nullif(col, F.lit("-")).cast(typ)
        )
    return out


def discard_internal_traffic(df: DataFrame, cidr_prefixes: tuple[str, ...],
                             src_col: str = "srcaddr",
                             dst_col: str = "dstaddr") -> DataFrame:
    """F4: drop rows where BOTH endpoints match an internal prefix
    (``vpcutils.js:31-48``; blank prefixes ignored after trim :40)."""
    prefixes = tuple(p.strip() for p in cidr_prefixes if p.strip())
    if not prefixes:
        return df

    def is_internal(col: str) -> Column:
        cond = F.lit(False)
        for p in prefixes:
            # coalesce: JS "-".startsWith(p) is false, never null — NODATA
            # rows (null addrs after parse) must pass the filter.
            cond = cond | F.coalesce(F.col(col).startswith(p), F.lit(False))
        return cond

    return df.filter(~(is_internal(src_col) & is_internal(dst_col)))


def enrich_security_groups(flows: DataFrame, eni_dim: DataFrame) -> DataFrame:
    """J1+J2: broadcast-join ENI dimension onto flows, then classify
    direction (``vpcutils.js:117-152``).

    ``eni_dim`` schema: interface_id, security_group_ids array<string>,
    ip_address string (primary private IP), subnet_id, vpc_id, aws_region.

    Direction semantics (:131-139): if dstaddr == ENI primary IP the flow
    is inbound — unless the *source* IP belongs to an ENI in the same
    subnet, which makes it internal; symmetric for outbound.
    """
    eni = F.broadcast(eni_dim)
    # Primary join on interface id (:128-130) — left join: rows with no
    # ENI data pass through unenriched (reference logs and keeps them).
    out = flows.join(eni, on="interface_id", how="left")

    # Second and third broadcast lookups: which side's IP maps to an ENI,
    # and in which subnet (J2).  Only (ip → subnet) is needed.  One row
    # per IP: private ranges legitimately repeat across VPCs (two ENIs
    # in different VPCs can both be 10.0.0.5), and a duplicated lookup
    # key would fan each matching flow out into multiple rows, inflating
    # byte/packet counts downstream.  min() keeps the choice
    # deterministic; scoping by vpc_id is the precise fix when flows
    # carry a VPC column.
    # One (ip → subnet) frame joined TWICE via dataframe aliases instead
    # of two withColumnRenamed copies (r15): the rename-Projects made the
    # two broadcast subtrees non-canonical, so the dimension aggregate,
    # its exchange and the broadcast build all executed twice; with
    # identical subtrees AQE's runtime exchange reuse turns the second
    # into a ReusedExchange — the lookup is aggregated, shuffled and
    # shipped once per query (verified post-execution: reused 0 → 2).
    ip_subnet = F.broadcast(
        eni_dim.groupBy(F.col("ip_address").alias("peer_ip"))
        .agg(F.min("subnet_id").alias("peer_subnet"))
    )
    src_m = ip_subnet.alias("_src_eni")
    dst_m = ip_subnet.alias("_dst_eni")
    out = (
        out.join(src_m, out.srcaddr == F.col("_src_eni.peer_ip"), "left")
        .join(dst_m, out.dstaddr == F.col("_dst_eni.peer_ip"), "left")
    )

    inbound = F.col("dstaddr") == F.col("ip_address")
    direction = F.when(
        F.col("ip_address").isNull(), F.lit(None).cast("string")
    ).when(
        inbound,
        F.when(F.col("_src_eni.peer_subnet") == F.col("subnet_id"),
               "internal").otherwise("inbound"),
    ).otherwise(
        F.when(F.col("_dst_eni.peer_subnet") == F.col("subnet_id"),
               "internal").otherwise("outbound"),
    )
    return (
        out.withColumn("direction", direction)
        .drop(src_m.peer_ip).drop(src_m.peer_subnet)
        .drop(dst_m.peer_ip).drop(dst_m.peer_subnet)
    )


def distinct_flow_ips(flows: DataFrame) -> DataFrame:
    """A3: the distinct src+dst IP set the reference feeds its one batched
    ENI describe call (``vpcutils.js:118-124``) — ``explode → distinct``."""
    return (
        flows.select(
            F.explode(F.array("srcaddr", "dstaddr")).alias("ip_address")
        )
        .filter(F.col("ip_address").isNotNull())
        .distinct()
    )
