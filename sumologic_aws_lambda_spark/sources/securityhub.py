"""SecurityHub ASFF operators (SURVEY §2.1 S9/S10/S13, §2.3 P11/P12,
§2.4 F10).

Reference: ``securityhub-forwarder/src/securityhub_forwarder.py`` — maps
search rows to AWS Security Finding Format structs (:56-89), normalizes
epoch timestamps with a 13-digit-millis sniff (:39-53), validates
severity 0-100 and compliance enum (:92-116); and
``securityhub-collector/src/securityhub_collector.py`` — explodes incoming
findings (:51-54) and groups them by ProductArn (:39-47).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COMPLIANCE_STATUSES = ("PASSED", "WARNING", "FAILED", "NOT_AVAILABLE")

ASFF_SCHEMA = (
    "struct<SchemaVersion:string, ProductArn:string, Id:string,"
    " GeneratorId:string, AwsAccountId:string, Types:array<string>,"
    " CreatedAt:string, UpdatedAt:string, FirstObservedAt:string,"
    " Title:string, Description:string,"
    " Severity:struct<Normalized:int>,"
    " Resources:array<struct<Type:string, Id:string>>,"
    " Compliance:struct<Status:string>>"
)


def epoch_to_iso(col, fmt: str = "yyyy-MM-dd'T'HH:mm:ss'Z'"):
    """P12 (:39-53): int-or-string epoch; ÷1000 when ≥13 digits; RFC3339."""
    s = F.col(col).cast("string")
    secs = F.when(
        F.length(s) >= 13, (s.cast("bigint") / 1000).cast("bigint")
    ).otherwise(s.cast("bigint"))
    return F.date_format(F.timestamp_seconds(secs), fmt)


def validate_findings(df: DataFrame) -> DataFrame:
    """F10 gate (:92-116): severity within 0-100, compliance in the enum,
    required fields present.  Invalid rows are *routed*, not dropped — a
    ``_valid`` flag keeps the error side-channel (badRecordsPath pattern)
    in the same plan."""
    sev_ok = F.col("severity").cast("int").between(0, 100)
    comp_ok = F.col("compliance_status").isin(*COMPLIANCE_STATUSES)
    required_ok = (
        F.col("title").isNotNull()
        & F.col("finding_type").isNotNull()
        & F.col("resource_id").isNotNull()
    )
    # coalesce: a NULL severity/compliance makes the conjunction NULL
    # (three-valued logic), and a NULL flag fails BOTH filter(_valid)
    # and filter(~_valid) — the row would vanish from valid AND error
    # routes, defeating the route-not-drop contract.  NULL-caused
    # invalidity is still invalidity: flag it False.
    return df.withColumn(
        "_valid", F.coalesce(sev_ok & comp_ok & required_ok, F.lit(False)))


def build_findings(df: DataFrame, region: str, default_account: str,
                   product_name: str = "sumologic") -> DataFrame:
    """P11 (:56-89): search rows → ASFF struct column.

    Id scheme mirrors :32-36: ``{product}:{region}:{acct}:{generator}/
    finding/{uuid}`` — ``uuid()`` is the one nondeterministic expression,
    exactly as in the reference.
    """
    acct = F.coalesce(F.col("aws_account_id"), F.lit(default_account))
    product_arn = F.format_string(
        "arn:aws:securityhub:%s:%s:product/%s/%s",
        F.lit(region), acct, acct, F.lit("default"),
    )
    finding_id = F.concat(
        F.lit(f"{product_name}:{region}:"), acct, F.lit(":"),
        F.col("generator_id"), F.lit("/finding/"), F.expr("uuid()"),
    )
    return df.select(
        F.struct(
            F.lit("2018-10-08").alias("SchemaVersion"),
            product_arn.alias("ProductArn"),
            finding_id.alias("Id"),
            F.col("generator_id").alias("GeneratorId"),
            acct.alias("AwsAccountId"),
            F.array(F.col("finding_type")).alias("Types"),
            epoch_to_iso("created_at").alias("CreatedAt"),
            epoch_to_iso("updated_at").alias("UpdatedAt"),
            F.col("title").alias("Title"),
            F.col("description").alias("Description"),
            F.struct(
                F.col("severity").cast("int").alias("Normalized")
            ).alias("Severity"),
            F.array(
                F.struct(
                    F.col("resource_type").alias("Type"),
                    F.col("resource_id").alias("Id"),
                )
            ).alias("Resources"),
            F.struct(
                F.col("compliance_status").alias("Status")
            ).alias("Compliance"),
        ).alias("finding")
    )


def explode_incoming_findings(df: DataFrame) -> DataFrame:
    """S10 (collector :51-54): ``event.detail.findings[]`` → rows."""
    return df.select(F.explode("detail.findings").alias("finding"))


def group_by_product_arn(findings: DataFrame) -> DataFrame:
    """A2 (collector :39-47): bucket findings per ProductArn with counts —
    the S13 sink then writes one object per (ProductArn, batch)."""
    return findings.groupBy(F.col("finding.ProductArn").alias("product_arn")).agg(
        F.count(F.lit(1)).alias("n_findings"),
        F.collect_list(F.to_json("finding")).alias("payloads"),
    )


def group_by_account_product(findings: DataFrame) -> DataFrame:
    """Multi-account (AWS Organizations) collector variant.

    Reference: ``securityhub-org/sumologic-securityhub-collector-awsorg/
    src/securityhub_collector_org.py:30-48`` — the org collector receives
    findings fanned in from every member account of the organization and
    buckets them per ProductArn before delivery (:34-40).  Each ASFF
    finding carries its originating ``AwsAccountId``, so the org rollup
    adds account id as a first-class grouping dimension: one delivery
    bucket per (account, product), which keeps per-account payloads
    separable for downstream routing and billing attribution.

    Scale shape: a single hash aggregation on a two-column key — the
    account dimension *increases* key cardinality, which reduces skew
    versus grouping on ProductArn alone (one giant product bucket would
    otherwise hot-spot a reducer at org scale)."""
    return findings.groupBy(
        F.col("finding.AwsAccountId").alias("aws_account_id"),
        F.col("finding.ProductArn").alias("product_arn"),
    ).agg(
        F.count(F.lit(1)).alias("n_findings"),
        F.max(F.col("finding.Severity.Normalized")).alias("max_severity"),
        F.collect_list(F.to_json("finding")).alias("payloads"),
    )
