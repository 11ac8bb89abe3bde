"""Extension-surface queries: UDAF (GROUPED_AGG pandas UDF), embedding
near-dup dedup, SNS / API-Gateway envelope parses (S7/S9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.udfs import geometric_mean_udf
from . import query


@query(
    "grouped_agg_udaf",
    oracle="""
    SELECT event_type,
           round(exp(avg(ln(value))), 4) AS geo_mean_value
    FROM events
    WHERE value > 0
    GROUP BY event_type
    """,
)
def grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 UDAF extension point: GROUPED_AGG pandas UDF computing the
    geometric mean; the oracle uses the algebraic built-in identity
    exp(avg(ln(x))) — which is also the preferred 100 TB formulation."""
    ev = table(spark, sf_dir, "events").filter(F.col("value") > 0)
    return ev.groupBy("event_type").agg(
        F.round(geometric_mean_udf("value"), 4).alias("geo_mean_value")
    )


@query(
    "embedding_neardup_pairs",
    oracle="""
    WITH c AS (
        SELECT vec_id, embedding::DOUBLE[] AS e
        FROM embeddings WHERE vec_id % 3 = 0
    )
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_dot_product(a.e, b.e) /
                 (sqrt(list_dot_product(a.e, a.e)) *
                  sqrt(list_dot_product(b.e, b.e))), 6) AS sim
    FROM c a JOIN c b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e) /
          (sqrt(list_dot_product(a.e, a.e)) *
           sqrt(list_dot_product(b.e, b.e))) >= 0.9
    """,
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection: pairs with cosine ≥ 0.9
    on a deterministic subset.  At 100 TB the pair space is pruned by the
    hyperplane-LSH buckets first (``lsh_ann_topk``); this is the exact
    verifier stage."""
    from ..operators.similarity import as_double, cosine_with_norms, l2_norm

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 3 == 0)
    # Norms hoisted to the per-vector projections: evaluated n times, not
    # n²/2 times, and bit-identical to the inline form (same op order).
    a = emb.select(F.col("vec_id").alias("a"),
                   as_double("embedding").alias("a_vec")) \
           .withColumn("a_norm", l2_norm(F.col("a_vec")))
    b = emb.select(F.col("vec_id").alias("b"),
                   as_double("embedding").alias("b_vec")) \
           .withColumn("b_norm", l2_norm(F.col("b_vec")))
    sim = cosine_with_norms(F.col("a_vec"), F.col("b_vec"),
                            F.col("a_norm"), F.col("b_norm"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("raw_sim", sim)
        .filter(F.col("raw_sim") >= 0.9)
        .select("a", "b", F.round("raw_sim", 6).alias("sim"))
    )


_SNS_EVENTS = [
    (1, '{"Timestamp":"2024-02-01T10:00:00.000Z","MessageId":"m-1",'
        '"Message":"{\\"finding\\":\\"HighSeverity\\",\\"count\\":3}"}'),
    (2, '{"Timestamp":"2024-02-01T11:30:00.000Z","MessageId":"m-2",'
        '"Message":"{\\"finding\\":\\"LowSeverity\\",\\"count\\":7}"}'),
]


@query(
    "sns_message_parse",
    oracle="""
    WITH raw(id, sns) AS (
        VALUES (1, '{"Timestamp":"2024-02-01T10:00:00.000Z","MessageId":"m-1","Message":"{\\"finding\\":\\"HighSeverity\\",\\"count\\":3}"}'),
               (2, '{"Timestamp":"2024-02-01T11:30:00.000Z","MessageId":"m-2","Message":"{\\"finding\\":\\"LowSeverity\\",\\"count\\":7}"}')
    )
    SELECT id,
           json_extract_string(sns, '$.MessageId') AS message_id,
           json_extract_string(json_extract_string(sns, '$.Message'),
                               '$.finding') AS finding,
           CAST(json_extract_string(json_extract_string(sns, '$.Message'),
                                    '$.count') AS BIGINT) AS n
    FROM raw
    """,
)
def sns_message_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: SNS envelope whose Message is itself a JSON *string*
    (``inspector/python/inspector.py:123-129``) — from_json twice."""
    df = spark.createDataFrame(_SNS_EVENTS, "id int, sns string")
    inner = F.get_json_object("sns", "$.Message")
    return df.select(
        "id",
        F.get_json_object("sns", "$.MessageId").alias("message_id"),
        F.get_json_object(inner, "$.finding").alias("finding"),
        F.get_json_object(inner, "$.count").cast("bigint").alias("n"),
    )


@query(
    "apigw_body_rows_parse",
    oracle="""
    WITH raw(id, body) AS (
        VALUES (1, '{"Rows":"[{\\"Title\\":\\"t1\\",\\"Severity\\":40},{\\"Title\\":\\"t2\\",\\"Severity\\":90}]"}')
    )
    SELECT id,
           json_extract_string(r.value, '$.Title') AS title,
           CAST(json_extract_string(r.value, '$.Severity') AS INT)
               AS severity
    FROM raw,
         LATERAL (SELECT unnest(
             json_extract(json_extract_string(body, '$.Rows'), '$[*]'))
             AS value) r
    """,
)
def apigw_body_rows_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: API-Gateway body with an embedded ``Rows`` JSON-string column —
    the double parse (``securityhub_forwarder.py:106-116,176-198``):
    from_json the body, then from_json the Rows string, then explode."""
    rows = [(1, '{"Rows":"[{\\"Title\\":\\"t1\\",\\"Severity\\":40},'
                '{\\"Title\\":\\"t2\\",\\"Severity\\":90}]"}')]
    df = spark.createDataFrame(rows, "id int, body string")
    inner = F.from_json(
        F.get_json_object("body", "$.Rows"),
        "array<struct<Title:string, Severity:int>>",
    )
    return df.select("id", F.explode(inner).alias("r")).select(
        "id",
        F.col("r.Title").alias("title"),
        F.col("r.Severity").alias("severity"),
    )
