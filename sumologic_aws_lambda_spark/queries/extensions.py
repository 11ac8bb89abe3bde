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


def _neardup_planes() -> list[list[float]]:
    from ..operators.similarity import hyperplanes

    return hyperplanes(num_planes=24, dim=64)


def _neardup_cte() -> str:
    """The banded-LSH candidate + exact-rescore pair set as a CTE chain
    ending in ``scored(a, b, sim)`` — shared by the pair query's oracle
    and the semantic-dedup clustering oracle."""
    from .similarity import _planes_sql

    return f"""{_planes_sql(_neardup_planes())},
    c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    bucketed AS (
        SELECT vec_id, p // 8 AS band,
               string_agg(CASE WHEN list_dot_product(e, pv) >= 0
                               THEN '1' ELSE '0' END, '' ORDER BY p)
                   AS bucket
        FROM c CROSS JOIN planes
        GROUP BY vec_id, p // 8
    ),
    cand AS (
        SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
        FROM bucketed x JOIN bucketed y USING (band, bucket)
        WHERE x.vec_id < y.vec_id
    ),
    scored AS (
        SELECT a, b,
               round(list_dot_product(ca.e, cb.e) /
                     (sqrt(list_dot_product(ca.e, ca.e)) *
                      sqrt(list_dot_product(cb.e, cb.e))), 6) AS sim
        FROM cand JOIN c ca ON cand.a = ca.vec_id
                  JOIN c cb ON cand.b = cb.vec_id
        WHERE list_dot_product(ca.e, cb.e) /
              (sqrt(list_dot_product(ca.e, ca.e)) *
               sqrt(list_dot_product(cb.e, cb.e))) >= 0.35
    )"""


def _neardup_oracle() -> str:
    return f"""
    WITH {_neardup_cte()}
    SELECT a, b, sim FROM scored
    """


@query("embedding_neardup_pairs", oracle=_neardup_oracle())
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection at the scale shape:
    banded hyperplane LSH (3 bands × 8 planes) generates candidate pairs
    via an equi-join on (band, bucket) — never corpus² — and only those
    candidates are exactly re-scored.  The oracle computes the identical
    banded candidate set (first-matching-band dedup on the Spark side ≡
    DISTINCT on the oracle side), so the pruning itself is
    hard-signal-verified, not just the scoring.  Replaces the r4
    all-pairs theta join (BroadcastNestedLoopJoin, the slowest bench
    query); the plan now contains only equi-joins (guarded by
    ``tests/test_plan_shapes.py::test_neardup_pairs_no_cartesian``).

    Threshold note: the fixture embeddings are random vectors (max
    pairwise cosine ≈ 0.51), so a production dedup threshold of 0.9
    returns zero rows on every engine.  The registered query uses 0.35 so
    the hard-signal compare exercises real candidate generation and
    scoring; the operator default stays 0.9."""
    from ..operators.similarity import lsh_neardup_pairs

    emb = table(spark, sf_dir, "embeddings")
    return lsh_neardup_pairs(emb, _neardup_planes(), n_bands=3,
                             threshold=0.35)


def _cluster_oracle() -> str:
    """Recursive-CTE component fixpoint over the LSH-pruned pair graph —
    ONE definition shared by both clustering twins, so the "identical
    oracle" contract is structural, not copy-paste."""
    return f"""
    WITH RECURSIVE {_neardup_cte()},
    edges AS (
        SELECT a AS src, b AS dst FROM scored
        UNION SELECT b, a FROM scored
    ),
    reach(node, lbl) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    labels AS (
        SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node
    )
    SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
    FROM labels GROUP BY cluster_id HAVING count(*) >= 2
    """


def _cluster_rollup(spark: SparkSession, sf_dir: str,
                    components_fn) -> DataFrame:
    """Shared pipeline body for the clustering twins: LSH pairs
    (materialized once), pair-touched nodes, components via the supplied
    engine, non-singleton rollup."""
    from ..operators.similarity import lsh_neardup_pairs

    emb = table(spark, sf_dir, "embeddings")
    pairs = lsh_neardup_pairs(emb, _neardup_planes(), n_bands=3,
                              threshold=0.35).select("a", "b") \
        .localCheckpoint()
    touched = (
        pairs.select(F.col("a").alias("vec_id"))
        .union(pairs.select(F.col("b").alias("vec_id")))
        .distinct()
    )
    labels = components_fn(touched, pairs, node_col="vec_id")
    return (
        labels.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )


@query(
    "semantic_dedup_clusters",
    oracle=_cluster_oracle(),
)
def semantic_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: embedding-cosine near-dup pairs
    (banded hyperplane LSH → exact rescore, same pruning as
    ``embedding_neardup_pairs``) resolved into duplicate clusters by
    min-label connected components; downstream dedup keeps
    ``vec_id == cluster_id`` (the min member IS the canonical doc).
    Output: every non-singleton cluster with its member count — the
    corpus-level duplicate inventory.

    Scale: pairs are LSH-pruned (never corpus²) and materialized once;
    the component fixpoint iterates over PAIR-TOUCHED nodes only — a
    vector with no near-dup edge can never join a ≥2-member cluster, so
    the iterative joins run on the (tiny) duplicate subgraph, not the
    corpus.  The final rollup is a map-side-combined count — no window,
    no collect.  The DuckDB oracle replays the identical LSH pruning AND
    the fixpoint via a recursive CTE, so clustering is
    hard-signal-checked end to end."""
    from ..operators.dedup import connected_components

    return _cluster_rollup(spark, sf_dir, connected_components)


@query(
    "semantic_dedup_clusters_star",
    oracle=_cluster_oracle(),
)
def semantic_dedup_clusters_star(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The same semantic-dedup clustering resolved by the
    ALTERNATING-STAR engine path
    (``operators/dedup.py::connected_components_star`` — O(log²) rounds
    on chain graphs, no neighborhood arrays): both component algorithms
    must produce the same min-labeled clusters under the ONE shared
    oracle (``_cluster_oracle``) and pipeline body
    (``_cluster_rollup``)."""
    from ..operators.dedup import connected_components_star

    return _cluster_rollup(spark, sf_dir, connected_components_star)


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
