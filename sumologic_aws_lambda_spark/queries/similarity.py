"""Similarity-search queries over ``embeddings`` (brute-force cosine
top-k, hyperplane-LSH ANN, k-NN classification).

The oracle recomputes cosine with ``list_dot_product`` over
double-cast lists; both engines fold left-to-right over 64 elements, and
similarities are rounded to 6 decimals before ranking so ordering is
hash-stable.  LSH hyperplanes are md5-derived (``operators/similarity.
hyperplanes``) and inlined into the oracle SQL as literals — bucketing is
bit-for-bit reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.similarity import (
    brute_force_topk,
    hyperplanes,
    knn_classify,
    lsh_topk,
)
from . import query

_COS = (
    "round(list_dot_product(q.qe, c.e) / "
    "(sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.e, c.e))), 6)"
)


@query(
    "cosine_topk_bruteforce",
    oracle=f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM c WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, {_COS} AS sim
        FROM q CROSS JOIN c
        WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, neighbor_id
        ) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
    """,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 10 query vectors against the full corpus —
    broadcast query set, corpus never shuffles."""
    emb = table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query(
    "knn_label_vote",
    oracle=f"""
    WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM c WHERE vec_id < 20),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, c.label, {_COS} AS sim
        FROM q CROSS JOIN c
        WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, neighbor_id
        ) AS rank
        FROM scored
    ),
    votes AS (
        SELECT query_id, label, count(*) AS votes
        FROM ranked WHERE rank <= 5
        GROUP BY query_id, label
    ),
    best AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY votes DESC, label
        ) AS rn
        FROM votes
    )
    SELECT query_id, label AS predicted_label, votes FROM best WHERE rn = 1
    """,
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN (k=5) majority-vote label prediction for 20 query vectors."""
    emb = table(spark, sf_dir, "embeddings")
    return knn_classify(emb, emb.filter(F.col("vec_id") < 20), k=5)


def _planes_sql(planes: list[list[float]]) -> str:
    rows = ",\n               ".join(
        f"({p}, {[float(x) for x in plane]}::DOUBLE[])"
        for p, plane in enumerate(planes)
    )
    return f"planes(p, pv) AS (VALUES {rows})"


_PLANES = hyperplanes(num_planes=8, dim=64)


@query(
    "lsh_ann_topk",
    oracle=f"""
    WITH {_planes_sql(_PLANES)},
    c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    bucketed AS (
        SELECT vec_id, e,
               string_agg(CASE WHEN list_dot_product(e, pv) >= 0
                               THEN '1' ELSE '0' END, '' ORDER BY p)
                   AS bucket
        FROM c CROSS JOIN planes
        GROUP BY vec_id, e
    ),
    q AS (SELECT vec_id AS query_id, e AS qe, bucket FROM bucketed
          WHERE vec_id < 50),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, {_COS} AS sim
        FROM q JOIN bucketed c ON q.bucket = c.bucket
        WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, neighbor_id
        ) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
    """,
)
def lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via 8 hyperplane-sign buckets: candidates share a bucket
    (equi-join), exact cosine only within buckets.  The scale path —
    recall trades against the number of planes."""
    emb = table(spark, sf_dir, "embeddings")
    return lsh_topk(emb, emb.filter(F.col("vec_id") < 50), _PLANES, k=5)
