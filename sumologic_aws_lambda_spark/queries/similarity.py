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
    cosine,
    hyperplanes,
    knn_classify,
    lsh_topk,
    quantize_int8,
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


@query(
    "int8_ann_rerank",
    oracle="""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), s AS (
        SELECT vec_id, e,
               list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
        FROM e
    ), qd AS (
        SELECT vec_id, e,
               CASE WHEN scale = 0
                    THEN list_transform(e, x -> 0)
                    ELSE list_transform(e,
                         x -> CAST(round(x / scale) AS INT))
               END AS q
        FROM s
    ), qry AS (
        SELECT vec_id AS query_id, e AS qe, q AS qq
        FROM qd WHERE vec_id < 10
    ), coarse AS (
        SELECT qry.query_id, c.vec_id AS neighbor_id, qry.qe, c.e,
               CAST(list_dot_product(qry.qq, c.q) AS BIGINT) AS iscore,
               row_number() OVER (
                   PARTITION BY qry.query_id
                   ORDER BY CAST(list_dot_product(qry.qq, c.q) AS BIGINT)
                            DESC, c.vec_id
               ) AS crank
        FROM qry CROSS JOIN qd c
        WHERE c.vec_id <> qry.query_id
    ), rerank AS (
        SELECT query_id, neighbor_id,
               round(list_dot_product(qe, e) /
                     (sqrt(list_dot_product(qe, qe)) *
                      sqrt(list_dot_product(e, e))), 6) AS sim,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(list_dot_product(qe, e) /
                            (sqrt(list_dot_product(qe, qe)) *
                             sqrt(list_dot_product(e, e))), 6) DESC,
                            neighbor_id
               ) AS rank
        FROM coarse WHERE crank <= 20
    )
    SELECT query_id, neighbor_id, sim, rank FROM rerank WHERE rank <= 5
    """,
)
def int8_ann_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN on int8 codes: coarse top-20 by INTEGER dot product
    over the quantized vectors (exact cross-engine — no float ordering
    anywhere in the candidate stage), then exact-cosine rerank of the
    20 candidates to top-5.

    This is the 100 TB serving shape: the coarse pass streams 4×-smaller
    codes with SIMD integer math and the expensive float scoring touches
    only ``20 × n_queries`` rows.  Query codes broadcast; the corpus
    never shuffles — the only exchange is the per-query top-k window
    over the coarse candidate set, which AQE sizes by n_queries, not
    corpus size."""
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings")
    codes = quantize_int8(emb)
    qset = F.broadcast(
        codes.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("q").alias("qq"),
        )
    )
    to_long = lambda c: c.cast("bigint")  # noqa: E731
    idot = F.aggregate(
        F.zip_with("qq", "q", lambda x, y: to_long(x * y)),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    coarse = (
        codes.select(F.col("vec_id").alias("neighbor_id"), "e", "q")
        .crossJoin(qset)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("iscore", idot)
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("iscore").desc(), F.col("neighbor_id")
    )
    cands = (
        coarse.withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= 20)
    )
    sim = F.round(cosine(F.col("qe"), F.col("e")), 6)
    wr = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS e
        FROM embeddings WHERE vec_id % 7 = 0
    ), s AS (
        SELECT vec_id, e,
               list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
        FROM e
    ), qd AS (
        SELECT vec_id, e, scale,
               CASE WHEN scale = 0
                    THEN list_transform(e, x -> 0)
                    ELSE list_transform(e, x -> CAST(round(x / scale) AS INT))
               END AS q
        FROM s
    ), agg AS (
        SELECT vec_id, e, scale, q,
               list_transform(q, v -> v * scale) AS dq,
               CAST(list_sum(q) AS BIGINT) AS sum_q,
               CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT)
                   AS sum_q2
        FROM qd
    )
    SELECT vec_id,
           CAST(len(q) AS INT) AS n_dims,
           COALESCE(sum_q, 0) AS sum_q,
           COALESCE(sum_q2, 0) AS sum_q2,
           md5(array_to_string(q, ',')) AS q_md5,
           round(scale, 6) AS scale_r,
           CASE WHEN sum_q2 = 0 THEN NULL
                ELSE round(list_dot_product(e, dq) /
                     (sqrt(list_dot_product(e, e)) *
                      sqrt(list_dot_product(dq, dq))), 6)
           END AS self_cos
    FROM agg
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization audit: per-vector codes (hash-matched
    byte-for-byte via md5 of the code array) plus the reconstruction
    quality ``self_cos = cos(x, dequant(x))`` — the number you watch when
    deciding whether the 4×-smaller codes are safe to use for ANN
    candidate generation.  Fully narrow; the corpus never shuffles
    (``operators.similarity.quantize_int8``)."""
    emb = table(spark, sf_dir, "embeddings")
    base = quantize_int8(emb.filter(F.col("vec_id") % 7 == 0))
    to_long = lambda c: c.cast("bigint")  # noqa: E731
    staged = base.select(
        "vec_id", "e", "scale", "q",
        F.transform("q", lambda v: v.cast("double") * F.col("scale"))
        .alias("dq"),
        F.aggregate("q", F.lit(0).cast("bigint"),
                    lambda a, x: a + to_long(x)).alias("sum_q"),
        F.aggregate("q", F.lit(0).cast("bigint"),
                    lambda a, x: a + to_long(x * x)).alias("sum_q2"),
    )
    return staged.select(
        "vec_id",
        F.size("q").cast("int").alias("n_dims"),
        "sum_q",
        "sum_q2",
        F.md5(F.concat_ws(",", F.col("q").cast("array<string>")))
        .alias("q_md5"),
        F.round("scale", 6).alias("scale_r"),
        F.when(F.col("sum_q2") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(cosine(F.col("e"), F.col("dq")), 6)
        ).alias("self_cos"),
    )


@query(
    "ann_recall_eval",
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
    exact_scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, {_COS} AS sim
        FROM q CROSS JOIN c
        WHERE c.vec_id <> q.query_id
    ),
    exact_topk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY sim DESC, neighbor_id
            ) AS rank FROM exact_scored
        ) WHERE rank <= 5
    ),
    ann_scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, {_COS} AS sim
        FROM q JOIN bucketed c ON q.bucket = c.bucket
        WHERE c.vec_id <> q.query_id
    ),
    ann_topk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY sim DESC, neighbor_id
            ) AS rank FROM ann_scored
        ) WHERE rank <= 5
    )
    SELECT e.query_id,
           CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS hits,
           CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / 5.0 AS recall_at_k
    FROM exact_topk e
    LEFT JOIN ann_topk a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
    """,
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the 8-plane LSH index against exact cosine ground
    truth for 50 queries — the evaluation loop run before trading
    planes/probes against recall in production.  Ground truth and ANN
    results are each k×n_queries rows, so the comparison join is
    negligible at any corpus scale (``operators.similarity.ann_recall``)."""
    from ..operators.similarity import ann_recall

    emb = table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 50)
    exact = brute_force_topk(emb, qs, k=5)
    ann = lsh_topk(emb, qs, _PLANES, k=5)
    return ann_recall(exact, ann, k=5)


# ---------------------------------------------------------------------------
# Product quantization: codebook training + asymmetric-distance search
# ---------------------------------------------------------------------------

_PQ_M = 8          # subspaces (64-dim -> 8 x 8-dim)
_PQ_K = 8          # centroids per subspace
_PQ_SCALE = 1_000_000
_PQ_D2 = ("list_sum(list_transform(list_zip({a}, {b}),"
          " p -> (p[1] - p[2]) * (p[1] - p[2])))")

_PQ_BASE_CTE = f"""
    c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    subsq AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS sub),
    seed AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
        FROM c ORDER BY vec_id LIMIT {_PQ_K}
    ),
    cents0 AS (
        SELECT s.sub, seed.cid,
               list_slice(seed.e, s.sub * 8 + 1, s.sub * 8 + 8) AS ce
        FROM seed CROSS JOIN subsq s
    ),
    subs AS (
        SELECT vec_id, s.sub,
               list_slice(e, s.sub * 8 + 1, s.sub * 8 + 8) AS sv
        FROM c CROSS JOIN subsq s
    )"""


def _pq_assign_cte(cent_cte: str, name: str) -> str:
    d2 = _PQ_D2.format(a="subs.sv", b=f"{cent_cte}.ce")
    return f"""
    {name} AS (
        SELECT vec_id, sub, cid FROM (
            SELECT subs.vec_id, subs.sub, {cent_cte}.cid,
                   row_number() OVER (PARTITION BY subs.vec_id, subs.sub
                       ORDER BY {d2}, {cent_cte}.cid) AS rn
            FROM subs JOIN {cent_cte} USING (sub)
        ) WHERE rn = 1
    )"""


@query(
    "pq_codebook_stats",
    oracle=f"""
    WITH {_PQ_BASE_CTE.lstrip()},
    {_pq_assign_cte("cents0", "a1").lstrip()},
    sums1 AS (
        SELECT a1.sub, a1.cid, t.i,
               sum(CAST(floor(t.x * {_PQ_SCALE}) AS BIGINT)) AS s,
               count(*) AS n
        FROM a1
        JOIN (SELECT vec_id, sub, generate_subscripts(sv, 1) AS i,
                     unnest(sv) AS x
              FROM subs) t USING (vec_id, sub)
        GROUP BY a1.sub, a1.cid, t.i
    ),
    cents1 AS (
        -- Empty clusters KEEP their stale seed centroid (Spark's
        -- pq_train contract): build round-1 centroids as seed LEFT JOIN
        -- means so a (sub, cid) with zero assignments neither vanishes
        -- from the checks nor from the a2 re-assignment argmin.
        SELECT c0.sub, c0.cid, coalesce(m1.ce, c0.ce) AS ce
        FROM cents0 c0 LEFT JOIN (
            SELECT sub, cid,
                   list(s / (n * {_PQ_SCALE}.0) ORDER BY i) AS ce
            FROM sums1 GROUP BY sub, cid
        ) m1 USING (sub, cid)
    ),
    {_pq_assign_cte("cents1", "a2").lstrip()},
    counts2 AS (
        SELECT sub, cid, CAST(count(*) AS BIGINT) AS n_assigned
        FROM a2 GROUP BY sub, cid
    ),
    checks AS (
        SELECT sub, cid,
               CAST(list_sum(list_transform(ce,
                   x -> CAST(floor(x * {_PQ_SCALE}) AS BIGINT)))
                   AS BIGINT) AS qcent_sum
        FROM cents1
    )
    SELECT sub, cid, coalesce(n_assigned, 0) AS n_assigned, qcent_sum
    FROM checks LEFT JOIN counts2 USING (sub, cid)
    """,
)
def pq_codebook_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook training: one Lloyd's round per
    subspace, all ``m`` subspaces trained in the same two Spark jobs
    (``operators.similarity.pq_train`` — the subspace index is just a
    grouping key).  Emits every (subspace, centroid) with its
    assignment count under the trained codebooks and an integer
    centroid checksum; the oracle replays seed → assign → integer-sum
    update → re-assign bit-for-bit, so the whole training trajectory is
    hard-signal-verified.  Driver state O(m·k·subdim); the corpus only
    ever flows through one narrow assignment pass and one map-side-
    combined sum shuffle per round."""
    from ..operators.similarity import pq_encode, pq_train, quantize

    emb = table(spark, sf_dir, "embeddings", parallel=True)
    books = pq_train(emb, m=_PQ_M, k=_PQ_K, iters=1, scale=_PQ_SCALE)
    codes = pq_encode(emb, books)
    counts = (
        codes.select(F.posexplode("codes").alias("sub", "cid"))
        .groupBy("sub", "cid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_assigned"))
    )
    import math

    check_rows = [
        (s, c, sum(int(math.floor(v * _PQ_SCALE)) for v in ce))
        for s in range(_PQ_M) for c, ce in enumerate(books[s])
    ]
    checks = spark.createDataFrame(
        check_rows, "sub int, cid int, qcent_sum bigint")
    return (
        checks.join(counts, ["sub", "cid"], "left")
        .select("sub", "cid",
                F.coalesce("n_assigned", F.lit(0)).cast("bigint")
                .alias("n_assigned"),
                "qcent_sum")
    )


@query(
    "pq_adc_topk",
    oracle=f"""
    WITH {_PQ_BASE_CTE.lstrip()},
    {_pq_assign_cte("cents0", "codes").lstrip()},
    q AS (SELECT vec_id AS query_id, e AS qe FROM c WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id, codes.vec_id AS neighbor_id,
               list_sum(list(
                   {_PQ_D2.format(
                       a="list_slice(q.qe, codes.sub * 8 + 1,"
                         " codes.sub * 8 + 8)",
                       b="cents0.ce")}
                   ORDER BY codes.sub)) AS adc_raw
        FROM q CROSS JOIN codes
        JOIN cents0 ON codes.sub = cents0.sub AND codes.cid = cents0.cid
        WHERE codes.vec_id <> q.query_id
        GROUP BY q.query_id, codes.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, round(adc_raw, 6) AS adc_d2,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY adc_raw, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, adc_d2, rank FROM ranked WHERE rank <= 5
    """,
)
def pq_adc_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance PQ search: corpus vectors as m-byte codes
    (seed codebooks — deterministic, so the oracle is closed-form),
    queries full-precision, distance = ordered sum of per-subspace
    d2 lookups against the literal codebook tensor.  Scan reads only
    the code column (64× narrower than raw floats at 100 TB); the lone
    shuffle is the per-query top-k WindowGroupLimit
    (``operators.similarity.pq_encode`` / ``pq_adc_topk``)."""
    from ..operators.similarity import pq_adc_topk, pq_encode, pq_train

    emb = table(spark, sf_dir, "embeddings", parallel=True)
    books = pq_train(emb, m=_PQ_M, k=_PQ_K, iters=0)
    return pq_adc_topk(pq_encode(emb, books), books,
                       emb.filter(F.col("vec_id") < 5), k=5)


_IVFPQ_NC = 8       # coarse cells
_IVFPQ_NPROBE = 2
_IVFPQ_COS = (
    "list_dot_product(v.e, ic.ce) /"
    " (sqrt(list_dot_product(v.e, v.e)) *"
    " sqrt(list_dot_product(ic.ce, ic.ce)))"
)


@query(
    "ivfpq_ann_topk",
    oracle=f"""
    WITH {_PQ_BASE_CTE.lstrip()},
    {_pq_assign_cte("cents0", "codes").lstrip()},
    ivfc AS (SELECT vec_id AS cid, e AS ce FROM c
             WHERE vec_id < {_IVFPQ_NC}),
    assign AS (
        SELECT vec_id, cluster_id FROM (
            SELECT v.vec_id, ic.cid AS cluster_id,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY {_IVFPQ_COS} DESC, ic.cid) AS rn
            FROM c v CROSS JOIN ivfc ic
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS query_id, cluster_id FROM (
            SELECT v.vec_id, ic.cid AS cluster_id,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY {_IVFPQ_COS} DESC, ic.cid) AS rn
            FROM c v CROSS JOIN ivfc ic
            WHERE v.vec_id < 5
        ) WHERE rn <= {_IVFPQ_NPROBE}
    ),
    cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM probes p JOIN assign a USING (cluster_id)
        WHERE a.vec_id <> p.query_id
    ),
    q AS (SELECT vec_id AS query_id, e AS qe FROM c WHERE vec_id < 5),
    scored AS (
        SELECT cd.query_id, cd.neighbor_id,
               list_sum(list(
                   {_PQ_D2.format(
                       a="list_slice(q.qe, codes.sub * 8 + 1,"
                         " codes.sub * 8 + 8)",
                       b="cents0.ce")}
                   ORDER BY codes.sub)) AS adc_raw
        FROM cand cd
        JOIN codes ON codes.vec_id = cd.neighbor_id
        JOIN cents0 ON codes.sub = cents0.sub AND codes.cid = cents0.cid
        JOIN q ON q.query_id = cd.query_id
        GROUP BY cd.query_id, cd.neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, round(adc_raw, 6) AS adc_d2,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY adc_raw, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, adc_d2, rank FROM ranked WHERE rank <= 5
    """,
)
def ivfpq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search — the FAISS production recipe: coarse inverted-file
    pruning (cosine cells, 2 probes of 8) +
    asymmetric PQ distance over m-byte codes for the surviving
    candidates only.  Centroids and codebooks are deterministic seeds,
    so the oracle replays index build (assignment + encoding), probe
    selection, candidate pruning, and ADC scoring end-to-end.  One
    narrow corpus pass builds codes AND cells; the only shuffle is the
    per-query top-k (``operators/similarity.py::ivfpq_adc_topk``)."""
    from ..operators.similarity import ivfpq_adc_topk, pq_train

    emb = table(spark, sf_dir, "embeddings", parallel=True)
    books = pq_train(emb, m=_PQ_M, k=_PQ_K, iters=0)
    cents = emb.filter(F.col("vec_id") < _IVFPQ_NC).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
    )
    return ivfpq_adc_topk(
        emb, books, cents, emb.filter(F.col("vec_id") < 5),
        k=5, nprobe=_IVFPQ_NPROBE)


@query(
    "hard_negative_mining",
    oracle=f"""
    WITH {_planes_sql(_PLANES)},
    c AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    bucketed AS (
        SELECT vec_id, label, e,
               string_agg(CASE WHEN list_dot_product(e, pv) >= 0
                               THEN '1' ELSE '0' END, '' ORDER BY p)
                   AS bucket
        FROM c CROSS JOIN planes
        GROUP BY vec_id, label, e
    ),
    q AS (SELECT vec_id AS query_id, label AS anchor_label, e AS qe,
                 bucket
          FROM bucketed WHERE vec_id < 50),
    scored AS (
        SELECT q.query_id, q.anchor_label,
               c.vec_id AS neighbor_id, c.label AS neg_label,
               {_COS} AS sim
        FROM q JOIN bucketed c ON q.bucket = c.bucket
        WHERE c.label <> q.anchor_label
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, neighbor_id
        ) AS rank
        FROM scored
    )
    SELECT query_id, anchor_label, neighbor_id, neg_label, sim, rank
    FROM ranked WHERE rank <= 4
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard negatives: per anchor, the 4 most-similar
    DIFFERENT-label vectors from its LSH bucket — the epoch-mining pass
    of an embedding trainer (``operators/similarity.py::
    hard_negatives``): narrow bucketing pass, bucket-keyed join,
    broadcast anchors, never all-pairs."""
    from ..operators.similarity import hard_negatives

    emb = table(spark, sf_dir, "embeddings")
    return hard_negatives(emb, emb.filter(F.col("vec_id") < 50),
                          _PLANES, k=4)


@query(
    "embedding_decontamination",
    oracle="""
    WITH c AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
        WHERE vec_id >= 30
    ),
    b AS (
        SELECT embedding::DOUBLE[] AS be FROM embeddings WHERE vec_id < 30
    ),
    scored AS (
        SELECT c.vec_id, c.label,
               max(round(list_dot_product(c.e, b.be) /
                   (sqrt(list_dot_product(c.e, c.e)) *
                    sqrt(list_dot_product(b.be, b.be))), 6))
                   AS max_bench_sim
        FROM c CROSS JOIN b
        GROUP BY c.vec_id, c.label
    )
    SELECT vec_id, label, max_bench_sim,
           (max_bench_sim >= 0.2) AS contaminated
    FROM scored
    """,
)
def embedding_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination: a corpus vector is
    contaminated when its max cosine against the benchmark set (vec_id
    < 30 here) reaches 0.2 — the semantic-leakage sweep run beside
    n-gram decontamination before training.  The benchmark broadcasts
    as ONE collected array; the corpus pass is fully narrow (no
    shuffle; ``operators/similarity.py::embedding_decontamination``)."""
    from ..operators.similarity import (
        embedding_decontamination as decon,
    )

    emb = table(spark, sf_dir, "embeddings")
    return decon(
        emb.filter(F.col("vec_id") >= 30),
        emb.filter(F.col("vec_id") < 30),
        threshold=0.2,
    ).select("vec_id", "label", "max_bench_sim", "contaminated")


@query(
    "embedding_dimension_stats",
    oracle="""
    WITH vals AS (
        SELECT g.i AS dim, e.embedding[g.i] AS val
        FROM embeddings e,
             LATERAL (SELECT unnest(generate_series(1,
                      len(e.embedding))) AS i) g
    )
    SELECT dim,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(val), 4) + 0.0 AS mean,
           round(stddev_samp(val), 4) + 0.0 AS std,
           round(min(val), 6) + 0.0 AS vmin,
           round(max(val), 6) + 0.0 AS vmax
    FROM vals GROUP BY dim
    """,
)
def embedding_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension distribution profile of the embedding space — the
    feature-health diagnostic run before training an index or a probe
    (dead dimensions, scale imbalance, outlier coordinates).

    One narrow pass: ``posexplode`` fans each vector to (dim, val)
    rows map-side and the aggregate partial-combines per dimension, so
    the shuffle carries exactly d rows per partition regardless of
    corpus size; output is d rows.  Values are float32 on both engines
    (exact), the moment sums round at 4 dp, extrema at 6 (rule 2).
    Every float column adds ``+ 0.0`` after its round (rule 24): a
    statistic that rounds to exactly zero emits -0.0 in DuckDB and 0.0
    in Spark — at sf0.1 two dimensions' means land there (the round-9
    full-registry sf0.1 sweep caught it; sf0.01 never exercised the
    boundary).
    """
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select(F.posexplode("embedding").alias("pos", "val"))
        .select((F.col("pos") + 1).alias("dim"), "val")
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.round(F.avg("val"), 4) + 0.0).alias("mean"),
            (F.round(F.stddev_samp("val"), 4) + 0.0).alias("std"),
            (F.round(F.min("val"), 6) + 0.0).alias("vmin"),
            (F.round(F.max("val"), 6) + 0.0).alias("vmax"),
        )
    )


_COS2 = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * "
    "sqrt(list_dot_product({b}, {b}))), 6)"
)


@query(
    "mmr_diversified_topk",
    oracle=f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT e AS qe FROM c WHERE vec_id = 0),
    rel AS (
        SELECT c.vec_id, c.e,
               {_COS2.format(a="c.e", b="q.qe")} AS rel
        FROM c CROSS JOIN q WHERE c.vec_id <> 0
    ),
    cand AS (
        SELECT vec_id, e, rel FROM (
            SELECT *, row_number() OVER (ORDER BY rel DESC, vec_id)
                AS rk
            FROM rel
        ) WHERE rk <= 10
    ),
    s1 AS (
        SELECT vec_id, e, rel, round(0.7 * rel, 6) AS score
        FROM cand ORDER BY rel DESC, vec_id LIMIT 1
    ),
    r2 AS (
        SELECT d.vec_id, d.e, d.rel,
               round(0.7 * d.rel
                     - 0.3 * {_COS2.format(a="d.e", b="s1.e")}, 6)
                   AS score
        FROM cand d, s1 WHERE d.vec_id <> s1.vec_id
    ),
    s2 AS (SELECT * FROM r2 ORDER BY score DESC, vec_id LIMIT 1),
    r3 AS (
        SELECT d.vec_id, d.rel,
               round(0.7 * d.rel - 0.3 * greatest(
                   {_COS2.format(a="d.e", b="s1.e")},
                   {_COS2.format(a="d.e", b="s2.e")}), 6) AS score
        FROM cand d, s1, s2
        WHERE d.vec_id NOT IN (s1.vec_id, s2.vec_id)
    ),
    s3 AS (SELECT * FROM r3 ORDER BY score DESC, vec_id LIMIT 1)
    SELECT 1 AS rank, vec_id, rel AS relevance, score AS mmr_score
    FROM s1
    UNION ALL
    SELECT 2, vec_id, rel, score FROM s2
    UNION ALL
    SELECT 3, vec_id, rel, score FROM s3
    """,
)
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval (query = vector 0, lambda = 0.7,
    pool = exact top-10, k = 3): the greedy re-ranking that trades
    relevance against redundancy — the standard diversification layer
    over any of the ANN top-k queries (Carbonell & Goldstein 1998).

    See :func:`operators.similarity.mmr_topk` for the scale shape: one
    narrow corpus pass + TakeOrdered builds the pool; the greedy loop
    runs k tiny jobs over the ≤10-row pool, never the corpus.  The
    oracle unrolls the three greedy steps as chained CTEs with the
    identical round-before-argmax discipline.
    """
    from ..operators.similarity import as_double, mmr_topk

    emb = table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") != 0).select(
        "vec_id", as_double("embedding").alias("e"))
    qv = emb.filter(F.col("vec_id") == 0).select(
        as_double("embedding").alias("qe"))
    # redundancy_weight spelled as the literal 0.3 so the Spark double
    # is bit-identical to the oracle's SQL literal (1.0 - 0.7 in Python
    # is 0.30000000000000004 — one ulp off, enough to flip a rounded
    # argmax at a 5e-7 boundary).
    return mmr_topk(corpus, qv, k=3, lam=0.7, pool_size=10,
                    redundancy_weight=0.3)


@query(
    "embedding_centroid_drift",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    halves AS (SELECT label, vec_id % 2 AS half, v FROM e),
    dims AS (
        SELECT label, half, d.i AS dim,
               round(sum(v[d.i]) + 1e-9, 6) AS s
        FROM halves,
             LATERAL (SELECT unnest(generate_series(1, len(v)))
                      AS i) d
        GROUP BY 1, 2, 3
    ),
    cents AS (
        SELECT label, half, list(s ORDER BY dim) AS c,
               CAST(min(n) AS BIGINT) AS n
        FROM (
            SELECT dims.*, cnt.n FROM dims JOIN (
                SELECT label, half, count(*) AS n
                FROM halves GROUP BY 1, 2
            ) cnt USING (label, half)
        ) GROUP BY label, half
    )
    SELECT a.label, a.n AS n_a, b.n AS n_b,
           round(list_dot_product(a.c, b.c)
                 / (sqrt(list_dot_product(a.c, a.c))
                    * sqrt(list_dot_product(b.c, b.c))), 4)
               AS centroid_cosine,
           round((sqrt(list_dot_product(b.c, b.c)) / b.n)
                 / (sqrt(list_dot_product(a.c, a.c)) / a.n), 4)
               AS norm_ratio
    FROM cents a JOIN cents b ON b.label = a.label
    WHERE a.half = 0 AND b.half = 1
    """,
)
def embedding_centroid_drift(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Embedding-space drift per label: cosine between the two corpus
    halves' class centroids (and the centroid-norm ratio) — the
    numeric companion to ``psi_drift_score``: PSI catches categorical
    shift, this catches SEMANTIC shift (a class whose members moved in
    embedding space even at unchanged volume).  Split = vec_id parity
    here (deterministic for the oracle); production splits by time.

    Centroids never materialize per-row state: one posexplode →
    (label, half, dim) partial-aggregatable SUM collapse (cosine is
    scale-invariant, so unnormalized sums stand in for means; the
    norm_ratio is NOT — each half's sum-vector norm divides by its
    row count first, so the metric reads MEAN-centroid magnitude
    drift and a pure volume imbalance between halves reads 1.0 —
    round-9 advisor fix), then
    the cosine folds over the 64-dim rounded-sum vectors — the
    identical left-to-right dot product both engines (rules 2/12/15:
    per-dim sums carry the +1e-9 nudge at round(6) so the ~25-term
    float order difference cannot flip a digit).
    """
    from ..operators.similarity import as_double, cosine, l2_norm

    emb = table(spark, sf_dir, "embeddings")
    halves = emb.select(
        "label", (F.col("vec_id") % 2).alias("half"),
        as_double("embedding").alias("v"))
    dims = (
        halves.select(
            "label", "half",
            F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "half", "dim")
        .agg(F.round(F.sum("x") + 1e-9, 6).alias("s"))
    )
    counts = halves.groupBy("label", "half").agg(
        F.count(F.lit(1)).alias("n"))
    cents = (
        dims.groupBy("label", "half")
        .agg(F.expr("transform(sort_array(collect_list("
                    "struct(dim, s))), p -> p.s)").alias("c"))
        .join(counts, ["label", "half"])
    )
    a = cents.filter(F.col("half") == 0).select(
        "label", F.col("c").alias("ca"), F.col("n").alias("n_a"))
    b = cents.filter(F.col("half") == 1).select(
        "label", F.col("c").alias("cb"), F.col("n").alias("n_b"))
    return a.join(b, "label").select(
        "label", "n_a", "n_b",
        F.round(cosine(F.col("ca"), F.col("cb")), 4)
        .alias("centroid_cosine"),
        F.round((l2_norm(F.col("cb")) / F.col("n_b"))
                / (l2_norm(F.col("ca")) / F.col("n_a")), 4)
        .alias("norm_ratio"),
    )
