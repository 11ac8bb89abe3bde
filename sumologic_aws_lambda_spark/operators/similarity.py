"""Similarity search over embedding columns (array<float>).

North-star addition: brute-force cosine top-k as the correctness baseline
and a hyperplane-LSH bucketed variant as the scale path.

100 TB design: brute force is the *verifier* — it broadcast-joins a small
query set against the corpus, so the corpus never shuffles; cost is one
narrow pass per query batch.  The LSH variant buckets the corpus once
(narrow map stage) and turns search into an equi-join on bucket id; recall
is tunable via number of planes / probe multipliers.  Vector math uses
``zip_with``/``aggregate`` built-ins (JVM, codegen) — no Python in the
loop.  Hyperplanes are md5-derived deterministic pseudo-randoms so any
engine can reproduce the bucketing bit-for-bit.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lit_vector(vals) -> Column:
    """A literal array<double> built as ONE parsed SQL expression.

    ``F.array(*[F.lit(v) ...])`` costs one py4j round-trip per element;
    the literal codebooks/centroid matrices in this module carry
    hundreds of doubles and appear several times per plan, which made
    driver-side plan CONSTRUCTION (not execution) the dominant cost of
    ivfpq_ann_topk (8 s cold at sf0.1 — round-8 profiling).  One
    ``F.expr`` string is a single round-trip.  ``repr(float)`` is the
    shortest round-tripping decimal and Java's parseDouble applies the
    same IEEE round-to-nearest, so values are bit-identical to the
    F.lit form (the oracle compare depends on that).  FINITE values
    only: repr(nan/inf) is not valid SQL (the F.lit form it replaced
    accepted them), so non-finite input raises here instead of
    surfacing later as an opaque AnalysisException."""
    vs = [float(v) for v in vals]
    if not all(math.isfinite(v) for v in vs):
        raise ValueError("lit_vector requires finite values")
    return F.expr("array(" + ",".join(f"{v!r}D" for v in vs) + ")")


def lit_matrix(rows) -> Column:
    """A literal array<array<double>> as one parsed expression — see
    :func:`lit_vector` for why this beats nested ``F.lit`` loops and
    the finite-values-only contract."""
    mat = [[float(v) for v in row] for row in rows]
    if not all(math.isfinite(v) for row in mat for v in row):
        raise ValueError("lit_matrix requires finite values")
    return F.expr(
        "array(" + ",".join(
            "array(" + ",".join(f"{v!r}D" for v in row) + ")"
            for row in mat) + ")")


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ — left-to-right fold, deterministic across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_with_norms(a: Column, b: Column,
                      a_norm: Column, b_norm: Column) -> Column:
    """Cosine over PRE-COMPUTED norms.  sqrt(dot(v,v)) depends only on
    one side, so staging it as a per-vector column before a pairwise
    join evaluates it once per vector instead of once per pair — the
    same doubles in the same operation order, so results are
    bit-identical to :func:`cosine` (the oracle compare relies on that),
    but the pair stage drops from 3 array folds to 1."""
    return dot(a, b) / (a_norm * b_norm)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k: broadcast the query set, score every corpus row,
    rank per query.  Ties break on neighbor id for determinism.  Norms are
    hoisted to the per-vector projections (``cosine_with_norms``)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id_col),
            as_double(vec_col).alias("q_vec"),
        ).withColumn("q_norm", l2_norm(F.col("q_vec")))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("c_vec")
    ).withColumn("c_norm", l2_norm(F.col("c_vec")))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("sim", F.round(
            cosine_with_norms(F.col("q_vec"), F.col("c_vec"),
                              F.col("q_norm"), F.col("c_norm")), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "sim", "rank")
    )


def hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim, derived
    from md5(plane:dim) — reproducible in any engine / language."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            v = int(h[:13], 16) / float(16 ** 13)  # [0, 1), 52-bit exact
            row.append(round(2.0 * v - 1.0, 9))
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-projection bit per plane, packed into a string bucket id
    (e.g. '1011...'), computed fully in Column expressions."""
    bits = [
        F.when(dot(vec, lit_vector(plane)) >= 0, "1").otherwise("0")
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_topk(corpus: DataFrame, queries: DataFrame, planes: list[list[float]],
             k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id") -> DataFrame:
    """ANN: bucket corpus + queries by hyperplane signs, score only
    within-bucket candidates, rank per query.

    Recall < 1 by construction (bucket boundary misses); at scale the
    bucketing pass is narrow and the join shuffles only on bucket id.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("c_vec"),
    ).withColumn("bucket", lsh_bucket(F.col("c_vec"), planes)) \
     .withColumn("c_norm", l2_norm(F.col("c_vec")))
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id_col),
            as_double(vec_col).alias("q_vec"),
        ).withColumn("bucket", lsh_bucket(F.col("q_vec"), planes))
        .withColumn("q_norm", l2_norm(F.col("q_vec")))
    )
    scored = (
        c.join(q, on="bucket")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("sim", F.round(
            cosine_with_norms(F.col("q_vec"), F.col("c_vec"),
                              F.col("q_norm"), F.col("c_norm")), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "sim", "rank")
    )


def lsh_neardup_pairs(df: DataFrame, planes: list[list[float]],
                      n_bands: int, threshold: float = 0.9,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded hyperplane LSH —
    the scale shape for "find all pairs with cosine ≥ t" (an all-pairs
    theta join is O(n²) with no partitionable key and dies at 100 TB).

    The planes are split into ``n_bands`` bands; a pair becomes a
    candidate iff it agrees on EVERY sign bit of at least one band
    (classic banding: per-band match probability ``p_bit^(planes/band)``,
    overall recall ``1 − (1 − p_band)^n_bands``).  Recall tunes via
    planes-per-band (lower → more candidates) and n_bands (higher →
    more candidates).

    100 TB shape, stage by stage:

    - The full sign signature is ONE narrow expression — a fold over a
      single literal plane matrix (``transform`` over array-of-arrays),
      not ``n_planes`` unrolled folds — so signature computation never
      shuffles and the codegen tree stays small.
    - Candidate generation is an equi-self-join on ``(band, bucket)``
      (bucket = the band's signature slice) — bucketed,
      shuffle-partitioned, never corpus².
    - A pair sharing several bands would duplicate; instead of a DISTINCT
      shuffle + joins back to the vectors, each pair is kept only at its
      FIRST matching band — a per-row predicate over the two carried
      signatures — and vectors/norms ride through the one join, so the
      whole operator is: narrow map → one equi-join shuffle → narrow
      score/filter.

    Returns ``(a, b, sim)`` with ``a < b`` and ``sim`` rounded to 6 dp.
    """
    if len(planes) % n_bands:
        raise ValueError("len(planes) must divide evenly into n_bands")
    per_band = len(planes) // n_bands
    mat = lit_matrix(planes)
    base = df.select(F.col(id_col).alias("id"),
                     as_double(vec_col).alias("vec"))
    bits = F.transform(
        mat, lambda p: F.when(dot(F.col("vec"), p) >= 0, "1").otherwise("0")
    )
    base = (
        base.withColumn("sig", F.array_join(bits, ""))
        .withColumn("norm", l2_norm(F.col("vec")))
    )
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.substring("sig", b * per_band + 1, per_band).alias("bucket"),
        )
        for b in range(n_bands)
    ])
    bucketed = (
        base.select("id", "vec", "norm", "sig",
                    F.explode(bands).alias("bb"))
        .select("id", "vec", "norm", "sig",
                F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"))
    )
    x = bucketed.select(
        *[F.col(c).alias(f"a_{c}") for c in ("id", "vec", "norm", "sig")],
        "band", "bucket")
    y = bucketed.select(
        *[F.col(c).alias(f"b_{c}") for c in ("id", "vec", "norm", "sig")],
        "band", "bucket")
    pairs = (
        x.join(y, on=["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
    )
    # Emit each pair only from its first matching band: no earlier band's
    # signature slices may also agree.  Pure row-local predicate — the
    # dedup costs zero shuffles.
    earlier = F.lit(False)
    for b in range(n_bands - 1):
        earlier = earlier | (
            (F.col("band") > b)
            & (F.substring("a_sig", b * per_band + 1, per_band)
               == F.substring("b_sig", b * per_band + 1, per_band))
        )
    return (
        pairs.filter(~earlier)
        .withColumn("raw_sim", cosine_with_norms(
            F.col("a_vec"), F.col("b_vec"),
            F.col("a_norm"), F.col("b_norm")))
        .filter(F.col("raw_sim") >= threshold)
        .select(F.col("a_id").alias("a"), F.col("b_id").alias("b"),
                F.round("raw_sim", 6).alias("sim"))
    )


def ann_recall(exact_topk: DataFrame, ann_topk: DataFrame, k: int,
               query_id_col: str = "query_id") -> DataFrame:
    """Recall@k of an ANN result against exact ground truth: per query,
    |ann ∩ exact| / k.

    The evaluation harness every ANN deployment needs before trading
    planes/probes against recall.  Left join from the exact set (so
    queries the ANN missed entirely still score 0), one count aggregate —
    both inputs are already top-k-sized (k × n_queries rows), so this is
    driver-free and broadcastable at any corpus scale.
    """
    # Broadcast the ANN side: both inputs are k × n_queries rows by
    # CONSTRUCTION (top-k outputs), so the hint is safe at any corpus
    # scale — without it the planner sees unknown stats behind the
    # ranking windows and falls back to a sort-merge join.
    hits = exact_topk.select(query_id_col, "neighbor_id").join(
        F.broadcast(ann_topk.select(query_id_col, "neighbor_id",
                                    F.lit(1).alias("_hit"))),
        [query_id_col, "neighbor_id"], "left",
    )
    n_hits = F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
    return hits.groupBy(query_id_col).agg(
        n_hits.cast("bigint").alias("hits"),
        (n_hits.cast("double") / F.lit(float(k))).alias("recall_at_k"),
    )


def quantize(vec: Column, scale: int = 1_000_000) -> Column:
    """Element-wise ``floor(x·scale)`` as BIGINT.  Integer sums are exact
    and order-independent, which is what makes iterative centroid math
    reproducible across engines AND across Spark's own partial-agg
    orderings (double sums are neither)."""
    return F.transform(
        vec, lambda x: F.floor(x * scale).cast("bigint")
    )


def quantize_int8(df: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization — the ANN memory path at
    100 TB: vectors shrink 4× vs float32 (64 dims: 256 B → 64 B), scoring
    becomes integer dot products (SIMD-friendly), and a corpus that
    wouldn't fit executor memory for the LSH/IVF candidate join now does.

    ``scale = max|xᵢ| / 127``; ``qᵢ = round(xᵢ / scale) ∈ [−127, 127]``;
    an all-zero vector quantizes to zeros (scale 0 guard).  Fully narrow
    Column math — no shuffle, no UDF — and every step (abs, max, IEEE
    double divide, round-half-away-from-zero) is engine-reproducible, so
    a DuckDB oracle recomputes the codes byte-for-byte.

    Returns ``(id, e array<double>, scale, q array<int>)``.
    """
    d = df.select(F.col(id_col), as_double(vec_col).alias("e"))
    d = d.withColumn(
        "scale", F.array_max(F.transform("e", F.abs)) / F.lit(127.0)
    )
    q = F.when(
        F.col("scale") == 0.0, F.transform("e", lambda x: F.lit(0))
    ).otherwise(
        F.transform("e", lambda x: F.round(x / F.col("scale"), 0).cast("int"))
    )
    return d.withColumn("q", q)


def kmeans_lite(df: DataFrame, k: int = 8, iters: int = 2,
                id_col: str = "vec_id", vec_col: str = "embedding",
                scale: int = 1_000_000) -> tuple[DataFrame, list]:
    """Lloyd's k-means, the Spark-iterative way (same driver-loop shape
    as ``operators.dedup.connected_components``): per round, a fully
    NARROW assignment pass (centroids ride along as literal arrays — the
    argmin is an array_sort over k (dist², cid) structs, no join, no
    window) followed by ONE shuffle computing per-cluster integer sums.
    Centroids (k × dim numbers) are collected to the driver each round —
    the standard scalable k-means shape: state is O(k·dim), data never
    leaves executors except through the one map-side-combined agg.

    Cross-engine determinism: init = first ``k`` vectors by id; new
    centroids derive from ``floor(x·scale)`` integer sums (exact,
    order-free), divided once at the driver; distances are left-to-right
    folds of doubles, bit-identical to any engine that scans the array
    sequentially.  Ties break on cid.

    Returns ``(assignments, centroids)``: the final (id, cid) frame and
    the final centroid list ``[(cid, n, [per-dim quantized sums])]``.
    """
    vecs = df.select(F.col(id_col), as_double(vec_col).alias("e"))
    seed = vecs.orderBy(id_col).limit(k).collect()
    dim = len(seed[0]["e"])
    centroids: list[tuple[int, list[float]]] = [
        (i, list(r["e"])) for i, r in enumerate(seed)
    ]

    def assign_expr(cents: list[tuple[int, list[float]]]) -> Column:
        # ONE higher-order transform over a single literal k×dim matrix
        # instead of k separate zip_with/aggregate folds: the analyzed
        # expression tree shrinks ~k× (one fold lambda, one literal
        # expr), which is what dominated per-round cost — each round's
        # fresh centroid literals force a fresh analyze/codegen pass,
        # so tree size IS the fixed cost (round-14, guide §4.4 applied
        # to plain expressions).  Per-row float work is unchanged, and
        # struct (d2, cid) ordering (ties break on cid) is identical.
        # cents is position-indexed: cid == list index by construction
        # (enumerate at init; the update comprehension preserves order),
        # so the transform's element index IS the cid.
        mat = lit_matrix([ce for _, ce in cents])
        cells = F.transform(
            mat,
            lambda c, i: F.struct(
                F.aggregate(
                    F.zip_with(F.col("e"), c,
                               lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d2"),
                i.alias("cid"),
            ),
        )
        return F.element_at(F.array_sort(cells), 1)["cid"]

    assignments = None
    stats_rows: list = []
    for _ in range(iters):
        assignments = vecs.select(
            F.col(id_col), "e", assign_expr(centroids).alias("cid")
        )
        # Stage the quantized vector as its OWN projection before the
        # aggregate: `sum(element_at(quantize(e), i))` per dimension
        # re-inlines the quantize transform into every one of the dim
        # aggregate inputs (evaluated dim× per row); a staged non-cheap,
        # multiply-referenced alias survives CollapseProject, so the
        # transform runs once per row and the sums read elements.
        stats = assignments.select(
            "cid", quantize(F.col("e"), scale).alias("_q")
        ).groupBy("cid").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.element_at(F.col("_q"), i + 1)).alias(f"s{i}")
              for i in range(dim)],
        )
        stats_rows = stats.collect()
        by_cid = {int(r["cid"]): r for r in stats_rows}
        centroids = [
            (cid,
             [by_cid[cid][f"s{i}"] / (by_cid[cid]["n"] * float(scale))
              for i in range(dim)]
             if cid in by_cid else old)  # empty cluster keeps its centroid
            for cid, old in centroids
        ]
    final = [
        (int(r["cid"]), int(r["n"]), [int(r[f"s{i}"]) for i in range(dim)])
        for r in sorted(stats_rows, key=lambda r: r["cid"])
    ]
    return assignments.select(id_col, "cid"), final


def knn_classify(corpus: DataFrame, queries: DataFrame, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 label_col: str = "label") -> DataFrame:
    """k-NN majority-vote label prediction from brute-force top-k.
    Vote ties break toward the smaller label value (deterministic)."""
    topk = brute_force_topk(corpus, queries, k, id_col, vec_col)
    labeled = topk.join(
        corpus.select(F.col(id_col).alias("neighbor_id"), label_col),
        on="neighbor_id",
    )
    votes = labeled.groupBy("query_id", label_col).agg(
        F.count(F.lit(1)).alias("votes")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col(label_col)
    )
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col(label_col).alias("predicted_label"), "votes")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): sub-vector codebooks + asymmetric-distance scan
# ---------------------------------------------------------------------------


def lit_tensor3(books) -> Column:
    """A literal array<array<array<double>>> (the full PQ codebook
    tensor) as ONE parsed expression — see :func:`lit_vector` for why
    this beats per-element ``F.lit`` and the finite-values-only
    contract."""
    t = [[[float(v) for v in row] for row in mat] for mat in books]
    if not all(math.isfinite(v) for mat in t for row in mat for v in row):
        raise ValueError("lit_tensor3 requires finite values")
    return F.expr(
        "array(" + ",".join(
            "array(" + ",".join(
                "array(" + ",".join(f"{v!r}D" for v in row) + ")"
                for row in mat) + ")"
            for mat in t) + ")")


def pq_codes_expr(vec: Column,
                  books: list[list[list[float]]]) -> Column:
    """PQ code array for one vector: ``codes[s] = argmin_cid
    d2(vec_slice_s, books[s][cid])`` — a single ``transform`` over the
    LITERAL 3-D codebook tensor whose element index IS the subspace,
    so the expression tree is O(1) in BOTH m and k.  The previous form
    unrolled one argmin per subspace (and pq_train wrapped them in an
    m-arm CASE); with fresh literals every training round, Catalyst
    analysis/codegen of that tree — not execution — dominated per-round
    cost (round-14, same diagnosis as kmeans_lite).  ``array_position``
    of the min takes the FIRST match, so ties break on the lowest cid,
    same as the oracles' ``ORDER BY d2, cid``."""
    sub_dim = len(books[0][0])

    def per_sub(book: Column, s: Column) -> Column:
        sl = F.slice(vec, s * sub_dim + 1, sub_dim)
        d2s = F.transform(
            book,
            lambda c: F.aggregate(
                F.zip_with(sl, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0), lambda acc, x: acc + x,
            ),
        )
        return (F.array_position(d2s, F.array_min(d2s)) - 1).cast("int")

    return F.transform(lit_tensor3(books), per_sub)


def pq_train(df: DataFrame, m: int = 8, k: int = 8, iters: int = 1,
             id_col: str = "vec_id", vec_col: str = "embedding",
             scale: int = 1_000_000) -> list[list[list[float]]]:
    """Train PQ codebooks: ``m`` independent per-subspace Lloyd's runs,
    executed in the SAME Spark jobs (the subspace index is just another
    grouping key, so one assignment pass + one integer-sum shuffle per
    round trains all ``m`` codebooks at once).

    Same determinism contract as ``kmeans_lite``: init = the first ``k``
    vectors' sub-slices, centroid updates from exact ``floor(x·scale)``
    integer sums divided once at the driver, distance folds
    left-to-right.  Driver state is O(m·k·subdim) — for m=8, k=256,
    subdim=8 that's 16 K floats regardless of corpus size.

    Returns ``codebooks[sub][cid] -> centroid`` (list of m lists of k
    subvectors).
    """
    vecs = df.select(F.col(id_col).alias("id"),
                     as_double(vec_col).alias("e"))
    seed = vecs.orderBy("id").limit(k).collect()
    dim = len(seed[0]["e"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_dim = dim // m
    books: list[list[list[float]]] = [
        [list(r["e"][s * sub_dim:(s + 1) * sub_dim]) for r in seed]
        for s in range(m)
    ]
    for _ in range(iters):
        # Assignment rides the same narrow codes expression the encoder
        # uses (ONE transform over the literal 3-D tensor — the
        # previous per-subspace explode + m-arm CASE of unrolled
        # argmins made plan analysis the dominant per-round cost); the
        # subspace slice is re-derived from the posexploded index and
        # the quantized slice is STAGED as its own projection so the
        # per-dimension sums read elements instead of re-inlining the
        # quantize transform sub_dim× per row (round-14, guide §4.4).
        assigned = vecs.select(
            "e",
            F.posexplode(pq_codes_expr(F.col("e"), books))
            .alias("sub", "cid"),
        ).select(
            "sub", "cid",
            quantize(
                F.slice(F.col("e"), F.col("sub") * sub_dim + 1, sub_dim),
                scale,
            ).alias("_q"),
        )
        stats = assigned.groupBy("sub", "cid").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.element_at(F.col("_q"), i + 1)).alias(f"s{i}")
              for i in range(sub_dim)],
        ).collect()
        by_key = {(int(r["sub"]), int(r["cid"])): r for r in stats}
        books = [
            [
                [by_key[(s, c)][f"s{i}"] / (by_key[(s, c)]["n"]
                                            * float(scale))
                 for i in range(sub_dim)]
                if (s, c) in by_key else old
                for c, old in enumerate(books[s])
            ]
            for s in range(m)
        ]
    return books


def pq_encode(df: DataFrame, books: list[list[list[float]]],
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """PQ-encode every vector: ``codes[sub] = argmin_cid d2(slice, cent)``
    — a FULLY NARROW projection (the codebooks ride as literals), no
    explode, no shuffle.  64-dim float64 (512 B) compresses to m bytes.

    Returns ``(id_col, codes array<int>)``.
    """
    return df.select(F.col(id_col),
                     pq_codes_expr(as_double(vec_col), books)
                     .alias("codes"))


def _adc_expr(books: list[list[list[float]]], q_col: str = "q_vec",
              codes_col: str = "codes") -> Column:
    """Asymmetric-distance Column: ``Σ_s d2(query_slice_s,
    codebook[s][code_s])`` — one transform over the LITERAL 3-D
    codebook tensor (element index = subspace) folded by ``aggregate``,
    so the expression tree is O(1) in m (the unrolled per-subspace sum
    it replaces dominated plan analysis, round-14).  Each term slices
    the query once and indexes its subspace's codebook with the dynamic
    code byte — pure expression work, no carried tensor column.  Both
    the transform and the fold run in element order with a 0.0 seed, so
    the summation sequence (…((0+t₀)+t₁)+…) is bit-identical to the
    left-associated unrolled form and the oracles."""
    sub_dim = len(books[0][0])
    terms = F.transform(
        lit_tensor3(books),
        lambda book, s: F.aggregate(
            F.zip_with(
                F.slice(F.col(q_col), s * sub_dim + 1, sub_dim),
                F.element_at(
                    book, F.element_at(F.col(codes_col), s + 1) + 1),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0), lambda a2, x: a2 + x,
        ),
    )
    return F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)


def pq_adc_topk(codes_df: DataFrame, books: list[list[list[float]]],
                queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query stays
    full-precision, each corpus vector is its m-byte code, and the
    distance is ``Σ_s d2(query_slice_s, codebook[s][code_s])``.

    Scale shape: queries broadcast (crossJoin of a tiny frame), the
    per-row score is an ordered fold over the m code entries against the
    LITERAL codebook tensor — pure codegen, no join against a distance
    table — and the only shuffle is the per-query top-k
    (row_number ≤ k lowers to WindowGroupLimit).  The corpus side reads
    ``codes`` only: at 100 TB the scan is 64× narrower than raw floats.

    Returns ``(query_id, neighbor_id, adc_d2, rank)`` — ascending
    distance, rank ties broken on neighbor id.
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias(query_id_col),
                       as_double(vec_col).alias("q_vec"))
    )
    adc = _adc_expr(books)
    scored = (
        codes_df.select(F.col(id_col).alias("neighbor_id"), "codes")
        .crossJoin(q)
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("adc_raw", adc)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_raw"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id",
                F.round("adc_raw", 6).alias("adc_d2"), "rank")
    )


def _centroid_struct_arr(centroids: DataFrame, cid_col: str = "cid",
                         ce_col: str = "ce") -> DataFrame:
    """All centroids as ONE broadcast array-of-structs row (cid, ce,
    norm) — the carrier for narrow in-row argmin assignment."""
    return F.broadcast(
        centroids.select(F.col(cid_col).alias("cid"),
                         as_double(ce_col).alias("ce"))
        .withColumn("cn", l2_norm(F.col("ce")))
        .groupBy().agg(
            F.collect_list(F.struct("cid", "ce", "cn")).alias("cents"))
    )


def _ranked_cells(vec: Column, norm: Column) -> Column:
    """(−cosine, cid)-sorted centroid ranking against the ``cents``
    array column — argmin/probe selection without explode, window, or
    shuffle (sort key ≡ ORDER BY sim DESC, cid)."""
    return F.array_sort(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                (-(dot(vec, c["ce"]) / (norm * c["cn"]))).alias("neg_sim"),
                c["cid"].alias("cid"),
            ),
        )
    )


def ivfpq_adc_topk(df: DataFrame, books: list[list[list[float]]],
                   centroids: DataFrame, queries: DataFrame, k: int = 5,
                   nprobe: int = 2, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   query_id_col: str = "query_id") -> DataFrame:
    """IVF-PQ — the FAISS-style production recipe, composing the two
    scale paths this module already has: a coarse inverted file prunes
    the candidate space to the query's ``nprobe`` cells, and asymmetric
    PQ distance scores only those candidates from their m-byte codes.

    Plan shape (the point of the composition): ONE narrow corpus pass
    computes BOTH the PQ codes and the coarse-cell assignment (the
    centroid array and codebooks ride as a broadcast row / literals);
    probes and query vectors are broadcast; candidate selection is a
    broadcast equi-join on ``cluster_id``; the ONLY shuffle in the
    whole plan is the final per-query top-k WindowGroupLimit.  At
    100 TB the index build writes (id, cluster_id, codes) once —
    64× narrower than raw floats — and every query batch reads
    ~nprobe/K of it.

    ``centroids`` is a (cid, ce) frame (trained externally or seeded
    deterministically); assignment metric is cosine, matching
    ``ivf_ann_topk``; scoring is L2 ADC, matching ``pq_adc_topk``.
    Returns ``(query_id, neighbor_id, adc_d2, rank)``.
    """
    cent_arr = _centroid_struct_arr(centroids)

    e = as_double(vec_col)
    codes = pq_codes_expr(e, books)
    indexed = (
        df.crossJoin(cent_arr)
        .select(
            F.col(id_col).alias("neighbor_id"),
            codes.alias("codes"),
            F.element_at(_ranked_cells(e, l2_norm(e)), 1)["cid"]
            .alias("cluster_id"),
        )
    )
    probes = (
        queries.crossJoin(cent_arr)
        .select(
            F.col(id_col).alias(query_id_col),
            F.explode(
                F.slice(_ranked_cells(e, l2_norm(e)), 1, nprobe)
            ).alias("cell"),
        )
        .select(query_id_col, F.col("cell.cid").alias("cluster_id"))
    )
    qvec = F.broadcast(
        queries.select(F.col(id_col).alias(query_id_col),
                       as_double(vec_col).alias("q_vec")))
    scored = (
        indexed.join(F.broadcast(probes), "cluster_id")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .join(qvec, query_id_col)
        .withColumn("adc_raw", _adc_expr(books))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_raw"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id",
                F.round("adc_raw", 6).alias("adc_d2"), "rank")
    )


def semdedup_labels(df: DataFrame, n_centroids: int = 8,
                    threshold: float = 0.2, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space coarsely, then deduplicate ONLY within clusters —
    the cluster assignment bounds the pairwise space the way LSH buckets
    do for MinHash.  Prune rule: a vector is pruned when a LOWER-id
    vector in the same cluster has cosine ≥ ``threshold`` with it
    (paper: keep one representative per semantic-duplicate group; the
    lowest-id rule makes the choice deterministic and SQL-expressible).

    Returns ``(vec_id, cluster_id, keep)``.

    Centroids are the first ``n_centroids`` corpus vectors — the same
    deterministic stand-in the IVF query uses; swap in ``kmeans_lite``
    output for trained centroids (same shape: the assignment pass is
    identical).

    Plan shape: assignment is a narrow broadcast-array argmax per vector
    (no shuffle — the corpus never moves to compute its cluster); the
    within-cluster pair space is an equi-self-join on ``cluster_id``
    with ``a < b``, and norms are hoisted per-vector before the join so
    the per-pair work is one array fold.  Skew note: SemDeDup's cost is
    inherently quadratic in the largest cluster — at 100 TB, cap
    cluster sizes by raising ``n_centroids`` (paper uses 50k clusters
    for 5B embeddings) so n²/k stays bounded; the join shape here is
    unchanged by k.
    """
    vecs = df.select(
        F.col(id_col).alias("vec_id"), as_double(vec_col).alias("e")
    ).withColumn("en", l2_norm(F.col("e")))
    cent_arr = F.broadcast(
        vecs.filter(F.col("vec_id") < n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"),
                F.col("en").alias("cn"))
        .groupBy()
        .agg(F.collect_list(F.struct("cid", "ce", "cn")).alias("cents"))
    )
    # argmax cosine via array_sort on (−sim, cid): ties break to the
    # lowest centroid id, matching the oracle's ORDER BY sim DESC, cid.
    ranked = F.array_sort(F.transform(
        F.col("cents"),
        lambda c: F.struct(
            (-(dot(F.col("e"), c["ce"]) / (F.col("en") * c["cn"])))
            .alias("neg_sim"),
            c["cid"].alias("cid"),
        ),
    ))
    # Materialize the assignment ONCE: three consumers read it (both
    # sides of the pair join and the final label join), and without the
    # checkpoint each would redo the k-centroid argmax over the corpus —
    # the single most expensive narrow pass here.  Same pattern as the
    # edge-list checkpoint in connected_components.
    assign = vecs.crossJoin(cent_arr).select(
        "vec_id", "e", "en",
        F.element_at(ranked, 1)["cid"].alias("cluster_id"),
    ).localCheckpoint()
    lo = assign.select(F.col("vec_id").alias("_u"), "cluster_id",
                       F.col("e").alias("_ue"), F.col("en").alias("_un"))
    hi = assign.select(F.col("vec_id").alias("_v"), "cluster_id",
                       F.col("e").alias("_ve"), F.col("en").alias("_vn"))
    dup_pairs = (
        lo.join(hi, "cluster_id")
        .filter(F.col("_u") < F.col("_v"))
        .filter(
            F.round(
                cosine_with_norms(F.col("_ue"), F.col("_ve"),
                                  F.col("_un"), F.col("_vn")), 6
            ) >= threshold
        )
        .select(F.col("_v").alias("vec_id")).distinct()
        .withColumn("_pruned", F.lit(True))
    )
    return (
        assign.join(dup_pairs, "vec_id", "left")
        .select(
            "vec_id", "cluster_id",
            F.coalesce(~F.col("_pruned"), F.lit(True)).alias("keep"),
        )
    )


def hard_negatives(corpus: DataFrame, anchors: DataFrame,
                   planes: list[list[float]], k: int = 4,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label",
                   query_id_col: str = "query_id") -> DataFrame:
    """Contrastive hard-negative mining: for each anchor, the k most
    similar vectors carrying a DIFFERENT label — the negatives a
    contrastive/embedding trainer wants, because easy (dissimilar)
    negatives teach nothing.

    Same physical shape as ``lsh_topk`` — candidates share a hyperplane
    bucket (equi-join, never all-pairs), the anchor side broadcasts,
    exact cosine only within buckets — plus the label-inequality filter
    before ranking.  At 100 TB this is the standard mining pass between
    training epochs: one narrow bucketing pass over the corpus, one
    bucket-keyed join against epoch-sized anchors.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neg_label"),
        as_double(vec_col).alias("c_vec"),
    ).withColumn("bucket", lsh_bucket(F.col("c_vec"), planes)) \
     .withColumn("c_norm", l2_norm(F.col("c_vec")))
    q = F.broadcast(
        anchors.select(
            F.col(id_col).alias(query_id_col),
            F.col(label_col).alias("anchor_label"),
            as_double(vec_col).alias("q_vec"),
        ).withColumn("bucket", lsh_bucket(F.col("q_vec"), planes))
        .withColumn("q_norm", l2_norm(F.col("q_vec")))
    )
    scored = (
        c.join(q, on="bucket")
        .filter(F.col("neg_label") != F.col("anchor_label"))
        .withColumn("sim", F.round(
            cosine_with_norms(F.col("q_vec"), F.col("c_vec"),
                              F.col("q_norm"), F.col("c_norm")), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "anchor_label", "neighbor_id",
                "neg_label", "sim", "rank")
    )


def embedding_decontamination(corpus: DataFrame, bench: DataFrame,
                              threshold: float = 0.2,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Benchmark decontamination in EMBEDDING space — the semantic twin
    of n-gram decontamination (``text.benchmark_ngram_hits``): a corpus
    vector is contaminated when its cosine against ANY benchmark vector
    reaches ``threshold`` (paraphrased eval leakage that exact n-gram
    matching misses).

    100 TB shape: an eval benchmark is tiny by definition, so the whole
    benchmark rides as ONE collected array on a broadcast single-row
    frame; per corpus vector the max-cosine is an ``array_max`` over a
    ``transform`` fold — the corpus pass is fully narrow (no explode, no
    groupBy, no shuffle at all).  Norms are hoisted: the benchmark's
    ride precomputed in the collected structs and the corpus vector's
    is a per-row column, so the per-pair work is one dot product.  Each
    pairwise sim is rounded to 6 dp BEFORE the max so an external
    replay agrees at the threshold.  An EMPTY benchmark contaminates
    nothing: ``max_bench_sim`` is NULL but ``contaminated`` coalesces
    to False (a NULL flag would silently drop the whole corpus from a
    boolean keep-filter).
    """
    b = bench.agg(F.collect_list(F.struct(
        as_double(vec_col).alias("bv"),
        l2_norm(as_double(vec_col)).alias("bn"))).alias("bs"))
    sims = F.transform(
        F.col("bs"),
        lambda s: F.round(
            dot(F.col("__v"), s["bv"]) / (F.col("__vn") * s["bn"]), 6),
    )
    return (
        corpus.withColumn("__v", as_double(vec_col))
        .withColumn("__vn", l2_norm(F.col("__v")))
        .crossJoin(F.broadcast(b))
        .withColumn("max_bench_sim", F.array_max(sims))
        .withColumn(
            "contaminated",
            F.coalesce(F.col("max_bench_sim") >= threshold, F.lit(False)))
        .drop("__v", "__vn", "bs")
    )


def mmr_topk(corpus: DataFrame, query_vec: DataFrame, k: int = 3,
             lam: float = 0.7, pool_size: int = 10,
             id_col: str = "vec_id", vec_col: str = "e",
             redundancy_weight: float | None = None) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998, public):
    greedy diversified top-k — each step picks the candidate maximizing
    ``lam * relevance - (1 - lam) * max-similarity-to-selected``.

    Scale shape: ONE narrow corpus pass scores relevance against the
    broadcast query vector; ``orderBy + limit(pool_size)`` lowers to a
    distributed TakeOrdered (no global sort) and everything after runs
    on the pool-sized frame — the greedy loop is k tiny Spark jobs over
    ≤ pool_size rows, never the corpus.  Determinism for the oracle
    compare: relevance and every pairwise redundancy round at 6 dp
    BEFORE the max/argmax (rule 2), ties break on the id.

    ``corpus`` needs (id_col, vec_col double-array); ``query_vec`` is a
    one-row frame with column ``qe``.  Returns (rank, <id_col>,
    relevance, mmr_score), the id column keeping the caller's name AND
    dtype — mmr_score of the first pick is lam*rel
    (empty selected set ⇒ zero redundancy), matching the unrolled SQL.
    """
    rel = (
        corpus.crossJoin(F.broadcast(query_vec))
        .select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("e"),
            F.round(cosine(F.col(vec_col), F.col("qe")), 6).alias("rel"),
        )
    )
    pool = (
        rel.orderBy(F.col("rel").desc(), "vec_id").limit(pool_size)
        .localCheckpoint()
    )
    first = (
        pool.orderBy(F.col("rel").desc(), "vec_id").limit(1)
        .select("vec_id", "e", "rel",
                F.round(F.lit(lam) * F.col("rel"), 6).alias("score"))
    )
    # mu is the redundancy multiplier the ORACLE must be able to spell
    # as the same double: Python 1.0 - 0.7 is 0.30000000000000004, one
    # ulp off a SQL literal 0.3, and the rounded score feeds an argmax
    # (round-8 review finding) — callers with a SQL twin pass the
    # literal weight explicitly.
    mu = (1.0 - lam) if redundancy_weight is None else redundancy_weight
    spark = corpus.sparkSession
    # Result schema derives the id type from the INPUT column (string,
    # int, long ids all round-trip; round-9 advisor fix: the previous
    # hardcoded `vec_id long` broke createDataFrame for non-long ids)
    # and keeps the caller's id column name.
    id_type = corpus.schema[id_col].dataType.simpleString()
    schema = (f"rank int, `{id_col}` {id_type}, relevance double, "
              "mmr_score double")
    head = first.collect()
    if not head:  # empty corpus/pool → empty frame, not an IndexError
        return spark.createDataFrame([], schema)
    selected = [head[0]]
    out_rows = [(1, selected[0]["vec_id"], selected[0]["rel"],
                 selected[0]["score"])]
    for step in range(2, k + 1):
        sel_df = spark.createDataFrame(
            [(r["vec_id"], r["e"]) for r in selected],
            f"sel_id {id_type}, se array<double>")
        chosen_ids = [r["vec_id"] for r in selected]
        scored = (
            pool.filter(~F.col("vec_id").isin(chosen_ids))
            .crossJoin(F.broadcast(sel_df))
            .withColumn("red", F.round(cosine(F.col("e"),
                                              F.col("se")), 6))
            .groupBy("vec_id", "rel", "e")
            .agg(F.max("red").alias("max_red"))
            .select(
                "vec_id", "e", "rel",
                F.round(F.lit(lam) * F.col("rel")
                        - F.lit(mu) * F.col("max_red"), 6)
                .alias("score"),
            )
        )
        picked = scored.orderBy(F.col("score").desc(), "vec_id") \
            .limit(1).collect()
        if not picked:  # pool exhausted before k picks (pool_size < k)
            break
        pick = picked[0]
        selected.append(pick)
        out_rows.append((step, pick["vec_id"], pick["rel"],
                         pick["score"]))
    return spark.createDataFrame(out_rows, schema)
