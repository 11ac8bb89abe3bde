"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline additions (north-star; absent from the reference).
Design constraints for 100 TB:

- Exact dedup is a hash-groupBy on a 128-bit fingerprint — one shuffle on
  a uniformly distributed key.
- MinHash signatures are computed per-document in a narrow stage (explode
  shingles → groupBy doc), then LSH banding turns near-dup detection into
  an equi-join on (band, band_key) — the only pairwise work happens inside
  buckets, never across the full corpus.
- Hashes are md5-derived (not xxhash64) so signatures are reproducible by
  any engine — the DuckDB oracle recomputes them byte-for-byte.  MinHash
  uses the *lexicographic* min of ``md5(seed:shingle)`` hex strings: the
  min of a uniform hash under 2^128 is order-isomorphic to the numeric
  min, and string min is portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..colnames import fresh_name

from .text import (
    fingerprint,
    normalize_text,
    with_word_ngrams,
    word_kgram_hash,
)


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of every exact-duplicate group.

    Skew-safe ONE-shuffle shape: a ``row_number`` window partitioned by
    the content hash looks tempting ("uniform 128-bit key") but is wrong
    for THIS workload — every *copy* of a duplicated document shares one
    hash value, so a boilerplate doc repeated 10 M times serializes into
    a single window partition.  Instead the whole winning ROW rides
    through a partial-aggregatable ``min_by(row, id)`` groupBy on the
    fingerprint: map-side combine keeps at most one row per hash per
    input partition, so the hot key is absorbed before the shuffle and
    no join back to the corpus is needed (the earlier groupBy + semi-join
    formulation shuffled the full corpus twice).  ``min_by`` orders by
    the id alone — the carried row may contain non-orderable columns
    (maps, binaries) that a ``min(struct(id, row))`` formulation would
    reject with EXPRESSION_TYPE_IS_NOT_ORDERABLE.  Determinism requires
    ``id_col`` to be unique, the usual contract for a document id.
    """
    row = F.struct(*[F.col(c) for c in df.columns])
    winners = (
        df.groupBy(fingerprint(text_col).alias("_fp"))
        .agg(F.min_by(row, F.col(id_col)).alias("_row"))
    )
    return winners.select([F.col(f"_row.{c}").alias(c)
                           for c in df.columns])


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams as an array column — the shingle set for
    MinHash / Jaccard.  Thin alias over ``text.word_ngrams`` so the gram
    construction (short-doc truncation, ANSI-safe try_element_at) lives
    in exactly one place; DataFrame pipelines should prefer
    ``with_word_ngrams(distinct=True)``, which stages the token split."""
    from .text import word_ngrams

    return F.array_distinct(word_ngrams(col, n))


def minhash_vector(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", num_hashes: int = 8,
                   shingle_n: int = 3,
                   out_col: str = "_mh") -> DataFrame:
    """(id, out_col array<string>) — the per-document MinHash vector,
    computed FULLY NARROWLY: ``array_min`` over a ``transform`` of the
    shingle array, one element per seed.

    The signature of a document is a pure row property, so no explode /
    groupBy / exchange is needed to compute it.  The previous
    explode+groupBy formulation planned as **SortAggregate** (Spark has
    no hash-aggregate for min over STRING buffers) — two full sorts of
    the exploded shingle stream around an exchange, at every corpus
    scale.  This form is zero-shuffle: at 100 TB the signature pass is
    a map-only stage over the corpus (round-14 optimization, guide
    §2.4 "remove shuffles outright").

    NULL text (NULL shingle array) yields a NULL vector so downstream
    generators drop the row — identical to the old explode path, where
    a NULL array exploded into no rows.
    """
    grammed = with_word_ngrams(
        df, text_col, shingle_n, keep=(id_col,), distinct=True
    )
    return grammed.select(
        F.col(id_col),
        F.when(F.col("grams").isNotNull(),
               minhash_vector_expr("grams", num_hashes)).alias(out_col),
    )


def minhash_vector_expr(grams: Column | str,
                        num_hashes: int = 8) -> Column:
    """The per-row MinHash vector as a pure Column over an EXISTING
    gram-array column — the expression form of :func:`minhash_vector`
    for pipelines that stage their own gram arrays (the crawl funnels'
    sentinel-text chain).  min over a multiset equals min over its
    set, so distinct and non-distinct gram arrays yield the same
    vector."""
    g = F.col(grams) if isinstance(grams, str) else grams

    def _seed_hash(s: int):
        # factory, NOT a default-arg lambda: pyspark's transform()
        # inspects lambda arity and would pass the element INDEX as a
        # second positional arg, silently shadowing the seed binding
        return lambda x: F.md5(F.concat_ws(":", F.lit(str(s)), x))

    return F.array(*[
        F.array_min(F.transform(g, _seed_hash(s)))
        for s in range(num_hashes)
    ])


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 8,
                       shingle_n: int = 3) -> DataFrame:
    """(id, seed, minhash) — one row per document per hash function.

    minhash_i(doc) = min over shingles of md5(i || ':' || shingle),
    compared lexicographically (portable across engines, see module doc).

    Long form of :func:`minhash_vector` (posexplode of the narrow
    per-document vector) — zero shuffles; the previous explode →
    SortAggregate → exchange → SortAggregate plan is gone.
    """
    wide = minhash_vector(df, text_col, id_col, num_hashes, shingle_n)
    return wide.select(
        F.col(id_col),
        F.posexplode("_mh").alias("seed", "minhash"),
    )


def minhash_band_keys(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 8,
                      rows_per_band: int = 2,
                      shingle_n: int = 3) -> DataFrame:
    """(id, band, band_key) — LSH band keys computed NARROWLY from the
    per-document MinHash vector: band b's key is the sorted
    ``'|'``-join of vector slice ``[b*rows_per_band, ...)``.

    Byte-identical to banding :func:`minhash_signatures` output through
    ``lsh_candidate_pairs``' groupBy (collect_list + sort_array over
    the band's rows ≡ sort_array over the vector slice), but with ZERO
    exchanges before the candidate join — the only shuffle left in the
    LSH pipeline is the (band, band_key) equi-join itself, which is the
    fundamentally required one.
    """
    wide = minhash_vector(df, text_col, id_col, num_hashes, shingle_n)
    n_bands = -(-num_hashes // rows_per_band)
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", F.sort_array(F.slice(
                "_mh", b * rows_per_band + 1,
                min(rows_per_band, num_hashes - b * rows_per_band)
            ))).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    return wide.select(
        F.col(id_col),
        F.inline(F.when(F.col("_mh").isNotNull(), F.array(*bands))),
    )


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id",
                        rows_per_band: int = 2) -> DataFrame:
    """LSH banding: concat ``rows_per_band`` consecutive minhashes into a
    band key; documents sharing any (band, key) are candidate pairs.

    The pairing is an equi-self-join on (band, band_key) — Catalyst
    shuffles both sides on the key, so cost scales with bucket sizes, not
    corpus².  Emits each unordered pair once (a < b).
    """
    banded = signatures.withColumn(
        "band", (F.col("seed") / rows_per_band).cast("int")
    ).groupBy(id_col, "band").agg(
        F.concat_ws("|", F.sort_array(F.collect_list("minhash"))).alias(
            "band_key"
        )
    )
    return lsh_pairs_from_bands(banded, id_col=id_col)


def lsh_pairs_from_bands(banded: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """Candidate pairs from a pre-banded (id, band, band_key) frame —
    the shared tail of :func:`lsh_candidate_pairs`; pair it with
    :func:`minhash_band_keys` for the zero-pre-shuffle LSH pipeline."""
    a = banded.select(F.col(id_col).alias("a"), "band", "band_key")
    b = banded.select(F.col(id_col).alias("b"), "band", "band_key")
    return (
        a.join(b, on=["band", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 3,
                        threshold: float = 0.2,
                        max_doc_freq: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    |A∩B| comes from a self-join on the shingle (shuffle keyed by
    shingle), |A∪B| = |A|+|B|−|A∩B|.

    ``max_doc_freq`` is the standard df-cut that makes the self-join safe
    to run standalone: shingles present in more than ``max_doc_freq``
    documents (stop-word n-grams — the skewed keys that make the join
    quadratic) are removed from the shingle *space* before anything is
    counted, so both |A∩B| and the sizes are computed over the surviving
    shingles and the Jaccard stays internally consistent.  The hot-shingle
    list is tiny by construction (only keys above the cut), so the
    exclusion is a broadcast anti-join — narrow, no extra shuffle.  With
    the cut, per-key join fan-out is bounded by max_doc_freq² regardless
    of corpus skew.  Without it (``None``), this is the post-LSH verifier
    semantics — callers restrict the input set.
    """
    sh = with_word_ngrams(
        df, text_col, shingle_n, keep=(id_col,), distinct=True
    ).select(F.col(id_col), F.explode("grams").alias("shingle"))

    if max_doc_freq is not None:
        # Bucket-pairs shape.  Pass 1: shingle doc-frequencies — a pure
        # count agg, so map-side partial aggregation keeps the hot keys
        # cheap; only shingles ABOVE the cut come back (tiny by
        # construction) and are broadcast-anti-joined away.  Pass 2: one
        # shuffle keyed by shingle builds each surviving shingle's doc
        # list — bounded ≤ max_doc_freq ids because hot shingles are
        # already gone, so no collect_list buffer can blow up — and the
        # a<b pairs are generated inside the bucket with higher-order
        # array expressions: no self-join, fan-out ≤ max_doc_freq² per
        # shingle regardless of corpus skew.
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        shc = sh.join(F.broadcast(hot), "shingle", "left_anti")
        # One collect_list agg feeds BOTH the pair generation and the
        # per-doc sizes (explode of the same bucket frame) — deriving
        # sizes from shc directly would re-instantiate the whole
        # hot-filter chain as a second subtree.
        buckets_all = shc.groupBy("shingle").agg(
            F.collect_list(id_col).alias("ids")
        )
        sizes = (
            buckets_all.select(F.explode("ids").alias(id_col))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("sz"))
        )
        buckets = buckets_all.filter(F.size("ids") >= 2)
        ids = F.array_sort("ids")
        pairs = F.flatten(
            F.transform(
                ids,
                lambda x, i: F.transform(
                    F.slice(ids, i + 2, F.size(ids)),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
        inter = (
            buckets.select(F.explode(pairs).alias("p"))
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("inter_sz"))
        )
    else:
        # Post-LSH verifier path: input is already pruned, exact
        # semantics over every shingle — classic self-join on shingle.
        sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
        a = sh.select(F.col(id_col).alias("a"), "shingle")
        b = sh.select(F.col(id_col).alias("b"), "shingle")
        inter = (
            a.join(b, on="shingle")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("inter_sz"))
        )
    # No broadcast() hint on the sizes joins: ``sizes`` is PER-DOC, i.e.
    # corpus-sized at 100 TB — a forced broadcast would OOM the driver.
    # Both joins key on a uniform doc id; AQE broadcasts when the sizes
    # frame is actually small (it is at test scale) and shuffles
    # otherwise.
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("a_sz"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("b_sz"))
    out = (
        inter.join(sa, "a").join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter_sz")
                / (F.col("a_sz") + F.col("b_sz") - F.col("inter_sz")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 16) -> DataFrame:
    """SimHash over word tokens: per-bit majority vote of token hashes.

    Token hash bits come from ``conv(md5 prefix, 16, 10)`` so the
    signature is engine-reproducible.  ``bits`` defaults to 16 (hamming
    comparisons on small corpora); the hash carries 15 hex chars = 60
    usable bits, so ``bits`` is capped there — beyond 60 the votes are
    constant zeros, and the 2^63 power in the signature fold overflows
    BIGINT under ANSI.  (A true 64-bit simhash needs two 32-bit halves
    or xxhash64 — at the cost of the cross-engine md5 contract.)
    Plan: explode tokens → explode bit positions → groupBy(id) — shuffle
    keyed by document id.
    """
    if not 1 <= bits <= 60:
        raise ValueError(
            f"bits must be in [1, 60] (md5-prefix hash carries 60 usable "
            f"bits; see docstring), got {bits}")
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    toks = toks.withColumn("h", h)
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    # Column-valued shift amount → SQL shiftleft + integer DIV (the
    # python shiftright() only takes a literal count).
    votes = toks.select(id_col, "h", bit).withColumn(
        "vote",
        F.expr(
            "CASE WHEN (h DIV shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)))"
            " % 2 = 1 THEN 1 ELSE -1 END"
        ),
    )
    bitvals = votes.groupBy(id_col, "bit").agg(
        F.when(F.sum("vote") > 0, 1).otherwise(0).alias("bitval")
    )
    return bitvals.groupBy(id_col).agg(
        F.sum(
            F.col("bitval") * F.pow(F.lit(2.0), F.col("bit")).cast("bigint")
        ).cast("bigint").alias("simhash")
    )


def connected_components(nodes: DataFrame, pairs: DataFrame,
                         node_col: str = "node",
                         max_iter: int = 20) -> DataFrame:
    """Resolve near-dup candidate pairs into duplicate CLUSTERS: each
    node gets the minimum node id reachable from it (``cluster_id``).

    Min-label propagation, iterated to fixpoint: each round every node
    takes the min of its own label and its neighbors' labels.  Rounds
    needed = graph diameter — near-dup clusters are shallow (pairs come
    from shared LSH buckets), so this converges in a handful of rounds.
    Each round is one shuffle join + agg; ``localCheckpoint`` cuts the
    lineage so the plan doesn't grow with iterations.  Convergence is
    detected by the (monotonically decreasing) sum of labels — a cheap
    scalar agg, no diff join.

    At 100 TB scale the same loop holds (edges post-LSH are a small
    fraction of the corpus); for adversarial graph shapes switch the
    body to the alternating large-star/small-star method — the driver
    loop and checkpointing stay identical.
    """
    # Materialize the edge list ONCE: the candidate-pair lineage is
    # typically an expensive LSH + rescore pipeline, and every fixpoint
    # round joins against edges — without the checkpoint each round
    # (plus its convergence action) would recompute that whole pipeline.
    # Post-LSH edges are a small fraction of the corpus by contract, so
    # the materialization is cheap.
    #
    # Restrict pairs to edges whose BOTH endpoints are supplied nodes
    # BEFORE the fixpoint loop: the union-form propagate below folds
    # every edge dst into the label frame, so a foreign endpoint would
    # otherwise (a) appear in the output and (b) relay labels between
    # member nodes it connects.  Two semi-joins at setup (amortized over
    # all hops, folded into the one-time edge materialization) keep the
    # contract pinned by test_star_labels_only_supplied_nodes; filtering
    # per hop or post-filtering the output would be wrong (the latter
    # keeps relay connectivity through non-members).
    #
    # The LABEL frame is checkpointed first and serves as the probe
    # side of both semi-joins (r15): the supplied nodes lineage (often
    # itself a union/distinct over the pair pipeline) then executes
    # exactly once, instead of once for the checkpoint plus once per
    # semi-join probe.
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("lbl")
    ).localCheckpoint()
    node_ids = labels.select("node")
    member_pairs = (
        pairs.select("a", "b")
        .join(node_ids, F.col("a") == F.col("node"), "left_semi")
        .join(node_ids, F.col("b") == F.col("node"), "left_semi")
    )
    edges = (
        member_pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(member_pairs.select(F.col("b").alias("src"),
                                   F.col("a").alias("dst")))
        .localCheckpoint()
    )
    # The edge count is free once the checkpoint is materialized; when
    # the duplicate subgraph is tiny (the common post-LSH case — most of
    # the corpus has no near-dup edge at all), collapse to one partition
    # so each fixpoint round is a single-task job instead of a
    # 32-partition shuffle round-trip.  The NODE side must pass the same
    # gate independently: a clean 100 TB corpus can have few edges but
    # billions of nodes, and coalescing the label frame on edge count
    # alone would serialize corpus-sized propagation onto one task.
    # Large graphs keep the parallel layout.
    small_edges = edges.count() <= 100_000
    if small_edges:
        edges = edges.coalesce(1)
        if labels.count() <= 1_000_000:
            labels = labels.coalesce(1)
    def propagate(lbls: DataFrame) -> DataFrame:
        # union form: one join + one partial-agg groupBy per hop.  The
        # previous two-join form (neighbor agg, then a left join back
        # onto the label frame) spent an extra corpus-keyed join per
        # hop for the same fixpoint step:  min(own, incoming) ≡
        # groupBy(node).min over (own row ∪ incoming rows), and every
        # node keeps its own row so nothing is lost (round-14
        # optimization, guide §2.4).
        neigh = edges.join(lbls, edges.src == lbls.node).select(
            F.col("dst").alias("node"), "lbl")
        return lbls.select("node", "lbl").union(neigh) \
            .groupBy("node").agg(F.min("lbl").alias("lbl"))

    def _sig(lbls: DataFrame):
        # Type-agnostic convergence signature: the labels converged iff
        # the (node, lbl) multiset stopped changing.  A plain sum('lbl')
        # would (a) throw CAST_INVALID_INPUT under ANSI when node ids
        # are STRINGS (md5 fingerprints — the natural dedup id), and
        # (b) overflow BIGINT summing billions of 64-bit ids; the
        # decimal-summed row hash works for any orderable id type (same
        # device as connected_components_star._sig).
        return lbls.agg(
            F.sum(F.xxhash64("node", "lbl").cast("decimal(38,0)"))
        ).first()[0]

    prev_sig = _sig(labels)
    for _ in range(max_iter):
        # TWO propagation hops per materialization: the checkpoint and
        # the convergence action dominate each round's wall time (fixed
        # job latency, not data), so doubling the hop count halves the
        # number of driver round-trips for the same diameter coverage.
        labels = propagate(propagate(labels)).localCheckpoint()
        cur_sig = _sig(labels)
        if cur_sig == prev_sig:
            break
        prev_sig = cur_sig
    return labels.select(F.col("node"), F.col("lbl").alias("cluster_id"))


def paragraph_units(col: Column | str, tokens_per_para: int = 12) -> Column:
    """Fixed-size token chunks standing in for paragraphs: array of
    ``tokens_per_para``-token strings over normalized text.  Real corpora
    split on blank lines first; the downstream dedup is unit-agnostic."""
    toks = F.split(normalize_text(col), " ")
    n = F.ceil(F.size(toks) / F.lit(tokens_per_para)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(
            F.slice(toks, i * tokens_per_para + 1, tokens_per_para), " "),
    )


def paragraph_count(col: Column | str, tokens_per_para: int = 12) -> Column:
    """``size(paragraph_units(col))`` without materializing the units:
    just ``ceil(n_tokens / tokens_per_para)`` over the normalized token
    count — a pure arithmetic projection, so the per-doc totals branch of
    :func:`paragraph_dedup` never pays the O(text) slice/join transform a
    second time."""
    toks = F.split(normalize_text(col), " ")
    return F.ceil(F.size(toks) / F.lit(tokens_per_para)).cast("bigint")


def paragraph_dedup(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    tokens_per_para: int = 12) -> DataFrame:
    """C4-style corpus-level paragraph dedup: every repeated paragraph is
    kept only at its FIRST occurrence (lowest ``(doc_id, position)``);
    documents are reassembled from their surviving paragraphs.

    Scale shape: posexplode (narrow) → the winning OCCURRENCE (id, pos,
    para text) rides through a partial-aggregatable
    ``min(struct(id, pos, para))`` groupBy on the paragraph hash — since
    ``(id, pos)`` is unique the text never decides the ordering, it is
    just cargo — → per-doc totals as a NARROW ``size(units)`` projection
    (one row per doc already, no explode, no shuffle) → reassembly
    groupBy + a doc-keyed join of two per-doc frames.  A ``row_number`` window partitioned by the
    paragraph hash would serialize every copy of a hot boilerplate
    paragraph (the C4 motivation case — one paragraph repeated 10 M
    times) into a single window partition; the groupBy's map-side
    combine keeps at most one occurrence per hash per input partition,
    so the hot key is absorbed before the shuffle.  The full exploded
    corpus shuffles exactly once (by hash); everything after operates on
    deduplicated winners or two-column doc stats, and the final join is
    on the uniform doc id.  Nothing is ever joined corpus×corpus and no
    paragraph list is collected to the driver.

    Returns (id_col, n_paras, n_kept, text_kept).  A document whose
    every paragraph first appeared in an earlier document comes back
    with ``n_kept = 0`` and ``text_kept = ''``.
    """
    paras = df.select(
        F.col(id_col),
        F.posexplode(paragraph_units(text_col, tokens_per_para))
        .alias("pos", "para"),
    )
    winners = paras.groupBy(F.md5("para").alias("_ph")).agg(
        F.min(F.struct(F.col(id_col).alias("id"),
                       F.col("pos").alias("pos"),
                       F.col("para").alias("para"))).alias("w")
    )
    totals = df.select(
        F.col(id_col),
        paragraph_count(text_col, tokens_per_para).alias("n_paras"))
    kept_sorted = F.array_sort(
        F.collect_list(F.struct(F.col("w.pos").alias("pos"),
                                F.col("w.para").alias("para"))))
    kept_per_doc = winners.groupBy(F.col("w.id").alias(id_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(kept_sorted, lambda s: s.getField("para")), " "
        ).alias("text_kept"),
    )
    return totals.join(kept_per_doc, id_col, "left").select(
        id_col,
        "n_paras",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint"))
        .alias("n_kept"),
        F.coalesce(F.col("text_kept"), F.lit("")).alias("text_kept"),
    )


def incremental_dedup(new_docs: DataFrame, seen: DataFrame,
                      text_col: str = "text",
                      key_fn=None) -> DataFrame:
    """Dedup an incoming batch against a prior corpus snapshot: drop any
    new document whose content fingerprint already exists in ``seen``
    (a fingerprint store with a ``fingerprint`` column).

    ``key_fn(col) -> Column`` overrides the dedup key (default: the md5
    content fingerprint) — e.g. ``md5(canonicalize_url(col))`` turns
    this into URL-level dedup with the same store contract (round-9:
    the curation stage-0 composition).

    LEFT ANTI hash join on the md5 fingerprint — at 100 TB the store is
    far larger than any daily batch, so the batch side is the small side:
    Spark broadcasts it or AQE picks a shuffled hash join on the uniform
    key; either way the snapshot is scanned once, never materialized.
    Persist the store bucketed by fingerprint and the shuffle disappears
    entirely.
    """
    key = (key_fn or fingerprint)(text_col)
    # collision-proof working column: a user column literally named
    # '_fp' must survive untouched (round-10 seventh-pass review — the
    # reserved-name class fixed across the streaming sinks)
    fp = fresh_name(new_docs.columns, "_fp")
    return new_docs.withColumn(fp, key).join(
        seen.select(F.col("fingerprint").alias(fp)),
        fp, "left_anti",
    ).drop(fp)


def connected_components_star(nodes: DataFrame, pairs: DataFrame,
                              node_col: str = "node",
                              max_iter: int = 50) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the adversarial-graph alternative to :func:`connected_components`.

    Min-label propagation needs rounds proportional to the graph
    DIAMETER: a long duplicate chain (a₁~a₂~…~aₙ, the adversarial shape
    for pairwise dedup output) costs O(n) rounds.  The star operations
    contract chains doubly-logarithmically: large-star hangs every
    larger neighbor off its neighborhood's minimum, small-star re-hangs
    the smaller neighbors, and the edge set converges to direct
    node→component-min stars in O(log²) rounds.

    Physical shape per round: each star op is one groupBy(min) plus an
    equi-join back to the edge list — NO ``collect_list`` neighborhood
    materialization, so a celebrity node (every copy of a viral document
    paired with the canonical one) never builds a giant array; its
    neighborhood flows through the join as rows.  Same output contract
    as ``connected_components``: (node, cluster_id = component min).
    """
    # Same member-endpoint pre-filter as connected_components (r15): the
    # star ops relay labels through EVERY pair endpoint, so an endpoint
    # absent from `nodes` would both appear in the intermediate edge set
    # and connect member nodes it bridges — the final semi-join used to
    # hide the first symptom but not the second (nodes={2,7},
    # pairs={(2,5),(5,7)} must NOT connect 2-7 when 5 is not supplied).
    # Two semi-joins at setup, amortized over all O(log²) rounds; both
    # engines now share one contract and stay property-equal on graphs
    # with foreign endpoints.  The node set is checkpointed ONCE and
    # reused by both probes and the final singleton anti-join — the
    # nodes lineage (often a union/distinct over the pair pipeline)
    # used to re-execute per consumer.
    node_ids = nodes.select(F.col(node_col).alias("_cc_node")) \
        .localCheckpoint()
    member_pairs = (
        pairs.select("a", "b")
        .join(node_ids, F.col("a") == F.col("_cc_node"), "left_semi")
        .join(node_ids, F.col("b") == F.col("_cc_node"), "left_semi")
    )
    e0 = member_pairs.select(F.col("a").alias("u"), F.col("b").alias("v")) \
        .filter(F.col("u") != F.col("v"))

    def large_star(edges: DataFrame) -> DataFrame:
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("_mv")).select(
            "u", F.least("_mv", F.col("u")).alias("m")
        )
        return (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(edges: DataFrame) -> DataFrame:
        canon = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = canon.groupBy("u").agg(F.min("v").alias("_mv")).select(
            "u", F.least("_mv", F.col("u")).alias("m")
        )
        rehung = (
            canon.join(mins, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        self_edges = mins.where(F.col("u") != F.col("m")).select(
            "u", F.col("m").alias("v")
        )
        return rehung.union(self_edges).distinct()

    edges = e0.localCheckpoint()

    def _sig(e: DataFrame):
        # decimal accumulator: summing 64-bit hashes overflows BIGINT
        # under ANSI semantics.
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return row["n"], row["h"]

    prev = _sig(edges)
    # Small-graph coalesce gate, mirroring connected_components (r15):
    # the initial _sig already counted the materialized edge frame, so
    # the gate is free.  When the duplicate subgraph is tiny (the common
    # post-LSH case) collapse to one partition so each star round's
    # groupBy/join/distinct chain runs as single-task jobs under AQE
    # instead of 32-partition shuffle round-trips.  Only the EDGE frame
    # is gated — the star loop never touches `nodes`, and the edge set
    # can only shrink under star contraction, so the gate holds for
    # every later round.  Large graphs keep the parallel layout.
    if prev[0] <= 100_000:
        edges = edges.coalesce(1)
    converged = False
    for _ in range(max_iter):
        edges = small_star(large_star(edges)).localCheckpoint()
        cur = _sig(edges)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # At a fixpoint the edge set is min-rooted stars (one out-edge
        # per non-root node); returning a NON-converged set would emit
        # multiple differing labels per node — silently wrong cluster
        # counts downstream.  Fail loudly instead.  (Empirically the
        # alternation converges in well under 50 rounds even on huge
        # graphs; hitting the cap signals something pathological.)
        raise RuntimeError(
            f"connected_components_star did not converge within "
            f"{max_iter} rounds — raise max_iter"
        )

    # The member pre-filter above guarantees every star-edge endpoint is
    # a supplied node, so the labeled side needs no output semi-join
    # (the pre-r15 form filtered here instead — one extra join per
    # query, and it still relayed labels through foreign nodes).
    labels = edges.select(
        F.col("u").alias(node_col), F.col("v").alias("cluster_id")
    )
    singles = node_ids.select(F.col("_cc_node").alias(node_col)).join(
        labels.select(node_col), node_col, "left_anti"
    ).select(F.col(node_col), F.col(node_col).alias("cluster_id"))
    return labels.union(singles)


def duplicate_span_stats(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 8) -> DataFrame:
    """Cross-document repeated-span detection at fixed k-token
    granularity — the distributable approximation of suffix-array
    ExactSubstr dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): every duplicated run of ≥ k tokens
    contains at least one duplicated k-token window, so the k-gram pass
    finds a superset of the suffix-array hits at window granularity and
    a span-removal step can trim from there.

    Returns one row per repeated span: ``(span_hash, n_docs, n_occ)``
    for spans occurring in ≥ 2 distinct documents (``n_occ`` counts all
    occurrences, including intra-document repeats).

    Physical shape: the token split is STAGED once per row, the k
    windows are a narrow higher-order ``transform`` over index
    ``sequence`` (no join, no window function), and the only shuffle is
    one groupBy on the 128-bit span hash.  The hash key is uniform
    ACROSS spans; a single boilerplate span repeated millions of times
    is one hot KEY, which partial (map-side) count/distinct aggregation
    absorbs before the exchange — unlike a row_number window, no
    single-task straggler.  At 100 TB the gram explosion is ~n_tokens
    rows per doc; spans travel as md5 hashes (16 bytes), never as
    strings.
    """
    d = df.select(
        F.col(id_col),
        F.split(normalize_text(text_col), " ").alias("_toks"),
    ).filter(F.size("_toks") >= k)
    idx = F.sequence(F.lit(0), F.size("_toks") - k)
    grams = F.transform(
        idx,
        lambda i: word_kgram_hash("_toks", i, k),
    )
    return (
        d.select(F.col(id_col), F.explode(grams).alias("span_hash"))
        .groupBy("span_hash")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def remove_duplicate_spans(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 8,
                           cross_doc_only: bool = False) -> DataFrame:
    """The REMOVAL half of ExactSubstr dedup (Lee et al. 2022): cut
    every repeated k-token window except its globally FIRST occurrence
    (minimum ``(doc_id, position)``).  Overlapping duplicated windows
    merge naturally — removal is position-based, so a 40-token
    duplicated run marked by 33 of its k-windows is cut once, not 33
    times.

    SEMANTICS NOTE — this defaults to true ExactSubstr scope: ANY
    repetition in the corpus counts, *including a span repeated twice
    inside one document* (self-plagiarized boilerplate is duplication
    too).  :func:`duplicate_span_stats` by contrast histograms only
    CROSS-document spans (``n_docs >= 2``), so its output undercounts
    what this transform cuts.  Pass ``cross_doc_only=True`` to restrict
    removal to spans appearing in ≥ 2 distinct documents — then the
    stats histogram and the removal impact line up exactly.

    Returns the input columns with ``text`` rewritten (duplicated-span
    tokens dropped, single-space rejoined over the NORMALIZED tokens)
    plus ``n_tokens_removed``.

    Physical shape, corpus-sized stages only:
      1. narrow gram fan-out (posexplode of the k-window hash array).
         The fan-out is evaluated TWICE (winners agg + losers join) on
         purpose: a materialized occurrence stream is ~7× the corpus
         bytes (44 B/token of hashes vs ~6 B/token of text), so at
         100 TB recomputing the narrow explode from the scan is cheaper
         than writing it to local disk — the opposite trade from
         ``semdedup_labels``'s checkpoint, whose assignment frame is
         SMALLER than its input;
      2. ONE groupBy on the span hash computing the global winner via
         partial-aggregatable ``min(struct(doc_id, pos))`` AND the
         occurrence count — hot boilerplate spans are absorbed map-side
         (never a window function, the r4 lesson);
      3. loser occurrences → per-doc covered-position sets: one groupBy
         on the uniform doc id (``collect_set`` is bounded by the doc's
         own token count);
      4. LEFT join back to the corpus on doc id — only affected docs
         carry a removal set; untouched docs pass through.
    """
    toks = F.split(normalize_text(text_col), " ")
    d = df.withColumn("_toks", toks)
    idx = F.sequence(F.lit(0), F.size("_toks") - k)
    grams = F.transform(
        idx, lambda i: F.struct(
            i.alias("pos"),
            word_kgram_hash("_toks", i, k).alias("h"),
        ),
    )
    occ = (
        d.filter(F.size("_toks") >= k)
        .select(F.col(id_col), F.explode(grams).alias("g"))
        .select(id_col, F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    )
    aggs = [
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("w"),
        F.count(F.lit(1)).alias("n_occ"),
    ]
    dup_pred = F.col("n_occ") >= 2
    if cross_doc_only:
        aggs.append(F.countDistinct(id_col).alias("n_docs"))
        dup_pred = dup_pred & (F.col("n_docs") >= 2)
    winners = occ.groupBy("h").agg(*aggs).filter(dup_pred).select(
        "h", F.col(f"w.{id_col}").alias("_wdoc"), F.col("w.pos").alias("_wpos"),
    )
    losers = (
        occ.join(winners, "h")
        .filter(~((F.col(id_col) == F.col("_wdoc"))
                  & (F.col("pos") == F.col("_wpos"))))
        .select(id_col, "pos")
    )
    covered = losers.groupBy(id_col).agg(
        F.array_distinct(
            F.flatten(
                F.collect_list(F.sequence(F.col("pos"),
                                          F.col("pos") + (k - 1)))
            )
        ).alias("_cut")
    )
    out_cols = [c for c in df.columns if c != text_col]
    kept = F.filter(
        F.col("_toks"),
        lambda x, i: ~F.coalesce(
            F.array_contains("_cut", i), F.lit(False)),
    )
    return (
        d.join(covered, id_col, "left")
        .select(
            *out_cols,
            F.concat_ws(" ", F.when(F.col("_cut").isNull(), F.col("_toks"))
                        .otherwise(kept)).alias(text_col),
            F.coalesce(F.size("_cut"), F.lit(0)).alias("n_tokens_removed"),
        )
    )


def winnowing_fingerprints(df: DataFrame, k: int = 4, w: int = 4,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm): hash every token ``k``-gram, slide a
    ``w``-hash window, and select each window's minimum hash (rightmost
    on ties).  The selected (hash, position) pairs are the document's
    fingerprints: any shared substring of at least ``w + k - 1`` tokens
    is GUARANTEED to contribute a shared fingerprint, while expected
    density is only 2/(w+1) — the local, position-robust alternative to
    MinHash when match *location* matters (plagiarism/provenance).

    Output: one row per distinct fingerprint — (id, ``h`` 32-bit
    md5-derived hash, ``p`` 0-based gram position, ``n_grams`` the
    document's gram count, constant per document so downstream stats
    never re-tokenize).  Documents shorter than ``k`` tokens have no
    grams and emit nothing; documents with fewer than ``w`` grams are
    one window (their global min).

    Scale: the whole selection is per-document array math — tokenize,
    gram-hash, window-fold, distinct — a SINGLE narrow map stage, no
    shuffle of any kind.  Downstream match-finding is one groupBy on
    the fingerprint hash (partial-agg, bounded skew: one row per doc
    per hash)."""
    from .text import normalize_text

    t = F.split(normalize_text(text_col), " ")
    grams = F.expr(
        f"transform(sequence(1, size(__t) - {k} + 1),"
        f" i -> cast(conv(substr(md5(array_join(slice(__t, i, {k}), ' ')),"
        f" 1, 8), 16, 10) as bigint))"
    )
    # (hash, −position) structs: array_min then yields the minimum hash
    # with the RIGHTMOST position on ties (the winnowing tie rule).
    gz = F.expr(
        "transform(sequence(1, size(__g)),"
        " i -> struct(try_element_at(__g, i) as h, -(i - 1) as np))")
    wins = F.expr(
        f"transform(sequence(1, greatest(size(__gz) - {w}, 0) + 1),"
        f" j -> array_min(slice(__gz, j, {w})))")
    return (
        df.select(id_col, t.alias("__t"))
        .filter(F.size("__t") >= k)
        .select(id_col, grams.alias("__g"))
        .select(id_col, F.size("__g").alias("n_grams"), gz.alias("__gz"))
        .select(id_col, "n_grams",
                F.explode(F.array_distinct(wins)).alias("__fp"))
        .select(id_col, F.col("__fp.h").alias("h"),
                (-F.col("__fp.np")).alias("p"), "n_grams")
    )
