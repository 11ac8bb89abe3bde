"""Deduplication queries (exact, MinHash signatures, LSH candidate pairs,
n-gram Jaccard, SimHash) over ``documents``.

Hashes are md5-derived throughout so the DuckDB oracle recomputes
signatures byte-for-byte (see ``operators/dedup.py`` module doc).  The
pair-generating queries restrict to a deterministic document subset —
they are the *verification* stage of a dedup pipeline; at 100 TB they run
after LSH pruning, never on the raw corpus crossproduct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.dedup import (
    connected_components,
    exact_dedup,
    lsh_pairs_from_bands,
    minhash_band_keys,
    minhash_signatures,
    minhash_vector,
    ngram_jaccard_pairs,
    simhash,
)
from . import query

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

# Shared oracle CTE: normalized docs → distinct word 3-gram shingles.
# list_slice mirrors concat_ws-over-element_at (short docs yield their
# full token list as one shingle on both sides).
def _shingle_cte(where: str) -> str:
    return f"""
    docs AS (
        SELECT doc_id, string_split({_NORM}, ' ') AS t
        FROM documents {where}
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(t, i, i + 2), ' ') AS shingle
        FROM docs,
             LATERAL (SELECT unnest(generate_series(1, greatest(len(t) - 2, 1)))
                      AS i) g
    )"""


@query(
    "exact_dedup_stats",
    oracle=f"""
    WITH keep AS (
        SELECT min(doc_id) AS doc_id
        FROM documents
        GROUP BY md5({_NORM})
    )
    SELECT d.source, count(*) AS kept_docs
    FROM documents d JOIN keep k ON d.doc_id = k.doc_id
    GROUP BY d.source
    """,
)
def exact_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest-id representative per fingerprint
    group.  When only the representative's columns are needed (not the
    whole row), ``min_by`` under a hash aggregate does it in ONE
    map-side-combined shuffle; ``operators/dedup.py::exact_dedup`` uses
    the same groupBy-winner shape plus a composite-key semi-join when
    the full surviving rows are required."""
    from ..operators.text import fingerprint

    d = table(spark, sf_dir, "documents", parallel=True)
    return (
        d.groupBy(fingerprint("text").alias("_fp"))
        .agg(F.min_by("source", "doc_id").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("kept_docs"))
    )


@query(
    "minhash_signatures",
    oracle=f"""
    WITH {_shingle_cte("WHERE doc_id % 5 = 0")}
    SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS minhash
    FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) s
    GROUP BY doc_id, seed
    """,
)
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 hash functions over word 3-gram shingles).
    min is lexicographic over md5 hex — portable across engines."""
    d = table(spark, sf_dir, "documents", parallel=True).filter(F.col("doc_id") % 5 == 0)
    return minhash_signatures(d, num_hashes=8)


@query(
    "minhash_lsh_pairs",
    oracle=f"""
    WITH {_shingle_cte("WHERE doc_id % 5 = 0")},
    sig AS (
        SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS minhash
        FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) s
        GROUP BY doc_id, seed
    ),
    banded AS (
        SELECT doc_id, seed // 2 AS band,
               string_agg(minhash, '|' ORDER BY minhash) AS band_key
        FROM sig GROUP BY doc_id, seed // 2
    )
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM banded x JOIN banded y
      ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id
    """,
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding (4 bands × 2 rows): near-dup candidate pairs via
    equi-join on (band, band_key) — no corpus crossproduct."""
    d = table(spark, sf_dir, "documents", parallel=True).filter(F.col("doc_id") % 5 == 0)
    # narrow band keys: the only exchange left is the candidate join
    return lsh_pairs_from_bands(minhash_band_keys(d, num_hashes=8))


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH {_shingle_cte("WHERE doc_id % 10 = 0")},
    shc AS (
        SELECT * FROM sh
        WHERE shingle NOT IN (
            SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 50
        )
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
    inter AS (
        SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter_sz
        FROM shc x JOIN shc y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id
    )
    SELECT a, b,
           round(inter_sz / (sa.sz + sb.sz - inter_sz), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = a
    JOIN sizes sb ON sb.doc_id = b
    WHERE inter_sz / (sa.sz + sb.sz - inter_sz) >= 0.1
    """,
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing ≥1 shingle (threshold 0.1)
    with a doc-frequency cut at 50: stop-word shingles (df > 50) leave the
    shingle space before the self-join, bounding per-key fan-out so the
    standalone form survives corpus skew (VERDICT r1 #5).  Post-LSH
    verifier use passes ``max_doc_freq=None`` for exact semantics."""
    d = table(spark, sf_dir, "documents", parallel=True).filter(F.col("doc_id") % 10 == 0)
    return ngram_jaccard_pairs(d, threshold=0.1, max_doc_freq=50)


@query(
    "simhash_signatures",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, string_split({_NORM}, ' ') AS t
        FROM documents WHERE doc_id % 5 = 0
    ),
    toks AS (SELECT doc_id, unnest(t) AS tok FROM docs),
    votes AS (
        SELECT doc_id, b.bit,
               CASE WHEN (CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)
                          // CAST(power(2, b.bit) AS BIGINT)) % 2 = 1
                    THEN 1 ELSE -1 END AS vote
        FROM toks CROSS JOIN
             (SELECT unnest(generate_series(0, 15)) AS bit) b
    ),
    bits AS (
        SELECT doc_id, bit,
               CASE WHEN sum(vote) > 0 THEN 1 ELSE 0 END AS bitval
        FROM votes GROUP BY doc_id, bit
    )
    SELECT doc_id,
           CAST(sum(bitval * CAST(power(2, bit) AS BIGINT)) AS BIGINT)
               AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash (per-bit majority over md5-hashed word tokens)."""
    d = table(spark, sf_dir, "documents", parallel=True).filter(F.col("doc_id") % 5 == 0)
    return simhash(d, bits=16)


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_shingle_cte("WHERE doc_id % 5 = 0")},
    sig AS (
        SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS minhash
        FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) s
        GROUP BY doc_id, seed
    ),
    banded AS (
        SELECT doc_id, seed // 2 AS band,
               string_agg(minhash, '|' ORDER BY minhash) AS band_key
        FROM sig GROUP BY doc_id, seed // 2
    ),
    pairs AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM banded x JOIN banded y
          ON x.band = y.band AND x.band_key = y.band_key
             AND x.doc_id < y.doc_id
    ),
    edges AS (
        SELECT a AS src, b AS dst FROM pairs
        UNION SELECT b, a FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT doc_id, doc_id FROM documents WHERE doc_id % 5 = 0
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, min(lbl) AS cluster_id
    FROM reach GROUP BY node
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup resolution: MinHash → LSH candidate pairs →
    connected components → one ``cluster_id`` per document (the min
    doc_id reachable through shared-bucket pairs).  Downstream dedup is
    then ``row_number() over (partition by cluster_id) = 1``.  The
    DuckDB oracle replays the same fixpoint with a recursive CTE."""
    d = table(spark, sf_dir, "documents", parallel=True).filter(
        F.col("doc_id") % 5 == 0
    )
    pairs = lsh_pairs_from_bands(minhash_band_keys(d, num_hashes=8))
    return connected_components(
        d.select("doc_id"), pairs, node_col="doc_id"
    ).withColumnRenamed("node", "doc_id")


@query(
    "paragraph_dedup_stats",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split({_NORM}, ' ') AS t
        FROM documents WHERE doc_id % 4 = 0
    ),
    paras AS (
        SELECT doc_id, i AS pos,
               array_to_string(list_slice(t, i * 12 + 1, i * 12 + 12), ' ')
                   AS para
        FROM toks,
             LATERAL (SELECT unnest(generate_series(0,
                          CAST(ceil(len(t) / 12.0) AS INT) - 1)) AS i) g
    ),
    ranked AS (
        SELECT doc_id, pos, para,
               row_number() OVER (
                   PARTITION BY md5(para) ORDER BY doc_id, pos
               ) AS rn
        FROM paras
    )
    SELECT doc_id, count(*) AS n_paras,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           md5(coalesce(string_agg(CASE WHEN rn = 1 THEN para END, ' '
                                   ORDER BY pos), '')) AS kept_md5
    FROM ranked GROUP BY doc_id
    """,
)
def paragraph_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-level paragraph dedup: repeated paragraphs (12-token
    units here — synthetic docs have no newlines) survive only at their
    first (doc_id, pos) occurrence; docs are reassembled from survivors.
    One skew-free window shuffle on md5(para) + one groupBy(doc) —
    nothing pairwise, nothing driver-side (see
    ``operators/dedup.py::paragraph_dedup``)."""
    from ..operators.dedup import paragraph_dedup

    d = table(spark, sf_dir, "documents", parallel=True).filter(
        F.col("doc_id") % 4 == 0
    )
    out = paragraph_dedup(d, tokens_per_para=12)
    return out.select(
        "doc_id", "n_paras", "n_kept",
        F.md5("text_kept").alias("kept_md5"),
    )


@query(
    "incremental_dedup_batch",
    oracle=f"""
    WITH seen AS (
        SELECT DISTINCT md5({_NORM}) AS fingerprint
        FROM documents WHERE doc_id % 7 <> 0
    ),
    batch AS (
        SELECT doc_id, source, md5({_NORM}) AS fp
        FROM documents WHERE doc_id % 7 = 0
    )
    SELECT b.doc_id, b.source
    FROM batch b LEFT JOIN seen s ON b.fp = s.fingerprint
    WHERE s.fingerprint IS NULL
    """,
)
def incremental_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: an incoming batch (doc_id % 7 = 0) is
    anti-joined against the fingerprint store of everything already
    ingested — the shape a daily pipeline runs so re-crawled content
    never re-enters training data (``operators/dedup.py::
    incremental_dedup``)."""
    from ..operators.dedup import incremental_dedup
    from ..operators.text import fingerprint

    docs = table(spark, sf_dir, "documents", parallel=True)
    seen = docs.filter(F.col("doc_id") % 7 != 0).select(
        fingerprint("text").alias("fingerprint")).distinct()
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    return incremental_dedup(batch, seen).select("doc_id", "source")


_WIN_K, _WIN_W = 4, 4
from .sampling import _hex8_to_int_sql as _hex8_sql  # noqa: E402


@query(
    "winnowing_fingerprint_stats",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
    ),
    g AS (
        SELECT doc_id, i - 1 AS p,
               {_hex8_sql(f"md5(array_to_string("
                          f"list_slice(t, i, i + {_WIN_K} - 1), ' '))")} AS h
        FROM docs,
             LATERAL (SELECT unnest(generate_series(1, len(t) - {_WIN_K} + 1))
                      AS i) q
        WHERE len(t) >= {_WIN_K}
    ),
    gc AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id),
    ws AS (SELECT doc_id, unnest(generate_series(0, greatest(ng - {_WIN_W},
                                                             0))) AS j
           FROM gc),
    wg AS (SELECT ws.doc_id, ws.j, g.h, g.p
           FROM ws JOIN g ON g.doc_id = ws.doc_id
                         AND g.p BETWEEN ws.j AND ws.j + {_WIN_W} - 1),
    sel AS (SELECT doc_id, h, p FROM (
                SELECT doc_id, j, h, p, row_number() OVER (
                    PARTITION BY doc_id, j ORDER BY h, p DESC) AS rn
                FROM wg)
            WHERE rn = 1),
    fps AS (SELECT DISTINCT doc_id, h, p FROM sel),
    fpc AS (SELECT doc_id, count(*) AS n_fingerprints
            FROM fps GROUP BY doc_id),
    dh AS (SELECT DISTINCT doc_id, h FROM fps),
    hd AS (SELECT h, count(*) AS nd FROM dh GROUP BY h),
    per AS (SELECT dh.doc_id, count(*) AS n_hashes,
                   CAST(sum(CASE WHEN hd.nd >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_shared_hashes
            FROM dh JOIN hd USING (h) GROUP BY dh.doc_id)
    SELECT gc.doc_id,
           CAST(greatest(gc.ng - {_WIN_W}, 0) + 1 AS BIGINT) AS n_windows,
           fpc.n_fingerprints, per.n_hashes, per.n_shared_hashes
    FROM gc JOIN fpc USING (doc_id) JOIN per USING (doc_id)
    """,
)
def winnowing_fingerprint_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint selection over every document —
    4-token grams, 4-hash windows, min-hash-rightmost-tie selection
    (``operators/dedup.py::winnowing_fingerprints``) — plus the match
    primitive: how many of each document's fingerprint hashes are
    shared with at least one other document.  The oracle replays gram
    hashing, window argmin (including the rightmost-tie rule), distinct
    selection, and cross-document sharing end-to-end.

    Scale: selection is a single narrow map stage (per-document array
    math, zero shuffles); the sharing rollup is one partial-agg groupBy
    on the fingerprint hash (≤1 row per doc per hash — bounded skew)."""
    from ..operators.dedup import winnowing_fingerprints

    d = table(spark, sf_dir, "documents", parallel=True)
    fps = winnowing_fingerprints(d, k=_WIN_K, w=_WIN_W)
    # The fingerprint rows carry the document gram count, so window
    # totals come from the same pass — the corpus is tokenized ONCE.
    fpc = fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        (F.greatest(F.max("n_grams") - _WIN_W, F.lit(0)) + 1)
        .cast("bigint").alias("n_windows"),
    ).select("doc_id", "n_windows", "n_fingerprints")
    dh = fps.select("doc_id", "h").distinct()
    hd = dh.groupBy("h").agg(F.count(F.lit(1)).alias("nd"))
    per = dh.join(hd, "h").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).cast("bigint")
        .alias("n_shared_hashes"),
    )
    return fpc.join(per, "doc_id")


@query(
    "minhash_calibration",
    oracle=f"""
    WITH {_shingle_cte("WHERE doc_id % 5 = 0")},
    sig AS (
        SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS minhash
        FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) s
        GROUP BY doc_id, seed
    ),
    banded AS (
        SELECT doc_id, seed // 2 AS band,
               string_agg(minhash, '|' ORDER BY minhash) AS band_key
        FROM sig GROUP BY doc_id, seed // 2
    ),
    pairs AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM banded x JOIN banded y
          ON x.band = y.band AND x.band_key = y.band_key
             AND x.doc_id < y.doc_id
    ),
    agree AS (
        SELECT p.a, p.b,
               round(sum(CASE WHEN xa.minhash = xb.minhash
                              THEN 1 ELSE 0 END) / 8.0, 4) AS est_jaccard
        FROM pairs p
        JOIN sig xa ON xa.doc_id = p.a
        JOIN sig xb ON xb.doc_id = p.b AND xb.seed = xa.seed
        GROUP BY p.a, p.b
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT p.a, p.b, count(*) AS i
        FROM pairs p
        JOIN sh x ON x.doc_id = p.a
        JOIN sh y ON y.doc_id = p.b AND y.shingle = x.shingle
        GROUP BY p.a, p.b
    )
    SELECT ag.a, ag.b, ag.est_jaccard,
           round(coalesce(i.i, 0)
                 / (sa.sz + sb.sz - coalesce(i.i, 0)), 6) AS exact_jaccard
    FROM agree ag
    LEFT JOIN inter i ON i.a = ag.a AND i.b = ag.b
    JOIN sizes sa ON sa.doc_id = ag.a
    JOIN sizes sb ON sb.doc_id = ag.b
    """,
)
def minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator calibration for the dedup stack (the family's analog
    of ``ann_recall_eval``): for every LSH candidate pair, the MinHash
    Jaccard ESTIMATE (fraction of agreeing seeds, the unbiased
    estimator the banding decision rests on) next to the EXACT shingle
    Jaccard — the eval run before trading bands/rows against recall in
    production.

    Scale: pairs come from banding (never corpus²); both the agreement
    join (pairs × 8 seed rows) and the exact verifier run on CANDIDATE
    pairs only — the whole-corpus work stays the one signature groupBy
    each side already pays."""
    d = table(spark, sf_dir, "documents", parallel=True).filter(
        F.col("doc_id") % 5 == 0)
    # narrow vectors both for banding and for the agreement estimate:
    # est = |{s: ha[s]==hb[s]}| / 8 computed per candidate row with
    # zip_with — no per-seed explode, no agreement groupBy exchange
    # (round-14 optimization; byte-identical to the per-seed-row form)
    wide = minhash_vector(d, num_hashes=8)
    pairs = lsh_pairs_from_bands(minhash_band_keys(d, num_hashes=8))
    wa = wide.select(F.col("doc_id").alias("a"),
                     F.col("_mh").alias("_mha"))
    wb = wide.select(F.col("doc_id").alias("b"),
                     F.col("_mh").alias("_mhb"))
    est = (
        pairs.join(wa, "a").join(wb, "b")
        .select(
            "a", "b",
            F.round(
                F.size(F.filter(
                    F.zip_with("_mha", "_mhb", lambda x, y: x == y),
                    lambda m: m))
                / F.lit(8.0), 4).alias("est_jaccard"),
        )
    )
    from ..operators.text import with_word_ngrams

    sh = with_word_ngrams(d, "text", 3, keep=("doc_id",), distinct=True) \
        .select("doc_id", F.explode("grams").alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        pairs
        .join(sh.select(F.col("doc_id").alias("a"), "shingle"), "a")
        .join(sh.select(F.col("doc_id").alias("b"), "shingle"),
              ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        est.join(inter, ["a", "b"], "left")
        .join(sizes.select(F.col("doc_id").alias("a"),
                           F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"),
                           F.col("sz").alias("szb")), "b")
        .select(
            "a", "b", "est_jaccard",
            F.round(
                F.coalesce(F.col("i"), F.lit(0))
                / (F.col("sza") + F.col("szb")
                   - F.coalesce(F.col("i"), F.lit(0))), 6)
            .alias("exact_jaccard"),
        )
    )
