"""Dataset-management operators for training-data pipelines:
deterministic splits and samples.

A 100 TB corpus can't be split with ``rand()`` — the assignment must be
(a) reproducible across runs/engines, (b) stable under re-partitioning,
(c) derivable per-row with no global state.  Content-hash bucketing
gives all three: ``md5(key)`` is identical in any engine, so DuckDB
verifies the exact split.  (Same rationale as the reference's
deterministic output keys, ``securityhub_collector.py:45`` —
``{ProductArn}-{request_id}`` — determinism via keys, not randomness.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from . import query

def _split_col():
    """First hex nibble of md5(doc_id): 0-b → train (75%), c-d → val
    (12.5%), e-f → test (12.5%)."""
    nibble = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return (
        F.when(nibble.isin(*"0123456789ab"), "train")
        .when(nibble.isin("c", "d"), "val")
        .otherwise("test")
    )


@query(
    "dataset_hash_split",
    oracle="""
    WITH tagged AS (
        SELECT CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                   THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN ('c','d') THEN 'val'
                 ELSE 'test'
               END AS split,
               n_chars, lang
        FROM documents
    )
    SELECT split, lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
    FROM tagged
    GROUP BY 1, 2
    """,
)
def dataset_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 75/12.5/12.5 train/val/test split by content-hash
    nibble, stratification check by language — every engine reproduces
    the same assignment, so splits survive re-sharding and backfills."""
    d = table(spark, sf_dir, "documents")
    return (
        d.withColumn("split", _split_col())
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            # Unrounded bigint/bigint double division is IEEE-identical in
            # Spark and DuckDB; symmetric round(_, 4) reintroduced a
            # half-up-vs-half-even tie risk at the 5th decimal for no gain.
            (F.sum("n_chars").cast("double") / F.count(F.lit(1)))
            .alias("avg_chars"),
        )
    )


@query(
    "sample_by_hash",
    oracle="""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '19'
    """,
)
def sample_by_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample: first md5 byte ≤ 0x19 (26/256).  Unlike
    ``TABLESAMPLE``/``rand()`` the membership is a pure row property —
    the same rows are sampled on every run, any partitioning, any
    engine; downstream joins against the sample stay consistent."""
    d = table(spark, sf_dir, "documents")
    return d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) <= "19"
    ).select("doc_id", "source", "n_chars")


@query(
    "stratified_hash_sample",
    oracle="""
    WITH ranked AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT source, count(*) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS sampled_chars
    FROM ranked WHERE rn <= 20
    GROUP BY source
    """,
)
def stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N-per-stratum sample (20 docs per source), ordered by
    content hash so the choice is deterministic yet unbiased by insert
    order.  One window shuffle on the stratum key; at scale prefer the
    threshold sample (``sample_by_hash``) when exact-N isn't required,
    since it needs no shuffle at all."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
        )
    )


@query(
    "domain_mixture_sample",
    oracle="""
    WITH tok AS (
        SELECT doc_id, source,
               len(string_split_regex(trim(text), '\\s+')) AS n_tok
        FROM documents
    ),
    tot AS (
        SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tokens
        FROM tok GROUP BY source
    ),
    r AS (
        SELECT source,
               (SELECT CAST(min(src_tokens) AS BIGINT) FROM tot)
                   / src_tokens AS rate
        FROM tot
    ),
    kept AS (
        SELECT t.source, t.n_tok, r.rate
        FROM tok t JOIN r USING (source)
        WHERE ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 4))::BIGINT
              / 65536.0 < r.rate
    )
    SELECT source, round(min(rate), 6) AS rate,
           count(*) AS n_kept,
           CAST(sum(n_tok) AS BIGINT) AS kept_tokens
    FROM kept GROUP BY source
    """,
)
def domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: downsample every source to the token
    budget of the smallest source (equal-token mixture, no upsampling) —
    the "data mixing" step of a training pipeline.

    Two tiny aggregations (per-source token totals, global min) come
    back as a broadcast; membership is then a pure row property —
    md5-fraction below the per-source rate — so the corpus pass is
    narrow, reproducible across engines, and stable under resharding.
    The only corpus-sized shuffle is the final per-source stats agg.
    """
    from ..operators.text import token_count

    d = table(spark, sf_dir, "documents", parallel=True)
    tok = token_count("text")
    totals = d.groupBy("source").agg(F.sum(tok).alias("src_tokens"))
    target = totals.agg(F.min("src_tokens").alias("target_tokens"))
    rates = totals.crossJoin(F.broadcast(target)).select(
        "source",
        (F.col("target_tokens") / F.col("src_tokens")).alias("rate"),
    )
    frac = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
        ).cast("double")
        / 65536.0
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter(frac < F.col("rate"))
        .groupBy("source")
        .agg(
            F.round(F.min("rate"), 6).alias("rate"),
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(tok).alias("kept_tokens"),
        )
    )


@query(
    "quality_binned_sample",
    oracle="""
    WITH feat AS (
        SELECT doc_id,
               len(string_split(trim(regexp_replace(lower(text),
                   '\\s+', ' ', 'g')), ' ')) AS n_tokens
        FROM documents
    ),
    binned AS (
        SELECT doc_id, n_tokens,
               CASE WHEN n_tokens < 40 THEN 'short'
                    WHEN n_tokens < 80 THEN 'medium'
                    ELSE 'long' END AS bin,
               CASE WHEN n_tokens < 40 THEN '0c'
                    WHEN n_tokens < 80 THEN '3f'
                    ELSE 'ff' END AS cut
        FROM feat
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(sum(n_tokens) AS BIGINT) AS sampled_tokens
    FROM binned
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= cut
    GROUP BY bin
    """,
)
def quality_binned_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-style quality-binned sampling: documents are binned by
    a quality proxy (token count: short/medium/long) and each bin gets a
    different deterministic sampling rate — 5% of short docs (md5 prefix
    ≤ 0x0c), 25% of medium (≤ 0x3f), 100% of long.  The standard "keep
    all high-quality, downsample the tail" recipe for assembling a
    training mix.

    Scale: binning and membership are pure row-local expressions (no
    quantile job, no rand(), no shuffle before the final rollup) and the
    per-bin rollup is a 3-group map-side-combined count — ONE exchange
    total, any corpus size, reproducible on any engine."""
    d = table(spark, sf_dir, "documents", parallel=True)
    from ..operators.text import token_count, normalize_text

    n_tokens = token_count(normalize_text(F.col("text")))
    binned = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.when(n_tokens < 40, "short")
        .when(n_tokens < 80, "medium")
        .otherwise("long").alias("bin"),
        F.when(n_tokens < 40, "0c")
        .when(n_tokens < 80, "3f")
        .otherwise("ff").alias("cut"),
    )
    return (
        binned.filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
            <= F.col("cut"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
             F.sum("n_tokens").cast("bigint").alias("sampled_tokens"))
    )


def _hex8_to_int_sql(hexpr: str) -> str:
    """DuckDB SQL for Spark's ``conv(substr(<hex>, 1, 8), 16, 10)``:
    positional strpos arithmetic over the first 8 hex chars (DuckDB has
    no base-conv builtin).  ``hexpr`` must be a 32-char hex expression."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({hexpr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"CAST({terms} AS BIGINT)"


_SHARD_NORM = ("trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))")
_SHARD_HASH = _hex8_to_int_sql("md5(CAST(doc_id AS VARCHAR))")
_ROW_HASH = _hex8_to_int_sql(
    "md5(concat_ws(chr(31), shard, doc_id, text))")


@query(
    "shard_plan",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, text,
               CAST({_SHARD_HASH} % 8 AS INT) AS shard,
               len(string_split({_SHARD_NORM}, ' ')) AS n_tokens
        FROM documents
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum({_ROW_HASH}) AS BIGINT) AS content_checksum
    FROM b GROUP BY shard
    """,
)
def shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data export plan: deterministic md5-mod shard
    assignment + per-shard manifest rows (count, token total,
    order-independent content checksum).  The write itself
    (``operators/shards.py::write_training_shards``) streams one file
    per shard via partitionBy with an O(n_shards) driver manifest; this
    query hard-signal-verifies the assignment and checksum math."""
    from ..operators.shards import shard_assignments, shard_manifest

    d = table(spark, sf_dir, "documents", parallel=True)
    return shard_manifest(shard_assignments(d, n_shards=8))


_CAP_K = 10


@query(
    "domain_quality_caps",
    oracle=f"""
    WITH ranked AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source
                   ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rn <= {_CAP_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN rn <= {_CAP_K} THEN n_chars ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM ranked GROUP BY source
    """,
)
def domain_quality_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document caps (the FineWeb-style guard against any
    one domain flooding the mix): keep at most 10 documents per
    source, ranked by a quality proxy (length, doc_id tiebreak), and
    account kept/total per domain.

    Scale: ONE window shuffle keyed by the domain.  Unlike content-hash
    dedup keys, the domain key set is the partition landscape the
    pipeline is explicitly balancing — a domain hot enough to skew this
    window is exactly the domain the cap exists to cut, and the
    row_number lowers to WindowGroupLimit-style rank-then-filter with
    the cap applied during the scan of each group, never materializing
    the full ranked domain.  (A truly adversarial single-domain corpus
    would use the two-phase budget plan of ``operators/budgets.py``.)"""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents", parallel=True)
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), "doc_id")
    ranked = d.select("source", "n_chars",
                      F.row_number().over(w).alias("rn"))
    keep = F.col("rn") <= _CAP_K
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(keep, F.col("n_chars")).otherwise(0)).cast("bigint")
        .alias("kept_chars"),
    )


_ES_K = 25
_ES_U = (
    "(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    " / 4294967296.0)"
)


@query(
    "weighted_reservoir_sample",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               power({_ES_U}, 1.0 / n_chars) AS k
        FROM documents
    )
    SELECT doc_id, n_chars, round(k, 6) AS es_key
    FROM keyed
    ORDER BY round(k, 9) DESC, doc_id
    LIMIT {_ES_K}
    """,
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis–Spirakis A-ES:
    each row gets key u^(1/w) (weight w = n_chars) and the global top-k
    keys are the sample — longer documents proportionally likelier.

    The textbook algorithm uses rand(); at 100 TB that breaks
    reproducibility, so u is the md5 fraction of the row key — the same
    determinism-via-hashing the split/sample family uses, which also
    lets DuckDB replay the identical draw.  The top-k lowers to
    TakeOrderedAndProject: per-partition heaps of k, no global sort.
    Ranking compares the key rounded to 9 places (engine-identical by
    construction) with the doc_id tiebreak.
    """
    d = table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        / F.lit(4294967296.0)
    )
    keyed = d.select(
        "doc_id", "n_chars",
        F.pow(u, F.lit(1.0) / F.col("n_chars")).alias("k"),
    )
    return (
        keyed.orderBy(F.round("k", 9).desc(), "doc_id")
        .limit(_ES_K)
        .select("doc_id", "n_chars", F.round("k", 6).alias("es_key"))
    )


@query(
    "split_leakage_audit",
    oracle="""
    WITH doc_level AS (
        SELECT source,
               CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                   THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN ('c','d') THEN 'val'
                 ELSE 'test'
               END AS doc_split,
               CASE
                 WHEN substr(md5(source), 1, 1)
                      IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                   THEN 'train'
                 WHEN substr(md5(source), 1, 1)
                      IN ('c','d') THEN 'val'
                 ELSE 'test'
               END AS group_split
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT doc_split) AS BIGINT) AS n_doc_splits,
           any_value(group_split) AS group_split,
           (count(DISTINCT doc_split) > 1) AS leaks_across_splits
    FROM doc_level
    GROUP BY source
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-leakage audit of train/val/test assignment: hashing per
    *document* scatters each source across splits (near-duplicate docs
    from one domain land in both train and test — the classic eval
    contamination), while hashing per *group* (source) pins every doc
    of a domain to one split.  One row per source: doc-level split
    spread, the group-level assignment, and the leak flag.

    Both assignments are pure row properties (md5) — no shuffle to
    assign, one groupBy on source to audit.

    group_split is a FUNCTION of the grouping key (md5 of ``source``),
    so it is derived AFTER the aggregation instead of carried through
    it (r15, guide §2.3/§1.2): the previous ``any_value(group_split)``
    was a string-buffered aggregate, which forced the whole two-level
    distinct aggregation onto SortAggregate — three full sorts of the
    corpus around the exchanges.  With only numeric buffers left
    (count + the distinct-rewrite's grouping), the plan is pure
    HashAggregate, and the per-row ``md5(source)`` moves from the
    corpus scan to the per-source result frame.
    """
    d = table(spark, sf_dir, "documents")

    def _nibble_split(col):
        nib = F.substring(F.md5(col), 1, 1)
        return (
            F.when(nib.isin(*"0123456789ab"), "train")
            .when(nib.isin("c", "d"), "val")
            .otherwise("test")
        )

    tagged = d.select(
        "source",
        _nibble_split(F.col("doc_id").cast("string")).alias("doc_split"),
    )
    return tagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("doc_split").alias("n_doc_splits"),
        (F.countDistinct("doc_split") > 1).alias("leaks_across_splits"),
    ).select(
        "source", "n_docs", "n_doc_splits",
        _nibble_split(F.col("source")).alias("group_split"),
        "leaks_across_splits",
    )


@query(
    "epoch_shard_manifest",
    oracle="""
    WITH keyed AS (
        SELECT g.epoch, doc_id,
               md5(CAST(g.epoch AS VARCHAR) || ':'
                   || CAST(doc_id AS VARCHAR)) AS sort_key
        FROM documents,
             LATERAL (SELECT unnest(generate_series(0, 2)) AS epoch) g
    )
    SELECT epoch, substr(sort_key, 1, 1) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(sort_key) AS lo_key, max(sort_key) AS hi_key
    FROM keyed GROUP BY 1, 2
    """,
)
def epoch_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training-data shuffle: each epoch orders
    the corpus by ``md5(epoch:doc_id)`` — a different but fully
    reproducible permutation per epoch, the property a training run
    needs to resume mid-epoch or re-derive any example's position.
    The manifest reports, per (epoch, 16-way shard = first key nibble),
    the document count and key range a reader uses to fetch its slice.

    Scale: the sort key is a narrow projection; the manifest is one
    partial-agg groupBy on (epoch, shard).  Writing the actual epoch
    order is ``repartitionByRange(sort_key)`` + ``sortWithinPartitions``
    — TeraSort's shape, no global sort, no driver materialization."""
    from ..catalog import table

    d = table(spark, sf_dir, "documents")
    keyed = d.select(
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("epoch"),
        "doc_id",
    ).withColumn(
        "sort_key",
        F.md5(F.concat_ws(":", F.col("epoch").cast("string"),
                          F.col("doc_id").cast("string"))),
    )
    return keyed.groupBy(
        "epoch", F.substring("sort_key", 1, 1).alias("shard")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("sort_key").alias("lo_key"),
        F.max("sort_key").alias("hi_key"),
    )


@query(
    "compaction_bin_plan",
    oracle="""
    WITH sized AS (
        SELECT source, doc_id, n_chars,
               sum(n_chars) OVER (
                   PARTITION BY source ORDER BY doc_id
               ) - n_chars AS prev_cum
        FROM documents
    ),
    binned AS (
        SELECT source, doc_id, n_chars,
               CAST(floor(prev_cum / 20000.0) AS BIGINT) AS bin
        FROM sized
    )
    SELECT source, bin,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(n_chars) AS BIGINT) AS bin_chars,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM binned GROUP BY source, bin
    """,
)
def compaction_bin_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: pack each source's files (documents
    stand in, ``n_chars`` as the file size) into ~20 KB target bins by
    cumulative-size assignment — the Delta/Iceberg OPTIMIZE planning
    shape.

    Sequential first-fit binning is an ordered prefix sum per source
    (one window over the per-source manifest, which is metadata-scale
    — file listings, not data), and the bin index is
    floor(preceding-bytes / target), so bins are contiguous ranges and
    every bin except the last overflows the target by at most one
    file.  All arithmetic is exact integer prefix sums — no floats to
    reconcile (rule 2).
    """
    d = table(spark, sf_dir, "documents", parallel=True)
    w = (
        Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = d.select(
        "source", "doc_id", "n_chars",
        F.floor((F.sum("n_chars").over(w) - F.col("n_chars")) / 20000.0)
        .alias("bin"),
    )
    return binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_chars").alias("bin_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


_LEAK_K = 8


@query(
    "split_ngram_decontamination",
    oracle=f"""
    WITH tagged AS (
        SELECT doc_id,
               CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                   THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN ('c','d') THEN 'val'
                 ELSE 'test'
               END AS split,
               string_split(trim(regexp_replace(lower(text), '\\s+',
                                                ' ', 'g')), ' ') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id, split,
               md5(array_to_string(
                   list_slice(t, g.i, g.i + {_LEAK_K} - 1), ' ')) AS gh
        FROM tagged,
             LATERAL (SELECT unnest(generate_series(
                 1, len(t) - {_LEAK_K} + 1)) AS i) g
        WHERE len(t) >= {_LEAK_K}
    ),
    train_g AS (
        SELECT DISTINCT gh FROM grams WHERE split = 'train'
    ),
    per_doc AS (
        SELECT g.split, g.doc_id,
               count(*) AS n_grams,
               count(tg.gh) AS n_leaked
        FROM grams g LEFT JOIN train_g tg ON g.gh = tg.gh
        WHERE g.split <> 'train'
        GROUP BY g.split, g.doc_id
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count_if(n_leaked > 0) AS BIGINT) AS leaked_docs,
           CAST(sum(n_grams) AS BIGINT) AS grams_total,
           CAST(sum(n_leaked) AS BIGINT) AS grams_leaked,
           CAST(sum(n_leaked) AS DOUBLE) / sum(n_grams)
               AS leaked_gram_share
    FROM per_doc
    GROUP BY split
    """,
)
def split_ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval contamination audit AFTER splitting: for each
    held-out split, how many documents share at least one {k}-token
    span with the train split, and what share of their spans leak —
    the decontamination check every eval pipeline runs between its own
    splits (GPT-3 §4 / PaLM app. dedup both audit n-gram overlap
    between train and eval; ``ngram_decontamination`` audits against
    an EXTERNAL benchmark, this audits the split boundary itself).

    Plan shape: one token split staged per row, spans as md5 hashes
    through a higher-order transform (never strings), ONE left join of
    the held-out gram stream against the distinct train-gram set on
    the uniform 128-bit key, then a two-level partial-agg collapse
    (doc, then split).  At 100 TB the train-gram set is huge but
    uniform — the join shuffles both sides on the hash key with
    map-side combine; the production variant pushes a bloom filter of
    train grams into the scan first, same algebra.
    ``leaked_gram_share`` is a single division of exact BIGINT sums
    (IEEE-identical both engines, the ``dataset_hash_split`` avg_chars
    precedent).
    """
    from ..operators.text import normalize_text, word_kgram_hash

    k = _LEAK_K
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", _split_col().alias("split"),
                F.split(normalize_text("text"), " ").alias("_toks"))
        .filter(F.size("_toks") >= k)
    )
    idx = F.sequence(F.lit(0), F.size("_toks") - k)
    grams = d.select(
        "doc_id", "split",
        F.explode(F.transform(
            idx,
            lambda i: word_kgram_hash("_toks", i, k),
        )).alias("gh"),
    )
    train_g = (grams.filter(F.col("split") == "train")
               .select("gh").distinct()
               .withColumn("_hit", F.lit(1)))
    per_doc = (
        grams.filter(F.col("split") != "train")
        .join(train_g, "gh", "left")
        .groupBy("split", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.count("_hit").alias("n_leaked"))
    )
    return per_doc.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("n_leaked") > 0).alias("leaked_docs"),
        F.sum("n_grams").alias("grams_total"),
        F.sum("n_leaked").alias("grams_leaked"),
        (F.sum("n_leaked").cast("double") / F.sum("n_grams"))
        .alias("leaked_gram_share"),
    )
