"""Streaming MinHash-LSH near-dedup: the ``foreachBatch`` twin of the
batch ``crawl_stage1_funnel`` back end (``queries/curation.py::
_funnel_neardup``) — RefinedWeb §3's FUZZY dedup running continuously
over a crawl stream, plus the composed stage-1 sink (URL dedup →
domain cap → extraction → quality gates → near-dedup) that extends
``CurationStage0Sink`` the way the batch stage-1 funnel extends the
stage-0 funnel.

Semantics (identical to the batch chain, so a band-key or seed-hash
change can never fork the two): a document's 8 minhashes over its
DISTINCT word 3-grams fold into 4 two-row band keys; the doc is
admitted iff, for EVERY band bucket it occupies, no EARLIER document
ever occupied that bucket — earlier batch first, then lower
``order_col`` within the batch.  ALL documents' buckets are recorded
(admitted or not): the batch rule is transitive through dropped docs
(A kills B; B's later bucket-mate C dies too even if C never shares a
bucket with A), so the store must remember B.  With ``order_col``
monotone across batches (crawl order — the ``DomainCapSink``
contract), a streaming run over N batches admits exactly the docs a
batch run over their union keeps.

Scale shape per micro-batch: explode distinct shingles (narrow) → ONE
map-side-combined groupBy(doc) computing all 8 mins (the
``operators/dedup.py::minhash_signatures`` algebra) → band groupBy
reusing that partitioning → a bucket window over the MICRO-BATCH only
(bounded by trigger size, never corpus-sized) → one equi-join against
the store's distinct bucket keys (batch side tiny → AQE broadcasts
it) → one join-back on the unique order key.  The store holds (band,
band_key, first_doc) — ~70 bytes per bucket, never text — and grows
with distinct content, the same envelope as the fingerprint store.
Nothing is collected to the driver.

Exactly-once under redelivery (the ``IncrementalDedupSink`` design):
every write overwrites the ``batch_id=N`` partition this batch owns,
store reads EXCLUDE rows the same batch id wrote, and within-batch
ordering is by ``order_col`` — a redelivered batch recomputes the
identical admit set and overwrites it in place.  Store and checkpoint
lifecycles travel together (see ``streaming/dedup.py`` module doc).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..colnames import fresh_prefix
from .dedup import (
    DeferredStats,
    DeferredWrites,
    _read_store,
    _reject_batch_id_collision,
    fingerprint_store_agg,
    recover_batch_store,
)
from .domain_cap import (
    CurationStage0Sink,
    TokenBudgetSink,
    budget_store_agg,
    cap_store_agg,
    order_watermark_agg,
    order_watermark_dir,
)


def band_store_agg(df: DataFrame) -> DataFrame:
    """Documented compaction ``agg`` for :class:`MinHashDedupSink`'s
    (band, band_key, first_doc) bucket store: admission reads bucket
    EXISTENCE only, so merging keeps one row per bucket;
    ``min(first_doc)`` keeps the informational first-occupant column
    deterministic (it is a string cast of the order key — min-by-string
    is fine for a label that nothing joins on).  Idempotent over
    already-compacted rows."""
    return df.groupBy("band", "band_key").agg(
        F.min("first_doc").alias("first_doc"))


class MinHashDedupSink:
    """foreachBatch callable: near-duplicate-free survivors →
    ``out_dir``, every batch document's (band, band_key, first_doc)
    buckets → ``store_dir`` (both per-batch overwrite partitions).

    ``order_col`` must be unique per document (it keys the join-back)
    and deterministic across replays; for batch-run parity it must be
    monotone across batches.  NULL texts coalesce to ``''`` — all
    empty documents share one shingle bucket and dedup together (they
    ARE mutual duplicates), and no row can silently vanish from the
    output the way an exploded NULL would.
    """

    def __init__(self, spark: SparkSession, store_dir: str, out_dir: str,
                 text_col: str = "text", order_col: str = "doc_id",
                 num_hashes: int = 8, rows_per_band: int = 2,
                 shingle_n: int = 3, with_counts: bool = False):
        if num_hashes < 1 or rows_per_band < 1 \
                or num_hashes % rows_per_band != 0:
            # a ragged final band would silently use a different
            # (weaker) key than the others — refuse at construction
            raise ValueError(
                f"num_hashes ({num_hashes}) must be a positive multiple "
                f"of rows_per_band ({rows_per_band})")
        self._spark = spark
        self._store = store_dir
        self._out = out_dir
        self._text = text_col
        self._order = order_col
        self._n = num_hashes
        # startup compaction recovery (round-11 ADVICE; see
        # dedup.recover_batch_store) — store and output surfaces both
        recover_batch_store(spark, store_dir)
        recover_batch_store(spark, out_dir)
        self._rpb = rows_per_band
        self._shingle = shingle_n
        # with_counts: ONE gram stream serves the MinHash mins AND
        # per-doc total/distinct 3-gram counts (the batch funnels'
        # _funnel_neardup(with_counts=True) algebra: the stream stays
        # non-distinct, which changes no signature — min over a
        # multiset equals min over its set).  _admit then attaches the
        # two count columns to the survivors frame and publishes their
        # per-call collision-proof names as ``self.counts_cols``; the
        # standalone __call__ drops them so they never leak into
        # out_dir.
        self._with_counts = with_counts
        self.counts_cols: tuple[str, str] | None = None
        self._writes = DeferredWrites()
        self._stats = DeferredStats()
        self.batch_stats: list[tuple[int, int, int]] = []  # (id, in, kept)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self._writes.clear()
        self._stats.clear()
        survivors = self._admit(batch_df, batch_id)
        if self.counts_cols:
            survivors = survivors.drop(*self.counts_cols)
        # Materialize the survivors checkpoint DURING the concurrent
        # stats collection, while the batch persist is still live
        # (round-13 ADVICE): the lazy checkpoint otherwise
        # materializes at flush time, AFTER the stats cleanup
        # unpersisted the batch — a nondeterministic upstream
        # (rand(), current_timestamp) could then make the written
        # rows diverge from batch_stats and the band store.  The
        # count doubles as a written-rows consistency check against
        # the flagged-derived n_kept; a mismatch means the order
        # column is not unique per document (join-back fan-out) and
        # aborts the trigger BEFORE anything flushes.
        def _check_out(row):
            n_out = int(row["n_out"])
            n_kept = self.batch_stats[-1][2]
            if n_out != n_kept:
                raise ValueError(
                    f"MinHashDedupSink wrote {n_out} survivor rows "
                    f"but admitted {n_kept} documents in batch "
                    f"{batch_id} — order_col {self._order!r} is not "
                    f"unique per document (see class docstring)")

        self._stats.add(
            survivors.agg(F.count(F.lit(1)).alias("n_out")), _check_out)
        self._writes.add(survivors, self._out, batch_id)
        self._stats.collect()
        self._writes.flush()

    def _band_keys(self, batch_df: DataFrame, u: str) -> DataFrame:
        """(``{u}_ord``, ``{u}_band``, ``{u}_key``): one row per
        document per band — the ``minhash_signatures`` +
        ``lsh_candidate_pairs`` banding algebra, inlined so the band
        key construction is byte-identical to ``_funnel_neardup``'s
        (min of md5('seed:shingle') over the distinct-shingle set;
        band = seed div rows_per_band; key = sorted '|'-join).  Every
        working name carries the caller's collision-proof prefix so a
        user column named 'band'/'seed'/... can never shadow."""
        from ..operators.text import with_word_ngrams

        txt = F.coalesce(F.col(self._text).cast("string"), F.lit(""))
        staged = batch_df.withColumn(f"{u}_txt", txt).withColumn(
            f"{u}_ord", F.col(self._order))
        shingled = with_word_ngrams(
            staged, f"{u}_txt", self._shingle,
            out_col=f"{u}_grams", keep=(f"{u}_ord",),
            distinct=not self._with_counts,
        ).select(f"{u}_ord",
                 F.explode(f"{u}_grams").alias(f"{u}_sh"))
        aggs = [
            F.min(F.md5(F.concat_ws(
                ":", F.lit(str(s)), F.col(f"{u}_sh")))).alias(f"{u}{s}")
            for s in range(self._n)
        ]
        extras: list[str] = []
        if self._with_counts:
            aggs += [
                F.count(F.lit(1)).alias(f"{u}_total"),
                F.count_distinct(F.col(f"{u}_sh")).alias(f"{u}_distinct"),
            ]
            extras = [f"{u}_total", f"{u}_distinct"]
        wide = shingled.groupBy(f"{u}_ord").agg(*aggs)
        stack_args = ", ".join(f"{s}, `{u}{s}`" for s in range(self._n))
        sigs = wide.select(
            f"{u}_ord", *extras,
            F.expr(f"stack({self._n}, {stack_args}) "
                   f"AS (`{u}_seed`, `{u}_mh`)"))
        return sigs.withColumn(
            f"{u}_band", (F.col(f"{u}_seed") / self._rpb).cast("int")
        ).groupBy(f"{u}_ord", *extras, f"{u}_band").agg(
            F.concat_ws("|", F.sort_array(F.collect_list(f"{u}_mh")))
            .alias(f"{u}_key"))

    def _admit(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        """Near-dedup without the output write: compute the admitted
        frame, stage the band-bucket store write, record stats, RETURN
        the frame (the ``DomainCapSink._admit`` composition contract).

        Per-trigger Spark-job shape (round-12 verdict item 1): ONE
        aggregate over the flagged band rows yields both stats — n_in
        is the distinct doc count (every document emits at least one
        band row: the gram index floors at one entry even for empty
        text), n_kept subtracts the docs with any blocked bucket — and
        is the materializing job for the bands AND flagged lazy
        checkpoints; the store write and the survivor join-back are
        cheap derivations over those checkpoints, deferred/evaluated
        by the caller's next action or the trigger-end flush."""
        _reject_batch_id_collision(batch_df)
        order = self._order
        u = fresh_prefix(batch_df.columns, "_nd")
        # persist: the batch feeds the shingle fold and the survivor
        # join-back — without it the (possibly extraction-heavy)
        # upstream transform recomputes per action.  Unpersisted by a
        # DeferredStats cleanup AFTER the trigger's concurrent stats
        # collection; materializations after that (the flush, a
        # composed downstream stage) recompute the upstream lineage,
        # which in the composed sinks is a cheap filter over the cap
        # stage's checkpoint and standalone is the deterministic
        # source re-read.
        batch_df.persist()
        self._stats.add_cleanup(batch_df.unpersist)
        # one materialization feeds the store write AND the admission
        # check (the dedup-sink precedent: the store write must not
        # re-read/re-shingle the input); lazy, so the trigger's stats
        # collection materializes it
        bands = self._band_keys(batch_df, u) \
            .localCheckpoint(eager=False)
        self._writes.add(
            bands.groupBy(f"{u}_band", f"{u}_key").agg(
                F.min(f"{u}_ord").cast("string").alias("first_doc"))
            .select(F.col(f"{u}_band").alias("band"),
                    F.col(f"{u}_key").alias("band_key"),
                    "first_doc"),
            self._store, batch_id)
        # the store is NEVER shuffled (round-13): a distinct over the
        # whole band store re-shuffled corpus-scale state every
        # trigger.  Semi-join it down to the batch's own buckets first
        # (broadcast probe — the store is only scanned); the distinct
        # then collapses only the HIT set, which is bounded by this
        # batch's buckets × their occupying batches, not by the
        # corpus.
        bkeys = bands.select(f"{u}_band", f"{u}_key").distinct()
        prior = (
            _read_store(
                self._spark, self._store,
                "band int, band_key string, first_doc string",
                exclude_batch=batch_id)
            .select(F.col("band").alias(f"{u}_band"),
                    F.col("band_key").alias(f"{u}_key"))
            .join(F.broadcast(bkeys),
                  [f"{u}_band", f"{u}_key"], "left_semi")
            .distinct().withColumn(f"{u}_prior", F.lit(True)))
        # blocked iff an earlier batch ever touched the bucket, or an
        # earlier-order doc in THIS batch occupies it.  The bucket
        # window runs over the micro-batch only — bounded by trigger
        # size; the corpus-scale state lives in the store semi-join
        # above.
        w = Window.partitionBy(f"{u}_band", f"{u}_key")
        flagged = bands.withColumn(
            f"{u}_first", F.min(f"{u}_ord").over(w)
        ).join(F.broadcast(prior),
               [f"{u}_band", f"{u}_key"], "left").withColumn(
            f"{u}_blocked",
            F.coalesce(F.col(f"{u}_prior"), F.lit(False))
            | (F.col(f"{u}_first") != F.col(f"{u}_ord"))
        ).localCheckpoint(eager=False)
        stats_df = flagged.agg(
            F.count_distinct(F.col(f"{u}_ord")).alias("n_in"),
            F.count_distinct(
                F.when(F.col(f"{u}_blocked"), F.col(f"{u}_ord")))
            .alias("n_blocked"))

        def _record(row):
            n_in = int(row["n_in"])
            self.batch_stats.append(
                (batch_id, n_in, n_in - int(row["n_blocked"])))

        self._stats.add(stats_df, _record)
        agg_cols = [
            F.max(F.col(f"{u}_blocked").cast("int")).alias(f"{u}_b")]
        sel: list = [F.col(f"{u}_ord").alias(order)]
        if self._with_counts:
            # every band row of one doc carries the same counts —
            # min() is determinism-by-construction, not a choice
            agg_cols += [F.min(f"{u}_total").alias(f"{u}_total"),
                         F.min(f"{u}_distinct")
                         .alias(f"{u}_distinct")]
            sel += [f"{u}_total", f"{u}_distinct"]
            self.counts_cols = (f"{u}_total", f"{u}_distinct")
        admitted = flagged.groupBy(f"{u}_ord").agg(*agg_cols) \
            .filter(F.col(f"{u}_b") == 0).select(*sel)
        return batch_df.join(admitted, order) \
            .localCheckpoint(eager=False)


def run_minhash_dedup(spark: SparkSession, in_path: str, out_dir: str,
                      store_dir: str, checkpoint_dir: str,
                      available_now: bool = True,
                      compact_every_n_batches: int | None = None):
    """Wire a json-lines document stream (``{"doc_id": ..., "text":
    ...}``) through the near-dedup sink.  Returns (StreamingQuery,
    sink) — the ``run_incremental_dedup`` wiring with the MinHash sink
    swapped in.  ``compact_every_n_batches`` enables band-store
    compaction at runner start and every N batches mid-stream
    (admissions unaffected — buckets merge one-row-per-bucket)."""
    from .dedup import _run_dedup_stream, _with_compaction

    sink = _with_compaction(
        spark, checkpoint_dir, MinHashDedupSink(spark, store_dir,
                                                out_dir),
        [(store_dir, band_store_agg)], compact_every_n_batches)
    return _run_dedup_stream(spark, in_path, sink,
                             checkpoint_dir, available_now)


class CurationStage1Sink:
    """The composed streaming stage-1: canonical-URL dedup → per-
    registered-domain cap (the full :class:`CurationStage0Sink` chain)
    → main-text extraction → min-content + token-band quality gates →
    MinHash-LSH near-dedup, in one ``foreachBatch`` callable — the
    streaming twin of ``queries/curation.py::crawl_stage1_funnel`` in
    the same production order (RefinedWeb §3: URL dedup → extraction →
    quality gates → FUZZY dedup; extraction is paid only on cap
    survivors, real MinHash work only on gate survivors).

    ``extract(col) -> Column`` maps the ``content_col`` to the text
    the gates and near-dedup see (e.g. ``lambda c: extract_main_text(
    c)["extracted_text"]``); ``None`` uses the column as-is.  Gate-
    FAILED documents are dropped (their cap budget stays consumed —
    production order), and only gate survivors enter the band store,
    matching the batch funnel where gate-failed rows ride in singleton
    sentinel buckets that can never block anything.

    Four persistent surfaces, all per-batch overwrite partitions with
    own-batch-excluded reads, so redelivery is idempotent END TO END:
    the URL fingerprint store, the cap count store, the band-bucket
    store, and the admitted output.  ``batch_stats`` rows are
    (batch_id, n_in, n_url_dedup, n_capped, n_gated, n_admitted).
    """

    def __init__(self, spark: SparkSession, dedup_store: str,
                 cap_store: str, band_store: str, out_dir: str,
                 url_col: str = "url", order_col: str = "doc_id",
                 cap: int = 10, content_col: str = "text",
                 extract=None, min_chars: int = 120,
                 token_band: tuple[int, int] = (15, 1000),
                 num_hashes: int = 8, rows_per_band: int = 2,
                 shingle_n: int = 3):
        # construction-time validation, before any batch side effect:
        # the inner sinks validate cap / band arithmetic themselves
        self._s0 = CurationStage0Sink(
            spark, dedup_store, cap_store, out_dir,
            url_col=url_col, order_col=order_col, cap=cap)
        self._nd_proto = MinHashDedupSink(
            spark, band_store, out_dir, text_col="_unused",
            order_col=order_col, num_hashes=num_hashes,
            rows_per_band=rows_per_band, shingle_n=shingle_n)
        self._spark = spark
        self._band_store = band_store
        self._out = out_dir
        self._order = order_col
        self._content = content_col
        self._extract = extract
        self._min_chars = min_chars
        self._band_lo, self._band_hi = token_band
        # ONE deferred-write + ONE deferred-stats buffer across the
        # whole composition: every inner stage stages its store write
        # and its 1-row stats aggregate here; the trigger collects the
        # stats concurrently, then flushes the writes concurrently
        # (round-12 verdict item 1 — the per-store sequential jobs
        # were the dominant fixed cost per trigger)
        self._writes = self._s0._writes
        self._nd_proto._writes = self._writes
        self._stats = self._s0._stats
        self._nd_proto._stats = self._stats
        self.batch_stats: list[tuple[int, int, int, int, int, int]] = []

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self._writes.clear()
        self._stats.clear()
        # stage 0 (validates batch_id collision before any side effect)
        capped = self._s0._admit(batch_df, batch_id)
        # extraction + gates: stage the extracted text ONCE (the
        # regex-heavy extractor must not re-evaluate per consumer —
        # the urls.py staging lesson); collision-proof staged name
        u = fresh_prefix(capped.columns, "_s1")
        xt_col: Column = F.col(self._content)
        if self._extract is not None:
            xt_col = self._extract(xt_col)
        # lazy checkpoint of the STAGED extraction: the nd stage's
        # batch persist is released by a stats-collect cleanup, but
        # the out-write flushes the survivors checkpoint AFTER that —
        # without this, the flush would re-run the regex-heavy
        # extractor over every cap survivor a second time per trigger
        # (round-13 review finding; stage 2 is safe because its
        # budget-stage aggregate materializes the survivors
        # checkpoint while the batch is still cached)
        staged = capped.withColumn(
            f"{u}_xt", F.coalesce(xt_col.cast("string"), F.lit(""))
        ).localCheckpoint(eager=False)
        gated = staged.filter(
            (F.length(f"{u}_xt") >= self._min_chars)
            & F.size(F.split(F.trim(F.col(f"{u}_xt")), r"\s+"))
            .between(self._band_lo, self._band_hi))
        # near-dedup on the staged extracted text; the inner sink
        # counts the gated frame as its n_in — reuse it
        nd = self._nd_proto
        nd._text = f"{u}_xt"
        survivors = nd._admit(gated, batch_id)
        self._writes.add(
            survivors.drop(f"{u}_xt"), self._out, batch_id)

        def _record(_row):
            _, n_in, n_dedup, n_capped = self._s0.batch_stats[-1]
            _, n_gated, n_adm = nd.batch_stats[-1]
            self.batch_stats.append(
                (batch_id, n_in, n_dedup, n_capped, n_gated, n_adm))

        self._stats.add(None, _record)
        self._stats.collect()
        self._writes.flush()


class CurationStage2Sink:
    """The composed streaming stage-2: the full stage-1 chain (URL
    dedup → registered-domain cap → extraction → min-content +
    token-band gates → MinHash near-dedup) THEN the selection wave —
    repetition-ratio quality gate → deterministic hash sample →
    cross-batch per-publisher TOKEN budget — in one ``foreachBatch``
    callable: the streaming twin of ``queries/curation.py::
    crawl_stage2_funnel`` in the same production order (RefinedWeb/
    FineWeb: dedup → quality filter → sampling → budget cut).

    Stage discipline mirrors the batch funnel exactly:

    - the near-dedup sink runs ``with_counts=True`` so ONE gram stream
      feeds the MinHash mins AND the total/distinct 3-gram counts (min
      over a multiset equals min over its set — the batch funnel's
      shared-groupBy argument, applied per micro-batch);
    - SPAMMY documents participate in near-dedup (their buckets enter
      the band store and can block later duplicates — in the batch run
      they ride the chain too) and are dropped only afterwards by the
      exact integer test ``(total - distinct) * 2 > total``;
    - the hash sample is a pure row property (first md5 byte of the
      order key ≤ ``sample_hex``), reproducible on any partitioning;
    - the token budget is :class:`TokenBudgetSink` semantics: EVERY
      sampled row's tokens consume the publisher's budget whether or
      not the row itself fit, so with a monotone ``order_col`` a
      streaming run over N batches admits exactly the rows the batch
      funnel admits over their union.

    Five persistent surfaces — URL fingerprint store, cap count store,
    band-bucket store, token-budget store, admitted output — all
    per-batch overwrite partitions with own-batch-excluded reads:
    redelivery of any batch recomputes the identical admit set and
    never consumes cap or token budget twice.  ``batch_stats`` rows
    are (batch_id, n_in, n_url_dedup, n_capped, n_gated, n_neardup,
    n_quality, n_sampled, n_admitted).
    """

    def __init__(self, spark: SparkSession, dedup_store: str,
                 cap_store: str, band_store: str, budget_store: str,
                 out_dir: str, url_col: str = "url",
                 order_col: str = "doc_id", cap: int = 10,
                 content_col: str = "text", extract=None,
                 min_chars: int = 120,
                 token_band: tuple[int, int] = (15, 1000),
                 num_hashes: int = 8, rows_per_band: int = 2,
                 shingle_n: int = 3, sample_hex: str = "b2",
                 token_budget: int = 100):
        # construction-time validation throughout: every inner sink
        # validates its own arithmetic before any batch side effect —
        # and OUR validation runs before the inner constructors, whose
        # startup compaction recovery is itself a filesystem side
        # effect (round-12: recovery moved into sink __init__)
        if not (isinstance(sample_hex, str) and len(sample_hex) == 2
                and all(c in "0123456789abcdef" for c in sample_hex)):
            # a malformed threshold ('B2', 'b', '0xb2') silently turns
            # the string compare into all-pass or all-fail
            raise ValueError(
                f"sample_hex must be two lowercase hex chars, got "
                f"{sample_hex!r}")
        # keep_key: stage 0's PSL-staged publisher key rides the chain
        # so the token-budget stage reuses it instead of paying the
        # tier-broadcast builds a second time per trigger (round-12
        # verdict item 1)
        self._s0 = CurationStage0Sink(
            spark, dedup_store, cap_store, out_dir,
            url_col=url_col, order_col=order_col, cap=cap,
            keep_key=True)
        self._nd = MinHashDedupSink(
            spark, band_store, out_dir, text_col="_set_per_batch",
            order_col=order_col, num_hashes=num_hashes,
            rows_per_band=rows_per_band, shingle_n=shingle_n,
            with_counts=True)
        self._tb = TokenBudgetSink(
            spark, budget_store, out_dir, weight_col="_set_per_batch",
            url_col=url_col, order_col=order_col, budget=token_budget)
        self._spark = spark
        self._out = out_dir
        self._order = order_col
        self._content = content_col
        self._extract = extract
        self._min_chars = min_chars
        self._band_lo, self._band_hi = token_band
        self._sample_hex = sample_hex
        # ONE deferred-write + ONE deferred-stats buffer across all
        # five persistent surfaces (see CurationStage1Sink) — stats
        # collected, then writes flushed, each concurrently per trigger
        self._writes = self._s0._writes
        self._nd._writes = self._writes
        self._tb._writes = self._writes
        self._stats = self._s0._stats
        self._nd._stats = self._stats
        self._tb._stats = self._stats
        self.batch_stats: list[
            tuple[int, int, int, int, int, int, int, int, int]] = []

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self._writes.clear()
        self._stats.clear()
        # stages 0–1 (stage 0 validates batch_id collision before any
        # persistent side effect)
        capped = self._s0._admit(batch_df, batch_id)
        u = fresh_prefix(capped.columns, "_s2")
        xt_col: Column = F.col(self._content)
        if self._extract is not None:
            xt_col = self._extract(xt_col)
        # stage extracted text AND its token count once (the budget
        # stage needs the same xtok the gate tested)
        staged = capped.withColumn(
            f"{u}_xt", F.coalesce(xt_col.cast("string"), F.lit(""))
        ).withColumn(
            f"{u}_xtok",
            F.size(F.split(F.trim(F.col(f"{u}_xt")), r"\s+")))
        gated = staged.filter(
            (F.length(f"{u}_xt") >= self._min_chars)
            & F.col(f"{u}_xtok").between(self._band_lo, self._band_hi))
        nd = self._nd
        nd._text = f"{u}_xt"
        survivors = nd._admit(gated, batch_id)
        c_total, c_distinct = nd.counts_cols
        # repetition-ratio gate — exact integer cross-product, no float
        # boundary (the batch funnel's test verbatim)
        qual_pred = ~((F.col(c_total) - F.col(c_distinct)) * 2
                      > F.col(c_total))
        # deterministic ~70% hash sample: membership is a pure row
        # property of the order key, so it rides into the budget
        # stage's single action as its keep tag — quality rows that
        # miss the sample flow through as counted losers (round-12
        # verdict item 1: no separate selection-count job at all)
        c_samp = f"{u}_samp"
        quality = survivors.filter(qual_pred).drop(
            c_total, c_distinct).withColumn(
            c_samp,
            F.substring(F.md5(F.col(self._order).cast("string")), 1, 2)
            <= self._sample_hex)
        tb = self._tb
        tb._weight = f"{u}_xtok"
        # reuse stage 0's publisher key (rode the chain as a plain
        # column) — identical value to what tb's own PSL staging would
        # compute on the same url_col, minus the staging cost
        key_col = self._s0.key_col
        tb._key = lambda _c: F.col(key_col)
        admitted = tb._admit(quality, batch_id, keep_col=c_samp)
        self._writes.add(
            admitted.drop(f"{u}_xt", f"{u}_xtok", key_col, c_samp),
            self._out, batch_id)

        def _record(_row):
            _, n_in, n_dedup, n_capped = self._s0.batch_stats[-1]
            _, n_gated, n_nd = nd.batch_stats[-1]
            _, n_sampled, n_adm = tb.batch_stats[-1]
            self.batch_stats.append(
                (batch_id, n_in, n_dedup, n_capped, n_gated, n_nd,
                 tb.last_total, n_sampled, n_adm))

        self._stats.add(None, _record)
        self._stats.collect()
        self._writes.flush()


def run_curation_stage2(spark: SparkSession, in_path: str,
                        dedup_store: str, cap_store: str,
                        band_store: str, budget_store: str,
                        out_dir: str, checkpoint_dir: str,
                        available_now: bool = True,
                        compact_every_n_batches: int | None = None,
                        **sink_kwargs):
    """Wire a json-lines crawl stream (``{"doc_id": ..., "url": ...,
    "text": ...}``) through the composed stage-2 sink.  Returns
    (StreamingQuery, sink) — the ``run_minhash_dedup`` wiring with the
    full curation composition swapped in; ``sink_kwargs`` pass through
    to :class:`CurationStage2Sink` (cap, token_budget, extract, ...).
    ``compact_every_n_batches`` enables compaction of all FIVE
    persistent store surfaces (URL fingerprints, cap counts, band
    buckets, token budgets, order watermark) at runner start AND every
    N batches mid-stream, each with its family's documented agg —
    admissions are provably unaffected (the soak test pins admissions
    identical to an uncompacted twin)."""
    from .dedup import _with_compaction

    sink = _with_compaction(
        spark, checkpoint_dir,
        CurationStage2Sink(
            spark, dedup_store, cap_store, band_store, budget_store,
            out_dir, **sink_kwargs),
        [(dedup_store, fingerprint_store_agg),
         (cap_store, cap_store_agg),
         (band_store, band_store_agg),
         (budget_store, budget_store_agg),
         (order_watermark_dir(budget_store), order_watermark_agg)],
        compact_every_n_batches)
    stream = (
        spark.readStream.format("json")
        .schema("doc_id long, url string, text string")
        .load(in_path)
    )
    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def run_curation_stage1(spark: SparkSession, in_path: str,
                        dedup_store: str, cap_store: str,
                        band_store: str, out_dir: str,
                        checkpoint_dir: str,
                        available_now: bool = True,
                        compact_every_n_batches: int | None = None,
                        **sink_kwargs):
    """Wire a json-lines crawl stream (``{"doc_id": ..., "url": ...,
    "text": ...}``) through the composed stage-1 sink — the
    :func:`run_curation_stage2` wiring without the selection wave.
    Returns (StreamingQuery, sink); ``compact_every_n_batches`` as on
    :func:`run_curation_stage2`, over the three stage-1 stores."""
    from .dedup import _with_compaction

    sink = _with_compaction(
        spark, checkpoint_dir,
        CurationStage1Sink(
            spark, dedup_store, cap_store, band_store, out_dir,
            **sink_kwargs),
        [(dedup_store, fingerprint_store_agg),
         (cap_store, cap_store_agg),
         (band_store, band_store_agg)],
        compact_every_n_batches)
    stream = (
        spark.readStream.format("json")
        .schema("doc_id long, url string, text string")
        .load(in_path)
    )
    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink
