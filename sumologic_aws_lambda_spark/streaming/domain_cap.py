"""Streaming per-registered-domain document caps: the ``foreachBatch``
twin of ``queries/curation.py::url_domain_caps`` — RefinedWeb §3.1's
publisher-level anti-domination cap running continuously over a crawl
stream instead of as a batch pass.

Per micro-batch Spark work: one window rank per cap key over the BATCH
(micro-batches are small by construction), one groupBy over the
persistent count store, one broadcast-ish join, two per-batch partition
writes.  The store holds (key, admitted) COUNTS only — bytes per
publisher per batch, never row data — the same bounded-state contract as
``CentroidDriftMonitor``'s |labels|×dim sums; nothing is collected to
the driver.

Exactly-once under redelivery (the ``IncrementalDedupSink`` design):
every write is an overwrite of the ``batch_id=N`` partition this batch
owns, and the prior-count read EXCLUDES rows the same batch id wrote —
so re-delivery of a failed batch recomputes the identical admit set and
overwrites it in place, never consuming cap budget twice.  Ranking
within a batch is by ``order_col`` (crawl order), which must be
deterministic for replay to reproduce the same ranks.  As with the
dedup sinks, batch ids are scoped to one streaming checkpoint: reuse a
fresh store per checkpoint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..colnames import fresh_prefix
from ..functions.urls import (
    canonicalize_url,
    load_psl_file,
    registered_domain,
    with_registered_domain_psl,
)
from .dedup import (
    _overwrite_batch_partition,
    _read_store,
    _reject_batch_id_collision,
    _store_has_data,
    recover_batch_store,
)


def cap_key_from_canonical(canon_col: Column) -> Column:
    """FIXTURE-TUPLE publisher key from an ALREADY-canonicalized URL
    column — the literal ``MULTI_LABEL_SUFFIXES`` Column form, retained
    for explicit ``key_fn=`` opt-in and tests.  The sinks' DEFAULT is
    now the full-PSL staging (:func:`stage_cap_key_psl`) — round-11
    verdict: the production paths must key on the snapshot they
    validated.  ``regexp_extract`` yields '' (not NULL) when the
    canonical URL is not http(s) — nullify it so those rows reach the
    caller-visible ``(null)`` sentinel budget instead of silently
    pooling in a near-invisible empty-string key (round-10 second-pass
    review)."""
    host = F.regexp_extract(canon_col, "^https?://([^/:?#]+)", 1)
    return registered_domain(F.when(host != "", host))


def default_cap_key(url_col: Column) -> Column:
    """FIXTURE-TUPLE publisher key from a raw URL column (canonical-URL
    host → literal-tuple registered domain).  No longer the sink
    default — see :func:`stage_cap_key_psl`; kept as the documented
    Column-expression form for explicit ``key_fn=`` use and the
    fixture/production agreement tests."""
    return cap_key_from_canonical(canonicalize_url(url_col))


def stage_cap_key_psl(df: DataFrame, url_col: str, out_col: str,
                      from_canonical: bool = False) -> DataFrame:
    """THE production publisher-key staging (the sinks' default):
    canonical-URL host → registered domain under the FULL vendored
    9,506-rule Public Suffix List snapshot
    (``functions/urls.py::with_registered_domain_psl`` — hybrid
    membership: broadcast joins for the two data-scale tiers, codegen
    set tests for the small ones; zero fact-side shuffles; the
    round-11-validated path, now the default keying, per the round-11
    verdict).  The rule tiers are parsed once and cached
    (``psl_rule_tiers``'s lru_cache) and the tier DataFrames are
    cached per session, so per-micro-batch calls pay only plan
    construction.

    ``from_canonical=True`` skips the canonicalizer when ``url_col``
    already holds a canonical URL (the composed stage-0 sink stages it
    once — the urls.py staging lesson).  Non-http(s) rows get a NULL
    key (the caller coalesces to the ``(null)`` sentinel).  Returns
    ``df`` + ``out_col``; working columns are collision-proofed and
    dropped."""
    u = fresh_prefix(df.columns, "_ck", out_col)
    hc = f"{u}_host"
    src = F.col(url_col) if from_canonical \
        else canonicalize_url(F.col(url_col))
    host = F.regexp_extract(src, "^https?://([^/:?#]+)", 1)
    staged = df.withColumn(hc, F.when(host != "", host))
    return with_registered_domain_psl(
        staged, hc, out_col, suffix_rows=load_psl_file()).drop(hc)


def cap_store_agg(df: DataFrame) -> DataFrame:
    """Documented compaction ``agg`` for :class:`DomainCapSink`'s
    (key, admitted) count store: admitted counts are additive across
    batches, so merging sums per key — idempotent over
    already-compacted rows (sum of a sum is the sum)."""
    return df.groupBy("key").agg(
        F.sum("admitted").cast("bigint").alias("admitted"))


def budget_store_agg(df: DataFrame) -> DataFrame:
    """Documented compaction ``agg`` for :class:`TokenBudgetSink`'s
    (key, toks) weight store — additive per key, like
    :func:`cap_store_agg`."""
    return df.groupBy("key").agg(
        F.sum("toks").cast("bigint").alias("toks"))


# TokenBudgetSink's monotone-order sidecar suffix.  The sidecar is a
# SIBLING prefix of the budget store (<store>_order_watermark), not a
# child: an underscore-prefixed child would be hidden from the store's
# partition discovery as intended, but Spark's DataSource also WARNS it
# ignores such a path when passed as an explicit read root (it still
# reads it today — a fail-open hazard if a future version honors the
# ignore), and a non-underscore child would corrupt the store's own
# partition discovery.  A sibling has neither problem.
_ORDER_WM = "_order_watermark"


def order_watermark_dir(store_dir: str) -> str:
    """Sidecar location for :class:`TokenBudgetSink`'s monotone-order
    watermark (see ``_ORDER_WM``).  Inside it the per-batch-overwrite
    layout applies as usual, so it compacts/recovers like any store."""
    return store_dir.rstrip("/") + _ORDER_WM


def order_watermark_agg(df: DataFrame) -> DataFrame:
    """Documented compaction ``agg`` for the ``_order_watermark``
    sidecar (see :class:`TokenBudgetSink`): only the global maximum
    matters, so merging keeps one row."""
    return df.agg(F.max("hi").alias("hi"))


class DomainCapSink:
    """foreachBatch callable: admit each publisher's documents until its
    RUNNING cross-batch count reaches ``cap``; admitted rows →
    ``out_dir``, per-key admitted counts → ``store_dir`` (both
    per-batch overwrite partitions).

    The DEFAULT cap key is the FULL-PSL registered domain of the
    canonical-URL host (:func:`stage_cap_key_psl` — the vendored
    9,506-rule snapshot via broadcast tier joins), so subdomain shards
    cdn0/cdn1/cdn2.pub.org share ONE budget under real-world suffix
    rules.  ``key_fn(col) -> Column`` overrides it with a Column
    expression (e.g. :func:`default_cap_key` for the fixture-tuple
    form); ``key_from_canonical=True`` tells the default staging that
    ``url_col`` is already canonical.  NULL keys (malformed URLs)
    coalesce to the ``(null)`` sentinel and share one budget — they
    stay observable in the store instead of bypassing the cap.
    ``order_col`` fixes within-batch admit order (crawl order); it
    must be deterministic so a redelivered batch reproduces the same
    ranks.
    """

    def __init__(self, spark: SparkSession, store_dir: str, out_dir: str,
                 url_col: str = "url", order_col: str = "doc_id",
                 cap: int = 10, key_fn=None,
                 key_from_canonical: bool = False,
                 out_drop_cols: tuple[str, ...] = ()):
        if cap < 1:
            raise ValueError(f"cap must be >= 1, got {cap}")
        self._spark = spark
        self._store = store_dir
        self._out = out_dir
        self._url = url_col
        self._order = order_col
        self._cap = cap
        self._key = key_fn
        self._key_from_canonical = key_from_canonical
        # finish any compaction a crash left in flight before the first
        # store read (round-11 ADVICE; see dedup.recover_batch_store)
        recover_batch_store(spark, store_dir)
        recover_batch_store(spark, out_dir)
        # caller-staged working columns to exclude from the admitted
        # output (the composed stage-0 sink stages the canonical URL
        # once and must not leak it into out_dir)
        self._out_drop = tuple(out_drop_cols)
        self.batch_stats: list[tuple[int, int, int]] = []  # (id, in, admitted)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        admitted = self._admit(batch_df, batch_id)
        _overwrite_batch_partition(admitted, self._out, batch_id)

    def _admit(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        """The cap stage without the output write: compute the admitted
        frame (working/out_drop columns removed), persist the count
        store, record stats, and RETURN the frame — so a composed sink
        (``CurationStage1Sink``) can chain further stages on the
        admitted rows in-memory instead of writing and re-reading an
        intermediate per batch.  ``__call__`` is ``_admit`` + the
        output-partition write."""
        _reject_batch_id_collision(batch_df)
        n_in = batch_df.count()
        # collision-proof internal names: a user batch column literally
        # named _cap_key / _cap_rn / _cap_prior must survive untouched
        # in the admitted output (round-10 third-pass review — the
        # same reserved-name class as the store-side 'key' fix), so
        # extend the prefix until it shadows nothing
        u = fresh_prefix(batch_df.columns, "_cap")
        c_key, c_rn, c_prior = f"{u}_key", f"{u}_rn", f"{u}_prior"
        c_pkey = f"{u}_prior_key"
        if self._key is not None:
            keyed = batch_df.withColumn(
                c_key,
                F.coalesce(self._key(F.col(self._url)), F.lit("(null)")))
        else:
            keyed = stage_cap_key_psl(
                batch_df, self._url, c_key,
                from_canonical=self._key_from_canonical,
            ).withColumn(
                c_key, F.coalesce(F.col(c_key), F.lit("(null)")))
        prior = _read_store(self._spark, self._store,
                            "key string, admitted bigint",
                            exclude_batch=batch_id)
        # store-side key aliased too: a bare .drop("key") would also
        # drop a USER data column named 'key' from the admitted output
        # (round-10 second-pass review)
        prior_counts = prior.groupBy(
            F.col("key").alias(c_pkey)).agg(
            F.sum("admitted").alias(c_prior))
        w = Window.partitionBy(c_key).orderBy(self._order)
        ranked = keyed.withColumn(c_rn, F.row_number().over(w))
        joined = ranked.join(
            prior_counts,
            ranked[c_key] == prior_counts[c_pkey],
            "left",
        ).drop(c_pkey).withColumn(
            c_prior, F.coalesce(F.col(c_prior), F.lit(0)))
        admitted = joined.filter(
            F.col(c_prior) + F.col(c_rn) <= self._cap)
        # both writes must see ONE materialization — without this the
        # store write would re-read the input and could diverge from
        # the out write (the IncrementalDedupSink precedent)
        admitted = admitted.localCheckpoint()
        n_adm = admitted.count()
        _overwrite_batch_partition(
            admitted.groupBy(F.col(c_key).alias("key")).agg(
                F.count(F.lit(1)).cast("bigint").alias("admitted")),
            self._store, batch_id)
        self.batch_stats.append((batch_id, n_in, n_adm))
        return admitted.drop(c_key, c_rn, c_prior, *self._out_drop)


class TokenBudgetSink:
    """foreachBatch callable: admit each key's documents while the
    key's RUNNING cross-batch WEIGHT sum (e.g. extracted-token count)
    stays within ``budget`` — the balanced-mixing cut of
    ``queries/curation.py::crawl_stage2_funnel`` (cap TOKENS per
    publisher, not documents: one publisher's long pages must not
    dominate the sampled corpus) as a persistent streaming stage.

    Semantics match the batch funnel's conditional cumsum exactly: a
    row is admitted iff ``prior + cum_weight(rows of this key up to and
    including this row, in order_col order) <= budget``, and EVERY
    input row's weight consumes budget whether or not the row itself
    fit — the batch cumsum keeps accumulating past the cut, so with a
    monotone ``order_col`` a streaming run over N batches admits
    exactly the rows one batch run over their union admits.  The store
    therefore records each batch's TOTAL weight per key, not just
    admitted weight.

    The monotone-order contract is SELF-ENFORCING (round-11 verdict
    watch item): each batch persists its max ``order_col`` into an
    ``_order_watermark``-suffixed SIBLING store
    (:func:`order_watermark_dir` — a sibling, so neither the store's
    partition discovery nor Spark's underscore-path ignore rules can
    ever touch it), and a batch
    whose min order does not EXCEED every prior batch's max raises
    before any persistent side effect — a caller wiring a non-monotone
    id fails loudly instead of silently getting order-dependent
    admissions.  The sidecar follows the per-batch-overwrite /
    exclude-own-batch design, so redelivery re-validates against only
    EARLIER batches and rewrites its own watermark idempotently.

    Same bounded-state / exactly-once envelope as ``DomainCapSink``:
    the store holds (key, toks) sums only, every write overwrites the
    ``batch_id=N`` partition this batch owns, prior reads exclude the
    writing batch, NULL keys coalesce to the ``(null)`` sentinel, NULL
    weights count 0 (the row still passes through if budget allows).
    ``key_fn(col) -> Column`` maps ``url_col`` to the budget key
    (default: registered domain of the canonical-URL host).
    """

    def __init__(self, spark: SparkSession, store_dir: str, out_dir: str,
                 weight_col: str, url_col: str = "url",
                 order_col: str = "doc_id", budget: int = 100,
                 key_fn=None, key_from_canonical: bool = False,
                 out_drop_cols: tuple[str, ...] = ()):
        if budget < 0:
            raise ValueError(f"budget must be >= 0, got {budget}")
        self._spark = spark
        self._store = store_dir
        self._out = out_dir
        self._weight = weight_col
        self._url = url_col
        self._order = order_col
        self._budget = budget
        self._key = key_fn
        self._key_from_canonical = key_from_canonical
        # startup compaction recovery — store, watermark sidecar and
        # output surfaces (round-11 ADVICE; see recover_batch_store)
        recover_batch_store(spark, store_dir)
        recover_batch_store(spark, order_watermark_dir(store_dir))
        recover_batch_store(spark, out_dir)
        self._out_drop = tuple(out_drop_cols)
        self.batch_stats: list[tuple[int, int, int]] = []  # (id, in, admitted)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        admitted = self._admit(batch_df, batch_id)
        _overwrite_batch_partition(admitted, self._out, batch_id)

    def _admit(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        """Budget stage without the output write (the ``DomainCapSink.
        _admit`` composition contract)."""
        _reject_batch_id_collision(batch_df)
        u = fresh_prefix(batch_df.columns, "_tb")
        c_key, c_cum, c_prior = f"{u}_key", f"{u}_cum", f"{u}_prior"
        c_pkey, c_w = f"{u}_prior_key", f"{u}_w"
        # ONE materialization feeds the store write (full keyed frame —
        # every row consumes budget) AND the admit path (the
        # IncrementalDedupSink precedent: the two persistent writes
        # must never see different recomputations of the input)
        if self._key is not None:
            keyed = batch_df.withColumn(
                c_key,
                F.coalesce(self._key(F.col(self._url)), F.lit("(null)")))
        else:
            keyed = stage_cap_key_psl(
                batch_df, self._url, c_key,
                from_canonical=self._key_from_canonical,
            ).withColumn(
                c_key, F.coalesce(F.col(c_key), F.lit("(null)")))
        keyed = keyed.withColumn(
            c_w,
            F.coalesce(F.col(self._weight).cast("bigint"), F.lit(0)),
        ).localCheckpoint()
        n_in = keyed.count()
        self._enforce_monotone_order(keyed, batch_id)
        prior = _read_store(self._spark, self._store,
                            "key string, toks bigint",
                            exclude_batch=batch_id)
        prior_sums = prior.groupBy(F.col("key").alias(c_pkey)).agg(
            F.sum("toks").alias(c_prior))
        # cumulative weight INCLUDING the current row, in crawl order —
        # the batch funnel's rowsBetween(unboundedPreceding, currentRow)
        w = Window.partitionBy(c_key).orderBy(self._order) \
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cumd = keyed.withColumn(c_cum, F.sum(c_w).over(w))
        joined = cumd.join(
            prior_sums, cumd[c_key] == prior_sums[c_pkey], "left",
        ).drop(c_pkey).withColumn(
            c_prior, F.coalesce(F.col(c_prior), F.lit(0)))
        admitted = joined.filter(
            F.col(c_prior) + F.col(c_cum) <= self._budget)
        admitted = admitted.localCheckpoint()
        n_adm = admitted.count()
        # the store records the batch's TOTAL weight per key (all input
        # rows consume budget — see class doc), so it must be computed
        # from the full keyed frame, not the admitted one
        _overwrite_batch_partition(
            keyed.groupBy(F.col(c_key).alias("key")).agg(
                F.sum(c_w).cast("bigint").alias("toks")),
            self._store, batch_id)
        self.batch_stats.append((batch_id, n_in, n_adm))
        return admitted.drop(c_key, c_cum, c_prior, c_w,
                             *self._out_drop)

    def _enforce_monotone_order(self, keyed: DataFrame,
                                batch_id: int) -> None:
        """Raise if this batch's min ``order_col`` does not EXCEED
        every prior batch's persisted max — the batch-parity contract
        made self-enforcing (class doc).  Runs BEFORE any persistent
        side effect of the batch; on pass, persists this batch's max
        into the ``_order_watermark`` sidecar (per-batch overwrite, so
        a redelivered batch re-validates against earlier batches only
        and rewrites its own row idempotently).  An empty batch moves
        no watermark and checks nothing."""
        wm_dir = order_watermark_dir(self._store)
        mm = keyed.agg(F.min(self._order).alias("lo"),
                       F.max(self._order).alias("hi")).first()
        if mm["lo"] is None:
            return
        if _store_has_data(self._spark, wm_dir):
            prior_hi = (
                self._spark.read.parquet(wm_dir)
                .filter(F.col("batch_id") != batch_id)
                .agg(F.max("hi")).first()[0])
            if prior_hi is not None and mm["lo"] <= prior_hi:
                raise ValueError(
                    f"TokenBudgetSink order_col {self._order!r} is not "
                    f"monotone across batches: batch {batch_id} starts "
                    f"at {mm['lo']!r} but a prior batch ended at "
                    f"{prior_hi!r} — cross-batch admissions would be "
                    f"order-dependent (see class docstring)")
        _overwrite_batch_partition(
            keyed.agg(F.max(F.col(self._order)).alias("hi")),
            wm_dir, batch_id)


class CurationStage0Sink:
    """The composed streaming stage-0: canonical-URL dedup THEN the
    per-registered-domain cap, in one ``foreachBatch`` callable — the
    streaming twin of ``queries/curation.py::crawl_stage0_funnel``'s
    first two stages, in the same production order (dedup first, so
    re-crawled spellings of one page never consume cap budget).

    Stage 1 stages the canonical URL ONCE (the regex-heavy
    canonicalizer must not re-evaluate per consumer — the urls.py
    staging lesson), keys on ``md5(canonical)`` with per-row fallbacks
    for malformed/NULL URLs (``raw:`` + the url, then ``rawid:`` + the
    order column, so NULL-url rows pass through instead of collapsing
    together), keeps the LOWEST-``order_col`` spelling per canonical
    key (a deterministic keeper — ``dropDuplicates`` would let a
    replayed batch emit a different survivor), dedups against the
    persistent fingerprint store, and records survivors' fingerprints;
    stage 2 is a :class:`DomainCapSink` fed the survivors frame
    DIRECTLY (its cap key reads the staged canonical column; the
    staging columns are excluded from the admitted output).  Both
    stores follow the per-batch-overwrite-partition /
    exclude-own-batch design, so redelivery of a batch is idempotent
    END TO END: the dedup recomputes the same survivors and the cap
    recomputes the same admit set.

    ``batch_stats`` rows are (batch_id, n_in, n_after_dedup,
    n_admitted).
    """

    def __init__(self, spark: SparkSession, dedup_store: str,
                 cap_store: str, out_dir: str, url_col: str = "url",
                 order_col: str = "doc_id", cap: int = 10):
        if cap < 1:
            # fail at CONSTRUCTION, not inside __call__ after the
            # dedup-store write has already happened (round-10
            # eighth-pass review: validate before any side effect)
            raise ValueError(f"cap must be >= 1, got {cap}")
        self._spark = spark
        self._dedup_store = dedup_store
        self._cap_store = cap_store
        self._out = out_dir
        self._url = url_col
        self._order = order_col
        self._cap = cap
        # startup compaction recovery for the URL fingerprint store
        # (the inner DomainCapSink recovers the cap store itself)
        recover_batch_store(spark, dedup_store)
        self.batch_stats: list[tuple[int, int, int, int]] = []

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        admitted = self._admit(batch_df, batch_id)
        _overwrite_batch_partition(admitted, self._out, batch_id)

    def _admit(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        """Dedup + cap without the output write (the ``DomainCapSink.
        _admit`` contract): returns the cap-admitted frame with working
        columns removed, so ``CurationStage1Sink`` can chain extraction
        / gates / near-dedup on it in-memory."""
        # validate BEFORE any persistent side effect: a rejected batch
        # must not leave its fingerprint partition behind (round-10
        # fifth-pass review)
        _reject_batch_id_collision(batch_df)
        n_in = batch_df.count()
        u = fresh_prefix(batch_df.columns, "_cur")
        canon, fp, rn = f"{u}_canon", f"{u}_fp", f"{u}_rn"
        staged = batch_df.withColumn(
            canon, canonicalize_url(F.col(self._url))
        ).withColumn(
            fp, F.coalesce(
                F.md5(F.col(canon)),
                # md5 of the raw string, not the string itself: a
                # malformed URL starting with 'id:' would otherwise
                # FORGE the 'rawid:' sentinel namespace ('raw:'+'id:7'
                # == 'rawid:7'; round-10 tenth-pass review) — with the
                # fixed-width hex digest the prefixes can never merge
                F.concat(F.lit("raw:"), F.md5(F.col(self._url))),
                # concat() is NULL when url is NULL — a second per-row
                # fallback keyed on the (unique) order column keeps
                # NULL-url rows from collapsing into one
                F.concat(F.lit("rawid:"),
                         F.col(self._order).cast("string"))))
        # deterministic keeper: lowest order_col per canonical key
        # (parity with crawl_stage0_funnel's min-doc_id rule)
        wkeep = Window.partitionBy(fp).orderBy(self._order)
        batch = staged.withColumn(rn, F.row_number().over(wkeep)) \
            .filter(F.col(rn) == 1).drop(rn)
        seen = _read_store(self._spark, self._dedup_store,
                           "fingerprint string",
                           exclude_batch=batch_id)
        # inline anti-join on the staged key: the multi-fallback fp
        # (md5-of-canonical / raw: / rawid:) is a function of THREE
        # inputs, not one column, so incremental_dedup's
        # key_fn-over-one-column contract cannot express it — and the
        # staged column must ride through to the store write anyway
        survivors = batch.join(
            seen.select(F.col("fingerprint").alias(fp)),
            fp, "left_anti")
        # one materialization feeds the fingerprint write AND the cap
        # stage (the dedup-sink precedent)
        survivors = survivors.localCheckpoint()
        # the per-row 'rawid:' sentinels exist only to keep NULL-url
        # rows distinct WITHIN a batch — persisted, they would acquire
        # cross-batch dedup meaning they don't have (an order value
        # repeating across batches would silently anti-join an
        # unrelated NULL-url document away; round-10 seventh-pass
        # review).  Content-derived keys (md5 / raw:) do persist.
        _overwrite_batch_partition(
            survivors.filter(~F.col(fp).startswith("rawid:"))
            .select(F.col(fp).alias("fingerprint")),
            self._dedup_store, batch_id)
        cap_sink = DomainCapSink(
            self._spark, self._cap_store, self._out,
            url_col=canon, order_col=self._order, cap=self._cap,
            key_from_canonical=True,  # full-PSL default, canon staged
            out_drop_cols=(canon, fp))
        admitted = cap_sink._admit(survivors, batch_id)
        # the inner sink already counted the survivors frame as its
        # n_in — reuse it instead of paying a second count job
        _, n_dedup, n_adm = cap_sink.batch_stats[-1]
        self.batch_stats.append((batch_id, n_in, n_dedup, n_adm))
        return admitted
