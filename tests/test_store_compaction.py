"""Store compaction (streaming/dedup.py::compact_batch_store): the
small-files maintenance pass for the per-batch-overwrite stores —
semantics preserved across every store family, replay safety of the
newest batch intact, crash protocol resumable."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.streaming.dedup import (
    COMPACTED_BATCH_ID,
    IncrementalDedupSink,
    compact_batch_store,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _partitions(tmp_path, store="store"):
    return sorted(p.name for p in (tmp_path / store).iterdir()
                  if p.name.startswith("batch_id="))


def test_fingerprint_store_compaction_preserves_dedup(spark, tmp_path):
    sink = IncrementalDedupSink(spark, str(tmp_path / "store"),
                                str(tmp_path / "out"))
    sink(_docs(spark, [(1, "alpha"), (2, "beta")]), 0)
    sink(_docs(spark, [(3, "gamma")]), 1)
    sink(_docs(spark, [(4, "delta")]), 2)
    # compact the two committed batches; batch 2 (replayable) untouched
    removed, rows = compact_batch_store(
        spark, str(tmp_path / "store"), upto_batch_id=2)
    assert removed == 2 and rows == 3
    assert _partitions(tmp_path) == [
        f"batch_id={COMPACTED_BATCH_ID}", "batch_id=2"]
    # store content identical: same fingerprints, batch 2's still under
    # its own id so its replay exclusion keeps working
    store = spark.read.parquet(str(tmp_path / "store"))
    assert store.count() == 4
    # a replay of the newest batch is still idempotent post-compaction
    sink(_docs(spark, [(4, "delta")]), 2)
    assert sink.batch_stats[-1] == (2, 1, 1)
    # and new batches dedup against the COMPACTED rows
    sink(_docs(spark, [(5, "alpha"), (6, "epsilon")]), 3)
    assert sink.batch_stats[-1] == (3, 2, 1)


def test_recompaction_folds_previous_consolidation(spark, tmp_path):
    sink = IncrementalDedupSink(spark, str(tmp_path / "store"),
                                str(tmp_path / "out"))
    for i, word in enumerate(["a", "b", "c", "d"]):
        sink(_docs(spark, [(i, word)]), i)
    assert compact_batch_store(
        spark, str(tmp_path / "store"), 2) == (2, 2)
    # second compaction folds -1 AND batches 2..3 into a fresh -1
    assert compact_batch_store(
        spark, str(tmp_path / "store"), 4) == (3, 4)
    assert _partitions(tmp_path) == [f"batch_id={COMPACTED_BATCH_ID}"]
    sink(_docs(spark, [(9, "a"), (10, "e")]), 4)
    assert sink.batch_stats[-1] == (4, 2, 1)


def test_count_store_compaction_with_sum_agg(spark, tmp_path):
    from sumologic_aws_lambda_spark.streaming.domain_cap import (
        DomainCapSink,
    )

    sink = DomainCapSink(
        spark, str(tmp_path / "store"), str(tmp_path / "out"),
        url_col="pub", order_col="doc_id", cap=3, key_fn=lambda c: c)
    rows = lambda r: spark.createDataFrame(  # noqa: E731
        r, "doc_id bigint, pub string")
    sink(rows([(1, "a")]), 0)
    sink(rows([(2, "a")]), 1)
    sink(rows([(3, "a")]), 2)
    removed, n = compact_batch_store(
        spark, str(tmp_path / "store"), 3,
        agg=lambda d: d.groupBy("key").agg(
            F.sum("admitted").cast("bigint").alias("admitted")))
    assert removed == 3 and n == 1          # three rows folded to one
    # running count preserved: publisher 'a' has consumed its cap of 3
    sink(rows([(4, "a"), (5, "b")]), 3)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 3, 5]


def test_band_store_compaction_with_min_agg(spark, tmp_path):
    from sumologic_aws_lambda_spark.streaming.neardup import (
        MinHashDedupSink,
    )

    tpl = " ".join(f"m{i}n{i}" for i in range(30))
    sink = MinHashDedupSink(spark, str(tmp_path / "store"),
                            str(tmp_path / "out"))
    sink(_docs(spark, [(1, tpl + " x1")]), 0)
    sink(_docs(spark, [(2, tpl + " x2")]), 1)       # blocked by batch 0
    compact_batch_store(
        spark, str(tmp_path / "store"), 2,
        agg=lambda d: d.groupBy("band", "band_key").agg(
            F.min("first_doc").alias("first_doc")))
    # compacted buckets still block a later near-duplicate
    sink(_docs(spark, [(3, tpl + " x3")]), 2)
    assert sink.batch_stats[-1] == (2, 1, 0)


def test_uncommitted_tmp_is_discarded_and_rerun(spark, tmp_path):
    sink = IncrementalDedupSink(spark, str(tmp_path / "store"),
                                str(tmp_path / "out"))
    sink(_docs(spark, [(1, "a")]), 0)
    sink(_docs(spark, [(2, "b")]), 1)
    # a crash before the commit rename leaves _compact_tmp; sources are
    # all intact, so the next run discards it and compacts fresh
    (tmp_path / "store" / "_compact_tmp").mkdir()
    (tmp_path / "store" / "_compact_tmp" / "junk").write_text("x")
    removed, n = compact_batch_store(spark, str(tmp_path / "store"), 2)
    assert (removed, n) == (2, 2)
    assert not (tmp_path / "store" / "_compact_tmp").exists()
    assert _partitions(tmp_path) == [f"batch_id={COMPACTED_BATCH_ID}"]


def test_committed_ready_dir_is_finished(spark, tmp_path):
    sink = IncrementalDedupSink(spark, str(tmp_path / "store"),
                                str(tmp_path / "out"))
    sink(_docs(spark, [(1, "a")]), 0)
    sink(_docs(spark, [(2, "b")]), 1)
    # simulate a crash AFTER the commit rename: the consolidated rows
    # sit in the ready dir, source batch 0 not yet deleted
    consolidated = spark.read.parquet(
        str(tmp_path / "store" / "batch_id=0")).select("fingerprint")
    consolidated.write.parquet(
        str(tmp_path / "store" / "_compact_ready.upto=1"))
    removed, n = compact_batch_store(spark, str(tmp_path / "store"), 1)
    assert removed == 1 and n == 0          # finished, not re-run
    assert _partitions(tmp_path) == [
        f"batch_id={COMPACTED_BATCH_ID}", "batch_id=1"]
    store = spark.read.parquet(str(tmp_path / "store"))
    assert store.count() == 2               # no loss, no duplication


def test_compaction_noop_and_validation(spark, tmp_path):
    assert compact_batch_store(
        spark, str(tmp_path / "nostore"), 5) == (0, 0)
    sink = IncrementalDedupSink(spark, str(tmp_path / "store"),
                                str(tmp_path / "out"))
    sink(_docs(spark, [(1, "a")]), 0)
    # nothing strictly below upto=0 → no-op
    assert compact_batch_store(spark, str(tmp_path / "store"), 0) == (0, 0)
    with pytest.raises(ValueError, match="upto_batch_id"):
        compact_batch_store(spark, str(tmp_path / "store"), -3)


def test_last_committed_batch_id_bounds_compaction(spark, tmp_path):
    """The checkpoint commit log yields the safe compaction bound:
    after two engine-driven runs the helper reports the last committed
    id, compacting strictly below it preserves every behavior, and the
    next engine run still dedups against the compacted rows."""
    import json as _json

    from sumologic_aws_lambda_spark.streaming.dedup import (
        compact_batch_store,
        last_committed_batch_id,
    )
    from sumologic_aws_lambda_spark.streaming.neardup import (
        run_minhash_dedup,
    )

    (tmp_path / "in").mkdir()
    tpl = " ".join(f"c{i}d{i}" for i in range(30))

    def run():
        q, sink = run_minhash_dedup(
            spark, str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "store"), str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        return sink

    assert last_committed_batch_id(
        spark, str(tmp_path / "ckpt")) is None
    (tmp_path / "in" / "b1.json").write_text(
        _json.dumps({"doc_id": 1, "text": tpl + " x1"}) + "\n")
    run()
    (tmp_path / "in" / "b2.json").write_text(
        _json.dumps({"doc_id": 2, "text": tpl + " x2"}) + "\n")
    run()
    upto = last_committed_batch_id(spark, str(tmp_path / "ckpt"))
    assert upto == 1
    removed, n = compact_batch_store(
        spark, str(tmp_path / "store"), upto)
    assert removed == 1 and n > 0           # batch 0 folded, batch 1 kept
    (tmp_path / "in" / "b3.json").write_text(
        _json.dumps({"doc_id": 3, "text": tpl + " x9"}) + "\n")
    sink = run()
    assert sink.batch_stats[-1] == (2, 1, 0)   # blocked by compacted rows


def test_sink_startup_recovers_pending_ready_dir(spark, tmp_path):
    """Round-11 ADVICE (medium): a crash between the commit rename and
    the final rename leaves every compacted row in an underscore dir
    partition discovery skips — restarting the stream WITHOUT another
    compaction call then re-admits previously-seen documents.  Sink
    construction must finish the pending protocol."""
    sink = IncrementalDedupSink(spark, str(tmp_path / "store"),
                                str(tmp_path / "out"))
    sink(_docs(spark, [(1, "a")]), 0)
    sink(_docs(spark, [(2, "b")]), 1)
    # simulate the post-commit crash: consolidated rows in the ready
    # dir, source batch 0 already deleted (the worst window — the
    # store's visible partitions no longer hold batch 0 at all)
    consolidated = spark.read.parquet(
        str(tmp_path / "store" / "batch_id=0")).select("fingerprint")
    consolidated.write.parquet(
        str(tmp_path / "store" / "_compact_ready.upto=1"))
    import shutil

    shutil.rmtree(tmp_path / "store" / "batch_id=0")
    # a FRESH sink over the same store (the restart) must recover
    # before its first trigger: doc 'a' stays deduped
    sink2 = IncrementalDedupSink(spark, str(tmp_path / "store"),
                                 str(tmp_path / "out"))
    assert _partitions(tmp_path) == [
        f"batch_id={COMPACTED_BATCH_ID}", "batch_id=1"]
    sink2(_docs(spark, [(3, "a"), (4, "c")]), 2)
    assert sink2.batch_stats[-1] == (2, 2, 1)


def test_compaction_resumes_then_performs_requested_run(spark, tmp_path):
    """Round-11 ADVICE (low): a compaction call that finds a leftover
    ready dir must finish it AND still perform the compaction it was
    asked for — not silently do only the stale half."""
    sink = IncrementalDedupSink(spark, str(tmp_path / "store"),
                                str(tmp_path / "out"))
    for i, word in enumerate(["a", "b", "c", "d"]):
        sink(_docs(spark, [(i, word)]), i)
    consolidated = spark.read.parquet(
        str(tmp_path / "store" / "batch_id=0")).select("fingerprint")
    consolidated.write.parquet(
        str(tmp_path / "store" / "_compact_ready.upto=1"))
    removed, n = compact_batch_store(spark, str(tmp_path / "store"), 3)
    # recovery removed batch 0, the requested run folded -1 + 1 + 2
    assert n == 3
    assert _partitions(tmp_path) == [
        f"batch_id={COMPACTED_BATCH_ID}", "batch_id=3"]
    store = spark.read.parquet(str(tmp_path / "store"))
    assert store.count() == 4               # no loss, no duplication
    sink(_docs(spark, [(9, "b"), (10, "e")]), 4)
    assert sink.batch_stats[-1] == (4, 2, 1)


def test_runner_auto_compaction_bounds_partitions(spark, tmp_path):
    """compact_every_n_batches on the engine runners: three
    engine-driven availableNow runs with mid-soak compaction keep the
    store partition count bounded, and admissions equal an
    uncompacted twin's over the same feed."""
    import json as _json

    from sumologic_aws_lambda_spark.streaming.dedup import (
        run_incremental_dedup,
    )

    for d in ("in", "in2"):
        (tmp_path / d).mkdir()

    def feed(i, text_rows):
        body = "".join(_json.dumps({"doc_id": d, "text": t}) + "\n"
                       for d, t in text_rows)
        (tmp_path / "in" / f"b{i}.json").write_text(body)
        (tmp_path / "in2" / f"b{i}.json").write_text(body)

    def run(root, **kw):
        q, sink = run_incremental_dedup(
            spark, str(tmp_path / "in"), str(tmp_path / root / "out"),
            str(tmp_path / root / "store"),
            str(tmp_path / root / "ckpt"), **kw)
        q.awaitTermination(120)
        return sink

    def run_twin():
        q, sink = run_incremental_dedup(
            spark, str(tmp_path / "in2"), str(tmp_path / "t" / "out"),
            str(tmp_path / "t" / "store"), str(tmp_path / "t" / "ckpt"))
        q.awaitTermination(120)
        return sink

    feeds = [
        [(1, "a"), (2, "b")],
        [(3, "a"), (4, "c")],
        [(5, "c"), (6, "b"), (7, "d")],
    ]
    for i, rows in enumerate(feeds):
        feed(i, rows)
        s = run("c", compact_every_n_batches=2)
        t = run_twin()
        assert s.batch_stats == t.batch_stats
    # by the third start two batches had committed → compaction ran:
    # partitions are bounded (consolidated + the protected newest +
    # the batch the third run just wrote), not one-per-batch
    parts = _partitions(tmp_path / "c")
    assert f"batch_id={COMPACTED_BATCH_ID}" in parts
    assert len(parts) <= 3
    out_c = spark.read.parquet(str(tmp_path / "c" / "out"))
    out_t = spark.read.parquet(str(tmp_path / "t" / "out"))
    assert (sorted(r.doc_id for r in out_c.collect())
            == sorted(r.doc_id for r in out_t.collect()))


def test_token_budget_order_watermark_raises_on_regression(spark, tmp_path):
    """The TokenBudgetSink monotone-order contract is self-enforcing
    (round-11 verdict watch item): a batch whose min order does not
    exceed every prior batch's max raises before any persistent side
    effect; replays of the SAME batch stay legal."""
    from sumologic_aws_lambda_spark.streaming.domain_cap import (
        TokenBudgetSink,
    )

    rows = lambda r: spark.createDataFrame(  # noqa: E731
        r, "doc_id bigint, pub string, toks bigint")
    sink = TokenBudgetSink(
        spark, str(tmp_path / "store"), str(tmp_path / "out"),
        weight_col="toks", url_col="pub", budget=100,
        key_fn=lambda c: c)
    sink(rows([(1, "a", 10), (2, "a", 20)]), 0)
    # replay of batch 0 re-validates against EARLIER batches only
    sink(rows([(1, "a", 10), (2, "a", 20)]), 0)
    sink(rows([(5, "a", 10)]), 1)
    store_before = spark.read.parquet(
        str(tmp_path / "store")).collect()
    with pytest.raises(ValueError, match="not monotone"):
        sink(rows([(3, "a", 10)]), 2)       # 3 <= batch 1's max 5
    # the rejected batch left no store rows behind
    assert (sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "store")).collect()))
        == sorted(map(tuple, store_before)))
    sink(rows([(6, "a", 10)]), 2)           # monotone again → fine
    assert sink.batch_stats[-1][2] == 1


def test_periodic_compactor_bounds_partitions_mid_stream(spark, tmp_path):
    """PeriodicCompactor: one CONTINUOUS stream (availableNow,
    maxFilesPerTrigger=1 → six sequential batches with no runner
    restart) compacts every 2 batches mid-stream; partitions stay
    bounded and admissions equal an uncompacted twin's."""
    import json as _json
    import os as _os
    import time as _time

    from sumologic_aws_lambda_spark.streaming.dedup import (
        PeriodicCompactor,
        fingerprint_store_agg,
    )

    for d in ("in",):
        (tmp_path / d).mkdir()
    words = [["a", "b"], ["a", "c"], ["d"], ["c", "e"], ["f"], ["b", "g"]]
    now = _time.time()
    doc = 0
    for i, ws in enumerate(words):
        rows = []
        for w in ws:
            rows.append(_json.dumps({"doc_id": doc, "text": w}))
            doc += 1
        p = tmp_path / "in" / f"b{i}.json"
        p.write_text("\n".join(rows) + "\n")
        _os.utime(p, (now + i, now + i))

    def run(root, wrap):
        from sumologic_aws_lambda_spark.streaming.dedup import (
            IncrementalDedupSink,
        )

        sink = IncrementalDedupSink(
            spark, str(tmp_path / root / "store"),
            str(tmp_path / root / "out"))
        fb = wrap(sink)
        q = (spark.readStream.format("json")
             .schema("doc_id long, text string")
             .option("maxFilesPerTrigger", 1)
             .load(str(tmp_path / "in"))
             .writeStream.foreachBatch(fb)
             .option("checkpointLocation", str(tmp_path / root / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        return sink

    c = run("c", lambda s: PeriodicCompactor(
        s, [(str(tmp_path / "c" / "store"), fingerprint_store_agg)], 2))
    t = run("t", lambda s: s)
    assert c.batch_stats == t.batch_stats
    parts = _partitions(tmp_path / "c")
    # last cadence point was batch 4 with upto=batch_id-1 (round-12
    # ADVICE: stay inside compact_batch_store's committed-only bound
    # without the sequential-commit assumption): ids 0-2 folded into
    # -1; 3, 4 and 5 still own their partitions
    assert f"batch_id={COMPACTED_BATCH_ID}" in parts
    assert len(parts) <= 4 < len(_partitions(tmp_path / "t"))
    out_c = sorted(r.doc_id for r in spark.read.parquet(
        str(tmp_path / "c" / "out")).collect())
    out_t = sorted(r.doc_id for r in spark.read.parquet(
        str(tmp_path / "t" / "out")).collect())
    assert out_c == out_t
    with pytest.raises(ValueError, match="compact_every_n_batches"):
        PeriodicCompactor(c, [], 0)


def test_deferred_pool_size_env_knob_validated(monkeypatch):
    """Round-14 (r13 ADVICE): the process-wide deferred-writes/stats
    pool is sizeable via SPARK_GRAFT_DEFERRED_POOL_WORKERS for
    multi-stream deployments — read once at first pool use, bounds
    validated with the function's own error (not a deep TypeError)."""
    from sumologic_aws_lambda_spark.streaming.dedup import DeferredWrites

    saved = DeferredWrites._pool
    try:
        for bad in ("abc", "0", "-2", "65"):
            DeferredWrites._pool = None
            monkeypatch.setenv("SPARK_GRAFT_DEFERRED_POOL_WORKERS", bad)
            with pytest.raises(ValueError,
                               match="SPARK_GRAFT_DEFERRED_POOL_WORKERS"):
                DeferredWrites._shared_pool()
        DeferredWrites._pool = None
        monkeypatch.setenv("SPARK_GRAFT_DEFERRED_POOL_WORKERS", "9")
        pool = DeferredWrites._shared_pool()
        assert pool._max_workers == 9
        assert DeferredWrites._shared_pool() is pool  # cached
        pool.shutdown(wait=False)
    finally:
        DeferredWrites._pool = saved
