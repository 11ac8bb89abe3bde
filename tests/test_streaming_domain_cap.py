"""Streaming per-registered-domain cap sink (streaming/domain_cap.py)
— the foreachBatch twin of queries/curation.py::url_domain_caps."""

from __future__ import annotations

import json

import pytest

from sumologic_aws_lambda_spark.streaming.domain_cap import DomainCapSink


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, url string")


def _urls(pub, shard, ids):
    return [(i, f"https://cdn{shard}.{pub}.org/d/{i}") for i in ids]


def test_cap_holds_across_batches_and_subdomain_shards(spark, tmp_path):
    sink = DomainCapSink(spark, str(tmp_path / "store"),
                         str(tmp_path / "out"), cap=3)
    # batch 0: two docs for pub-a (shard 0), one for pub-b
    sink(_batch(spark, _urls("pub-a", 0, [1, 2])
                + _urls("pub-b", 0, [3])), 0)
    # batch 1: three more pub-a docs from a DIFFERENT subdomain shard —
    # only one fits the shared publisher budget
    sink(_batch(spark, _urls("pub-a", 1, [4, 5, 6])), 1)
    assert sink.batch_stats == [(0, 3, 3), (1, 3, 1)]
    out = spark.read.parquet(str(tmp_path / "out"))
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == [1, 2, 3, 4]  # crawl order, cap=3 for pub-a
    store = spark.read.parquet(str(tmp_path / "store"))
    totals = {r["key"]: r["n"] for r in
              store.groupBy("key").sum("admitted")
              .withColumnRenamed("sum(admitted)", "n").collect()}
    assert totals == {"pub-a.org": 3, "pub-b.org": 1}


def test_redelivered_batch_does_not_consume_budget_twice(spark, tmp_path):
    sink = DomainCapSink(spark, str(tmp_path / "store"),
                         str(tmp_path / "out"), cap=3)
    sink(_batch(spark, _urls("pub-a", 0, [1, 2])), 0)
    b1 = _batch(spark, _urls("pub-a", 1, [4, 5, 6]))
    sink(b1, 1)
    # redeliver batch 1 (checkpoint recovery): identical admit set,
    # partition overwritten in place, budget NOT consumed twice
    sink(b1, 1)
    assert sink.batch_stats[-2:] == [(1, 3, 1), (1, 3, 1)]
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 4]
    store = spark.read.parquet(str(tmp_path / "store"))
    total = store.groupBy().sum("admitted").collect()[0][0]
    assert total == 3  # 2 from batch 0 + 1 from batch 1, replay folded


def test_null_keys_share_sentinel_budget_and_cap_validates(spark, tmp_path):
    with pytest.raises(ValueError, match="cap"):
        DomainCapSink(spark, "s", "o", cap=0)
    sink = DomainCapSink(spark, str(tmp_path / "store"),
                         str(tmp_path / "out"), cap=1)
    sink(_batch(spark, [(1, "not a url"), (2, "also-bad"),
                        (3, "https://ok.example.org/x")]), 0)
    assert sink.batch_stats == [(0, 3, 2)]  # 1 malformed + the good row
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def test_cap_over_engine_driven_micro_batches(spark, tmp_path):
    """Cross-batch cap through REAL engine micro-batches: two files →
    two foreachBatch calls (availableNow, maxFilesPerTrigger=1); the
    publisher budget spans them."""
    import os

    src = tmp_path / "in"
    src.mkdir()
    (src / "a_first.json").write_text("\n".join(
        json.dumps({"doc_id": i,
                    "url": f"https://cdn0.pub-a.org/d/{i}"})
        for i in range(1, 3)))
    (src / "b_second.json").write_text("\n".join(
        json.dumps({"doc_id": i,
                    "url": f"https://cdn1.pub-a.org/d/{i}"})
        for i in range(3, 7)))
    # the file source orders micro-batches by MODIFICATION TIME — pin
    # it explicitly so "first crawl wave" is deterministic
    os.utime(src / "a_first.json", (1_000_000, 1_000_000))
    os.utime(src / "b_second.json", (2_000_000, 2_000_000))
    sink = DomainCapSink(spark, str(tmp_path / "store"),
                         str(tmp_path / "out"), cap=3)
    stream = spark.readStream.schema("doc_id bigint, url string") \
        .option("maxFilesPerTrigger", 1).json(str(src))
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)
    out = spark.read.parquet(str(tmp_path / "out"))
    got = sorted(r["doc_id"] for r in out.collect())
    assert len(got) == 3  # the publisher budget, across both shards
    assert got[:2] == [1, 2]  # batch 0 admitted fully, batch 1 topped up


def test_non_http_urls_use_null_sentinel_and_key_column_survives(
        spark, tmp_path):
    """Round-10 second-pass fixes: a non-http(s) URL keys to the
    visible '(null)' sentinel (regexp_extract's '' is nullified, not
    coalesce-bypassed), and a user data column named 'key' survives
    the prior-counts join untouched."""
    sink = DomainCapSink(spark, str(tmp_path / "store"),
                         str(tmp_path / "out"), cap=1)
    batch = spark.createDataFrame(
        [(1, "ftp://files.example.org/a", "k1"),
         (2, "wss://live.example.org/b", "k2"),
         (3, "https://ok.example.org/x", "k3")],
        "doc_id bigint, url string, key string")
    sink(batch, 0)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert "key" in out.columns  # user column not dropped by the join
    got = {r["doc_id"]: r["key"] for r in out.collect()}
    assert got == {1: "k1", 3: "k3"}  # cap=1 per key: ftp row 1 admitted
    store = spark.read.parquet(str(tmp_path / "store"))
    keys = {r["key"] for r in store.select("key").collect()}
    assert "(null)" in keys  # non-http budget is visible, not ''


def test_reserved_internal_names_do_not_shadow_user_columns(
        spark, tmp_path):
    """Round-10 third-pass fix: user batch columns named _cap_key /
    _cap_rn / _cap_prior survive the sink untouched (internal working
    names are extended until they shadow nothing)."""
    sink = DomainCapSink(spark, str(tmp_path / "store"),
                         str(tmp_path / "out"), cap=2)
    batch = spark.createDataFrame(
        [(1, "https://a.pub.org/x", "u1", 7, 9)],
        "doc_id bigint, url string, _cap_key string, "
        "_cap_rn int, _cap_prior int")
    sink(batch, 0)
    out = spark.read.parquet(str(tmp_path / "out"))
    row = out.collect()[0]
    assert row["_cap_key"] == "u1"
    assert row["_cap_rn"] == 7 and row["_cap_prior"] == 9


def test_batch_id_data_column_is_rejected(spark, tmp_path):
    """Round-10 fourth-pass fix: the partition column would shadow a
    user data column named batch_id on read-back — refuse it."""
    sink = DomainCapSink(spark, str(tmp_path / "store"),
                         str(tmp_path / "out"), cap=2)
    batch = spark.createDataFrame(
        [(1, "https://a.pub.org/x", 99)],
        "doc_id bigint, url string, batch_id bigint")
    with pytest.raises(ValueError, match="batch_id"):
        sink(batch, 0)


def test_curation_stage0_sink_dedup_then_cap(spark, tmp_path):
    """Composed streaming stage-0: URL-variant spellings of one page
    collapse BEFORE the cap (dedup-first production order), the cap
    spans batches and subdomain shards, and redelivery is idempotent
    end to end."""
    from sumologic_aws_lambda_spark.streaming.domain_cap import (
        CurationStage0Sink,
    )

    sink = CurationStage0Sink(
        spark, str(tmp_path / "fp"), str(tmp_path / "cap"),
        str(tmp_path / "out"), cap=2)
    b0 = spark.createDataFrame([
        # three spellings of ONE page -> one survivor, one cap slot
        (1, "HTTPS://WWW.CDN0.Pub-A.org:443/p/1?utm_source=x"),
        (2, "https://cdn0.pub-a.org/p/1"),
        (3, "https://bot@cdn0.pub-a.org/p/1#frag"),
        # a second distinct page for the same publisher
        (4, "https://cdn1.pub-a.org/p/2"),
    ], "doc_id bigint, url string")
    sink(b0, 0)
    # batch 1: a re-crawl of page 1 (cross-batch dedup) plus two new
    # pages; the publisher budget (2) is already full
    b1 = spark.createDataFrame([
        (5, "https://www.cdn0.pub-a.org/p/1?gclid=z"),
        (6, "https://cdn2.pub-a.org/p/3"),
        (7, "https://cdn0.pub-b.org/p/9"),
    ], "doc_id bigint, url string")
    sink(b1, 1)
    assert sink.batch_stats == [(0, 4, 2, 2), (1, 3, 2, 1)]
    out = spark.read.parquet(str(tmp_path / "out"))
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == [1, 4, 7]  # pub-a capped at 2, pub-b's page admitted
    # end-to-end replay idempotence
    sink(b1, 1)
    assert sink.batch_stats[-1] == (1, 3, 2, 1)
    out2 = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r["doc_id"] for r in out2.collect()) == [1, 4, 7]


def test_curation_stage0_null_urls_and_user_fp_column(spark, tmp_path):
    """Round-10 fifth-pass fixes: NULL-url rows get per-row fallback
    keys (they must NOT collapse into one under dropDuplicates-style
    NULL equality), and a user data column named _fp survives (the
    anti-join no longer routes through incremental_dedup's hardcoded
    working column)."""
    from sumologic_aws_lambda_spark.streaming.domain_cap import (
        CurationStage0Sink,
    )

    sink = CurationStage0Sink(
        spark, str(tmp_path / "fp"), str(tmp_path / "cap"),
        str(tmp_path / "out"), cap=5)
    batch = spark.createDataFrame(
        [(1, None, "a"), (2, None, "b"),
         (3, "https://x.pub.org/p", "c")],
        "doc_id bigint, url string, _fp string")
    sink(batch, 0)
    assert sink.batch_stats == [(0, 3, 3, 3)]  # both NULL rows survive
    out = spark.read.parquet(str(tmp_path / "out"))
    got = {r["doc_id"]: r["_fp"] for r in out.collect()}
    assert got == {1: "a", 2: "b", 3: "c"}  # user _fp intact
    # staging columns must not leak into the admitted output
    assert not [c for c in out.columns if c.startswith("_cur")]


def test_curation_stage0_keeper_is_lowest_order(spark, tmp_path):
    """The within-batch keeper is the LOWEST order_col spelling per
    canonical key — deterministic under replay, matching the batch
    funnel's min-doc_id rule."""
    from sumologic_aws_lambda_spark.streaming.domain_cap import (
        CurationStage0Sink,
    )

    sink = CurationStage0Sink(
        spark, str(tmp_path / "fp"), str(tmp_path / "cap"),
        str(tmp_path / "out"), cap=5)
    batch = spark.createDataFrame(
        [(9, "https://www.pub.org/p?utm_source=x"),
         (2, "https://pub.org/p"),
         (5, "HTTPS://PUB.ORG:443/p#z")],
        "doc_id bigint, url string")
    sink(batch, 0)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_null_url_sentinels_do_not_persist_to_dedup_store(
        spark, tmp_path):
    """Round-10 seventh-pass fix: the per-row 'rawid:' fallback keys of
    NULL-url rows keep them distinct WITHIN a batch but must not gain
    cross-batch dedup meaning — a later batch reusing the same order
    value must not be anti-joined away."""
    from sumologic_aws_lambda_spark.streaming.domain_cap import (
        CurationStage0Sink,
    )

    sink = CurationStage0Sink(
        spark, str(tmp_path / "fp"), str(tmp_path / "cap"),
        str(tmp_path / "out"), cap=9)
    b0 = spark.createDataFrame([(1, None), (2, "https://p.org/a")],
                               "doc_id bigint, url string")
    sink(b0, 0)
    # batch 1 reuses doc_id=1 for a DIFFERENT (still NULL-url) doc
    b1 = spark.createDataFrame([(1, None)],
                               "doc_id bigint, url string")
    sink(b1, 1)
    assert sink.batch_stats == [(0, 2, 2, 2), (1, 1, 1, 1)]
    store = spark.read.parquet(str(tmp_path / "fp"))
    fps = [r["fingerprint"] for r in store.collect()]
    assert not [f for f in fps if f.startswith("rawid:")]


def test_curation_stage0_cap_validates_at_construction(spark):
    """Round-10 eighth-pass fix: a bad cap fails at construction, not
    inside the first batch after the dedup store was written."""
    from sumologic_aws_lambda_spark.streaming.domain_cap import (
        CurationStage0Sink,
    )

    with pytest.raises(ValueError, match="cap"):
        CurationStage0Sink(spark, "a", "b", "c", cap=0)


def test_case_variant_collisions_are_caught(spark, tmp_path):
    """Round-10 ninth-pass fixes: Spark resolves columns
    case-insensitively, so the collision guards must too — a user
    '_CAP_KEY' column survives (prefix extends) and a 'Batch_ID'
    column is rejected."""
    sink = DomainCapSink(spark, str(tmp_path / "store"),
                         str(tmp_path / "out"), cap=2)
    batch = spark.createDataFrame(
        [(1, "https://a.pub.org/x", "u1")],
        "doc_id bigint, url string, _CAP_key string")
    sink(batch, 0)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.collect()[0]["_CAP_key"] == "u1"
    bad = spark.createDataFrame(
        [(1, "https://a.pub.org/x", 9)],
        "doc_id bigint, url string, Batch_ID bigint")
    with pytest.raises(ValueError, match="batch_id"):
        sink(bad, 1)


def test_raw_url_fallback_cannot_forge_the_rawid_namespace(
        spark, tmp_path):
    """Round-10 tenth-pass fix: a malformed URL starting with 'id:'
    must not produce a fingerprint in the 'rawid:' sentinel namespace
    (it would collide with a NULL-url row's sentinel and be excluded
    from the store)."""
    from sumologic_aws_lambda_spark.streaming.domain_cap import (
        CurationStage0Sink,
    )

    sink = CurationStage0Sink(
        spark, str(tmp_path / "fp"), str(tmp_path / "cap"),
        str(tmp_path / "out"), cap=9)
    batch = spark.createDataFrame(
        [(7, None), (8, "id:7"), (9, "https://p.org/a")],
        "doc_id bigint, url string")
    sink(batch, 0)
    # doc 8 must NOT be dropped as a 'duplicate' of NULL-url doc 7
    assert sink.batch_stats == [(0, 3, 3, 3)]
    store = spark.read.parquet(str(tmp_path / "fp"))
    fps = [r["fingerprint"] for r in store.collect()]
    # the malformed-URL key persists (raw:md5...), the sentinel doesn't
    assert len([f for f in fps if f.startswith("raw:")]) == 1
    assert not [f for f in fps if f.startswith("rawid:")]
    # and a RE-CRAWL of the same malformed URL is deduped cross-batch
    sink(spark.createDataFrame([(10, "id:7")],
                               "doc_id bigint, url string"), 1)
    assert sink.batch_stats[-1] == (1, 1, 0, 0)


def test_default_cap_key_uses_full_psl_snapshot(spark):
    """Round-12: the sinks' DEFAULT keying is the full vendored
    9,506-rule PSL snapshot, not the fixture tuple — pinned on a host
    where the two provably diverge (*.ck wildcard: the fixture tuple
    would fold foo.bar.ck to bar.ck; the full list makes bar.ck a
    public suffix, so the publisher is foo.bar.ck)."""
    from sumologic_aws_lambda_spark.streaming.domain_cap import (
        stage_cap_key_psl,
    )

    df = spark.createDataFrame(
        [(1, "https://a.b.pub.co.uk/x?utm_source=f"),
         (2, "https://foo.bar.ck/x"),
         (3, "not a url"), (4, None)],
        "doc_id bigint, url string")
    out = {r.doc_id: r.k
           for r in stage_cap_key_psl(df, "url", "k").collect()}
    assert out[1] == "pub.co.uk"
    assert out[2] == "foo.bar.ck"
    assert out[3] is None and out[4] is None
