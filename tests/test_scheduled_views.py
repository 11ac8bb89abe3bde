"""Scheduled-view store tests (plans/scheduled_views.py): backfill,
incremental refresh equivalence, touched-date partition rewrites, view
querying with further stages, and unmergeable-aggregate rejection."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.plans.scheduled_views import (
    ScheduledViewSpec,
    ScheduledViewStore,
    materialize,
    merge_increment,
)
from sumologic_aws_lambda_spark.plans.sumoql import SumoQLError, SumoSchema

SCHEMA = SumoSchema(raw_col="msg", ts_col="ts",
                    meta_cols={"_sourceCategory": "cat"})

SPEC = ScheduledViewSpec(
    name="daily_counts",
    query="* | timeslice 1d | count, sum(v) by _timeslice, cat",
)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (i, f"2024-01-{(i % 3) + 1:02d} 10:{i % 60:02d}:00",
         "api" if i % 2 == 0 else "web", "m", i)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id int, ts string, cat string, "
                                     "msg string, v long")
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _as_dict(df):
    return {
        (r["_timeslice"], r["cat"]): (r["_count"], r["_sum_v"])
        for r in df.collect()
    }


def test_incremental_merge_equals_full_recompute(events):
    full = materialize(events, SPEC, SCHEMA)
    old = events.filter(F.col("id") % 4 != 0)
    late = events.filter(F.col("id") % 4 == 0)
    merged = merge_increment(
        materialize(old, SPEC, SCHEMA), materialize(late, SPEC, SCHEMA)
    )
    assert _as_dict(merged) == _as_dict(full)


def test_store_backfill_refresh_and_read(spark, events, tmp_path):
    store = ScheduledViewStore(str(tmp_path))
    old = events.filter(F.col("id") % 4 != 0)
    late = events.filter(F.col("id") % 4 == 0)
    store.backfill(old, SPEC, SCHEMA)
    store.refresh(spark, late, "daily_counts", SCHEMA)
    got = _as_dict(store.read(spark, "daily_counts"))
    assert got == _as_dict(materialize(events, SPEC, SCHEMA))


def test_refresh_rewrites_only_touched_dates(spark, events, tmp_path):
    store = ScheduledViewStore(str(tmp_path))
    store.backfill(events, SPEC, SCHEMA)
    path = os.path.join(str(tmp_path), "daily_counts")
    before = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path) if d.startswith("_slice_date=")
    }
    assert len(before) == 3
    # late batch touching only 2024-01-02
    late = events.filter(
        F.to_date("ts") == F.lit("2024-01-02").cast("date")
    ).limit(5)
    store.refresh(spark, late, "daily_counts", SCHEMA)
    after = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path) if d.startswith("_slice_date=")
    }
    untouched = [d for d in before if "2024-01-02" not in d]
    assert untouched and all(before[d] == after[d] for d in untouched)
    assert after["_slice_date=2024-01-02"] != before["_slice_date=2024-01-02"]


def test_query_view_with_further_stages(spark, events, tmp_path):
    store = ScheduledViewStore(str(tmp_path))
    store.backfill(events, SPEC, SCHEMA)
    out = store.query(
        spark, "_view=daily_counts | sum(_count) by cat", SCHEMA
    )
    got = {r.cat: r._sum__count for r in out.collect()}
    assert got == {"api": 60, "web": 60}


def test_view_rejects_unmergeable_and_sliceless(events):
    with pytest.raises(SumoQLError, match="not mergeable"):
        materialize(
            events,
            ScheduledViewSpec(
                name="bad",
                query="* | timeslice 1d | avg(v) by _timeslice, cat",
            ),
            SCHEMA,
        )
    with pytest.raises(SumoQLError, match="timeslice"):
        materialize(
            events,
            ScheduledViewSpec(name="bad2", query="* | count by cat"),
            SCHEMA,
        )


def test_bad_view_name_and_query_prefix(spark, tmp_path):
    with pytest.raises(SumoQLError):
        ScheduledViewSpec(name="no spaces", query="* | count")
    store = ScheduledViewStore(str(tmp_path))
    with pytest.raises(SumoQLError):
        store.query(spark, "not_a_view_query")


def test_streaming_maintenance_matches_batch(spark, tmp_path):
    import json

    from sumologic_aws_lambda_spark.plans.scheduled_views import (
        run_view_stream,
    )

    (tmp_path / "in").mkdir()
    store = ScheduledViewStore(str(tmp_path / "views"))
    spec = ScheduledViewSpec(
        name="stream_daily",
        query="* | timeslice 1d | count, sum(v) by _timeslice, cat",
    )

    def write_batch(fname, rows):
        p = tmp_path / "in" / fname
        p.write_text("\n".join(json.dumps(r) for r in rows))

    def run():
        q = run_view_stream(
            spark, str(tmp_path / "in"), store, spec,
            str(tmp_path / "ckpt"), schema=SCHEMA)
        q.awaitTermination()

    write_batch("b1.json", [
        {"ts": "2024-02-01 10:00:00", "cat": "api", "v": 5},
        {"ts": "2024-02-01 11:00:00", "cat": "api", "v": 7},
        {"ts": "2024-02-02 09:00:00", "cat": "web", "v": 1},
    ])
    run()
    # late batch: touches day 1 again plus a new day
    write_batch("b2.json", [
        {"ts": "2024-02-01 23:00:00", "cat": "api", "v": 3},
        {"ts": "2024-02-03 08:00:00", "cat": "web", "v": 9},
    ])
    run()

    got = {
        (str(r["_timeslice"].date()), r["cat"]): (r["_count"], r["_sum_v"])
        for r in store.read(spark, "stream_daily").collect()
    }
    assert got == {
        ("2024-02-01", "api"): (3, 15),
        ("2024-02-02", "web"): (1, 1),
        ("2024-02-03", "web"): (1, 9),
    }


def test_merge_property_any_split_equals_full(spark):
    """Hypothesis-style property over deterministic splits: for every
    2-way split of the input, refresh(backfill(A), B) == backfill(A∪B)."""
    rows = [
        (i, f"2024-03-{(i % 5) + 1:02d} 0{i % 9}:00:00",
         f"c{i % 3}", "m", (i * 7) % 13)
        for i in range(90)
    ]
    events = spark.createDataFrame(
        rows, "id int, ts string, cat string, msg string, v long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    full = _as_dict(materialize(events, SPEC, SCHEMA))
    for mod in (2, 3, 7):
        a = events.filter(F.col("id") % mod != 0)
        b = events.filter(F.col("id") % mod == 0)
        merged = merge_increment(
            materialize(a, SPEC, SCHEMA), materialize(b, SPEC, SCHEMA)
        )
        assert _as_dict(merged) == full, f"split mod {mod} diverged"


def test_view_rejects_count_distinct(events):
    # `_count_distinct_v` also carries the `_count_` prefix — merging
    # distinct counts by SUM would overcount values shared across batches.
    with pytest.raises(SumoQLError, match="not mergeable"):
        materialize(
            events,
            ScheduledViewSpec(
                name="cd",
                query="* | timeslice 1d | count_distinct(v)"
                      " by _timeslice, cat",
            ),
            SCHEMA,
        )


def test_hll_sketch_views_merge_exactly(spark, events, tmp_path):
    # Distinct-count views: HLL partials max-merge register-wise, so the
    # incrementally maintained sketch equals the one-shot sketch and the
    # estimates agree exactly.
    spec = ScheduledViewSpec(
        name="daily_users",
        query="* | timeslice 1d | count, hll(v) by _timeslice, cat",
    )
    full = materialize(events, spec, SCHEMA)
    old = events.filter(F.col("id") % 4 != 0)
    late = events.filter(F.col("id") % 4 == 0)
    merged = merge_increment(
        materialize(old, spec, SCHEMA), materialize(late, spec, SCHEMA)
    )

    def est(df):
        return {
            (r["_timeslice"], r["cat"]): r["n"]
            for r in df.selectExpr(
                "_timeslice", "cat",
                "hll_sketch_estimate(_hll_v) AS n").collect()
        }

    assert est(merged) == est(full)

    # binary sketch column round-trips through the parquet store and the
    # estimate reads back through an eval stage on the _view= path
    store = ScheduledViewStore(str(tmp_path))
    store.backfill(old, spec, SCHEMA)
    store.refresh(spark, late, "daily_users", SCHEMA)
    out = store.query(
        spark,
        "_view=daily_users | hll_sketch_estimate(_hll_v) as n_distinct"
        " | fields cat, _timeslice, n_distinct",
        SCHEMA,
    )
    got = {(r["_timeslice"], r["cat"]): r["n_distinct"]
           for r in out.collect()}
    assert got == est(full)


def test_maintainer_skips_redelivered_batch(spark, tmp_path):
    from sumologic_aws_lambda_spark.plans.scheduled_views import (
        ScheduledViewMaintainer,
    )

    store = ScheduledViewStore(str(tmp_path))
    spec = ScheduledViewSpec(
        name="retry_view",
        query="* | timeslice 1d | count by _timeslice, cat",
    )
    m = ScheduledViewMaintainer(spark, store, spec, SCHEMA)
    batch = spark.createDataFrame(
        [("2024-08-01 10:00:00", "api", "m", 1)],
        "ts string, cat string, msg string, v long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    m(batch, 0)
    m(batch, 0)        # redelivery of the SAME batch id: no double merge
    assert store.read(spark, "retry_view").collect()[0]["_count"] == 1
    m(batch, 1)        # a genuinely new batch still merges
    assert store.read(spark, "retry_view").collect()[0]["_count"] == 2


def test_fresh_checkpoint_gets_fresh_high_water_mark(spark, tmp_path):
    from sumologic_aws_lambda_spark.plans.scheduled_views import (
        ScheduledViewMaintainer,
    )

    store = ScheduledViewStore(str(tmp_path))
    spec = ScheduledViewSpec(
        name="hwm_view",
        query="* | timeslice 1d | count by _timeslice, cat",
    )
    batch = spark.createDataFrame(
        [("2024-09-01 10:00:00", "api", "m", 1)],
        "ts string, cat string, msg string, v long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    run1 = ScheduledViewMaintainer(spark, store, spec, SCHEMA, run_id="ck1")
    run1(batch, 0)
    run1(batch, 0)   # redelivery within the run: skipped
    assert store.read(spark, "hwm_view").collect()[0]["_count"] == 1
    # a NEW run (fresh checkpoint) restarts ids at 0 — must NOT be
    # swallowed by run1's mark
    run2 = ScheduledViewMaintainer(spark, store, spec, SCHEMA, run_id="ck2")
    run2(batch, 0)
    assert store.read(spark, "hwm_view").collect()[0]["_count"] == 2
    # re-backfill clears every mark; the next batch applies again
    store.backfill(batch, spec, SCHEMA)
    run3 = ScheduledViewMaintainer(spark, store, spec, SCHEMA, run_id="ck1")
    run3(batch, 0)
    assert store.read(spark, "hwm_view").collect()[0]["_count"] == 2


def test_recreated_checkpoint_is_keyed_by_query_id(spark, tmp_path):
    """Deleting + recreating a checkpoint at the same PATH restarts
    batch ids at 0 under a new streaming query id — the mark must be
    keyed by that id, not the path, or early batches are swallowed."""
    import json
    import os

    from sumologic_aws_lambda_spark.plans.scheduled_views import (
        ScheduledViewMaintainer,
    )

    store = ScheduledViewStore(str(tmp_path / "views"))
    ck = tmp_path / "ck"
    spec = ScheduledViewSpec(
        name="qid_view",
        query="* | timeslice 1d | count by _timeslice, cat",
    )
    batch = spark.createDataFrame(
        [("2024-09-02 10:00:00", "api", "m", 1)],
        "ts string, cat string, msg string, v long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    def start_checkpoint(qid: str) -> None:
        os.makedirs(ck, exist_ok=True)
        with open(ck / "metadata", "w") as fh:
            json.dump({"id": qid}, fh)

    start_checkpoint("11111111-aaaa")
    run1 = ScheduledViewMaintainer(spark, store, spec, SCHEMA,
                                   run_id=str(ck), checkpoint_dir=str(ck))
    run1(batch, 0)
    run1(batch, 0)  # redelivery under the same query id: skipped
    assert store.read(spark, "qid_view").collect()[0]["_count"] == 1

    # checkpoint deleted + recreated at the SAME path → new query id,
    # batch ids restart at 0 — must merge, not be skipped
    import shutil

    shutil.rmtree(ck)
    start_checkpoint("22222222-bbbb")
    run2 = ScheduledViewMaintainer(spark, store, spec, SCHEMA,
                                   run_id=str(ck), checkpoint_dir=str(ck))
    run2(batch, 0)
    assert store.read(spark, "qid_view").collect()[0]["_count"] == 2


def test_mark_keys_do_not_collide_after_sanitization(spark, tmp_path):
    """run_id 'ck-1' and 'ck_1' sanitize to the same \\w+ string; the
    hashed filename must keep their marks distinct."""
    from sumologic_aws_lambda_spark.plans.scheduled_views import (
        ScheduledViewMaintainer,
    )

    store = ScheduledViewStore(str(tmp_path))
    spec = ScheduledViewSpec(
        name="collide_view",
        query="* | timeslice 1d | count by _timeslice, cat",
    )
    batch = spark.createDataFrame(
        [("2024-09-03 10:00:00", "api", "m", 1)],
        "ts string, cat string, msg string, v long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    a = ScheduledViewMaintainer(spark, store, spec, SCHEMA, run_id="ck-1")
    b = ScheduledViewMaintainer(spark, store, spec, SCHEMA, run_id="ck_1")
    assert a._hwm_path() != b._hwm_path()
    a(batch, 0)
    b(batch, 0)  # distinct run: must not be swallowed by a's mark
    assert store.read(spark, "collide_view").collect()[0]["_count"] == 2


def test_refresh_unregistered_view_raises_helpful_error(spark, tmp_path):
    store = ScheduledViewStore(str(tmp_path))
    spec = ScheduledViewSpec(
        name="orphan_view",
        query="* | timeslice 1d | count by _timeslice, cat",
    )
    batch = spark.createDataFrame(
        [("2024-09-04 10:00:00", "api", "m", 1)],
        "ts string, cat string, msg string, v long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    store.register(spec)
    store.backfill(batch, spec, SCHEMA)
    # fresh-process resume: data on disk, spec not registered
    fresh = ScheduledViewStore(str(tmp_path))
    with pytest.raises(SumoQLError, match="not registered"):
        fresh.refresh(spark, batch, "orphan_view", SCHEMA)


def test_view_query_threads_lookups(spark, tmp_path):
    """_view= piped stages can use the lookup verb when a registry is
    passed through ScheduledViewStore.query."""
    store = ScheduledViewStore(str(tmp_path))
    spec = ScheduledViewSpec(
        name="lkp_view",
        query="* | timeslice 1d | count by _timeslice, cat",
    )
    store.register(spec)
    batch = spark.createDataFrame(
        [("2024-09-05 10:00:00", "api", "m", 1),
         ("2024-09-05 11:00:00", "web", "m", 1)],
        "ts string, cat string, msg string, v long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    store.backfill(batch, spec, SCHEMA)
    dim = spark.createDataFrame(
        [("api", "backend"), ("web", "frontend")],
        "cat string, tier string",
    )
    out = store.query(
        spark, "_view=lkp_view | lookup tier from tiers on cat",
        SCHEMA, lookups={"tiers": dim},
    )
    got = {r.cat: r.tier for r in out.collect()}
    assert got == {"api": "backend", "web": "frontend"}


def test_legacy_high_water_mark_is_honored_and_migrated(spark, tmp_path):
    """Marks written by the pre-round-6 filename (sanitized run_id, no
    digest) must still suppress redelivered batches after upgrade, and
    the first applied batch retires the legacy file."""
    import os

    from sumologic_aws_lambda_spark.plans.scheduled_views import (
        ScheduledViewMaintainer,
    )

    store = ScheduledViewStore(str(tmp_path))
    spec = ScheduledViewSpec(
        name="legacy_view",
        query="* | timeslice 1d | count by _timeslice, cat",
    )
    batch = spark.createDataFrame(
        [("2024-09-06 10:00:00", "api", "m", 1)],
        "ts string, cat string, msg string, v long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    m = ScheduledViewMaintainer(spark, store, spec, SCHEMA, run_id="ckX")
    m(batch, 0)   # establishes the view + new-format mark at id 0
    # simulate the pre-upgrade state: legacy-format mark at id 1,
    # new-format mark absent
    os.remove(m._hwm_path())
    with open(m._legacy_hwm_path(), "w") as fh:
        fh.write("1")
    m2 = ScheduledViewMaintainer(spark, store, spec, SCHEMA, run_id="ckX")
    m2(batch, 1)   # redelivery of batch 1: suppressed by the LEGACY mark
    assert store.read(spark, "legacy_view").collect()[0]["_count"] == 1
    m2(batch, 2)   # genuinely new batch applies and retires the legacy file
    assert store.read(spark, "legacy_view").collect()[0]["_count"] == 2
    assert not os.path.exists(m2._legacy_hwm_path())
    assert os.path.exists(m2._hwm_path())


def test_view_rejects_percentile(events):
    """Percentiles compile to `_pct_<arg>_<p>` columns; they are not
    mergeable partials and must be rejected at registration, not
    silently treated as group keys (which would make refresh diverge
    from a full recompute)."""
    spec = ScheduledViewSpec(
        name="pct_view",
        query="* | timeslice 1d | count, percentile(v, 95) "
              "by _timeslice, cat",
    )
    with pytest.raises(SumoQLError, match="not mergeable"):
        materialize(events, spec, SCHEMA)
