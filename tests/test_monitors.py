"""Threshold alert monitors (reference AlertsMonitor,
``sumoresource.py:1503``): folder JSON parsing with variable
substitution, batch evaluation over compiled SumoQL, the streaming
windowed twin, and the org fields-schema registry."""

from __future__ import annotations

import json

import pytest

from sumologic_aws_lambda_spark.plans.monitors import (
    MonitorSpec,
    TriggerCondition,
    evaluate_monitor,
    parse_monitor_folder,
    parse_time_range,
    run_monitor_stream,
)
from sumologic_aws_lambda_spark.plans.sumoql import SumoQLError, SumoSchema
from sumologic_aws_lambda_spark.provisioning import CatalogStore

FOLDER = json.dumps({
    "type": "MonitorsLibraryFolderExport",
    "name": "${env} alerts",
    "children": [
        {
            "type": "MonitorsLibraryMonitorExport",
            "name": "error_spike",
            "monitorType": "Logs",
            "queries": [{"rowId": "A",
                         "query": "_sourceCategory=${cat}"
                                  " | timeslice 1h | count by _timeslice"}],
            "triggers": [
                {"triggerType": "Critical", "threshold": 3,
                 "thresholdType": "GreaterThanOrEqual", "timeRange": "-1h"},
            ],
        },
        {
            "type": "MonitorsLibraryFolderExport",
            "name": "nested",
            "children": [{
                "type": "MonitorsLibraryMonitorExport",
                "name": "quiet_feed",
                "queries": [{"rowId": "A",
                             "query": "* | timeslice 1h"
                                      " | count by _timeslice"}],
                "triggers": [
                    {"triggerType": "Warning", "threshold": 1,
                     "thresholdType": "LessThanOrEqual"},
                ],
            }],
        },
    ],
})


def test_parse_folder_substitutes_and_flattens():
    specs = parse_monitor_folder(FOLDER, {"env": "prod", "cat": "err"})
    assert [s.name for s in specs] == ["error_spike", "quiet_feed"]
    assert "_sourceCategory=err" in specs[0].query
    trig = specs[0].triggers[0]
    assert (trig.severity, trig.threshold, trig.threshold_type) == (
        "Critical", 3.0, "GreaterThanOrEqual")


def test_parse_time_range():
    assert parse_time_range("-15m") == 900
    assert parse_time_range("1d") == 86400
    with pytest.raises(SumoQLError):
        parse_time_range("soon")


def test_bad_threshold_type_raises(spark):
    t = TriggerCondition("Critical", 1.0, threshold_type="Near")
    from pyspark.sql import functions as F

    with pytest.raises(SumoQLError):
        t.compare(F.lit(1))


def _events(spark):
    rows = [
        # 4 errors in hour 0 (>= 3 → Critical), 1 in hour 1
        (1_700_000_000 + off, "err") for off in (10, 20, 30, 40)
    ] + [(1_700_003_600 + 10, "err")] + [
        (1_700_000_000 + 50, "ok"), (1_700_003_600 + 60, "ok"),
    ]
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        rows, "epoch long, category string"
    ).select(F.timestamp_seconds("epoch").alias("ts"), "category")


SCHEMA = SumoSchema(raw_col="category", ts_col="ts",
                    meta_cols={"_sourceCategory": "category"})


def test_evaluate_monitor_batch(spark):
    specs = parse_monitor_folder(FOLDER, {"env": "test", "cat": "err"})
    out = evaluate_monitor(_events(spark), specs[0], SCHEMA).collect()
    # only hour-0 crosses Critical >= 3, with value 4
    assert len(out) == 1
    r = out[0]
    assert (r.monitor, r.severity, r.value, r.threshold) == (
        "error_spike", "Critical", 4.0, 3.0)
    assert r.slice_epoch == 1_700_000_000 - (1_700_000_000 % 3600)


def test_triggers_evaluate_independently(spark):
    spec = MonitorSpec(
        name="m", query="* | timeslice 1h | count by _timeslice",
        triggers=(
            TriggerCondition("Critical", 4, "GreaterThanOrEqual"),
            TriggerCondition("Warning", 2, "GreaterThanOrEqual"),
        ))
    out = evaluate_monitor(_events(spark), spec, SCHEMA)
    sev = sorted((r.severity, r.value) for r in out.collect())
    # hour 0 has 5 events → BOTH Critical and Warning fire; hour 1 has 2
    # events → Warning only (reference: each trigger is independent)
    assert sev == [("Critical", 5.0), ("Warning", 2.0), ("Warning", 5.0)]


def test_streaming_monitor_emits_finalized_windows(spark, tmp_path):
    (tmp_path / "in").mkdir()
    rows = [
        {"ts": f"2024-01-01T00:00:{s:02d}", "event_type": "err"}
        for s in (10, 20, 30, 40)
    ] + [
        {"ts": "2024-01-01T01:00:10", "event_type": "err"},
        # 'ok' noise in hour 0 must NOT count toward the scoped monitor
        {"ts": "2024-01-01T00:00:50", "event_type": "ok"},
        {"ts": "2024-01-01T00:00:55", "event_type": "ok"},
        # far-future sentinel advances the watermark past hours 0 and 1
        # (matches the scope — a filtered-out row cannot move the
        # watermark, which sits above the scope filter in the plan)
        {"ts": "2024-01-01T06:00:00", "event_type": "err"},
    ]
    (tmp_path / "in" / "b1.json").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n")
    # the monitor query's SCOPE is applied to the stream; pipe stages
    # are replaced by the tumbling count
    spec = MonitorSpec(
        name="error_spike", query="event_type=err | timeslice 1h | count",
        triggers=(TriggerCondition("Critical", 3, "GreaterThanOrEqual",
                                   "-1h"),))
    q = run_monitor_stream(
        spark, str(tmp_path / "in"), str(tmp_path / "out"),
        str(tmp_path / "ckpt"), spec,
        group_cols=("event_type",), watermark="1 hour")
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out"))
    # only hour-0/err crosses >= 3, emitted once, after its window
    # finalized under the watermark; hour 1 (1 event) and 'ok' never emit
    assert {(r.monitor, r.severity, r.event_type, r.value)
            for r in out.collect()} == {
        ("error_spike", "Critical", "err", 4.0)}


def test_fields_schema_crud(tmp_path):
    p = tmp_path / "cat.json"
    store = CatalogStore(str(p))
    f1 = store.create_field("user")
    assert store.create_field("user").field_id == f1.field_id  # idempotent
    assert store.get_field_id("user") == f1.field_id
    with pytest.raises(KeyError):
        store.get_field_id("ghost")

    f2 = store.create_field("oldname")
    f3 = store.rename_field(f2.field_id, "newname")
    assert f3.field_id != f2.field_id          # rename = create + delete
    with pytest.raises(KeyError):
        store.get_field_id("oldname")

    # persistence round-trip
    store2 = CatalogStore(str(p))
    assert [f.field_name for f in store2.org_fields()] == [
        "newname", "user"]

    store2.delete_field(f1.field_id)
    assert [f.field_name for f in store2.org_fields()] == ["newname"]


def test_fields_schema_filter_drops_unregistered(spark):
    from pyspark.sql import functions as F

    store = CatalogStore()
    store.create_field("a")
    off = store.create_field("b")
    store.set_field_enabled(off.field_id, False)
    df = spark.createDataFrame([(1,)], "id int").select(
        "id",
        F.create_map(
            F.lit("a"), F.lit("1"),
            F.lit("b"), F.lit("2"),
            F.lit("c"), F.lit("3"),
        ).alias("attrs"),
    )
    kept = df.select(
        F.map_keys(store.fields_schema_filter("attrs")).alias("k")
    ).collect()[0].k
    assert kept == ["a"]                       # b disabled, c unregistered

    empty_store = CatalogStore()
    none_kept = df.select(
        F.size(empty_store.fields_schema_filter("attrs")).alias("n")
    ).collect()[0].n
    assert none_kept == 0


def test_triggerless_monitor_raises_clearly(spark):
    from sumologic_aws_lambda_spark.plans.monitors import (
        MonitorSpec,
        evaluate_monitor,
        evaluate_monitors,
    )
    from sumologic_aws_lambda_spark.plans.sumoql import SumoQLError, SumoSchema

    df = spark.createDataFrame([("x",)], "msg string")
    spec = MonitorSpec(name="empty", query="* | count", triggers=())
    with pytest.raises(SumoQLError, match="no triggers"):
        evaluate_monitor(df, spec, SumoSchema(raw_col="msg"))
    with pytest.raises(SumoQLError, match="no monitor specs"):
        evaluate_monitors(df, [], SumoSchema(raw_col="msg"))


def test_parse_folder_skips_resolution_and_missing_data_triggers():
    doc = {
        "type": "MonitorsLibraryFolderExport",
        "children": [{
            "type": "MonitorsLibraryMonitorExport",
            "name": "m1",
            "queries": [{"rowId": "A", "query": "error | count"}],
            "triggers": [
                {"triggerType": "Critical", "threshold": 10,
                 "thresholdType": "GreaterThan"},
                {"triggerType": "ResolvedCritical", "threshold": 10,
                 "thresholdType": "LessThanOrEqual"},
                {"triggerType": "MissingData", "timeRange": "-30m"},
            ],
        }],
    }
    import json as _json

    specs = parse_monitor_folder(_json.dumps(doc))
    assert [t.severity for t in specs[0].triggers] == ["Critical"]


def test_evaluate_monitor_drops_extra_aggregates(spark):
    """'count, sum(v) by cat' thresholds on one aggregate; the other
    must not leak into the alert schema (the union contract)."""
    df = spark.createDataFrame(
        [("a", 5), ("a", 6), ("b", 1)], "cat string, v long")
    spec = MonitorSpec(
        name="m", query="* | count, sum(v) by cat",
        triggers=(TriggerCondition("Critical", 5, "GreaterThan"),))
    out = evaluate_monitor(df, spec, SCHEMA, value_col="_sum_v")
    assert set(out.columns) == {"monitor", "severity", "cat", "value",
                                "threshold"}
    assert {(r.cat, r.value) for r in out.collect()} == {("a", 11.0)}


# ------------------------------------------------------------------ SLOs

def test_slo_budget_math(spark):
    from sumologic_aws_lambda_spark.plans.slos import SloSpec, evaluate_slo
    from sumologic_aws_lambda_spark.plans.sumoql import SumoSchema

    rows = [
        # day 1: 8 good, 2 bad of 10; day 2: 5 good, 5 bad of 10
        *[("2024-01-01 0%d:00:00" % i, "ok") for i in range(8)],
        ("2024-01-01 08:00:00", "err"), ("2024-01-01 09:00:00", "err"),
        *[("2024-01-02 0%d:00:00" % i, "ok") for i in range(5)],
        *[("2024-01-02 1%d:00:00" % i, "err") for i in range(5)],
    ]
    df = spark.createDataFrame(rows, "t string, kind string") \
        .selectExpr("CAST(t AS TIMESTAMP) AS t", "kind")
    spec = SloSpec(name="s", good_condition="kind = 'ok'", target=0.8)
    out = {str(r["_timeslice"]): r for r in evaluate_slo(
        df, spec, SumoSchema(ts_col="t")).collect()}
    d1 = out["2024-01-01 00:00:00"]
    # budget at 80% target = 20% of traffic; day 1 spent 2 of 2.0 → 0 left
    assert (d1["good"], d1["total"], d1["sli"]) == (8, 10, 0.8)
    assert d1["cum_consumed"] == 2 and d1["cum_budget"] == 2.0
    assert d1["budget_remaining"] == 0.0 and d1["burn_rate"] == 1.0
    d2 = out["2024-01-02 00:00:00"]
    # cumulative: 7 errors vs budget 4 → remaining negative (blown)
    assert d2["cum_consumed"] == 7 and d2["cum_budget"] == 4.0
    assert d2["budget_remaining"] == -0.75
    assert d2["burn_rate"] == 2.5       # 50% error rate / 20% budget


def test_slo_rejects_bad_spec(spark):
    import pytest as _pytest
    from sumologic_aws_lambda_spark.plans.slos import SloSpec, evaluate_slo
    from sumologic_aws_lambda_spark.plans.sumoql import (
        SumoQLError,
        SumoSchema,
    )

    df = spark.createDataFrame([("2024-01-01 00:00:00", "ok")],
                               "t string, kind string") \
        .selectExpr("CAST(t AS TIMESTAMP) AS t", "kind")
    with _pytest.raises(SumoQLError):
        evaluate_slo(df, SloSpec("s", "kind='ok'", target=1.0),
                     SumoSchema(ts_col="t"))
    with _pytest.raises(SumoQLError):
        evaluate_slo(df, SloSpec("s", "kind='ok'", slice_="5m"),
                     SumoSchema(ts_col="t"))
    with _pytest.raises(SumoQLError):
        evaluate_slo(df, SloSpec("s", "kind = = 'ok'"),
                     SumoSchema(ts_col="t"))


def test_throttle_alerts_first_of_burst(spark):
    from sumologic_aws_lambda_spark.plans.monitors import throttle_alerts

    alerts = spark.createDataFrame(
        [
            # contiguous daily burst: only day 0 notifies at 2d cooldown
            ("m1", "Critical", 0), ("m1", "Critical", 86400),
            ("m1", "Critical", 2 * 86400),
            # gap >= cooldown: next one notifies again
            ("m1", "Critical", 5 * 86400),
            # other series throttles independently
            ("m1", "Warning", 86400),
        ],
        "monitor string, severity string, slice_epoch long",
    )
    got = {
        (r.monitor, r.severity, r.slice_epoch): r.suppressed
        for r in throttle_alerts(alerts, cooldown_seconds=172800).collect()
    }
    assert got[("m1", "Critical", 0)] is False
    assert got[("m1", "Critical", 86400)] is True
    assert got[("m1", "Critical", 2 * 86400)] is True
    assert got[("m1", "Critical", 5 * 86400)] is False
    assert got[("m1", "Warning", 86400)] is False


def test_throttle_alerts_bucket_mode_renotifies(spark):
    from sumologic_aws_lambda_spark.plans.monitors import throttle_alerts

    alerts = spark.createDataFrame(
        [("m1", "Critical", d * 86400) for d in range(6)],
        "monitor string, severity string, slice_epoch long",
    )
    got = {
        r.slice_epoch: r.suppressed
        for r in throttle_alerts(
            alerts, cooldown_seconds=2 * 86400, mode="bucket"
        ).collect()
    }
    # Epoch-aligned 2-day buckets: days 0, 2, 4 notify; 1, 3, 5 suppress.
    assert {d * 86400: (d % 2 == 1) for d in range(6)} == got
