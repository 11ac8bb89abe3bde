"""Dashboard surface tests (plans/dashboards.py): export parse, panel
evaluation, view backing, and content-pack integration."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.plans.content_packs import (
    ContentPack,
    ContentPackCatalog,
)
from sumologic_aws_lambda_spark.plans.dashboards import (
    Dashboard,
    DashboardError,
    DashboardService,
)
from sumologic_aws_lambda_spark.plans.scheduled_views import (
    ScheduledViewStore,
)
from sumologic_aws_lambda_spark.plans.sumoql import SumoSchema

SCHEMA = SumoSchema(raw_col="cat", ts_col="ts",
                    meta_cols={"_sourceCategory": "cat"})

_DASH = {
    "type": "DashboardV2SyncDefinition",
    "name": "Ops Overview",
    "panels": [
        {"key": "by-type", "title": "Counts by type",
         "panelType": "SumoSearchPanel",
         "queries": [{"queryString": "* | count by cat"}]},
        {"key": "daily", "title": "Daily volume",
         "queries": [{"queryString":
                      "* | timeslice 1d | count by _timeslice, cat"}]},
    ],
}


@pytest.fixture(scope="module")
def events(spark):
    rows = [(i, f"2024-06-{(i % 2) + 1:02d} 03:00:00", f"c{i % 2}", i)
            for i in range(40)]
    return spark.createDataFrame(
        rows, "id int, ts string, cat string, v long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_dashboard_data_evaluates_all_panels(spark, events):
    svc = DashboardService()
    svc.register(Dashboard.from_json(json.dumps(_DASH)))
    assert svc.dashboards() == ["Ops Overview"]
    data = svc.dashboard_data("Ops Overview", events, SCHEMA)
    assert set(data) == {"by-type", "daily"}
    assert {r.cat: r._count for r in data["by-type"].collect()} == \
        {"c0": 20, "c1": 20}
    assert data["daily"].count() == 2


def test_back_with_views_backs_only_view_shaped_panels(spark, events,
                                                       tmp_path):
    svc = DashboardService()
    svc.register(Dashboard.from_json(json.dumps(_DASH)))
    store = ScheduledViewStore(str(tmp_path))
    backed = svc.back_with_views("Ops Overview", store, events, SCHEMA)
    # 'by-type' has no timeslice → skipped; 'daily' qualifies.
    assert backed == {"daily": "ops_overview_daily"}
    view = store.read(spark, "ops_overview_daily")
    assert view.count() == 2 and "_count" in view.columns


def test_content_pack_collects_dashboards(spark, events):
    pack_json = json.dumps({
        "type": "FolderSyncDefinition", "name": "App",
        "children": [
            {"type": "SavedSearchWithScheduleSyncDefinition", "name": "s",
             "search": {"queryText": "* | count by cat"}},
            dict(_DASH),
        ],
    })
    pack = ContentPack.from_json(pack_json)
    assert list(pack.dashboards) == ["Ops Overview"]
    cat = ContentPackCatalog()
    cat.install(pack)
    svc = DashboardService()
    svc.register(pack.dashboards["Ops Overview"])
    data = svc.dashboard_data("Ops Overview", events, SCHEMA)
    assert data["by-type"].count() == 2


def test_bad_dashboards_raise(spark):
    with pytest.raises(DashboardError, match="no panels"):
        Dashboard.from_node({"name": "empty", "panels": []})
    with pytest.raises(DashboardError, match="no query"):
        Dashboard.from_node(
            {"name": "d", "panels": [{"title": "p", "queries": []}]})
    with pytest.raises(DashboardError, match="bad dashboard JSON"):
        Dashboard.from_json("{nope")
    svc = DashboardService()
    with pytest.raises(DashboardError, match="unknown dashboard"):
        svc.dashboard("nope")


def test_text_panels_are_skipped_not_fatal():
    from sumologic_aws_lambda_spark.plans.dashboards import Dashboard

    node = {
        "name": "d",
        "panels": [
            {"panelType": "TextPanel", "title": "Overview"},
            {"title": "p1", "queries": [{"queryString": "error | count"}]},
        ],
    }
    d = Dashboard.from_node(node)
    assert [p.title for p in d.panels] == ["p1"]


def test_legacy_panel_querystring_is_read():
    from sumologic_aws_lambda_spark.plans.dashboards import Dashboard

    node = {
        "name": "legacy",
        "panels": [{"name": "p1", "queryString": "error | count"}],
    }
    d = Dashboard.from_node(node)
    assert d.panels[0].query_text == "error | count"
