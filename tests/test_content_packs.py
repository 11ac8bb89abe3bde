"""Content-pack install/run semantics (plans/content_packs.py) — the
Spark analog of the reference's App resource
(sumologic-app-utils/src/sumoresource.py:543)."""

from __future__ import annotations

import json

import pytest

from sumologic_aws_lambda_spark.plans.content_packs import (
    ContentPack,
    ContentPackCatalog,
    ContentPackError,
)
from sumologic_aws_lambda_spark.plans.sumoql import SumoSchema

PACK = {
    "type": "FolderSyncDefinition",
    "name": "AWS Observability",
    "description": "demo pack",
    "children": [
        {
            "type": "SavedSearchWithScheduleSyncDefinition",
            "name": "Errors by host",
            "search": {
                "queryText": '_sourceCategory=$$logsrc | count by host',
                "defaultTimeRange": {"from": "-1d"},
            },
        },
        {
            "type": "FolderSyncDefinition",
            "name": "Latency",
            "children": [
                {
                    "type": "SavedSearchWithScheduleSyncDefinition",
                    "name": "p95",
                    "search": {"queryText":
                               "* | percentile(v, 95) by host"},
                },
            ],
        },
        {"type": "DashboardV2SyncDefinition", "name": "ignored panel"},
    ],
}


def _pack(params=None):
    return ContentPack.from_json(json.dumps(PACK),
                                 params or {"logsrc": "prod/api"})


def test_parse_flattens_folder_tree():
    p = _pack()
    # Root folder name is the pack name, not a path segment; nested
    # folders become path prefixes; dashboards are skipped.
    assert sorted(p.searches) == ["Errors by host", "Latency/p95"]
    assert p.name == "AWS Observability"
    s = p.searches["Errors by host"]
    assert s.query_text == "_sourceCategory=prod/api | count by host"
    assert s.time_range == {"from": "-1d"}


def test_unsubstituted_param_rejected():
    with pytest.raises(ContentPackError, match="logsrc"):
        ContentPack.from_json(json.dumps(PACK))


def test_missing_query_text_rejected():
    bad = {"name": "x", "children": [
        {"type": "SavedSearchWithScheduleSyncDefinition",
         "name": "empty", "search": {}}]}
    with pytest.raises(ContentPackError, match="queryText"):
        ContentPack.from_json(json.dumps(bad))


def test_install_upserts_and_uninstall():
    cat = ContentPackCatalog()
    paths = cat.install(_pack())
    assert paths == ["Errors by host", "Latency/p95"]
    # Re-install with different params replaces the content (reference
    # maps content:duplicate_content to import-over-existing).
    cat.install(_pack({"logsrc": "dev/api"}))
    assert cat.packs() == ["AWS Observability"]
    assert "dev/api" in cat.search("AWS Observability",
                                   "Errors by host").query_text
    cat.uninstall("AWS Observability")
    assert cat.packs() == []
    with pytest.raises(ContentPackError, match="not installed"):
        cat.search("AWS Observability", "Errors by host")


def test_run_compiles_saved_search(spark):
    cat = ContentPackCatalog()
    cat.install(_pack())
    df = spark.createDataFrame(
        [("prod/api", "h1", 10), ("prod/api", "h1", 20),
         ("prod/api", "h2", 5), ("dev/api", "h9", 1)],
        "cat string, host string, v long",
    )
    schema = SumoSchema(raw_col="cat",
                        meta_cols={"_sourceCategory": "cat"})
    out = cat.run(df, "AWS Observability", "Errors by host", schema)
    got = {r.host: r._count for r in out.collect()}
    assert got == {"h1": 2, "h2": 1}
    with pytest.raises(ContentPackError, match="no saved search"):
        cat.run(df, "AWS Observability", "nope", schema)
