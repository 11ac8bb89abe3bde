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


def test_schedule_saved_search_as_view(spark, tmp_path):
    import json

    from pyspark.sql import functions as F

    from sumologic_aws_lambda_spark.plans.scheduled_views import (
        ScheduledViewStore,
    )
    from sumologic_aws_lambda_spark.plans.sumoql import SumoSchema

    pack_json = json.dumps({
        "type": "FolderSyncDefinition", "name": "Ops Pack",
        "children": [
            {"type": "SavedSearchWithScheduleSyncDefinition",
             "name": "Daily Volume",
             "search": {"queryText":
                        "* | timeslice 1d | count by _timeslice, cat"}},
            {"type": "SavedSearchWithScheduleSyncDefinition",
             "name": "Raw Avg",
             "search": {"queryText": "* | avg(v) by cat"}},
        ],
    })
    from sumologic_aws_lambda_spark.plans.content_packs import (
        ContentPack,
        ContentPackCatalog,
        ContentPackError,
    )

    cat = ContentPackCatalog()
    cat.install(ContentPack.from_json(pack_json))
    rows = [(i, f"2024-04-{(i % 2) + 1:02d} 01:00:00", f"c{i % 2}", i)
            for i in range(40)]
    events = spark.createDataFrame(
        rows, "id int, ts string, cat string, v long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    schema = SumoSchema(raw_col="cat", ts_col="ts")

    store = ScheduledViewStore(str(tmp_path))
    name = cat.schedule(store, events, "Ops Pack", "Daily Volume", schema)
    assert name == "ops_pack_daily_volume"
    got = {(str(r["_timeslice"].date()), r.cat): r["_count"]
           for r in store.read(spark, name).collect()}
    assert got == {("2024-04-01", "c0"): 20, ("2024-04-02", "c1"): 20}

    # a non-view-shaped search (no timeslice / unmergeable agg) refuses
    with pytest.raises(ContentPackError, match="cannot back"):
        cat.schedule(store, events, "Ops Pack", "Raw Avg", schema)


def test_param_prefix_keys_do_not_corrupt_longer_markers():
    import json as _json

    pack = {
        "type": "SavedSearchWithScheduleSyncDefinition",
        "name": "s",
        "description": None,
        "search": {"queryText": "_sourceCategory=$$logsrcExt | count"},
    }
    from sumologic_aws_lambda_spark.plans.content_packs import ContentPack

    got = ContentPack.from_json(
        _json.dumps(pack),
        params={"logsrc": "prod/cloudtrail", "logsrcExt": "prod/ext"},
    )
    s = next(iter(got.searches.values()))
    assert "prod/ext" in s.query_text
    assert "cloudtrailExt" not in s.query_text
    assert s.description == ""      # explicit null normalizes


# -- folder store: copy / admin import (sumologic.py:204-254) ---------------


def _store_with_pack():
    from sumologic_aws_lambda_spark.plans.content_packs import (
        ContentFolderStore,
    )

    store = ContentFolderStore()
    personal = store.get_personal_folder()
    job = store.import_content(
        personal.folder_id,
        json.dumps(PACK).replace("$$logsrc", "prod/api"))
    assert store.check_import_status(
        personal.folder_id, job)["status"] == "Success"
    return store, personal


def test_import_builds_folder_tree_and_duplicate_contract():
    store, personal = _store_with_pack()
    app = personal.folders["AWS Observability"]
    assert "Errors by host" in app.searches
    assert "p95" in app.folders["Latency"].searches

    # overwrite=False on a duplicate fails the job with the same error
    # code the reference's App resource recovers from
    job = store.import_content(
        personal.folder_id,
        json.dumps(PACK).replace("$$logsrc", "prod/api"))
    st = store.check_import_status(personal.folder_id, job)
    assert st["status"] == "Failed"
    assert "duplicate_content" in st["error"]

    # overwrite=True replaces (fresh folder id)
    job = store.import_content(
        personal.folder_id,
        json.dumps(PACK).replace("$$logsrc", "other/cat"),
        is_overwrite=True)
    st = store.check_import_status(personal.folder_id, job)
    assert st["status"] == "Success"
    new_app = personal.folders["AWS Observability"]
    assert new_app.folder_id != app.folder_id
    assert "other/cat" in new_app.searches["Errors by host"].query_text


def test_copy_folder_remaps_every_id():
    store, personal = _store_with_pack()
    app = personal.folders["AWS Observability"]
    dest = store.create_folder("Backups", "", personal.folder_id)
    job = store.copy_folder(app.folder_id, dest.folder_id)
    st = store.check_copy_status(app.folder_id, job)
    assert st["status"] == "Success"
    copy = store.get_folder_by_id(st["newFolderId"])
    assert copy.folder_id != app.folder_id
    assert copy.folders["Latency"].folder_id != \
        app.folders["Latency"].folder_id
    # deep copy: mutating the copy leaves the original untouched
    copy.searches["Errors by host"].query_text = "mutated"
    assert app.searches["Errors by host"].query_text != "mutated"

    # copying into a folder that already has the name appends " (Copy)"
    job2 = store.copy_folder(app.folder_id, dest.folder_id)
    st2 = store.check_copy_status(app.folder_id, job2)
    assert store.get_folder_by_id(
        st2["newFolderId"]).name == "AWS Observability (Copy)"


def test_admin_recommended_requires_admin_mode():
    from sumologic_aws_lambda_spark.plans.content_packs import (
        ContentFolderStore,
    )

    store = ContentFolderStore()
    admin_root = store.get_admin_recommended_folder()
    with pytest.raises(ContentPackError, match="is_admin"):
        store.create_folder("Apps", "", admin_root.folder_id)
    f = store.create_folder("Apps", "", admin_root.folder_id,
                            is_admin=True)
    with pytest.raises(ContentPackError, match="admin"):
        store.get_folder_by_id(f.folder_id)
    assert store.get_folder_by_id(f.folder_id, is_admin=True) is f
    with pytest.raises(ContentPackError, match="is_admin"):
        store.import_content(
            f.folder_id, json.dumps(PACK).replace("$$logsrc", "x"))
    with pytest.raises(ContentPackError, match="is_admin"):
        store.delete_folder(f.folder_id)
    store.delete_folder(f.folder_id, is_admin=True)
    with pytest.raises(ContentPackError, match="no folder"):
        store.get_folder_by_id(f.folder_id, is_admin=True)


def test_copy_folder_gates_admin_source_and_deep_copies_time_range():
    """Round-7 review: copying admin-recommended content READS it, so
    the source is admin-gated too; and the clone must not alias the
    original's time_range dict."""
    from sumologic_aws_lambda_spark.plans.content_packs import (
        ContentFolderStore,
    )

    store = ContentFolderStore()
    admin_root = store.get_admin_recommended_folder()
    apps = store.create_folder("Apps", "", admin_root.folder_id,
                               is_admin=True)
    store.import_content(
        apps.folder_id, json.dumps(PACK).replace("$$logsrc", "x"),
        is_admin=True)
    personal = store.get_personal_folder()
    with pytest.raises(ContentPackError, match="is_admin"):
        store.copy_folder(apps.folder_id, personal.folder_id)

    job = store.copy_folder(apps.folder_id, personal.folder_id,
                            is_admin=True)
    st = store.check_copy_status(apps.folder_id, job)
    copy = store.get_folder_by_id(st["newFolderId"])
    orig = apps.folders["AWS Observability"].searches["Errors by host"]
    dup = copy.folders["AWS Observability"].searches["Errors by host"]
    assert dup.time_range == orig.time_range
    dup.time_range["from"] = "-30d"
    assert orig.time_range["from"] == "-1d"      # no aliasing
