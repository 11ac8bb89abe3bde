"""Unit tests for the provisioning catalog (provisioning.py)."""

from __future__ import annotations

import pytest

from sumologic_aws_lambda_spark.provisioning import CatalogStore, Source


def test_collector_create_is_idempotent(tmp_path):
    store = CatalogStore(str(tmp_path / "cat.json"))
    a = store.create_collector("prod", category="prod/logs")
    b = store.create_collector("prod")
    assert a.collector_id == b.collector_id


def test_source_semantics_and_persistence(tmp_path):
    path = str(tmp_path / "cat.json")
    store = CatalogStore(path)
    col = store.create_collector("prod")
    src = store.create_source(
        col.collector_id, "api",
        filters=[
            {"filterType": "Exclude", "regexp": "DEBUG"},
            {"filterType": "Include", "regexp": ""},      # blank → dropped
        ],
        message_per_request=True,
        multiline_enabled=True,                           # forced off
        path_expression="*.log.gz",
    )
    assert src.multiline_enabled is False
    assert len(src.filters) == 1

    # reload from disk
    store2 = CatalogStore(path)
    srcs = store2.sources_for(col.collector_id)
    assert len(srcs) == 1 and srcs[0].name == "api"
    # create-or-fetch after reload
    again = store2.create_source(col.collector_id, "api")
    assert again.source_id == src.source_id


def test_delete_collector_with_sources_refused(tmp_path):
    store = CatalogStore()
    col = store.create_collector("c")
    store.create_source(col.collector_id, "s")
    with pytest.raises(ValueError, match="still has sources"):
        store.delete_collector(col.collector_id)


def test_read_options_and_trigger():
    src = Source(name="s3src", collector_id="x",
                 path_expression="prefix/*.json",
                 scan_interval_ms=300_000, cutoff_hours=24)
    opts = CatalogStore.source_read_options(src, now_epoch=1_704_153_600)
    assert opts["pathGlobFilter"] == "prefix/*.json"
    # explicit Z: a zone-less string parses in the SESSION timezone and
    # shifts the cutoff window on non-UTC clusters
    assert opts["modifiedAfter"] == "2024-01-01T00:00:00Z"  # now − 24 h
    assert CatalogStore.source_trigger(src) == "300 seconds"


def test_filter_predicate_include_exclude(spark):
    src = Source(name="s", collector_id="x", filters=[
        {"filterType": "Include", "regexp": "ERROR|WARN"},
        {"filterType": "Exclude", "regexp": "heartbeat"},
    ])
    df = spark.createDataFrame(
        [(1, "ERROR boom"), (2, "WARN heartbeat"), (3, "INFO ok"),
         (4, "WARN disk")],
        "id int, message string",
    )
    kept = [r["id"] for r in
            df.filter(CatalogStore.source_filter_predicate(src))
            .select("id").collect()]
    assert sorted(kept) == [1, 4]


def test_provisioned_source_drives_stream(spark, tmp_path):
    """S11 end-to-end: a catalog source's options/trigger/filters drive a
    real bounded stream — catalog → readStream bridge → F9 predicate."""
    src_dir = tmp_path / "landing"
    src_dir.mkdir()
    (src_dir / "a.log").write_text(
        "ERROR first\nINFO noise\nWARN heartbeat\nWARN disk low\n"
    )

    store = CatalogStore()
    col = store.create_collector("prod")
    source = store.create_source(
        col.collector_id, "file-src",
        path_expression="*.log",
        scan_interval_ms=60_000,
        filters=[
            {"filterType": "Include", "regexp": "ERROR|WARN"},
            {"filterType": "Exclude", "regexp": "heartbeat"},
        ],
    )
    opts = CatalogStore.source_read_options(source)
    assert CatalogStore.source_trigger(source) == "60 seconds"

    reader = spark.readStream.format("text")
    for k, v in opts.items():
        reader = reader.option(k, v)
    stream = (
        reader.load(str(src_dir))
        .withColumnRenamed("value", "message")
        .filter(CatalogStore.source_filter_predicate(source))
    )
    q = (
        stream.writeStream.format("memory").queryName("provisioned")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(r["message"] for r in
                 spark.sql("select * from provisioned").collect())
    assert got == ["ERROR first", "WARN disk low"]


def test_multiline_always_reads_wholetext():
    # autoline matching (the Sumo default pairing) also folds lines from
    # a wholetext read — both multiline modes need whole objects
    auto = Source(name="a", collector_id="x", multiline_enabled=True,
                  use_autoline_matching=True)
    custom = Source(name="c", collector_id="x", multiline_enabled=True,
                    use_autoline_matching=False)
    off = Source(name="o", collector_id="x", multiline_enabled=False)
    assert CatalogStore.source_read_options(auto).get("wholetext") == "true"
    assert CatalogStore.source_read_options(custom).get("wholetext") == "true"
    assert "wholetext" not in CatalogStore.source_read_options(off)
