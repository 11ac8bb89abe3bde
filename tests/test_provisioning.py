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


def test_add_fields_in_matching_sources_bulk_apply(tmp_path):
    """AddFieldsInHostMetricsSources (sumoresource.py:1231): bulk field
    merge across every hostmetrics source matching the instance list,
    old fields popped before new ones merge, chunked processing hitting
    every chunk, non-matching sources untouched."""
    from sumologic_aws_lambda_spark.provisioning import CatalogStore

    store = CatalogStore(str(tmp_path / "cat.json"))
    c = store.create_collector("hosts")
    srcs = {}
    for i in range(12):
        srcs[i] = store.create_source(
            c.collector_id, f"hm-{i}", source_type="hostmetrics",
            fields={"InstanceId": f"i-{i:03d}", "stale": "x"})
    other = store.create_source(
        c.collector_id, "http-in", source_type="http",
        fields={"InstanceId": "i-000"})

    ids = [f"i-{i:03d}" for i in range(11)]    # 11 ids → two chunks of 10
    updated = store.add_fields_in_matching_sources(
        ids, {"account": "prod", "namespace": "hostmetrics"},
        old_fields={"stale": "x"}, batch_size=10)
    assert len(updated) == 11                  # both chunks applied
    for i in range(11):
        assert srcs[i].fields == {
            "InstanceId": f"i-{i:03d}", "account": "prod",
            "namespace": "hostmetrics"}
    assert srcs[11].fields == {"InstanceId": "i-011", "stale": "x"}
    assert other.fields == {"InstanceId": "i-000"}  # wrong type untouched

    # delete path (:1317-1320): new_fields=None removes the stack fields
    store.add_fields_in_matching_sources(
        ["i-000"], None, old_fields={"account": "1", "namespace": "1"})
    assert srcs[0].fields == {"InstanceId": "i-000"}

    # persistence round-trip
    store2 = CatalogStore(str(tmp_path / "cat.json"))
    got = [s for s in store2.sources_for(c.collector_id)
           if s.name == "hm-1"][0]
    assert got.fields["account"] == "prod"


def test_account_alias_validation_and_fallbacks():
    from sumologic_aws_lambda_spark.provisioning import account_alias

    csv_text = "123,prodaccount\n456,Bad Alias!\n789," + "x" * 31 + "\n"
    assert account_alias("123", csv_text) == {
        "ACCOUNT_ALIAS": "prodaccount"}
    # invalid alias (fails [a-z0-9]+$) → fallback chain
    assert account_alias("456", csv_text, "fb1") == {
        "ACCOUNT_ALIAS": "fb1"}
    # >30 chars → fallback to account id when no explicit alias
    assert account_alias("789", csv_text) == {"ACCOUNT_ALIAS": "789"}
    # no mapping at all
    assert account_alias("42", None, "alias42") == {
        "ACCOUNT_ALIAS": "alias42"}
    assert account_alias("42", None) == {"ACCOUNT_ALIAS": "42"}


def test_enterprise_or_trial_check():
    from sumologic_aws_lambda_spark.provisioning import (
        enterprise_or_trial_check,
    )

    assert enterprise_or_trial_check(True, 0) == {
        "is_enterprise": "Yes", "is_paid": "Yes"}
    assert enterprise_or_trial_check(False, 5) == {
        "is_enterprise": "No", "is_paid": "No"}
    assert enterprise_or_trial_check(False, 6) == {
        "is_enterprise": "No", "is_paid": "Yes"}


def test_source_mask_and_hash_rules(spark):
    """Hash/Mask processing rules (the redaction half of F9): Mask
    blanks matches, Hash replaces each match with md5 so equal values
    stay joinable, rules apply in list order."""
    import hashlib

    from sumologic_aws_lambda_spark.provisioning import (
        CatalogStore,
        Source,
    )

    src = Source(name="s", collector_id="c", filters=[
        {"filterType": "Mask", "name": "ssn",
         "regexp": r"\d{3}-\d{2}-\d{4}", "mask": "###-##-####"},
        {"filterType": "Hash", "name": "email",
         "regexp": r"[\w.]+@[\w.]+"},
        {"filterType": "Exclude", "name": "noise", "regexp": "DEBUG"},
    ])
    df = spark.createDataFrame(
        [("ssn 123-45-6789 mail a@b.co",),
         ("mail a@b.co and c@d.org",)], "message string")
    out = [r["m"] for r in df.select(
        CatalogStore.source_mask_transform(src).alias("m")).collect()]
    h = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert out[0] == f"ssn ###-##-#### mail {h('a@b.co')}"
    assert out[1] == f"mail {h('a@b.co')} and {h('c@d.org')}"
    # same value → same hash across rows (joinable after redaction)
    assert out[0].split()[-1] == out[1].split()[1]


def test_hash_rule_respects_regex_boundaries_and_mask_is_literal(spark):
    """Round-7 review findings: a Hash rule must rewrite only true
    regex MATCHES (a value nested in a longer word stays intact), and a
    Mask string containing $ or backslash is a literal, never a group
    reference."""
    import hashlib

    from sumologic_aws_lambda_spark.provisioning import (
        CatalogStore,
        Source,
    )

    h = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    src = Source(name="s", collector_id="c", filters=[
        {"filterType": "Hash", "name": "w", "regexp": r"\bjoin\b"},
    ])
    df = spark.createDataFrame(
        [("adjoining join rejoins join",)], "message string")
    out = df.select(
        CatalogStore.source_mask_transform(src).alias("m")
    ).first()["m"]
    assert out == f"adjoining {h('join')} rejoins {h('join')}"

    masked = Source(name="m", collector_id="c", filters=[
        {"filterType": "Mask", "name": "amt", "regexp": r"\d+",
         "mask": r"US$0-\REDACTED"},
    ])
    df2 = spark.createDataFrame([("paid 123 now",)], "message string")
    got = df2.select(
        CatalogStore.source_mask_transform(masked).alias("m")
    ).first()["m"]
    assert got == r"paid US$0-\REDACTED now"
