"""Persistent lookup tables (plans/lookups.py): save / save append /
cross-session lookup resolution through the SumoQL verbs."""

from __future__ import annotations

import pytest

from sumologic_aws_lambda_spark.plans.lookups import PersistentLookups
from sumologic_aws_lambda_spark.plans.sumoql import (
    SumoQLError,
    SumoSchema,
    compile_query,
)

SCHEMA = SumoSchema(raw_col="msg")


def test_save_persists_and_new_registry_resolves(spark, tmp_path):
    store = PersistentLookups(spark, str(tmp_path))
    src = spark.createDataFrame(
        [("h1", "warn"), ("h2", "crit")], "host string, level string"
    )
    compile_query(src, "* | save severities", SCHEMA, lookups=store)
    assert "severities" in store and store.tables() == ["severities"]

    # a FRESH registry over the same directory resolves from disk
    fresh = PersistentLookups(spark, str(tmp_path))
    logs = spark.createDataFrame([("h1", "m1"), ("h3", "m3")],
                                 "host string, msg string")
    out = compile_query(
        logs, "* | lookup level from severities on host",
        SCHEMA, lookups=fresh,
    )
    got = {r.host: r.level for r in out.collect()}
    assert got == {"h1": "warn", "h3": None}


def test_save_append_merges_rows(spark, tmp_path):
    store = PersistentLookups(spark, str(tmp_path))
    a = spark.createDataFrame([("h1", "warn")], "host string, level string")
    b = spark.createDataFrame([("h2", "crit")], "host string, level string")
    compile_query(a, "* | save sev append", SCHEMA, lookups=store)  # creates
    compile_query(b, "* | save sev append", SCHEMA, lookups=store)  # merges
    assert store["sev"].count() == 2
    # plain overwrite replaces
    compile_query(b, "* | save sev", SCHEMA, lookups=store)
    assert store["sev"].count() == 1


def test_append_on_plain_dict_raises(spark):
    df = spark.createDataFrame([("x",)], "msg string")
    with pytest.raises(SumoQLError, match="persistent lookup store"):
        compile_query(df, "* | save t append", SCHEMA, lookups={})


def test_unknown_table_and_bad_name(spark, tmp_path):
    store = PersistentLookups(spark, str(tmp_path))
    df = spark.createDataFrame([("x",)], "msg string")
    with pytest.raises(SumoQLError, match="unknown lookup table"):
        compile_query(df, "* | lookup a from nosuch on msg",
                      SCHEMA, lookups=store)
    with pytest.raises(KeyError):
        store["nosuch"]
    with pytest.raises(SumoQLError, match="bad lookup table name"):
        store.save("no spaces", df)


def test_save_over_table_being_read(spark, tmp_path):
    # the refresh pattern: enrich from a table, then save back to it.
    store = PersistentLookups(spark, str(tmp_path))
    base = spark.createDataFrame(
        [("h1", 1), ("h2", 5)], "host string, hits long")
    store.save("counters", base)
    refreshed = compile_query(
        spark.createDataFrame([("h1",), ("h2",)], "host string"),
        "* | lookup hits from counters on host"
        " | hits + 1 as hits2 | fields host, hits2",
        SCHEMA, lookups=store,
    ).withColumnRenamed("hits2", "hits")
    store.save("counters", refreshed)   # overwrites the path it reads
    got = {r.host: r.hits for r in store["counters"].collect()}
    assert got == {"h1": 2, "h2": 6}


def test_stale_tmp_dirs_not_listed_and_reclaimed_by_save(spark, tmp_path):
    """A crash mid-save leaves `<name>.__tmp__` — it must never be
    listed as a table (by any registry), and the next save of that name
    reclaims it.  Constructing a registry stays read-only: an init-time
    sweep could destroy ANOTHER live registry's in-flight save on a
    shared root."""
    import os

    store = PersistentLookups(spark, str(tmp_path))
    src = spark.createDataFrame([("h1", "warn")],
                                "host string, level string")
    compile_query(src, "* | save sev", SCHEMA, lookups=store)
    # simulate a crash leftover
    os.makedirs(tmp_path / "sev.__tmp__")
    assert store.tables() == ["sev"]
    fresh = PersistentLookups(spark, str(tmp_path))
    # read-only construction: the leftover is untouched, just unlisted
    assert (tmp_path / "sev.__tmp__").exists()
    assert fresh.tables() == ["sev"]
    # the next save of the same name reclaims the leftover
    compile_query(src, "* | save sev", SCHEMA, lookups=fresh)
    assert fresh["sev"].count() == 1
    assert not (tmp_path / "sev.__tmp__").exists()
