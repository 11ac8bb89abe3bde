"""Unit tests for the SumoQL compiler grammar (plans/sumoql.py)."""

from __future__ import annotations

import pytest

from sumologic_aws_lambda_spark.plans.sumoql import (
    SumoQLError,
    SumoSchema,
    compile_query,
)

SCHEMA = SumoSchema(raw_col="msg", ts_col="ts",
                    meta_cols={"_sourceCategory": "cat"})


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        (1, "prod/api", '{"status":"500","latency":"120"}', "2024-01-01 10:00:00"),
        (2, "prod/api", '{"status":"200","latency":"15"}', "2024-01-01 10:03:00"),
        (3, "prod/web", '{"status":"200","latency":"30"}', "2024-01-01 10:07:00"),
        (4, "dev/api", "ERROR something broke badly", "2024-01-01 11:00:00"),
    ]
    df = spark.createDataFrame(rows, "id int, cat string, msg string, ts string")
    return df.selectExpr("id", "cat", "msg", "CAST(ts AS TIMESTAMP) ts")


def test_scope_equality_and_fulltext(logs):
    out = compile_query(logs, "_sourceCategory=dev/api ERROR", SCHEMA)
    assert [r.id for r in out.collect()] == [4]


def test_scope_wildcard(logs):
    out = compile_query(logs, "_sourceCategory=prod/*", SCHEMA)
    assert sorted(r.id for r in out.collect()) == [1, 2, 3]


def test_json_where_count(logs):
    out = compile_query(
        logs,
        '_sourceCategory=prod/* | json "status" | where status = \'200\''
        " | count by cat",
        SCHEMA,
    )
    got = {r.cat: r._count for r in out.collect()}
    assert got == {"prod/api": 1, "prod/web": 1}


def test_json_aliases(logs):
    out = compile_query(
        logs, '* | json "status", "latency" as st, lat | fields id, st, lat',
        SCHEMA,
    )
    assert out.columns == ["id", "st", "lat"]
    row = {r.id: r for r in out.collect()}
    assert row[1].st == "500" and row[1].lat == "120"
    assert row[4].st is None  # non-JSON message → null extraction


def test_anchor_parse(logs):
    out = compile_query(
        logs, '* | parse "ERROR * broke*" as what, rest | where what is not null',
        SCHEMA,
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].what == "something"


def test_parse_regex_named_groups(logs):
    out = compile_query(
        logs,
        '* | parse regex "status...(?<code>\\d+)" nodrop | count by code',
        SCHEMA,
    )
    got = {r.code: r._count for r in out.collect()}
    assert got == {"500": 1, "200": 2, None: 1}


def test_parse_drops_nonmatching_by_default(logs):
    out = compile_query(
        logs,
        '* | parse regex "status...(?<code>\\d+)" | count by code',
        SCHEMA,
    )
    got = {r.code: r._count for r in out.collect()}
    assert got == {"500": 1, "200": 2}


def test_timeslice_and_multi_agg(logs):
    out = compile_query(
        logs,
        '* | json "latency" | timeslice 5m'
        " | count, max(latency) by _timeslice",
        SCHEMA,
    )
    got = {r._timeslice.isoformat(): r._count for r in out.collect()}
    assert got["2024-01-01T10:00:00"] == 2
    assert got["2024-01-01T10:05:00"] == 1
    assert got["2024-01-01T11:00:00"] == 1


def test_global_agg_without_by(logs):
    out = compile_query(logs, "* | count", SCHEMA)
    assert out.collect()[0]._count == 4


def test_sort_limit(logs):
    out = compile_query(logs, "* | sort by id asc | limit 2", SCHEMA)
    assert [r.id for r in out.collect()] == [1, 2]


@pytest.mark.parametrize("bad", [
    "",
    "* | frobnicate x",
    "* | parse \"no stars here\" as x",
    "* | timeslice 5 parsecs",
    "* | json no quoted paths",
])
def test_errors(logs, bad):
    with pytest.raises((SumoQLError, Exception)):
        df = compile_query(logs, bad, SCHEMA)
        df.collect()


@pytest.fixture(scope="module")
def kv_logs(spark):
    rows = [
        (1, 'user=alice status=200 path="/a b" ts=1', "2024-01-01 10:00:00"),
        (2, "user=bob status=500 ts=2", "2024-01-01 10:01:00"),
        (3, "user=alice status=200 ts=3", "2024-01-01 10:02:00"),
    ]
    df = spark.createDataFrame(rows, "id int, msg string, ts string")
    return df.selectExpr("id", "msg", "CAST(ts AS TIMESTAMP) ts")


def test_kv_extract_quoted_and_missing(kv_logs):
    out = compile_query(kv_logs, '* | kv "user", "path"', SCHEMA)
    rows = {r["id"]: (r["user"], r["path"]) for r in out.collect()}
    assert rows[1] == ("alice", "/a b")   # quoted value unwrapped
    assert rows[2] == ("bob", None)       # missing key → null


def test_csv_positional_and_fields_drop(spark):
    df = spark.createDataFrame([(1, "a, b ,c")], "id int, msg string")
    out = compile_query(df, "* | csv x, y, z | fields - msg", SCHEMA)
    assert out.columns == ["id", "ts", "x", "y", "z"] or "msg" not in out.columns
    r = out.collect()[0]
    assert (r["x"], r["y"], r["z"]) == ("a", "b", "c")  # trimmed


def test_top_orders_by_count_then_value(kv_logs):
    out = compile_query(kv_logs, '* | kv "user" | top 2 user', SCHEMA)
    assert [(r["user"], r["_count"]) for r in out.collect()] == [
        ("alice", 2), ("bob", 1)
    ]


def test_dedup_keeps_most_recent_per_key(kv_logs):
    out = compile_query(
        kv_logs, '* | kv "user" | dedup by user | fields id, user', SCHEMA
    )
    assert sorted(tuple(r) for r in out.collect()) == [(2, "bob"), (3, "alice")]


def test_dedup_n_greater_than_one(kv_logs):
    out = compile_query(kv_logs, '* | kv "user" | dedup 2 by user', SCHEMA)
    assert out.count() == 3


def test_percentile_first_last(kv_logs):
    out = compile_query(
        kv_logs,
        '* | kv "status" | percentile(id, 50), first(status), last(status)',
        SCHEMA,
    )
    r = out.collect()[0]
    assert r["_pct_id_50"] == 2.0
    assert r["_first_status"] == "200"   # earliest ts
    assert r["_last_status"] == "200"    # latest ts


def test_first_requires_ts_column(spark):
    df = spark.createDataFrame([(1, "x")], "id int, msg string")
    with pytest.raises(SumoQLError, match="timestamp"):
        compile_query(df, "* | first(id)", SCHEMA)


def test_bad_top_and_csv_raise(kv_logs):
    with pytest.raises(SumoQLError):
        compile_query(kv_logs, "* | top user", SCHEMA)
    with pytest.raises(SumoQLError):
        compile_query(kv_logs, "* | csv", SCHEMA)


def test_lookup_stage_broadcasts(spark, kv_logs):
    from pyspark.sql import functions as F  # noqa: F401

    dim = spark.createDataFrame(
        [("alice", "admin"), ("carol", "guest")], "uname string, role string"
    )
    out = compile_query(
        kv_logs,
        '* | kv "user" | lookup role from users on user=uname',
        SCHEMA, lookups={"users": dim},
    )
    rows = {r["id"]: r["role"] for r in out.collect()}
    assert rows == {1: "admin", 2: None, 3: "admin"}   # left join semantics
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_lookup_unknown_table_raises(kv_logs):
    with pytest.raises(SumoQLError, match="unknown lookup"):
        compile_query(kv_logs, "* | lookup x from nope on id", SCHEMA)


def test_dedup_after_agg_without_raw_column(kv_logs):
    """dedup after a stage that dropped _raw/ts must not reference them
    (regression: unconditional raw-column tiebreaker raised
    AnalysisException on post-aggregation frames)."""
    out = compile_query(
        kv_logs, '* | kv "user" | count by user | dedup by user', SCHEMA
    )
    assert sorted((r["user"], r["_count"]) for r in out.collect()) == [
        ("alice", 2), ("bob", 1)
    ]


def test_dedup_default_keys_include_raw(spark):
    """No-'by' dedup = whole-row identity: the raw message participates,
    so two rows with identical metadata but different messages survive."""
    df = spark.createDataFrame(
        [(1, "m-one", "2024-01-01 10:00:00"),
         (2, "m-two", "2024-01-01 10:01:00"),
         (3, "m-one", "2024-01-01 10:02:00")],
        "id int, msg string, ts string",
    ).selectExpr("msg", "CAST(ts AS TIMESTAMP) ts")
    out = compile_query(df, "* | dedup", SCHEMA)
    assert sorted(r["msg"] for r in out.collect()) == ["m-one", "m-two"]


def test_parse_keeps_row_with_empty_first_capture(spark):
    """Drop decides on the pattern MATCH, not on the first group's
    post-nullif value: an empty-but-matched capture keeps the row."""
    df = spark.createDataFrame(
        [(1, "code= msg=hello"), (2, "code=7 msg=bye"), (3, "nothing here")],
        "id int, msg string",
    )
    out = compile_query(
        df, '* | parse regex "code=(?<code>\\d*) msg" | fields id, code',
        SCHEMA,
    )
    rows = {r["id"]: r["code"] for r in out.collect()}
    assert rows == {1: None, 2: "7"}  # row 1 kept (matched), row 3 dropped


def test_matches_glob_with_single_quote(spark):
    """A ' inside a matches glob must not break the generated rlike
    literal (expression-injection guard)."""
    df = spark.createDataFrame(
        [(1, "it's fine"), (2, "other")], "id int, msg string"
    )
    out = compile_query(
        df, '* | where msg matches "it\'s*"', SCHEMA
    )
    assert [r["id"] for r in out.collect()] == [1]


def test_expression_stage(kv_logs):
    out = compile_query(kv_logs, "* | id * 10 + 1 as score", SCHEMA)
    assert [r["score"] for r in out.orderBy("id").collect()] == [11, 21, 31]


def test_bad_expression_stage_raises(kv_logs):
    with pytest.raises(SumoQLError, match="bad expression|unknown stage"):
        compile_query(kv_logs, "* | nonsense( as x", SCHEMA)


def test_transaction_states_and_span(spark):
    rows = [
        ("u1", "start", "2024-01-01 10:00:00.500000"),
        ("u1", "work",  "2024-01-01 10:00:30"),
        ("u1", "work",  "2024-01-01 10:01:00"),
        ("u1", "done",  "2024-01-01 10:02:00.750000"),
        ("u1", "noise", "2024-01-01 10:03:00"),   # undeclared state
        ("u2", "start", "2024-01-01 11:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user string, state string, ts string"
    ).selectExpr("user", "state", "CAST(ts AS TIMESTAMP) ts")
    out = compile_query(
        df,
        "* | transaction on user with states start,work,done in state",
        SumoSchema(raw_col="msg", ts_col="ts"),
    )
    got = {r["user"]: r.asDict() for r in out.collect()}
    u1 = got["u1"]
    # per-state counts; the undeclared 'noise' row is excluded entirely
    assert (u1["start"], u1["work"], u1["done"]) == (1, 2, 1)
    # span = 10:00:00.5 → 10:02:00.75 = 120250 ms; epoch floors to :00
    assert u1["_duration_ms"] == 120_250
    assert u1["_begin_epoch"] % 60 == 0
    u2 = got["u2"]
    assert (u2["start"], u2["work"], u2["done"]) == (1, 0, 0)
    assert u2["_duration_ms"] == 0


def test_transaction_requires_ts_and_states(spark):
    df = spark.createDataFrame([("a", "x")], "user string, state string")
    with pytest.raises(SumoQLError, match="timestamp"):
        compile_query(
            df, "* | transaction on user with states x in state",
            SumoSchema(raw_col="msg", ts_col="ts"),
        )
    with pytest.raises(SumoQLError, match="bad transaction"):
        compile_query(
            df, "* | transaction user x", SumoSchema(raw_col="msg"),
        )


def test_geoip_broadcast_range_lookup(spark):
    logs = spark.createDataFrame(
        [(1, "52.94.76.10"), (2, "10.0.0.7")],
        "row_id int, client_ip string",
    )
    geo = spark.createDataFrame(
        [(52 * 16777216 + 94 * 65536 + 76 * 256,
          52 * 16777216 + 94 * 65536 + 76 * 256 + 255, "US")],
        "ip_start bigint, ip_end bigint, country string",
    )
    out = compile_query(
        logs, "* | geoip client_ip", SumoSchema(raw_col="client_ip"),
        lookups={"geoip": geo},
    )
    got = {r["row_id"]: r["country"] for r in out.collect()}
    assert got == {1: "US", 2: None}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_geoip_requires_registered_table(spark):
    logs = spark.createDataFrame([(1, "1.2.3.4")],
                                 "row_id int, client_ip string")
    with pytest.raises(SumoQLError, match="geoip"):
        compile_query(logs, "* | geoip client_ip",
                      SumoSchema(raw_col="client_ip"), lookups={})


def test_csv_short_row_null_fills(spark):
    df = spark.createDataFrame(
        [(1, "a,b,c"), (2, "only-one")], "id int, msg string"
    )
    out = compile_query(
        df, "* | csv f1, f2, f3", SumoSchema(raw_col="msg")
    )
    got = {r["id"]: (r["f1"], r["f2"], r["f3"]) for r in out.collect()}
    assert got[1] == ("a", "b", "c")
    assert got[2] == ("only-one", None, None)


def test_stats_aggs_and_median(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 20.0)],
        "k string, v double",
    )
    out = compile_query(
        df, "* | stddev(v), variance(v), median(v) by k",
        SumoSchema(raw_col="k"),
    )
    got = {r["k"]: r for r in out.collect()}
    assert got["a"]["_stddev_v"] == pytest.approx(1.0)
    assert got["a"]["_variance_v"] == pytest.approx(1.0)
    assert got["a"]["_median_v"] == pytest.approx(2.0)
    assert got["b"]["_median_v"] == pytest.approx(15.0)  # interpolated


def test_count_frequent_caps_and_orders(spark):
    rows = [("x",)] * 5 + [("y",)] * 3 + [("z",)] * 3
    df = spark.createDataFrame(rows, "k string")
    out = compile_query(df, "* | count_frequent k", SumoSchema(raw_col="k"))
    got = [(r["k"], r["_approxcount"]) for r in out.collect()]
    assert got == [("x", 5), ("y", 3), ("z", 3)]  # desc count, tie on key


def test_count_frequent_rejects_bad_field(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(SumoQLError, match="count_frequent"):
        compile_query(df, "* | count_frequent k; drop", SumoSchema(raw_col="k"))


def test_scalar_rewrites_hex_numeric_ip(spark):
    df = spark.createDataFrame(
        [(1, 255, "ff", "abc", "10.1.2.3"),
         (2, 10, "A0", "3.5", "300.1.2.3"),
         (3, 16, "0", "", "172.31.0.1"),
         (4, 7, "10", "-2e3", "8.8.8.8")],
        "id int, dec bigint, hex string, maybe string, ip string",
    )
    out = compile_query(
        df,
        "* | decToHex(dec) as h"
        " | hexToDec(hex) as d"
        " | isNumeric(maybe) as isnum"
        " | isValidIP(ip) as valid"
        " | isPrivateIP(ip) as private",
        SumoSchema(raw_col="ip"),
    )
    rows = {r["id"]: r for r in out.collect()}
    assert [rows[i]["h"] for i in (1, 2, 3, 4)] == ["FF", "A", "10", "7"]
    assert [rows[i]["d"] for i in (1, 2, 3, 4)] == [255, 160, 0, 16]
    assert [rows[i]["isnum"] for i in (1, 2, 3, 4)] == [
        False, True, False, True]  # "-2e3" parses as a double
    assert [rows[i]["valid"] for i in (1, 2, 3, 4)] == [
        True, False, True, True]  # 300 octet out of range
    assert [rows[i]["private"] for i in (1, 2, 3, 4)] == [
        True, False, True, False]  # 10/8, —, 172.31/12, public


def test_scalar_rewrites_luhn_haversine(spark):
    df = spark.createDataFrame(
        [(1, "79927398713"), (2, "79927398710")], "id int, cc string")
    out = compile_query(
        df,
        "* | luhn(cc) as valid_cc"
        " | haversine(36.12, -86.67, 33.94, -118.40) as dist_km",
        SumoSchema(raw_col="cc"),
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["valid_cc"] is True and rows[2]["valid_cc"] is False
    # LAX–BNA great-circle distance ≈ 2887 km (classic haversine example)
    assert abs(rows[1]["dist_km"] - 2887.26) < 1.0


def test_haversine_parenthesizes_operator_bearing_args(spark):
    # _SIMPLE_ARG admits arithmetic like `lat - 0.5`; without parens the
    # substitution into `(\3 - \1)` would rebind as lat2 - lat - 0.5 and
    # silently skew distances.  Both spellings must agree.
    df = spark.createDataFrame([(1, 36.62, -86.17)], "id int, lat double, lon double")
    out = compile_query(
        df,
        "* | haversine(lat - 0.5, lon - 0.5, 33.94, -118.40) as d1"
        " | haversine(36.12, -86.67, 33.94, -118.40) as d2",
        SumoSchema(raw_col="id"),
    )
    r = out.collect()[0]
    assert abs(r["d1"] - r["d2"]) < 1e-9


def test_json_stage_field_and_array_path(spark):
    df = spark.createDataFrame(
        [(1, "x", '{"user":{"name":"ann"},"phones":["p1","p2"]}')],
        "id int, msg string, payload string",
    )
    out = compile_query(
        df,
        '* | json field=payload "user.name", "phones[1]" as uname, phone2',
        SumoSchema(raw_col="msg"),
    )
    row = out.collect()[0]
    assert row["uname"] == "ann" and row["phone2"] == "p2"


def test_json_stage_default_alias_strips_index(spark):
    df = spark.createDataFrame(
        [(1, '{"a":{"b":[10,20]}}')], "id int, raw string")
    out = compile_query(df, '* | json "a.b[0]"', SumoSchema(raw_col="raw"))
    assert out.collect()[0]["b"] == "10"


def test_logexplain_default_control(spark):
    # 4 error rows (3 on host a, 1 on host b), 4 ok rows (all host b):
    # host a should fully separate with relevance = 0.75 * (1 - 0) = 0.75.
    rows = [("error", "a")] * 3 + [("error", "b")] + [("ok", "b")] * 4
    df = spark.createDataFrame(rows, "status string, host string")
    out = compile_query(
        df, '* | logexplain status = "error" on host',
        SumoSchema(raw_col="status"),
    ).collect()
    by_expl = {r.explanation: r for r in out}
    a = by_expl["host=a"]
    assert a.test_count == 3 and a.control_count == 0
    assert a.test_coverage == 0.75 and a.control_coverage == 0.0
    assert a.relevance == 0.75
    b = by_expl["host=b"]
    assert b.test_count == 1 and b.control_count == 4
    assert b.control_coverage == 1.0
    # Sorted by relevance descending: the separating value leads.
    assert out[0].explanation == "host=a"


def test_logexplain_against_and_meta_resolution(spark):
    rows = [("error", "a", "x"), ("warn", "a", "x"),
            ("ok", "b", "y"), ("error", "b", "y")]
    df = spark.createDataFrame(rows, "status string, host string, cat string")
    out = compile_query(
        df,
        '* | logexplain status = "error" against status = "ok" '
        "on host, _sourceCategory",
        SumoSchema(raw_col="status", meta_cols={"_sourceCategory": "cat"}),
    ).collect()
    expl = {r.explanation for r in out}
    # Meta name appears in the label, bound column drives the grouping;
    # only combos with at least one test row survive.
    assert expl == {"host=a, _sourceCategory=x", "host=b, _sourceCategory=y"}
    # Control totals count only rows matching the against-condition.
    b = next(r for r in out if r.explanation.startswith("host=b"))
    assert b.control_count == 1 and b.control_coverage == 1.0


def test_logexplain_rejects_garbage(spark):
    df = spark.createDataFrame([("x",)], "a string")
    with pytest.raises(SumoQLError):
        compile_query(df, "* | logexplain on ", SumoSchema(raw_col="a"))


def test_split_stage_named_pieces(spark):
    df = spark.createDataFrame(
        [("a|b|c",), ("x|y",)], "msg string")
    out = compile_query(
        df, "* | split msg delim='|' extract p1, p2, p3",
        SumoSchema(raw_col="msg"),
    ).collect()
    got = {r.msg: (r.p1, r.p2, r.p3) for r in out}
    assert got == {"a|b|c": ("a", "b", "c"), "x|y": ("x", "y", None)}


def test_split_stage_rejects_garbage(spark):
    df = spark.createDataFrame([("x",)], "msg string")
    with pytest.raises(SumoQLError):
        compile_query(df, "* | split msg delim= extract a",
                      SumoSchema(raw_col="msg"))


def test_values_aggregate_sorted_distinct(spark):
    df = spark.createDataFrame(
        [("a", "z"), ("a", "m"), ("a", "z"), ("b", "k")],
        "grp string, v string")
    out = compile_query(df, "* | values(v) by grp",
                        SumoSchema(raw_col="v")).collect()
    got = {r.grp: r._values_v for r in out}
    assert got == {"a": "m,z", "b": "k"}


def test_trace_follows_id_chain(spark):
    # Chain: A-1 <-> B-1 <-> A-2 <-> B-2 ; island: A-9 <-> B-9.
    rows = [
        (1, "start A-1"),
        (2, "A-1 linked B-1"),
        (3, "B-1 linked A-2"),
        (4, "A-2 linked B-2"),
        (5, "island A-9 B-9"),
        (6, "no ids here"),
    ]
    df = spark.createDataFrame(rows, "id long, msg string")
    out = compile_query(
        df, '* | trace "[AB]-[0-9]+" "A-1"', SumoSchema(raw_col="msg"))
    assert sorted(r.id for r in out.collect()) == [1, 2, 3, 4]
    assert "_tids" not in out.columns


def test_trace_seed_only_matches_itself(spark):
    df = spark.createDataFrame(
        [(1, "only X-5"), (2, "only X-7")], "id long, msg string")
    out = compile_query(
        df, '* | trace "X-[0-9]+" "X-5"', SumoSchema(raw_col="msg"))
    assert [r.id for r in out.collect()] == [1]


def test_trace_rejects_bad_args(spark):
    df = spark.createDataFrame([("x",)], "msg string")
    with pytest.raises(SumoQLError):
        compile_query(df, '* | trace "only-one-arg"',
                      SumoSchema(raw_col="msg"))


# --- subquery / compose ---------------------------------------------------


@pytest.fixture(scope="module")
def sub_logs(spark):
    rows = [
        (1, "click", 10, 1.0),
        (2, "click", 20, 2.0),
        (3, "click", 30, 3.0),
        (4, "error", 10, 99.0),
        (5, "error", 20, 1.0),
        (6, "error", 40, 99.0),
    ]
    return spark.createDataFrame(rows, "id int, cat string, uid int, v double")


SUB_SCHEMA = SumoSchema(raw_col="cat", meta_cols={"_sourceCategory": "cat"})


def test_subquery_semi_joins_composed_keys(sub_logs):
    out = compile_query(
        sub_logs,
        "_sourceCategory=click "
        "[subquery:_sourceCategory=error | where v > 50 | compose uid]",
        SUB_SCHEMA,
    )
    # users 10 and 40 had high-value errors; only 10 also clicked.
    assert sorted(r.id for r in out.collect()) == [1]
    assert out.columns == sub_logs.columns  # semi join adds nothing


def test_subquery_multi_field_and_maxresults(sub_logs):
    out = compile_query(
        sub_logs,
        "* [subquery:_sourceCategory=error | compose uid, cat"
        " maxresults=100]",
        SUB_SCHEMA,
    )
    # (uid, cat) must match — clicks never match the error rows' cat.
    assert sorted(r.id for r in out.collect()) == [4, 5, 6]


def test_subquery_plan_is_broadcast_semi_join(sub_logs):
    out = compile_query(
        sub_logs,
        "_sourceCategory=click "
        "[subquery:_sourceCategory=error | compose uid]",
        SUB_SCHEMA,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_subquery_meta_field_resolution(sub_logs):
    # compose on the Sumo meta name; resolves through schema.meta_cols.
    out = compile_query(
        sub_logs,
        "* [subquery:_sourceCategory=error | compose _sourceCategory]",
        SUB_SCHEMA,
    )
    assert sorted(r.id for r in out.collect()) == [4, 5, 6]


def test_subquery_rejects_keywords_and_missing_compose(sub_logs):
    with pytest.raises(SumoQLError):
        compile_query(
            sub_logs,
            "* [subquery:_sourceCategory=error | compose uid keywords]",
            SUB_SCHEMA,
        )
    with pytest.raises(SumoQLError):
        compile_query(
            sub_logs, "* [subquery:_sourceCategory=error]", SUB_SCHEMA)
    with pytest.raises(SumoQLError):
        compile_query(
            sub_logs,
            "* [subquery:_sourceCategory=error | compose nosuchfield]",
            SUB_SCHEMA,
        )


def test_subquery_inner_aggregation_compose(sub_logs):
    # compose a post-aggregation column: users with >= 2 error events.
    out = compile_query(
        sub_logs,
        "_sourceCategory=click "
        "[subquery:_sourceCategory=error | count by uid"
        " | where _count >= 1 | compose uid]",
        SUB_SCHEMA,
    )
    assert sorted(r.uid for r in out.collect()) == [10, 20]


# --- ipv4ToNumber / parseDate / urlencode rewrites ------------------------


def test_ipv4_to_number_and_urlencode(spark):
    df = spark.createDataFrame([("1.2.3.4", "a b&c")], "ip string, s string")
    out = compile_query(
        df,
        "* | ipv4ToNumber(ip) as n | urlencode(s) as enc",
        SumoSchema(raw_col="ip"),
    )
    row = out.collect()[0]
    assert row.n == (1 << 24) + (2 << 16) + (3 << 8) + 4
    assert row.enc == "a+b%26c"


def test_parse_date_epoch_millis(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame([("2024-01-01 00:00:01",)], "d string")
    out = compile_query(
        df,
        '* | parseDate(d, "yyyy-MM-dd HH:mm:ss") as ms',
        SumoSchema(raw_col="d"),
    )
    assert out.collect()[0].ms == 1704067201000


def test_count_frequent_approx_matches_exact_at_low_cardinality(spark):
    rows = [(i, f"k{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "id int, k string")
    exact = compile_query(df, "* | count_frequent k",
                          SumoSchema(raw_col="k")).collect()
    approx = compile_query(df, "* | count_frequent k approx",
                           SumoSchema(raw_col="k")).collect()
    assert {(r.k, r._approxcount) for r in approx} == \
        {(r.k, r._approxcount) for r in exact}


def test_count_frequent_approx_multi_field(spark):
    rows = [(i, f"k{i % 3}", f"g{i % 2}") for i in range(60)]
    df = spark.createDataFrame(rows, "id int, k string, g string")
    out = compile_query(df, "* | count_frequent k, g approx",
                        SumoSchema(raw_col="k")).collect()
    assert out[0]._approxcount == 10
    assert len(out) == 6 and {r.k for r in out} == {"k0", "k1", "k2"}


def test_nested_subquery_compiles_and_filters(sub_logs):
    # errors by users whose uid also appears among high-value clicks:
    # inner subquery (clicks v >= 3) composes uid=30; no error row has
    # uid 30, so the outer nested filter yields nothing for errors —
    # then the top-level subquery semi-join keeps no click rows either.
    out = compile_query(
        sub_logs,
        "_sourceCategory=click "
        "[subquery:_sourceCategory=error "
        "[subquery:_sourceCategory=click | where v >= 3 | compose uid]"
        " | compose uid]",
        SUB_SCHEMA,
    )
    assert out.collect() == []
    # and a nested subquery that DOES produce keys flows through:
    out2 = compile_query(
        sub_logs,
        "_sourceCategory=click "
        "[subquery:_sourceCategory=error "
        "[subquery:_sourceCategory=click | where v <= 1 | compose uid]"
        " | compose uid]",
        SUB_SCHEMA,
    )
    assert sorted(r.uid for r in out2.collect()) == [10]


def test_subquery_over_cap_raises(sub_logs):
    with pytest.raises(SumoQLError, match="more than 2 composed rows"):
        compile_query(
            sub_logs,
            "* [subquery:_sourceCategory=error | compose uid"
            " maxresults=2]",
            SUB_SCHEMA,
        ).collect()


def test_count_frequent_approx_null_keys_match_exact(spark):
    rows = [(None, "x"), ("x", None), ("x", None), (None, None), ("a", "b")]
    df = spark.createDataFrame(rows, "a string, b string")
    exact = compile_query(df, "* | count_frequent a, b",
                          SumoSchema(raw_col="a")).collect()
    approx = compile_query(df, "* | count_frequent a, b approx",
                           SumoSchema(raw_col="a")).collect()
    assert {(r.a, r.b, r._approxcount) for r in approx} == \
        {(r.a, r.b, r._approxcount) for r in exact}
    # single-column NULL keys are kept too
    one = compile_query(df, "* | count_frequent a approx",
                        SumoSchema(raw_col="a")).collect()
    assert {(r.a, r._approxcount) for r in one} == {("x", 2), ("a", 1),
                                                    (None, 2)}


def test_logexplain_keywords_inside_quotes(spark):
    # 'against' and 'on' inside quoted literals belong to the condition.
    rows = [("fight against x", "h1"), ("peace on earth", "h1"),
            ("fight against x", "h2"), ("calm", "h2")]
    df = spark.createDataFrame(rows, "msg string, host string")
    out = compile_query(
        df,
        '* | logexplain msg = "fight against x" on host',
        SumoSchema(raw_col="msg"),
    )
    got = {r.explanation: r.test_count for r in out.collect()}
    assert got == {"host=h1": 1, "host=h2": 1}


def test_cidr_rewrites(spark):
    df = spark.createDataFrame(
        [("10.10.1.32", "10.10.1.1"), ("10.11.1.32", "10.10.1.1")],
        "a string, b string",
    )
    out = compile_query(
        df,
        '* | maskFromCIDR("16") as m16'
        ' | getCIDRPrefix(a, "16") as net'
        ' | compareCIDRPrefix(a, b, "16") as same16'
        ' | compareCIDRPrefix(a, b, "8") as same8',
        SumoSchema(raw_col="a"),
    ).collect()
    assert out[0]["m16"] == "255.255.0.0"
    assert out[0]["net"] == "10.10.0.0/16" and out[1]["net"] == "10.11.0.0/16"
    assert out[0]["same16"] is True and out[1]["same16"] is False
    assert out[1]["same8"] is True


def test_cidr_edge_prefixes(spark):
    df = spark.createDataFrame([("10.10.1.32",)], "a string")
    out = compile_query(
        df,
        '* | maskFromCIDR("32") as m32'
        ' | getCIDRPrefix(a, "32") as full'
        ' | compareCIDRPrefix(a, "99.0.0.1", "0") as always',
        SumoSchema(raw_col="a"),
    ).collect()[0]
    assert out["m32"] == "255.255.255.255"
    assert out["full"] == "10.10.1.32/32"
    assert out["always"] is True


def test_cidr_prefix_out_of_range_raises_sumoql_error(spark):
    df = spark.createDataFrame([("10.0.0.1",)], "a string")
    for q in ('* | maskFromCIDR("40") as m',
              '* | getCIDRPrefix(a, "99") as n',
              '* | compareCIDRPrefix(a, a, "33") as c'):
        with pytest.raises(SumoQLError, match="out of range"):
            compile_query(df, q, SumoSchema(raw_col="a"))


def test_benchmark_stage_maps_keys_and_broadcasts(spark):
    """``benchmark <col> as <alias> from <table> on bkey=field`` — the
    reference's enterprise-probe verb (sumoresource.py:56-62): baseline
    keys map onto local fields, the value column lands under the alias,
    unmatched rows keep NULL (left join), and the join broadcasts."""
    import pytest as _pytest

    from sumologic_aws_lambda_spark.plans.sumoql import (
        SumoQLError,
        SumoSchema,
        compile_query,
    )

    df = spark.createDataFrame(
        [("Recon", "sev2"), ("Recon", "sev2"), ("Exfil", "sev9")],
        "threatPurpose string, sev string")
    bench = spark.createDataFrame(
        [("Recon", "sev2", 12.5)],
        "threatpurpose string, severity string, percentage double")
    out = compile_query(
        df,
        "* | benchmark percentage as global_percent from guardduty"
        " on threatpurpose=threatPurpose, severity=sev",
        SumoSchema(raw_col="threatPurpose"),
        lookups={"guardduty": bench},
    )
    rows = {(r["threatPurpose"], r["global_percent"])
            for r in out.collect()}
    assert rows == {("Recon", 12.5), ("Exfil", None)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    with _pytest.raises(SumoQLError, match="unknown benchmark table"):
        compile_query(df, "* | benchmark percentage from nope on a=sev",
                      SumoSchema(raw_col="sev"), lookups={})


def test_lookup_contains_flags_and_broadcasts(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [("u1", 5), ("u2", 7), ("u3", 9)], "user string, n int")
    allow = spark.createDataFrame(
        [("u1", "x"), ("u1", "y"), ("u3", "z")],
        "member string, extra string")
    out = compile_query(
        df,
        "* | lookupContains known from allowlist on user=member",
        SumoSchema(raw_col="user"),
        lookups={"allowlist": allow},
    )
    got = {(r["user"], r["known"]) for r in out.collect()}
    assert got == {("u1", True), ("u2", False), ("u3", True)}
    # probe side is the distinct key only, broadcast; no width leak
    assert "extra" not in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    with _pytest.raises(SumoQLError, match="unknown lookup table"):
        compile_query(df, "* | lookupContains f from nope on user",
                      SumoSchema(raw_col="user"), lookups={})


def test_lookup_contains_resolves_disk_resident_tables(spark, tmp_path):
    """PersistentLookups resolves tables via __missing__ (disk load);
    lookupContains/benchmark must use membership + [] — .get() bypasses
    __missing__ and wrongly reported saved tables as unknown."""
    from sumologic_aws_lambda_spark.plans.lookups import PersistentLookups

    store = PersistentLookups(spark, str(tmp_path / "lk"))
    store.save("allow", spark.createDataFrame(
        [("u1",)], "member string"))
    # a FRESH store over the same root: table exists on disk only
    fresh = PersistentLookups(spark, str(tmp_path / "lk"))
    assert "allow" in fresh and dict.get(fresh, "allow") is None
    df = spark.createDataFrame([("u1",), ("u2",)], "user string")
    out = compile_query(
        df, "* | lookupContains known from allow on user=member",
        SumoSchema(raw_col="user"), lookups=fresh)
    assert {(r["user"], r["known"]) for r in out.collect()} == \
        {("u1", True), ("u2", False)}


def test_meta_field_grouping_in_agg_top_count_frequent(logs):
    # Built-in metadata fields resolve through meta_cols in EVERY
    # grouping stage (round-8 review: the agg-only fix left `top` and
    # `count_frequent` throwing unresolved-column errors on the same
    # idiom).
    out = compile_query(logs, "* | count by _sourceCategory", SCHEMA)
    got = {r["_sourceCategory"]: r["_count"] for r in out.collect()}
    assert got == {"prod/api": 2, "prod/web": 1, "dev/api": 1}

    top = compile_query(logs, "* | top 2 _sourceCategory", SCHEMA)
    rows = top.collect()
    assert [r["_sourceCategory"] for r in rows] == ["prod/api", "dev/api"]
    assert rows[0]["_count"] == 2

    cf = compile_query(logs, "* | count_frequent _sourceCategory", SCHEMA)
    got = {r["_sourceCategory"]: r["_approxcount"] for r in cf.collect()}
    assert got == {"prod/api": 2, "prod/web": 1, "dev/api": 1}

    cfa = compile_query(
        logs, "* | count_frequent _sourceCategory approx", SCHEMA)
    got = {r["_sourceCategory"]: r["_approxcount"] for r in cfa.collect()}
    assert got == {"prod/api": 2, "prod/web": 1, "dev/api": 1}
