"""Unit semantics of the time-series SumoQL stages (plans/sumoql_ts.py)
on tiny hand-built frames — the oracle parity suite covers the fixture
tables; these pin the per-stage contracts."""

from __future__ import annotations

import datetime

import pytest

from sumologic_aws_lambda_spark.plans.sumoql import (
    SumoQLError,
    SumoSchema,
    compile_query,
)
from sumologic_aws_lambda_spark.functions.ip import (
    compare_cidr_prefix,
    get_cidr_prefix,
    ipv4_to_number,
    mask_from_cidr,
)
from pyspark.sql import functions as F

SCHEMA = SumoSchema(raw_col="msg", ts_col="ts")


def _series(spark, rows):
    return spark.createDataFrame(
        [(datetime.datetime(2024, 1, d), g, v) for d, g, v in rows],
        "ts timestamp, grp string, v long",
    ).withColumn("_timeslice", F.col("ts"))


def test_accum_and_total(spark):
    df = _series(spark, [(1, "a", 1), (2, "a", 2), (3, "a", 3)])
    out = compile_query(df, "* | accum v | total v", SCHEMA)
    rows = {r["ts"].day: (r["_accum"], r["_total"])
            for r in out.collect()}
    assert rows == {1: (1.0, 6.0), 2: (3.0, 6.0), 3: (6.0, 6.0)}


def test_backshift_diff_by_group(spark):
    df = _series(
        spark,
        [(1, "a", 10), (2, "a", 13), (1, "b", 5), (2, "b", 4)],
    )
    out = compile_query(
        df, "* | backshift v by grp | diff v by grp", SCHEMA
    )
    got = {(r["grp"], r["ts"].day): (r["_backshift"], r["_diff"])
           for r in out.collect()}
    assert got[("a", 1)] == (None, None)
    assert got[("a", 2)] == (10, 3)
    assert got[("b", 2)] == (5, -1)


def test_smooth_window_and_alias(spark):
    df = _series(spark, [(1, "a", 2), (2, "a", 4), (3, "a", 9)])
    out = compile_query(df, "* | smooth v, 2 as sm", SCHEMA)
    got = {r["ts"].day: r["sm"] for r in out.collect()}
    assert got == {1: 2.0, 2: 3.0, 3: 6.5}


def test_fillmissing_densifies_and_zero_fills(spark):
    df = _series(spark, [(1, "a", 7), (4, "a", 9)]).drop("grp", "ts")
    out = compile_query(df, "* | fillmissing timeslice(1d)", SCHEMA)
    got = {r["_timeslice"].day: r["v"] for r in out.collect()}
    assert got == {1: 7, 2: 0, 3: 0, 4: 9}


def test_outlier_baseline_excludes_current_row(spark):
    # flat baseline then a spike: sigma of the trailing window is 0, so
    # the spike trips; earlier rows don't (|x-mu| = 0).
    df = _series(
        spark, [(d, "a", 5) for d in range(1, 6)] + [(6, "a", 50)]
    )
    out = compile_query(
        df, "* | outlier v window=5 threshold=1", SCHEMA
    )
    got = {r["ts"].day: r["_violation"] for r in out.collect()}
    assert got[6] == 1
    assert all(got[d] == 0 for d in range(1, 6))


def test_transpose_requires_single_measure(spark):
    df = _series(spark, [(1, "a", 1)])  # ts + grp + v + _timeslice
    with pytest.raises(SumoQLError, match="one measure"):
        compile_query(
            df, "* | transpose row _timeslice column grp as a", SCHEMA
        )


def test_predict_emits_horizon_rows(spark):
    df = (
        _series(spark, [(d, "a", 10 + 2 * d) for d in range(1, 6)])
        .drop("grp", "ts")
    )
    out = compile_query(df, "* | predict v, 3", SCHEMA).collect()
    observed = [r for r in out if r["v"] is not None]
    forecast = [r for r in out if r["v"] is None]
    assert len(observed) == 5 and len(forecast) == 3
    # perfectly linear input → exact fit, day-6 forecast = 22
    by_day = {r["_timeslice"].day: r["_predicted"] for r in out}
    assert abs(by_day[6] - 22.0) < 1e-6
    assert abs(by_day[8] - 26.0) < 1e-6


def test_cidr_functions(spark):
    df = spark.createDataFrame(
        [("10.10.1.35", "10.10.200.4"), ("10.10.1.35", "192.168.0.1")],
        "a string, b string",
    ).select(
        ipv4_to_number("a").alias("num"),
        get_cidr_prefix("a", 17).alias("net"),
        mask_from_cidr(17).alias("mask"),
        compare_cidr_prefix("a", "b", 16).alias("same16"),
    )
    rows = df.collect()
    assert rows[0]["num"] == 10 * 16777216 + 10 * 65536 + 1 * 256 + 35
    assert rows[0]["net"] == "10.10.0.0/17"
    assert rows[0]["mask"] == "255.255.128.0"
    assert rows[0]["same16"] is True
    assert rows[1]["same16"] is False


def _logs(spark):
    return spark.createDataFrame(
        [("click k=1", "a"), ("click k=2", "b"), ("view k=1", "a"),
         ("view k=3", "c")],
        "msg string, tag string",
    )


def test_subsearch_join_three_way(spark):
    df = _logs(spark)
    out = compile_query(
        df,
        "* | join"
        ' (parse "click k=*" as k | count by k) as c,'
        ' (parse "view k=*" as k | count by k) as v,'
        ' (parse "* k=" as kind | count by kind) as t'
        " on c.k = v.k, t.kind = c.k",
        SCHEMA,
    )
    # only k=1 appears in both click and view; no kind equals '1'
    assert out.columns == [
        "c_k", "c__count", "v_k", "v__count", "t_kind", "t__count"
    ]
    assert out.count() == 0


def test_subsearch_join_two_way(spark):
    df = _logs(spark)
    rows = compile_query(
        df,
        "* | join"
        ' (parse "click k=*" as k | count by k) as c,'
        ' (parse "view k=*" as k | count by k) as v'
        " on c.k = v.k",
        SCHEMA,
    ).collect()
    assert len(rows) == 1
    assert rows[0]["c_k"] == "1" and rows[0]["v__count"] == 1


def test_join_requires_linked_condition(spark):
    with pytest.raises(SumoQLError, match="no 'on' condition"):
        compile_query(
            _logs(spark),
            "* | join (count by tag) as a, (count by msg) as b"
            " on a.tag = a.tag",
            SCHEMA,
        )


def test_save_then_lookup(spark):
    df = _logs(spark)
    lookups = {}
    compile_query(
        df, '* | parse "click k=*" as k | count by k | save clicks',
        SCHEMA, lookups=lookups,
    )
    assert "clicks" in lookups
    out = compile_query(
        df,
        '* | parse "view k=*" as k'
        " | lookup _count from clicks on k"
        " | fields k, _count",
        SCHEMA, lookups=lookups,
    )
    got = {r["k"]: r["_count"] for r in out.collect()}
    assert got == {"1": 1, "3": None}


def test_parse_multi_explodes_matches(spark):
    df = spark.createDataFrame(
        [("a=1 b=22",), ("none here",), ("c=333",)], "msg string"
    )
    out = compile_query(
        df, '* | parse regex "(?<n>\\d+)" multi', SCHEMA
    ).collect()
    assert sorted(r["n"] for r in out) == ["1", "22", "333"]
    kept = compile_query(
        df, '* | parse regex "(?<n>\\d+)" multi nodrop', SCHEMA
    ).collect()
    assert len(kept) == 4 and None in {r["n"] for r in kept}


def test_parse_anchor_multi_explodes_matches(spark):
    # round-12: the anchor form previously IGNORED the multi flag —
    # this pins one row per template match, drop/nodrop
    df = spark.createDataFrame(
        [("k=a;k=b;",), ("none here",), ("k=c;",)], "msg string"
    )
    out = compile_query(
        df, '* | parse "k=*;" as tok multi', SCHEMA
    ).collect()
    assert sorted(r["tok"] for r in out) == ["a", "b", "c"]
    kept = compile_query(
        df, '* | parse "k=*;" as tok multi nodrop', SCHEMA
    ).collect()
    assert len(kept) == 4 and None in {r["tok"] for r in kept}


def test_parse_anchor_multi_nstar_binds_all_stars(spark):
    # round-13: multi-star anchor templates (round 12 refused them) —
    # every repeated match emits one row binding ALL stars, in match
    # order; nodrop keeps zero-match rows with nulls in every alias
    df = spark.createDataFrame(
        [("k=a;v=1;k=b;v=2;",), ("none here",), ("k=c;v=9;",)],
        "msg string",
    )
    out = compile_query(
        df, '* | parse "k=*;v=*;" as a, b multi', SCHEMA
    ).collect()
    assert sorted((r["a"], r["b"]) for r in out) == [
        ("a", "1"), ("b", "2"), ("c", "9")]
    kept = compile_query(
        df, '* | parse "k=*;v=*;" as a, b multi nodrop', SCHEMA
    ).collect()
    assert len(kept) == 4
    nulls = [r for r in kept if r["a"] is None]
    assert len(nulls) == 1 and nulls[0]["b"] is None
    # a user column named like the working prefix must survive
    df2 = spark.createDataFrame(
        [("k=a;v=1;", "keepme")], "msg string, _pmulti string")
    got = compile_query(
        df2, '* | parse "k=*;v=*;" as a, b multi', SCHEMA).collect()
    assert got[0]["_pmulti"] == "keepme" and got[0]["a"] == "a"


def test_parse_regex_multi_ngroup_binds_all_groups(spark):
    # round-14: multi-group regex-form multi (round 13 refused >1 named
    # group) — every repeated pattern match emits one row binding ALL
    # named groups, in match order; nodrop keeps zero-match rows with
    # nulls in every group column
    df = spark.createDataFrame(
        [("a=1;b=22;",), ("none here",), ("c=333;",)], "msg string"
    )
    out = compile_query(
        df, '* | parse regex "(?<k>\\w+)=(?<v>\\d+);" multi', SCHEMA
    ).collect()
    assert sorted((r["k"], r["v"]) for r in out) == [
        ("a", "1"), ("b", "22"), ("c", "333")]
    kept = compile_query(
        df, '* | parse regex "(?<k>\\w+)=(?<v>\\d+);" multi nodrop',
        SCHEMA,
    ).collect()
    assert len(kept) == 4
    nulls = [r for r in kept if r["k"] is None]
    assert len(nulls) == 1 and nulls[0]["v"] is None
    # a user column named like the working prefix must survive
    df2 = spark.createDataFrame(
        [("a=1;", "keepme")], "msg string, _pmulti string")
    got = compile_query(
        df2, '* | parse regex "(?<k>\\w+)=(?<v>\\d+);" multi',
        SCHEMA).collect()
    assert got[0]["_pmulti"] == "keepme" and got[0]["k"] == "a"
    # zero named groups is still a hard error
    import pytest as _pytest
    from sumologic_aws_lambda_spark.plans.sumoql import SumoQLError
    with _pytest.raises(SumoQLError):
        compile_query(df, '* | parse regex "(\\d+)" multi', SCHEMA)


def test_outlier_direction_filters_sign(spark):
    # flat baseline 5, then one spike up (day 6) and one drop (day 7
    # baseline window still mostly 5s)
    df = _series(
        spark,
        [(d, "a", 5) for d in range(1, 6)] + [(6, "a", 50), (7, "a", -40)],
    )
    up = compile_query(
        df, "* | outlier v window=5 threshold=1 direction=+", SCHEMA
    )
    got_up = {r["ts"].day: r["_violation"] for r in up.collect()}
    assert got_up[6] == 1 and got_up[7] == 0
    down = compile_query(
        df, "* | outlier v window=5 threshold=1 direction=-", SCHEMA
    )
    got_dn = {r["ts"].day: r["_violation"] for r in down.collect()}
    assert got_dn[6] == 0 and got_dn[7] == 1


def test_formatdate_todate_rewrites(spark):
    df = _series(spark, [(3, "a", 1)])
    out = compile_query(
        df,
        '* | formatDate(ts, "yyyy-MM") as ym | toDate(ts) as d',
        SCHEMA,
    ).collect()
    assert out[0]["ym"] == "2024-01"
    assert out[0]["d"] == datetime.date(2024, 1, 3)


def test_compare_with_timeshift(spark):
    df = _series(spark, [(1, "a", 10), (2, "a", 20), (3, "a", 35)]).select(
        "_timeslice", "grp", "v")
    out = compile_query(df, "* | compare with timeshift 1d", SCHEMA)
    rows = {r["_timeslice"].day: r["v_1d"] for r in out.collect()}
    # Day N sees day N-1's value; day 1 has no prior period.
    assert rows == {1: None, 2: 10, 3: 20}


def test_compare_timeshift_multi_period_avg(spark):
    df = _series(spark, [(1, "a", 10), (2, "a", 20), (3, "a", 60)]).select(
        "_timeslice", "grp", "v")
    out = compile_query(df, "* | compare timeshift 1d 2", SCHEMA)
    rows = {r["_timeslice"].day: r["v_1d_avg"] for r in out.collect()}
    # Day 3 averages days 1+2; day 2 only sees day 1.
    assert rows == {1: None, 2: 10.0, 3: 15.0}


def test_compare_keeps_groups_separate(spark):
    df = _series(spark, [(1, "a", 1), (2, "a", 2),
                         (1, "b", 100), (2, "b", 200)]).select(
        "_timeslice", "grp", "v")
    out = compile_query(df, "* | compare with timeshift 1d", SCHEMA)
    rows = {(r["grp"], r["_timeslice"].day): r["v_1d"]
            for r in out.collect()}
    assert rows == {("a", 1): None, ("a", 2): 1,
                    ("b", 1): None, ("b", 2): 100}


def test_compare_requires_timeslice(spark):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(SumoQLError):
        compile_query(df, "* | compare with timeshift 1d", SCHEMA)


def test_compare_keeps_numeric_group_keys(spark):
    from pyspark.sql import functions as F

    from sumologic_aws_lambda_spark.plans.sumoql import SumoSchema, compile_query

    rows = []
    for day in (1, 2):
        for uid in (10, 20):
            for _ in range(day * uid):  # distinct counts per (day, uid)
                rows.append((f"2024-05-{day:02d} 00:00:00", uid))
    df = spark.createDataFrame(rows, "ts string, user_id long").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    out = compile_query(
        df,
        "* | timeslice 1d | count by _timeslice, user_id"
        " | compare with timeshift 1d",
        SumoSchema(raw_col="ts", ts_col="ts"),
    )
    got = {(str(r["_timeslice"].date()), r.user_id):
           (r["_count"], r["_count_1d"]) for r in out.collect()}
    # day-2 rows must see THEIR OWN group's day-1 count, and user_id
    # must survive as a key (no user_id_1d column).
    assert got[("2024-05-02", 10)] == (20, 10)
    assert got[("2024-05-02", 20)] == (40, 20)
    assert "user_id_1d" not in out.columns


def test_compare_without_aggregate_raises(spark):
    from pyspark.sql import functions as F

    from sumologic_aws_lambda_spark.plans.sumoql import (
        SumoQLError,
        SumoSchema,
        compile_query,
    )

    df = spark.createDataFrame(
        [("2024-05-01 00:00:00", "x")], "ts string, label string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(SumoQLError, match="numeric aggregate"):
        compile_query(
            df, "* | timeslice 1d | compare with timeshift 1d",
            SumoSchema(raw_col="ts", ts_col="ts"),
        )


def test_compare_treats_derived_columns_as_measures(spark):
    from pyspark.sql import functions as F

    from sumologic_aws_lambda_spark.plans.sumoql import SumoSchema, compile_query

    rows = []
    for day in (1, 2):
        for cat in ("a", "b"):
            for _ in range(day * (2 if cat == "a" else 3)):
                rows.append((f"2024-07-{day:02d} 00:00:00", cat))
    df = spark.createDataFrame(rows, "ts string, cat string").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    out = compile_query(
        df,
        "* | timeslice 1d | count by _timeslice, cat"
        " | _count * 10 as rate | compare with timeshift 1d",
        SumoSchema(raw_col="ts", ts_col="ts"),
    )
    # the group-key metadata keeps cat a KEY while the derived 'rate'
    # becomes a measure with its own _1d column
    assert "rate_1d" in out.columns and "cat_1d" not in out.columns
    got = {(str(r["_timeslice"].date()), r.cat): (r["_count_1d"], r.rate_1d)
           for r in out.collect()}
    assert got[("2024-07-02", "a")] == (2, 20)
    assert got[("2024-07-02", "b")] == (3, 30)
