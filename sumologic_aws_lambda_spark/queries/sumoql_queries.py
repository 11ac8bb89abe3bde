"""Queries driven through the SumoQL compiler (``plans/sumoql.py``) —
each oracle is the hand-written SQL the compiled plan must agree with.

Schema binding for the fixture tables: ``events.props`` is the raw
message (JSON payloads), ``events.event_type`` plays ``_sourceCategory``,
``events.ts`` is ``_messagetime``; for document searches ``documents.
text`` is the raw message and ``source`` the category.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..plans.sumoql import SumoSchema, compile_query
from . import query

EVENTS_SCHEMA = SumoSchema(
    raw_col="props", ts_col="ts",
    meta_cols={"_sourceCategory": "event_type"},
)
DOCS_SCHEMA = SumoSchema(
    raw_col="text", meta_cols={"_sourceCategory": "source"},
)


@query(
    "sumoql_count_by",
    oracle="""
    SELECT json_extract_string(props, '$.k') AS k, count(*) AS _count
    FROM events
    WHERE event_type = 'click'
      AND CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    GROUP BY 1
    """,
)
def sumoql_count_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``scope | json | where | count by`` — the §3.3 search shape."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        '_sourceCategory=click | json "k" | where CAST(k AS BIGINT) > 50'
        " | count by k",
        EVENTS_SCHEMA,
    )


@query(
    "sumoql_timeslice_agg",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS _timeslice,
           count(*) AS _count,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def sumoql_timeslice_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``timeslice 1d | count, sum(value) by _timeslice`` — the search-
    language tumbling window (T10)."""
    ev = table(spark, sf_dir, "events")
    out = compile_query(
        ev,
        "_sourceCategory=purchase | timeslice 1d"
        " | count, sum(value) by _timeslice",
        EVENTS_SCHEMA,
    )
    return out.select(
        "_timeslice", "_count", F.round("_sum_value", 2).alias("sum_value")
    )


@query(
    "sumoql_parse_anchor",
    oracle="""
    SELECT nullif(regexp_extract(text, 'the (.*?) order', 1), '') AS w,
           count(*) AS _count
    FROM documents
    WHERE source = 'src1' AND contains(text, 'the')
    GROUP BY 1
    """,
)
def sumoql_parse_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor parse ``"the * order" as w`` (FER-style extraction, P19)."""
    d = table(spark, sf_dir, "documents", parallel=True)
    return compile_query(
        d,
        '_sourceCategory=src1 the | parse "the * order" as w nodrop'
        " | count by w",
        DOCS_SCHEMA,
    )


@query(
    "sumoql_parse_regex_where",
    oracle="""
    WITH parsed AS (
        SELECT nullif(regexp_extract(props, 'k.: (\\d+)', 1), '') AS knum
        FROM events
        WHERE event_type = 'error'
    )
    SELECT knum, count(*) AS _count
    FROM parsed
    WHERE CAST(knum AS BIGINT) BETWEEN 20 AND 40
    GROUP BY knum
    """,
)
def sumoql_parse_regex_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse regex`` with a named group + where + aggregation."""
    ev = table(spark, sf_dir, "events")
    # Pattern avoids literal quote chars — the tiny grammar has no escaped-
    # quote support inside quoted strings (kept small on purpose).
    return compile_query(
        ev,
        '_sourceCategory=error | parse regex "k.: (?<knum>\\d+)"'
        " | where CAST(knum AS BIGINT) BETWEEN 20 AND 40 | count by knum",
        EVENTS_SCHEMA,
    )


@query(
    "sumoql_sort_limit",
    oracle="""
    SELECT event_type, round(avg(value), 4) AS _avg_value
    FROM events
    GROUP BY event_type
    ORDER BY _avg_value DESC
    LIMIT 3
    """,
)
def sumoql_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``avg(value) by event_type | sort by _avg_value | limit 3`` —
    top-k through the compiler (TakeOrdered physically)."""
    ev = table(spark, sf_dir, "events")
    out = compile_query(
        ev,
        "* | avg(value) by event_type | sort by _avg_value | limit 3",
        EVENTS_SCHEMA,
    )
    return out.select(
        "event_type", F.round("_avg_value", 4).alias("_avg_value")
    )


@query(
    "sumoql_kv_extract",
    oracle="""
    WITH lines AS (
        SELECT 'user=u' || user_id || ' type=' || event_type ||
               ' val=' || CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)
                   AS line
        FROM events
    )
    SELECT nullif(regexp_extract(line, '(?:^|[\\s,;])type=("[^"]*"|[^\\s,;]+)', 1), '')
               AS type,
           count(*) AS _count
    FROM lines
    GROUP BY 1
    """,
)
def sumoql_kv_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``kv "type"`` — key=value extraction from a log line (Sumo's
    keyvalue operator; inverse of the P9 flatten).  Input lines are
    built from the events table so the whole path is reproducible."""
    ev = table(spark, sf_dir, "events").select(
        F.concat(
            F.lit("user=u"), F.col("user_id"),
            F.lit(" type="), F.col("event_type"),
            F.lit(" val="),
            F.floor("value").cast("long").cast("string"),
        ).alias("line")
    )
    schema = SumoSchema(raw_col="line")
    return compile_query(ev, '* | kv "type" | count by type', schema)


@query(
    "sumoql_csv_split",
    oracle="""
    WITH lines AS (
        SELECT n_name || ',' || CAST(n_nationkey AS VARCHAR) || ',' ||
               CAST(n_regionkey AS VARCHAR) AS line
        FROM nation
    )
    SELECT string_split(line, ',')[1] AS name,
           string_split(line, ',')[3] AS region_key
    FROM lines
    """,
)
def sumoql_csv_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``csv name, key, region_key`` — positional split, then keep two
    fields via the drop form ``fields - key``."""
    nat = table(spark, sf_dir, "nation").select(
        F.concat_ws(
            ",", "n_name", F.col("n_nationkey").cast("string"),
            F.col("n_regionkey").cast("string"),
        ).alias("line")
    )
    schema = SumoSchema(raw_col="line")
    return compile_query(
        nat, "* | csv name, key, region_key | fields - key, line", schema
    )


@query(
    "sumoql_top_values",
    oracle="""
    SELECT event_type, count(*) AS _count
    FROM events
    GROUP BY event_type
    ORDER BY _count DESC, event_type
    LIMIT 3
    """,
)
def sumoql_top_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``top 3 event_type`` — the dashboard most-frequent-values shape
    (cf. the 'top 10 resources' fixture,
    ``securityhub-forwarder/test/fixtures.json:3-5``)."""
    ev = table(spark, sf_dir, "events")
    return compile_query(ev, "* | top 3 event_type", EVENTS_SCHEMA)


@query(
    "sumoql_dedup_latest",
    oracle="""
    SELECT user_id, eid FROM (
        SELECT user_id, eid,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY epoch_s DESC, eid DESC
               ) AS rn
        FROM (
            SELECT user_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
                   CAST(event_id AS VARCHAR) AS eid
            FROM events
        )
    ) WHERE rn <= 1
    """,
)
def sumoql_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup by user_id`` — keep each user's most recent event.
    Timestamps are pre-floored to epoch seconds and ties break on the
    event id (cast to the raw column) so Spark(µs)/DuckDB(ns) agree."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.col("event_id").cast("string").alias("eid"),
    )
    schema = SumoSchema(raw_col="eid", ts_col="epoch_s")
    return compile_query(ev, "* | dedup by user_id | fields user_id, eid",
                         schema)


@query(
    "sumoql_percentile_first_last",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(arg_min(value, event_id), 4) AS first_value,
           round(arg_max(value, event_id), 4) AS last_value
    FROM events
    GROUP BY event_type
    """,
)
def sumoql_percentile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``percentile(value, 95), first(value), last(value) by type`` —
    first/last are min_by/max_by on a unique, monotone order column
    (event_id here), the only distributed-safe semantics."""
    ev = table(spark, sf_dir, "events")
    schema = SumoSchema(raw_col="props", ts_col="event_id")
    out = compile_query(
        ev,
        "* | percentile(value, 95), first(value), last(value)"
        " by event_type",
        schema,
    )
    return out.select(
        "event_type",
        F.round("_pct_value_95", 4).alias("p95"),
        F.round("_first_value", 4).alias("first_value"),
        F.round("_last_value", 4).alias("last_value"),
    )


@query(
    "sumoql_lookup_expr",
    oracle="""
    SELECT o.o_orderkey,
           n.n_name AS nation,
           round(o.o_totalprice * 1.1, 2) AS with_tax
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_totalprice > 400000
    """,
)
def sumoql_lookup_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``lookup … from … on …`` (broadcast dim join) + an eval
    projection stage (``expr as name``) through the compiler — Sumo's
    lookup-table operator and field expressions."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    out = compile_query(
        joined,
        "* | where o_totalprice > 400000"
        " | lookup n_name from nations on c_nationkey=n_nationkey"
        " | round(o_totalprice * 1.1, 2) as with_tax"
        " | fields o_orderkey, n_name, with_tax",
        SumoSchema(raw_col="o_orderpriority"),
        lookups={"nations": nation},
    )
    return out.withColumnRenamed("n_name", "nation")


@query(
    "sumoql_eval_functions",
    oracle="""
    WITH j AS (
        SELECT json_extract_string(props, '$.k') AS k, event_type
        FROM events WHERE event_type = 'click'
    ), f AS (
        SELECT printf('%s-%04d', upper(event_type), CAST(k AS BIGINT))
                   AS tag,
               CAST(k AS DOUBLE) AS kn
        FROM j
        WHERE regexp_matches(event_type, '^cli.*$')
    )
    SELECT tag, count(*) AS _count
    FROM f WHERE kn >= 50 GROUP BY 1
    """,
)
def sumoql_eval_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sumo scalar-function surface in eval/where expressions —
    ``matches`` (glob), ``toUpperCase``, ``format``, ``toLong``, ``num``
    — each rewritten to a built-in Spark expression (no UDFs), so the
    whole stage chain stays inside codegen."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        '_sourceCategory=click | json "k"'
        ' | where event_type matches "cli*"'
        ' | toUpperCase(event_type) as et'
        ' | format("%s-%04d", et, toLong(k)) as tag'
        " | where num(k) >= 50"
        " | count by tag",
        EVENTS_SCHEMA,
    )


@query(
    "sumoql_parse_field_chain",
    oracle="""
    WITH p1 AS (
        SELECT nullif(regexp_extract(text, 'the (.*?) order', 1), '')
                   AS phrase
        FROM documents WHERE source = 'src0'
    ), p1f AS (
        SELECT phrase FROM p1 WHERE phrase IS NOT NULL
    ), p2 AS (
        SELECT nullif(regexp_extract(phrase, '(.*?) ', 1), '')
                   AS firstword
        FROM p1f
    )
    SELECT firstword, count(*) AS _count
    FROM p2 WHERE firstword IS NOT NULL
    GROUP BY 1
    ORDER BY _count DESC, firstword ASC
    LIMIT 10
    """,
)
def sumoql_parse_field_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained parses with Sumo drop semantics: the first anchor parse
    DROPS non-matching docs (no ``nodrop``), the second reads from the
    extracted column via ``field=``; multi-key ``sort`` + ``limit``
    lowers to TakeOrderedAndProject (no global sort)."""
    d = table(spark, sf_dir, "documents", parallel=True)
    return compile_query(
        d,
        '_sourceCategory=src0 | parse "the * order" as phrase'
        ' | parse field=phrase "* " as firstword'
        " | count by firstword"
        " | sort by _count desc, firstword asc | limit 10",
        DOCS_SCHEMA,
    )


@query(
    "sumoql_subsearch_join",
    oracle="""
    WITH c AS (
        SELECT json_extract_string(props, '$.k') AS k, count(*) AS _count
        FROM events WHERE event_type = 'click' GROUP BY 1
    ), v AS (
        SELECT json_extract_string(props, '$.k') AS k, count(*) AS _count
        FROM events WHERE event_type = 'view' GROUP BY 1
    )
    SELECT c.k AS c_k, c._count AS c__count,
           v.k AS v_k, v._count AS v__count
    FROM c JOIN v ON c.k = v.k
    """,
)
def sumoql_subsearch_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sumo's sub-search ``join``: two aggregating pipelines over the
    same stream, inner-joined on extracted keys.  Both operands are
    post-aggregation (small), so AQE broadcasts the smaller side."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        "* | join"
        ' (where event_type = \'click\' | json "k" | count by k) as c,'
        ' (where event_type = \'view\' | json "k" | count by k) as v'
        " on c.k = v.k",
        EVENTS_SCHEMA,
    )


@query(
    "sumoql_parse_multi",
    oracle="""
    WITH lines AS (
        SELECT 'u=' || user_id || ' e=' || event_id || ' v='
                   || CAST(floor(value) AS BIGINT) AS line
        FROM events
    ), m AS (
        SELECT unnest(regexp_extract_all(line, '(\\d+)', 1)) AS d
        FROM lines
    )
    SELECT d, count(*) AS _count
    FROM m
    WHERE CAST(d AS BIGINT) < 40
    GROUP BY 1
    """,
)
def sumoql_parse_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse regex … multi`` — one output row per regex match
    (regexp_extract_all + explode, Sumo's multi-value extraction /
    UDTF shape)."""
    ev = table(spark, sf_dir, "events").select(
        F.concat(
            F.lit("u="), F.col("user_id"),
            F.lit(" e="), F.col("event_id"),
            F.lit(" v="), F.floor("value").cast("bigint"),
        ).alias("line")
    )
    schema = SumoSchema(raw_col="line")
    return compile_query(
        ev,
        '* | parse regex "(?<d>\\d+)" multi'
        " | where CAST(d AS BIGINT) < 40 | count by d",
        schema,
    )


@query(
    "sumoql_parse_anchor_multi",
    oracle="""
    WITH lines AS (
        SELECT 'k=' || event_type || ';k='
                   || substr(CAST(user_id AS VARCHAR), 1, 2)
                   || ';' AS line
        FROM events
    ), m AS (
        SELECT unnest(regexp_extract_all(line, 'k=(.*?);', 1)) AS tok
        FROM lines
    )
    SELECT tok, count(*) AS _count
    FROM m
    GROUP BY 1
    """,
)
def sumoql_parse_anchor_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-form ``parse "k=*;" as tok multi`` — the template applied
    repeatedly, one output ROW per match (round-12: previously the
    anchor branch silently ignored the ``multi`` flag; now it compiles
    to the same regexp_extract_all + explode shape as the regex branch,
    and raises on multi-star templates).  Scale shape: generator
    expression inside whole-stage codegen, no shuffle before the final
    count-by."""
    ev = table(spark, sf_dir, "events").select(
        F.concat(
            F.lit("k="), F.col("event_type"),
            F.lit(";k="), F.substring(F.col("user_id").cast("string"),
                                      1, 2),
            F.lit(";"),
        ).alias("line")
    )
    schema = SumoSchema(raw_col="line")
    return compile_query(
        ev,
        '* | parse "k=*;" as tok multi | count by tok',
        schema,
    )


@query(
    "sumoql_parse_anchor_multi_nstar",
    oracle="""
    WITH lines AS (
        SELECT 'a=' || event_type || ':'
                   || CAST(user_id % 10 AS VARCHAR) || ';a=s'
                   || CAST(event_id % 3 AS VARCHAR) || ':'
                   || CAST(user_id % 7 AS VARCHAR) || ';' AS line
        FROM events
    ), arrs AS (
        SELECT regexp_extract_all(line, 'a=(.*?):(.*?);', 1) AS l1,
               regexp_extract_all(line, 'a=(.*?):(.*?);', 2) AS l2
        FROM lines
    ), m AS (
        SELECT l1[i] AS k, l2[i] AS v
        FROM arrs, LATERAL (
            SELECT unnest(generate_series(1, len(l1))) AS i
        ) t
    )
    SELECT k, v, count(*) AS _count
    FROM m
    GROUP BY 1, 2
    """,
)
def sumoql_parse_anchor_multi_nstar(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Multi-star anchor-form ``parse "a=*:*;" as k, v multi`` — every
    repeated template match emits one row binding ALL stars (round-13:
    the round-12 single-star form refused multi-star with an error;
    full Sumo semantics compile to one regexp_extract_all per group
    over the same pattern, arrays_zip, explode).  Scale shape: generator
    expression inside whole-stage codegen, no shuffle before the final
    count-by."""
    ev = table(spark, sf_dir, "events").select(
        F.concat(
            F.lit("a="), F.col("event_type"),
            F.lit(":"), (F.col("user_id") % 10).cast("string"),
            F.lit(";a=s"), (F.col("event_id") % 3).cast("string"),
            F.lit(":"), (F.col("user_id") % 7).cast("string"),
            F.lit(";"),
        ).alias("line")
    )
    schema = SumoSchema(raw_col="line")
    return compile_query(
        ev,
        '* | parse "a=*:*;" as k, v multi | count by k, v',
        schema,
    )


@query(
    "sumoql_parse_regex_multi_ngroup",
    oracle="""
    WITH lines AS (
        SELECT 'a' || CAST(event_id % 3 AS VARCHAR) || '='
                   || CAST(user_id % 10 AS VARCHAR) || ';b='
                   || CAST(user_id % 7 AS VARCHAR) || ';' AS line
        FROM events
    ), arrs AS (
        SELECT regexp_extract_all(line, '(\\w+)=(\\d+);', 1) AS l1,
               regexp_extract_all(line, '(\\w+)=(\\d+);', 2) AS l2
        FROM lines
    ), m AS (
        SELECT l1[i] AS k, l2[i] AS v
        FROM arrs, LATERAL (
            SELECT unnest(generate_series(1, len(l1))) AS i
        ) t
    )
    SELECT k, v, count(*) AS _count
    FROM m
    GROUP BY 1, 2
    """,
)
def sumoql_parse_regex_multi_ngroup(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Multi-group regex-form ``parse regex "(?<k>\\w+)=(?<v>\\d+);"
    multi`` — every repeated pattern match emits one row binding ALL
    named groups (round-14: the regex branch previously refused >1
    named group under ``multi``; the anchor branch's multi-star
    technique — one regexp_extract_all per group, arrays_zip, explode —
    transplanted to named groups, per reference FER semantics
    sumoresource.py:1147-1177).  Scale shape: generator expression
    inside whole-stage codegen, no shuffle before the final
    count-by."""
    ev = table(spark, sf_dir, "events").select(
        F.concat(
            F.lit("a"), (F.col("event_id") % 3).cast("string"),
            F.lit("="), (F.col("user_id") % 10).cast("string"),
            F.lit(";b="), (F.col("user_id") % 7).cast("string"),
            F.lit(";"),
        ).alias("line")
    )
    schema = SumoSchema(raw_col="line")
    return compile_query(
        ev,
        '* | parse regex "(?<k>\\w+)=(?<v>\\d+);" multi | count by k, v',
        schema,
    )


@query(
    "sumoql_timeslice_buckets",
    oracle="""
    WITH src AS (
        SELECT CAST(floor(epoch(ts)) AS BIGINT) AS e
        FROM events WHERE event_type = 'view'
    ), b AS (
        SELECT min(e) AS lo, max(e) AS hi FROM src
    ), w AS (
        SELECT lo, (hi - lo) // 10 + 1 AS width FROM b
    )
    SELECT CAST(to_timestamp(lo + ((e - lo) // width) * width)
                AS TIMESTAMP) AS _timeslice,
           count(*) AS _count
    FROM src CROSS JOIN w
    GROUP BY 1
    """,
)
def sumoql_timeslice_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``timeslice 10 buckets`` — fixed-count slicing (the dashboard
    auto-bucket form): span min/max agg broadcast back, integer epoch
    bucket assignment, then the usual count-by."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        "_sourceCategory=view | timeslice 10 buckets"
        " | count by _timeslice",
        EVENTS_SCHEMA,
    )


@query(
    "sumoql_transaction",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS view,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS purchase,
           epoch_us(min(ts)) // 1000000 AS _begin_epoch,
           (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000 AS _duration_ms
    FROM events
    WHERE event_type IN ('view', 'click', 'purchase')
    GROUP BY user_id
    """,
)
def sumoql_transaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``transaction on user_id with states view,click,purchase in
    event_type`` — per-user funnel transactions: state counts + span.
    One map-side-combined shuffle on the transaction key
    (``plans/sumoql.py::_stage_transaction``)."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        "* | transaction on user_id with states view,click,purchase"
        " in event_type",
        EVENTS_SCHEMA,
    )


# Synthetic access-log rows + a tiny geo range table for the geoip stage.
_GEO_LOGS: list[tuple[int, str]] = [
    (1, "52.94.76.10"),     # us-range
    (2, "52.94.76.200"),    # us-range
    (3, "185.199.108.153"), # eu-range
    (4, "10.0.0.7"),        # private -> no match
    (5, "203.0.113.99"),    # apnic doc range
]
_GEO_RANGES: list[tuple[int, int, str, str]] = [
    # (ip_start, ip_end, country, region): contiguous public test ranges
    (52 * 16777216 + 94 * 65536 + 76 * 256,       # 52.94.76.0
     52 * 16777216 + 94 * 65536 + 76 * 256 + 255, # 52.94.76.255
     "US", "us-east"),
    (185 * 16777216 + 199 * 65536 + 108 * 256,
     185 * 16777216 + 199 * 65536 + 111 * 256 + 255,
     "NL", "eu-west"),
    (203 * 16777216 + 0 * 65536 + 113 * 256,
     203 * 16777216 + 0 * 65536 + 113 * 256 + 255,
     "AU", "ap-southeast"),
]


@query(
    "sumoql_geoip_enrich",
    oracle=f"""
    WITH logs(row_id, client_ip) AS (
        VALUES {", ".join(f"({i}, '{ip}')" for i, ip in _GEO_LOGS)}
    ),
    geo(ip_start, ip_end, country, region) AS (
        VALUES {", ".join(f"({a}, {b}, '{c}', '{r}')"
                          for a, b, c, r in _GEO_RANGES)}
    ),
    nums AS (
        SELECT row_id, client_ip,
               CAST(string_split(client_ip, '.')[1] AS BIGINT) * 16777216
             + CAST(string_split(client_ip, '.')[2] AS BIGINT) * 65536
             + CAST(string_split(client_ip, '.')[3] AS BIGINT) * 256
             + CAST(string_split(client_ip, '.')[4] AS BIGINT) AS ipnum
        FROM logs
    )
    SELECT n.row_id, n.client_ip, g.country, g.region
    FROM nums n LEFT JOIN geo g
      ON n.ipnum >= g.ip_start AND n.ipnum <= g.ip_end
    """,
)
def sumoql_geoip_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``* | geoip client_ip`` — range-lookup enrichment against a
    registered geo table (stand-in for the MaxMind db).  The geo dim
    broadcasts; the log side never shuffles
    (``plans/sumoql.py::_stage_geoip``)."""
    logs = spark.createDataFrame(_GEO_LOGS, "row_id int, client_ip string")
    geo = spark.createDataFrame(
        _GEO_RANGES, "ip_start bigint, ip_end bigint,"
        " country string, region string"
    )
    return compile_query(
        logs, "* | geoip client_ip",
        SumoSchema(raw_col="client_ip"),
        lookups={"geoip": geo},
    )

@query(
    "sumoql_stats_aggs",
    oracle="""
    SELECT event_type,
           round(stddev(value), 4) AS stddev_value,
           round(variance(value), 4) AS variance_value,
           round(median(value), 4) AS median_value
    FROM events
    GROUP BY event_type
    """,
)
def sumoql_stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stddev(x), variance(x), median(x) by k`` — the dispersion aggs of
    Sumo's search language (public operators stddev / variance / pct-50).
    stddev/variance are sample forms on both engines; median is the exact
    interpolated percentile-0.5.  One map-side-combinable shuffle for
    stddev/variance; median needs the grouped values (Spark's percentile
    buffer), fine per-group — at 100 TB swap median for approx_percentile
    if group cardinality is adversarial."""
    ev = table(spark, sf_dir, "events")
    out = compile_query(
        ev,
        "* | stddev(value), variance(value), median(value) by event_type",
        EVENTS_SCHEMA,
    )
    return out.select(
        "event_type",
        F.round("_stddev_value", 4).alias("stddev_value"),
        F.round("_variance_value", 4).alias("variance_value"),
        F.round("_median_value", 4).alias("median_value"),
    )


@query(
    "sumoql_count_frequent",
    oracle="""
    SELECT json_extract_string(props, '$.k') AS k,
           count(*) AS _approxcount
    FROM events
    WHERE event_type = 'view'
    GROUP BY 1
    ORDER BY _approxcount DESC, k
    LIMIT 100
    """,
)
def sumoql_count_frequent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``count_frequent k`` — Sumo's most-frequent-values operator
    (output field _approxcount, result cap 100).  GroupBy-count +
    TakeOrderedAndProject: no global sort, map-side partial agg
    (``plans/sumoql.py::_stage_count_frequent``)."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        '_sourceCategory=view | json "k" | count_frequent k',
        EVENTS_SCHEMA,
    )


@query(
    "sumoql_logexplain",
    oracle="""
    WITH base AS (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) > 80 AS t
        FROM events
    ),
    g AS (
        SELECT event_type,
               CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS tc,
               CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS cc
        FROM base GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(tc) AS BIGINT) AS tt,
               CAST(sum(cc) AS BIGINT) AS ct
        FROM g
    )
    SELECT concat('_sourceCategory=', coalesce(event_type, 'null'))
               AS explanation,
           round(round(tc / tt, 6) * (1 - round(cc / greatest(ct, 1), 6)), 6)
               AS relevance,
           round(tc / tt, 6) AS test_coverage,
           round(cc / greatest(ct, 1), 6) AS control_coverage,
           tc AS test_count,
           cc AS control_count
    FROM g, tot
    WHERE tc > 0
    """,
)
def sumoql_logexplain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``logexplain <cond> on _sourceCategory`` — Sumo's explanation
    miner: which source categories over-index among high-``k`` events.
    One corpus pass (conditional-count groupBy), denominators re-derived
    from the grouped frame, 1-row broadcast crossJoin
    (``plans/sumoql.py::_stage_logexplain``)."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        '* | json "k" | logexplain CAST(k AS BIGINT) > 80 on '
        "_sourceCategory",
        EVENTS_SCHEMA,
    )


@query(
    "sumoql_compare_timeshift",
    oracle="""
    WITH s AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS _timeslice,
               count(*) AS _count
        FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT s._timeslice, s._count, p._count AS _count_1d
    FROM s LEFT JOIN s p ON p._timeslice + INTERVAL 1 DAY = s._timeslice
    """,
)
def sumoql_compare_timeshift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``timeslice 1d | count by _timeslice | compare with timeshift 1d``
    — period-over-period comparison on the aggregated series: an
    equi-join of the series against its day-shifted replica, never a
    window and never the fact table
    (``plans/sumoql_ts.py::stage_compare``)."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        "_sourceCategory=error | timeslice 1d | count by _timeslice"
        " | compare with timeshift 1d",
        EVENTS_SCHEMA,
    )


_PACK_JSON = """
{
  "type": "FolderSyncDefinition",
  "name": "Events Overview",
  "description": "synthetic app export",
  "children": [
    {
      "type": "FolderSyncDefinition",
      "name": "Engagement",
      "children": [
        {
          "type": "SavedSearchWithScheduleSyncDefinition",
          "name": "High-k by category",
          "search": {
            "queryText": "_sourceCategory=$$cat | json \\"k\\" | where CAST(k AS BIGINT) > 60 | count by k"
          }
        }
      ]
    }
  ]
}
"""


@query(
    "content_pack_saved_search",
    oracle="""
    SELECT json_extract_string(props, '$.k') AS k, count(*) AS _count
    FROM events
    WHERE event_type = 'signup'
      AND CAST(json_extract_string(props, '$.k') AS BIGINT) > 60
    GROUP BY 1
    """,
)
def content_pack_saved_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Install a content pack (ApiExported JSON with a ``$$cat``
    parameter, per the reference App resource ``sumoresource.py:543``)
    into a session catalog and run its nested saved search against the
    events source (``plans/content_packs.py``)."""
    from ..plans.content_packs import ContentPack, ContentPackCatalog

    cat = ContentPackCatalog()
    cat.install(ContentPack.from_json(_PACK_JSON, {"cat": "signup"}))
    ev = table(spark, sf_dir, "events")
    return cat.run(ev, "Events Overview", "Engagement/High-k by category",
                   EVENTS_SCHEMA)


@query(
    "sumoql_split_values",
    oracle="""
    SELECT event_type AS etype,
           array_to_string(
               list_sort(list(DISTINCT CAST(user_id % 5 AS VARCHAR))),
               ',') AS _values_ubucket
    FROM events
    GROUP BY event_type
    """,
)
def sumoql_split_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``eval concat → split delim='~' extract → values() by`` — the
    delimited-field splitter (quoted pipes survive stage splitting) and
    Sumo's distinct-value-set aggregate, emitted as a sorted
    comma-joined string so the hash compare is engine-stable
    (``plans/sumoql.py::_stage_split`` / ``_stage_agg``)."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        "* | concat(event_type, '~', CAST(user_id % 5 AS STRING))"
        " as combo"
        " | split combo delim='~' extract etype, ubucket"
        " | values(ubucket) by etype",
        EVENTS_SCHEMA,
    )


@query(
    "sumoql_trace_chain",
    oracle="""
    WITH RECURSIVE msgs AS (
        SELECT event_id,
               concat('user-', CAST(user_id % 200 AS VARCHAR),
                      ' key-',
                      CAST(json_extract_string(props, '$.k') AS VARCHAR))
                   AS msg
        FROM events WHERE event_id % 37 = 0
    ),
    ids AS (
        SELECT event_id,
               unnest(regexp_extract_all(msg, '(user|key)-[0-9]+')) AS id
        FROM msgs
    ),
    edges AS (
        SELECT a.id AS src, b.id AS dst
        FROM ids a JOIN ids b
          ON a.event_id = b.event_id AND a.id <> b.id
    ),
    reach(id) AS (
        SELECT 'user-1'
        UNION
        SELECT e.dst FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT DISTINCT m.event_id, m.msg
    FROM msgs m JOIN ids i USING (event_id)
    WHERE i.id IN (SELECT id FROM reach)
    """,
)
def sumoql_trace_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``trace "<id-regex>" "user-1"`` — the transitive ID chase over
    synthesized two-id messages (user-N ↔ key-M links, the request-id /
    session-id chain shape).  The recursive-CTE oracle replays the same
    reachability fixpoint, so the BFS itself is hard-signal-checked
    (``plans/sumoql.py::_stage_trace``)."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_id") % 37 == 0
    ).select(
        "event_id",
        F.concat(
            F.lit("user-"), (F.col("user_id") % 200).cast("string"),
            F.lit(" key-"),
            F.get_json_object("props", "$.k").cast("string"),
        ).alias("msg"),
    )
    return compile_query(
        ev, '* | trace "(user|key)-[0-9]+" "user-1"',
        SumoSchema(raw_col="msg"),
    )


@query(
    "sumoql_subquery_compose",
    oracle="""
    SELECT user_id, count(*) AS _count
    FROM events
    WHERE event_type = 'click'
      AND user_id IN (
          SELECT DISTINCT user_id FROM events
          WHERE event_type = 'error' AND value > 9.0)
    GROUP BY user_id
    """,
)
def sumoql_subquery_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sumo subquery: ``scope [subquery:… | compose user_id] | count by``
    — click activity of users who also hit a high-value error.  Compiles
    to a broadcast left-semi join on the composed key set (capped at
    Sumo's documented 10k subquery-result limit), so the outer fact
    stream never shuffles for the filter
    (``plans/sumoql.py::_apply_subquery``)."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        "_sourceCategory=click "
        "[subquery:_sourceCategory=error | where value > 9.0"
        " | compose user_id]"
        " | count by user_id",
        EVENTS_SCHEMA,
    )


@query(
    "sumoql_ip_date_functions",
    oracle="""
    WITH raw(id, ip, seen) AS (
        VALUES (1, '10.1.2.3',      '2024-03-01 10:00:00'),
               (2, '192.168.0.200', '2024-03-02 23:59:59'),
               (3, '8.8.8.8',       '2024-04-15 00:30:00'),
               (4, '172.31.255.1',  '2024-12-31 12:00:00')
    )
    SELECT id,
           (CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
            + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
            + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
            + CAST(string_split(ip, '.')[4] AS BIGINT)) AS ip_num,
           (regexp_matches(ip,
               '^(10\\.|192\\.168\\.|172\\.(1[6-9]|2[0-9]|3[01])\\.)'))
               AS is_private,
           CAST(epoch_ms(CAST(seen AS TIMESTAMP)) AS BIGINT) AS epoch_millis
    FROM raw
    """,
)
def sumoql_ip_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sumo scalar surface: ``ipv4ToNumber`` (octet fold — no UDF),
    ``isPrivateIP`` (RFC1918 regex) and ``parseDate`` (SimpleDateFormat →
    ``to_timestamp``), each an eval-projection rewrite that stays inside
    whole-stage codegen (``plans/sumoql.py::_EXPR_REWRITES``)."""
    rows = [
        (1, "10.1.2.3", "2024-03-01 10:00:00"),
        (2, "192.168.0.200", "2024-03-02 23:59:59"),
        (3, "8.8.8.8", "2024-04-15 00:30:00"),
        (4, "172.31.255.1", "2024-12-31 12:00:00"),
    ]
    # parseDate interprets naive datetime strings in the session zone;
    # the oracle's epoch_ms() is UTC — pin it (idempotent; catalog.table()
    # sets the same conf, but this query never touches the catalog).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame(rows, "id int, ip string, seen string")
    out = compile_query(
        df,
        "* | ipv4ToNumber(ip) as ip_num"
        " | isPrivateIP(ip) as is_private"
        ' | parseDate(seen, "yyyy-MM-dd HH:mm:ss") as epoch_millis',
        SumoSchema(raw_col="ip"),
    )
    return out.select("id", "ip_num", "is_private", "epoch_millis")


@query(
    "scheduled_view_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS _timeslice,
           event_type,
           count(*) AS _count,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def scheduled_view_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scheduled view maintained incrementally: backfill on ~80% of the
    stream, then merge the held-out ~20% as a late batch
    (``plans/scheduled_views.py``).  The oracle is the FULL recompute
    over all events, so the hard signal checks the partial-aggregate
    merge algebra itself: refresh(backfill(A), B) must equal
    backfill(A ∪ B) per (slice × group).  Values sum as DECIMAL partials
    — exact and order-independent — so the equality is bit-level, not
    tolerance-based."""
    from ..plans.scheduled_views import (
        ScheduledViewSpec,
        materialize,
        merge_increment,
    )

    ev = table(spark, sf_dir, "events")
    spec = ScheduledViewSpec(
        name="events_daily",
        query="* | CAST(value AS DECIMAL(18,2)) as dval"
              " | timeslice 1d | count, sum(dval) by _timeslice, event_type",
    )
    history = ev.filter(F.col("event_id") % 5 != 0)
    late = ev.filter(F.col("event_id") % 5 == 0)
    view = materialize(history, spec, EVENTS_SCHEMA)
    refreshed = merge_increment(view, materialize(late, spec, EVENTS_SCHEMA))
    return refreshed.select(
        "_timeslice",
        "event_type",
        "_count",
        F.col("_sum_dval").cast("double").alias("sum_value"),
    )


@query(
    "sumoql_save_lookup_roundtrip",
    oracle="""
    WITH sev AS (
        SELECT event_type, round(avg(value), 4) AS _avg_value
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, s._avg_value AS type_avg
    FROM events e JOIN sev s USING (event_type)
    WHERE e.event_id % 211 = 0
    """,
)
def sumoql_save_lookup_roundtrip(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """``save`` → ``lookup`` roundtrip through one registry: the first
    query materializes a per-type average into the session lookup
    registry, the second enriches the fact stream from it via the
    always-broadcast lookup join (``plans/sumoql.py`` save/lookup
    stages; the parquet-persistent form is ``plans/lookups.py``)."""
    ev = table(spark, sf_dir, "events")
    registry: dict = {}
    compile_query(
        ev,
        "* | avg(value) by event_type | save type_stats",
        EVENTS_SCHEMA, lookups=registry,
    )
    out = compile_query(
        ev,
        "* | where event_id % 211 = 0"
        " | lookup _avg_value from type_stats on event_type",
        EVENTS_SCHEMA, lookups=registry,
    )
    return out.select(
        "event_id", F.round("_avg_value", 4).alias("type_avg")
    )


@query(
    "dashboard_panel_data",
    oracle="""
    SELECT 'by-type' AS panel, event_type, count(*) AS _count
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'high-value', event_type, count(*)
    FROM events WHERE value > 9.0 GROUP BY event_type
    """,
)
def dashboard_panel_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dashboard evaluation (reference ``sumologic.py:172-183``
    ``dashboard_data``): a two-panel board compiled per panel and
    stacked with the panel key — panels share the source scan, each
    panel is its own aggregation plan (``plans/dashboards.py``)."""
    import json as _json

    from ..plans.dashboards import Dashboard, DashboardService

    svc = DashboardService()
    svc.register(Dashboard.from_json(_json.dumps({
        "type": "DashboardV2SyncDefinition", "name": "events-board",
        "panels": [
            {"key": "by-type", "title": "Counts",
             "queries": [{"queryString": "* | count by event_type"}]},
            {"key": "high-value", "title": "High value",
             "queries": [{"queryString":
                          "* | where value > 9.0 | count by event_type"}]},
        ],
    })))
    ev = table(spark, sf_dir, "events")
    data = svc.dashboard_data("events-board", ev, EVENTS_SCHEMA)
    out = None
    for key, frame in data.items():
        piece = frame.select(
            F.lit(key).alias("panel"), "event_type", "_count")
        out = piece if out is None else out.unionByName(piece)
    return out


@query(
    "index_routing_stats",
    oracle="""
    SELECT CASE WHEN event_type = 'error' THEN 'security'
                WHEN value > 9.0 THEN 'high_value'
                ELSE 'sumologic_default' END AS _index,
           count(*) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    """,
)
def index_routing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition routing (Sumo indexes): every event assigned its
    partition by the first matching routing expression — one chained-when
    projection, first-match-wins precedence, unmatched rows to the
    default index (``plans/partitions.py::assign_index``; the physical
    ``partitionBy(_index)`` layout is exercised in
    ``tests/test_partitions.py``)."""
    from ..plans.partitions import PartitionSpec, assign_index

    ev = table(spark, sf_dir, "events").withColumn(
        "high", (F.col("value") > 9.0).cast("string"))
    specs = [
        PartitionSpec("security", "_sourceCategory=error"),
        PartitionSpec("high_value", "high=true"),
    ]
    routed = assign_index(ev, specs, EVENTS_SCHEMA)
    return routed.groupBy("_index").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


@query(
    "sumoql_cidr_functions",
    oracle="""
    WITH raw(id, ip) AS (
        VALUES (1, '10.10.1.32'),
               (2, '10.10.14.7'),
               (3, '192.168.0.200'),
               (4, '10.10.1.99')
    )
    SELECT id,
           '255.255.255.0' AS mask24,
           (CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
            + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
            + CAST(string_split(ip, '.')[3] AS BIGINT) * 256) // 256 * 256
               AS net24_num_helper,
           concat_ws('.',
               string_split(ip, '.')[1], string_split(ip, '.')[2],
               string_split(ip, '.')[3], '0') || '/24' AS net24,
           (string_split(ip, '.')[1] = '10'
            AND string_split(ip, '.')[2] = '10'
            AND string_split(ip, '.')[3] = '1') AS same_net_as_gw
    FROM raw
    """,
)
def sumoql_cidr_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sumo CIDR scalar family (``maskFromCIDR`` / ``getCIDRPrefix`` /
    ``compareCIDRPrefix``): each rewrites at COMPILE time to plain
    integer masking over the ipv4 octet fold — the mask constant-folds,
    the emitted expression stays inside whole-stage codegen, no UDF
    (``plans/sumoql.py::_EXPR_REWRITES``; Column twins in
    ``functions/ip.py``).  The oracle recomputes mask/prefix/compare
    with independent octet string math (/24 only needs the first three
    octets), so the bit-twiddling rewrite is checked against a
    formulation that shares none of its code."""
    rows = [(1, "10.10.1.32"), (2, "10.10.14.7"),
            (3, "192.168.0.200"), (4, "10.10.1.99")]
    df = spark.createDataFrame(rows, "id int, ip string")
    out = compile_query(
        df,
        '* | maskFromCIDR("24") as mask24'
        " | ipv4ToNumber(ip) as ip_num"
        ' | getCIDRPrefix(ip, "24") as net24'
        ' | compareCIDRPrefix(ip, "10.10.1.1", "24") as same_net_as_gw',
        SumoSchema(raw_col="ip"),
    )
    return out.select(
        "id", "mask24",
        (F.floor(F.col("ip_num") / 256) * 256).alias("net24_num_helper"),
        "net24", "same_net_as_gw",
    )


def _synthesized_sig_sql() -> str:
    """DuckDB twin of ``plans/sumoql.py::logreduce_signature`` over the
    message both verb queries synthesize — the identical mask chain,
    applied in the identical order (shared by the logreduce and
    logcompare oracles so the twins cannot drift apart)."""
    from ..plans.sumoql import LOGREDUCE_MASKS

    sig = ("'type=' || coalesce(event_type, 'null') || ' took ' ||"
           " json_extract_string(props, '$.k') || ' ms on host 10.0.' ||"
           " json_extract_string(props, '$.k') || '.25'")
    for pat in LOGREDUCE_MASKS:
        sig = f"regexp_replace({sig}, '{pat}', '*', 'g')"
    return sig


def _logreduce_oracle() -> str:
    sig = _synthesized_sig_sql()
    return f"""
    WITH m AS (SELECT {sig} AS _signature FROM events)
    SELECT _signature, CAST(count(*) AS BIGINT) AS _count
    FROM m GROUP BY _signature
    ORDER BY _count DESC, _signature
    LIMIT 10
    """


@query("sumoql_logreduce", oracle=_logreduce_oracle())
def sumoql_logreduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``logreduce`` — Sumo's log-clustering operator: messages collapse
    into signatures by masking variable parts (UUIDs, hex ids, IPv4s,
    numbers), ranked by frequency.  The pipeline synthesizes a
    realistic message (category + latency + host address) so THREE of
    the four mask classes fire, then clusters it; the oracle replays
    the same mask chain (``_logreduce_oracle``), so signature
    construction — not just counting — carries the hard signal.

    Plan: masking is narrow, the signature groupBy is map-side combined
    (duplicate templates collapse per-partition — the operator's whole
    premise), and the rank is TakeOrdered, never a global sort
    (``plans/sumoql.py::_stage_logreduce``)."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        '* | json "k"'
        " | concat('type=', coalesce(event_type, 'null'), ' took ', k,"
        " ' ms on host 10.0.', k, '.25') as msg"
        " | logreduce field=msg limit=10",
        EVENTS_SCHEMA,
    )


def _logcompare_oracle() -> str:
    """DuckDB twin of ``plans/sumoql.py::_stage_logcompare`` over the
    same synthesized message as ``sumoql_logreduce``."""
    sig = _synthesized_sig_sql()
    return f"""
    WITH m AS (SELECT {sig} AS _signature, ts FROM events),
    cut AS (SELECT max(ts) - INTERVAL 7 DAY AS _cut FROM events),
    g AS (
        SELECT _signature,
               CAST(sum(CASE WHEN ts < _cut THEN 1 ELSE 0 END) AS BIGINT)
                   AS _baseline_count,
               CAST(sum(CASE WHEN ts >= _cut THEN 1 ELSE 0 END) AS BIGINT)
                   AS _target_count
        FROM m CROSS JOIN cut GROUP BY _signature
    ),
    tot AS (SELECT CAST(sum(_baseline_count) AS DOUBLE) AS bt,
                   CAST(sum(_target_count) AS DOUBLE) AS tt
            FROM g)
    SELECT _signature, _baseline_count, _target_count,
           (_baseline_count = 0 AND _target_count > 0) AS _is_new,
           round(log2(((_target_count + 1) / (tt + 2))
                      / ((_baseline_count + 1) / (bt + 2))), 4) AS _change
    FROM g CROSS JOIN tot
    ORDER BY _change DESC, _signature
    LIMIT 20
    """


@query("sumoql_logcompare", oracle=_logcompare_oracle())
def sumoql_logcompare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``logcompare last 7d`` — Sumo's signature-diff operator: cluster
    messages into logreduce signatures and score how each template's
    rate changed in the trailing week vs the prior baseline (surges,
    fades, brand-new templates).  The oracle replays mask chain, time
    split, smoothing and scoring end-to-end
    (``plans/sumoql.py::_stage_logcompare``)."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        '* | json "k"'
        " | concat('type=', coalesce(event_type, 'null'), ' took ', k,"
        " ' ms on host 10.0.', k, '.25') as msg"
        " | logcompare field=msg last 7d limit=20",
        EVENTS_SCHEMA,
    )


@query(
    "sumoql_logreduce_keys",
    oracle="""
    WITH shapes AS (
        SELECT CASE WHEN event_type = 'error' THEN '["code","k"]'
                    WHEN event_type = 'purchase' THEN '["amount","k"]'
                    ELSE '["k"]' END AS _signature
        FROM events
    )
    SELECT _signature, CAST(count(*) AS BIGINT) AS _count
    FROM shapes GROUP BY _signature
    ORDER BY _count DESC, _signature
    LIMIT 10
    """,
)
def sumoql_logreduce_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``logreduce keys`` — Sumo's JSON-schema clustering: messages
    group by the sorted set of JSON keys they carry (their SHAPE), the
    first question against unfamiliar structured logs.  The pipeline
    synthesizes schema variety (errors carry ``code``, purchases carry
    ``amount``; ``to_json`` drops the NULL branch), then clusters; the
    oracle derives the expected key sets INDEPENDENTLY from the event
    type, so the whole construct-parse-sort-join path is cross-checked
    rather than replayed.

    Plan: key extraction is narrow; one map-side-combined signature
    groupBy + TakeOrdered (``plans/sumoql.py::_stage_logreduce``)."""
    ev = table(spark, sf_dir, "events")
    return compile_query(
        ev,
        '* | json "k"'
        " | to_json(named_struct('k', k,"
        " 'code', CASE WHEN event_type = 'error' THEN k END,"
        " 'amount', CASE WHEN event_type = 'purchase' THEN value END))"
        " as msg"
        " | logreduce keys field=msg limit=10",
        EVENTS_SCHEMA,
    )


@query(
    "sumoql_benchmark",
    oracle="""
    WITH baseline(etype, pct) AS (VALUES
        ('click', 21.0), ('error', 20.0), ('purchase', 19.5),
        ('signup', 20.0), ('view', 19.5)
    )
    SELECT e.event_type, b.pct AS global_pct,
           CAST(count(*) AS BIGINT) AS _count,
           round(100.0 * count(*) /
                 (SELECT count(*) FROM events), 4) AS local_pct
    FROM events e LEFT JOIN baseline b ON b.etype = e.event_type
    GROUP BY 1, 2
    """,
)
def sumoql_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sumo's ``benchmark`` operator (the verb the reference's
    enterprise-account probe issues, ``sumoresource.py:56-62``):
    broadcast-join the stream against a curated global-baseline table
    keyed by mapped fields and carry the baseline value beside each
    row — here the fleet-global event-type share next to this org's
    local share.  The stream never shuffles for the benchmark join."""
    ev = table(spark, sf_dir, "events")
    baseline = spark.createDataFrame(
        [("click", 21.0), ("error", 20.0), ("purchase", 19.5),
         ("signup", 20.0), ("view", 19.5)],
        "etype string, pct double")
    out = compile_query(
        ev,
        "* | benchmark pct as global_pct from fleet on etype=event_type"
        " | count by event_type, global_pct",
        SumoSchema(raw_col="event_type", ts_col="ts"),
        lookups={"fleet": baseline},
    )
    total = ev.agg(F.count(F.lit(1)).alias("__tot"))
    return (
        out.crossJoin(F.broadcast(total))
        .withColumn("local_pct",
                    F.round(100.0 * F.col("_count") / F.col("__tot"), 4))
        .drop("__tot")
    )


@query(
    "sumoql_lookup_contains",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count_if(big.c_custkey IS NOT NULL) AS BIGINT)
               AS n_big_spender,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    LEFT JOIN (SELECT DISTINCT c_custkey FROM customer
               WHERE c_acctbal > 5000) big
           ON big.c_custkey = c.c_custkey
    GROUP BY o.o_orderpriority
    """,
)
def sumoql_lookup_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``lookupContains`` — Sumo's lookup-existence probe (the boolean
    twin of ``lookup``): flags rows whose key appears in a lookup table
    without projecting its columns, then aggregates on the flag.  The
    probe side is the DISTINCT key column only, broadcast."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return compile_query(
        joined,
        "* | lookupContains is_big from big_spenders on c_custkey"
        " | if(is_big, 1, 0) as big"
        " | sum(big), count by o_orderpriority",
        SumoSchema(raw_col="o_orderpriority"),
        lookups={"big_spenders": big},
    ).withColumnRenamed("_sum_big", "n_big_spender") \
        .withColumnRenamed("_count", "n_orders")
