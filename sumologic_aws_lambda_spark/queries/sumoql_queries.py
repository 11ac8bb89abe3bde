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
        '_sourceCategory=src1 the | parse "the * order" as w | count by w',
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
