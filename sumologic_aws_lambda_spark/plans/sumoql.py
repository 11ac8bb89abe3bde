"""Sumo-style search-language compiler: query string → DataFrame plan.

The reference *calls* this language through the Search Job API
(``sumologic-app-utils/src/sumologic.py:96-116``; scope example
``_sourceCategory=X`` in ``cloudwatchevents/test/test-guardduty-benchmark
.py:167``; parse-expression example ``| json "eventSource", "awsRegion" as
eventSource, region`` in ``sumologic-app-utils/Test/SampleTemplate.yaml:
361-363`` — the FER surface, ``sumoresource.py:1147-1177``).

Grammar (kept deliberately tiny — each construct is specced against the
cited examples):

    query     := scope ('|' stage)*
    scope     := (field '=' value | word)*          -- metadata equality +
                 ['[subquery:' query '|' 'compose' --   full-text terms
                  field (',' field)*               -- Sumo subquery: inner
                  ['maxresults=' N] ']']           -- result set filters the
                                                   -- outer (semi-join)
    stage     := 'json' '"'path'"' (',' '"'path'"')* ['as' name (',' name)*]
               | 'parse' '"' prefix '*' suffix '"' 'as' name   -- anchor parse
                 ['multi'] ['nodrop']               -- multi: 1 row per match
               | 'parse' 'regex' '"' re-with-named-groups '"'
                 ['multi'] ['nodrop']
               | ('kv'|'keyvalue') '"'key'"' (',' '"'key'"')*  -- k=v extract
               | 'csv' name (',' name)*              -- positional split
               | 'where' sql-expr
               | 'fields' ['-'] name (',' name)*     -- keep or drop form
               | 'timeslice' Nunit                  -- 5m / 1h / 1d
               | agg (',' agg)* ['by' name (',' name)*]
               | 'top' N name                       -- most-frequent values
               | 'count_frequent' name (',' name)*  -- Sumo count_frequent
                                                    -- (_approxcount, cap 100)
               | 'dedup' [N] ['by' name (',' name)*]
               | 'lookup' out (',' out)* 'from' table 'on' key  -- dim join
               | 'benchmark' col ['as' alias] 'from' table
                 'on' bkey=field (',' ...)*         -- global baseline join
               | 'join' '(' stages ')' 'as' name (',' ...)* 'on' eq (',' eq)*
               | 'sort' 'by' name ['asc'|'desc']
               | 'limit' N
               | ts-stage                           -- see sumoql_ts.py:
                                                    -- accum total backshift
                                                    -- diff smooth rollingstd
                                                    -- fillmissing outlier
                                                    -- transpose predict
               | sql-expr 'as' name                 -- eval projection
    agg       := 'count' | ('sum'|'avg'|'min'|'max'|'count_distinct'|'first'
                 |'last'|'stddev'|'variance'|'median') '(' name ')'
               | 'percentile' '(' name ',' P ')'

Everything compiles to built-in Column expressions (SURVEY §4: no Catalyst
extension needed) — ``json`` → ``get_json_object``, anchor parse / ``parse
regex`` → ``regexp_extract``, ``timeslice`` → ``window()``, aggregations →
``groupBy().agg()``.  Catalyst then pushes scope predicates into the scan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..colnames import fresh_name


@dataclass(frozen=True)
class SumoSchema:
    """Binds Sumo's built-in field names to DataFrame columns."""

    raw_col: str = "_raw"                 # the message body
    ts_col: str = "_messagetime"          # event timestamp
    receipt_col: str | None = None        # ingest timestamp (_receiptTime)
    meta_cols: dict[str, str] = field(default_factory=dict)
    # e.g. {"_sourceCategory": "source_category", "_sourceHost": "..."}


_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400}

_AGG_RE = re.compile(
    r"^(count_distinct|count|sum|avg|min|max|first|last"
    r"|stddev|variance|median|values|hll)"
    r"\s*(?:\(\s*([\w.]*)\s*\))?$"
)
_PCTL_RE = re.compile(r"^percentile\s*\(\s*([\w.]+)\s*,\s*([\d.]+)\s*\)$")


class SumoQLError(ValueError):
    pass


def _split_stages(query: str) -> list[str]:
    """Split on top-level '|' (quotes and parens respected — a '|'
    inside a ``join (sub | query)`` block belongs to the sub-query, and
    one inside a quoted literal — ``split f delim='|'`` — belongs to the
    literal).  Single quotes are tracked only outside double quotes, so
    an apostrophe inside a double-quoted string stays plain text."""
    parts, buf, in_q, in_sq, depth = [], [], False, False, 0
    for ch in query:
        if ch == '"' and not in_sq:
            in_q = not in_q
        elif ch == "'" and not in_q:
            in_sq = not in_sq
        elif not in_q and not in_sq and ch in "([":
            depth += 1
        elif not in_q and not in_sq and ch in ")]":
            depth -= 1
        if ch == "|" and not in_q and not in_sq and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf).strip())
    return [p for p in parts if p]


def _quoted_list(text: str) -> list[str]:
    return re.findall(r'"([^"]*)"', text)


def compile_query(df: DataFrame, query: str,
                  schema: SumoSchema = SumoSchema(),
                  lookups: dict[str, DataFrame] | None = None) -> DataFrame:
    """Compile and apply a Sumo-style query against ``df``.

    ``lookups`` registers dimension DataFrames addressable from
    ``lookup … from <name> on …`` stages (Sumo's lookup-table operator;
    always broadcast — lookup tables are dimension-sized by contract).
    """
    stages = _split_stages(query)
    if not stages:
        raise SumoQLError("empty query")
    scope, subqueries = _extract_subqueries(stages[0])
    out = _apply_scope(df, scope or "*", schema)
    for sub in subqueries:
        out = _apply_subquery(out, df, sub, schema, lookups)
    for stage in stages[1:]:
        out = _apply_stage(out, stage, schema, lookups)
    return out


def scope_predicate(scope: str, schema: SumoSchema) -> Column:
    """Scope as a single boolean Column: metadata equalities + bare
    full-text terms ANDed together (``_sourceCategory=X`` semantics from
    the benchmark test :167).  Reused by the FER registry, which needs
    the predicate without the filter (``sumoresource.py:1168-1176``)."""
    pred = F.lit(True)
    if scope == "*":
        return pred
    for term in scope.split():
        m = re.match(r"^([\w]+)=(\S+)$", term)
        if m:
            name, value = m.groups()
            col = schema.meta_cols.get(name, name)
            # Sumo scope matching supports trailing wildcards.
            if value.endswith("*"):
                pred = pred & F.col(col).startswith(value[:-1])
            else:
                pred = pred & (F.col(col) == value)
        else:
            pred = pred & F.col(schema.raw_col).contains(term)
    return pred


def _apply_scope(df: DataFrame, scope: str, schema: SumoSchema) -> DataFrame:
    if scope == "*":
        return df
    return df.filter(scope_predicate(scope, schema))


def compile_prefixed_query(text: str, prefix: str, reader,
                           schema: SumoSchema,
                           lookups: dict[str, DataFrame] | None = None,
                           ) -> DataFrame:
    """Shared ``<prefix>=<name> [extra scope] [| stages…]`` compiler for
    store-backed sources (``_view=`` scheduled views, ``_index=``
    partitions): one parse, one stage loop, so the two prefixes cannot
    drift.  ``reader(name)`` supplies the pruned base frame; ``lookups``
    (optional, same contract as :func:`compile_query`) lets the piped
    stages use ``lookup`` / ``save`` / ``geoip``."""
    m = re.match(rf"^\s*{prefix}\s*=\s*(\w+)\s*([^|]*)(?:\|(.*))?$",
                 text, re.DOTALL)
    if not m:
        raise SumoQLError(
            f"query must start with {prefix}=<name>: {text!r}")
    out = reader(m.group(1))
    extra = m.group(2).strip()
    if extra:
        out = out.filter(scope_predicate(extra, schema))
    if m.group(3):
        for stage in _split_stages(m.group(3)):
            out = _apply_stage(out, stage, schema, lookups)
    return out


def _extract_subqueries(scope: str) -> tuple[str, list[str]]:
    """Split ``[subquery:…]`` blocks out of a scope stage.  Returns the
    scope text with the blocks removed plus each block's inner query."""
    rest, subs, pos = [], [], 0
    while pos < len(scope):
        m = re.compile(r"\[\s*subquery\s*:", re.IGNORECASE).search(scope, pos)
        if not m:
            rest.append(scope[pos:])
            break
        rest.append(scope[pos:m.start()])
        depth, in_q, i = 0, False, m.start()
        end = -1
        while i < len(scope):
            ch = scope[i]
            if ch == '"':
                in_q = not in_q
            elif not in_q and ch == "[":
                depth += 1
            elif not in_q and ch == "]":
                depth -= 1
                if depth == 0:
                    end = i
                    break
            i += 1
        if end < 0:
            raise SumoQLError(f"unbalanced [subquery: …] in scope: {scope!r}")
        subs.append(scope[m.end():end].strip())
        pos = end + 1
    return " ".join("".join(rest).split()), subs


_COMPOSE_RE = re.compile(
    r"^([\w,\s]+?)(?:\s+maxresults\s*=\s*(\d+))?$", re.IGNORECASE
)

# Sumo caps subquery result sets at 10k composed rows (public subquery
# docs); the cap is what keeps the semi-join side broadcast-safe.
_SUBQUERY_MAX_RESULTS = 10_000


def _apply_subquery(out: DataFrame, base: DataFrame, text: str,
                    schema: SumoSchema,
                    lookups: dict[str, DataFrame] | None) -> DataFrame:
    """Sumo subquery: run the inner query over the same stream, then keep
    outer rows whose ``compose`` fields match any inner result row (AND
    across fields, OR across rows) — a left-semi join.

    Physical shape: the composed key set is distinct-reduced and capped at
    ``maxresults`` (default 10k, Sumo's documented subquery limit), so the
    build side is always tiny → explicit ``broadcast()``; the outer fact
    stream never shuffles.  Only the field-equality form of ``compose`` is
    supported — Sumo's ``keywords`` form turns values into full-text terms,
    which is a nested-loop contains-join; at 100 TB express that as a
    field match on a parsed column instead.
    """
    inner_stages = _split_stages(text)
    if len(inner_stages) < 2 or not re.match(
        r"^compose\b", inner_stages[-1], re.IGNORECASE
    ):
        raise SumoQLError(
            f"subquery must end with '| compose <fields>': {text!r}"
        )
    compose = inner_stages[-1].split(None, 1)[1] if " " in inner_stages[-1] \
        else ""
    if re.search(r"\bkeywords\b", compose, re.IGNORECASE):
        raise SumoQLError(
            "subquery 'compose … keywords' (full-text form) is not "
            "supported — compose on a parsed field instead"
        )
    cm = _COMPOSE_RE.match(compose.strip())
    if not cm or not cm.group(1).strip():
        raise SumoQLError(f"bad compose clause: {compose!r}")
    fields = [f.strip() for f in cm.group(1).split(",") if f.strip()]
    cap = int(cm.group(2)) if cm.group(2) else _SUBQUERY_MAX_RESULTS

    # Nested subqueries recurse: the inner scope may itself carry
    # [subquery:…] blocks (Sumo allows one level of nesting; here any
    # depth compiles — each level is its own broadcast semi-join).
    inner_scope, nested = _extract_subqueries(inner_stages[0])
    inner = _apply_scope(base, inner_scope or "*", schema)
    for sub in nested:
        inner = _apply_subquery(inner, base, sub, schema, lookups)
    for stage in inner_stages[1:-1]:
        inner = _apply_stage(inner, stage, schema, lookups)

    def resolve(frame: DataFrame, f: str) -> str:
        if f in frame.columns:
            return f
        mapped = schema.meta_cols.get(f)
        if mapped and mapped in frame.columns:
            return mapped
        raise SumoQLError(f"compose field {f!r} not present")

    keys = inner.select(
        *[F.col(resolve(inner, f)).alias(f"__sq_{f}") for f in fields]
    ).distinct()
    # Sumo FAILS a subquery whose result exceeds the cap rather than
    # silently truncating (a limit() here would keep an arbitrary,
    # partition-order-dependent subset).  The guard costs one extra
    # bounded action: counting at most cap+1 distinct rows.
    if keys.limit(cap + 1).count() > cap:
        raise SumoQLError(
            f"subquery produced more than {cap} composed rows — tighten "
            "the inner query or raise maxresults"
        )
    cond = None
    for f in fields:
        e = F.col(resolve(out, f)) == F.col(f"__sq_{f}")
        cond = e if cond is None else (cond & e)
    return out.join(F.broadcast(keys), cond, "left_semi")


def _apply_stage(df: DataFrame, stage: str, schema: SumoSchema,
                 lookups: dict[str, DataFrame] | None = None,
                 parse_keep_default: bool = False) -> DataFrame:
    head = stage.split(None, 1)[0].lower()
    rest = stage[len(head):].strip()

    if head == "lookup":
        # `is None`, not truthiness: an empty PersistentLookups store is
        # falsy but still resolves tables from disk.
        return _stage_lookup(df, rest, {} if lookups is None else lookups)
    if head == "lookupcontains":
        return _stage_lookup_contains(
            df, rest, {} if lookups is None else lookups)
    if head == "benchmark":
        return _stage_benchmark(
            df, rest, {} if lookups is None else lookups)
    if head == "join":
        return _stage_join(df, rest, schema, lookups)
    if head == "save":
        # Sumo's `save <table> [append]`: register the frame under a
        # name so a later query can `lookup … from <table>`.  With a
        # plain dict registry the save is session-scoped; with a
        # `PersistentLookups` store (`plans/lookups.py`) it writes
        # through to parquet, and `append` merges rows into an existing
        # table (Sumo's save-with-merge).
        m = re.fullmatch(r"(\w+)(\s+append)?", rest.strip(), re.IGNORECASE)
        if not m:
            raise SumoQLError(f"bad save target: {rest!r}")
        name, append = m.group(1), bool(m.group(2))
        if lookups is None:
            raise SumoQLError(
                "save needs a lookups registry (pass lookups={} to "
                "compile_query)"
            )
        saver = getattr(lookups, "save", None)
        if callable(saver):
            saver(name, df, append=append)
        elif append:
            raise SumoQLError(
                "save … append needs a persistent lookup store "
                "(plans.lookups.PersistentLookups), not a plain dict"
            )
        else:
            lookups[name] = df
        return df

    # post-aggregation time-series stages (accum/total/backshift/diff/
    # smooth/rollingstd/fillmissing/outlier/transpose/predict)
    from .sumoql_ts import STAGES as _TS_STAGES
    if head in _TS_STAGES:
        return _TS_STAGES[head](df, rest, schema)

    if head == "json":
        return _stage_json(df, rest, schema)
    if head == "parse":
        return _stage_parse(df, rest, schema,
                            keep_default=parse_keep_default)
    if head in ("kv", "keyvalue"):
        return _stage_keyvalue(df, rest, schema)
    if head == "csv":
        return _stage_csv(df, rest, schema)
    if head == "split":
        return _stage_split(df, rest, schema)
    if head == "where":
        return df.filter(F.expr(_rewrite_expr(rest)))
    if head == "fields":
        names = [c.strip() for c in rest.lstrip("-").split(",")]
        if not rest.strip() or not all(
            re.fullmatch(r"[\w.]+", c) for c in names
        ):
            raise SumoQLError(f"bad fields stage: {rest!r}")
        if rest.startswith("-"):
            return df.drop(*names)
        return df.select(*names)
    if head == "timeslice":
        return _stage_timeslice(df, rest, schema)
    if head == "top":
        return _stage_top(df, rest, schema)
    if head == "count_frequent":
        return _stage_count_frequent(df, rest, schema=schema)
    if head == "transaction":
        return _stage_transaction(df, rest, schema)
    if head == "geoip":
        return _stage_geoip(df, rest, {} if lookups is None else lookups)
    if head == "dedup":
        return _stage_dedup(df, rest, schema)
    if head == "logexplain":
        return _stage_logexplain(df, rest, schema)
    if head == "logreduce":
        return _stage_logreduce(df, rest, schema)
    if head == "logcompare":
        return _stage_logcompare(df, rest, schema)
    if head == "trace":
        return _stage_trace(df, rest, schema)
    if head == "sort":
        return _stage_sort(df, rest)
    if head == "limit":
        if not re.fullmatch(r"\d+", rest.strip()):
            raise SumoQLError(f"bad limit stage: {rest!r}")
        return df.limit(int(rest))
    # "count," / "sum(x)," — first token of a multi-agg list keeps its comma
    if _AGG_RE.match(head.rstrip(",")) or head.startswith("percentile"):
        return _stage_agg(df, stage, schema)
    # eval projection: ``<sql-expr> as <name>`` (Sumo's field expressions)
    m = re.match(r"^(.+?)\s+as\s+(\w+)$", stage, re.IGNORECASE | re.DOTALL)
    if m:
        try:
            return df.withColumn(
                m.group(2), F.expr(_rewrite_expr(m.group(1)))
            )
        except SumoQLError as exc:
            # a rewrite already diagnosed the problem (e.g. CIDR prefix
            # out of range) — keep its message, just add the stage.
            raise SumoQLError(f"{exc} (in stage {stage!r})") from exc
        except Exception as exc:
            raise SumoQLError(f"bad expression stage: {stage!r}") from exc
    raise SumoQLError(f"unknown stage: {stage!r}")


# --- Sumo scalar-function surface → Spark SQL rewrites -------------------
#
# Sumo's eval/where expressions use a handful of function names that are
# not Spark SQL's (public Sumo search-language operators).  Each rewrite
# emits a built-in expression, so everything stays in codegen.  Patterns
# only fire on simple argument forms (identifier / literal / balanced-
# paren-free), which covers the observed query surface; anything else
# passes through to Spark SQL untouched.

_SIMPLE_ARG = r"[^(),]+?"

_EXPR_REWRITES: list[tuple[re.Pattern, object]] = [
    # x matches "glob*" → glob-to-regex rlike (Sumo matches uses * wildcards)
    # handled separately in _rewrite_matches (needs glob translation)
    (re.compile(rf"\bnum\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"CAST(\1 AS DOUBLE)"),
    (re.compile(rf"\btoLong\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"CAST(\1 AS BIGINT)"),
    (re.compile(rf"\btoDouble\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"CAST(\1 AS DOUBLE)"),
    (re.compile(rf"\btoString\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"CAST(\1 AS STRING)"),
    (re.compile(r"\bformat\(", re.IGNORECASE), "format_string("),
    (re.compile(rf"\bisBlank\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"(\1 IS NULL OR trim(\1) = '')"),
    (re.compile(rf"\bisEmpty\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"(\1 IS NULL OR \1 = '')"),
    (re.compile(rf"\bisNull\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"(\1 IS NULL)"),
    (re.compile(rf"\btoLowerCase\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"lower(\1)"),
    (re.compile(rf"\btoUpperCase\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"upper(\1)"),
    (re.compile(rf"\burldecode\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"url_decode(\1)"),
    (re.compile(rf"\bbase64Decode\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"decode(unbase64(\1), 'UTF-8')"),
    (re.compile(rf"\bbase64Encode\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"base64(encode(\1, 'UTF-8'))"),
    (re.compile(rf"\bformatDate\(({_SIMPLE_ARG}),\s*(\"[^\"]*\"|'[^']*')\)",
                re.IGNORECASE),
     r"date_format(\1, \2)"),
    (re.compile(rf"\btoDate\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"CAST(\1 AS DATE)"),
    (re.compile(r"\bnow\(\)", re.IGNORECASE), "current_timestamp()"),
    (re.compile(rf"\bdecToHex\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"conv(\1, 10, 16)"),
    (re.compile(rf"\bhexToDec\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"CAST(conv(\1, 16, 10) AS BIGINT)"),
    # isNumeric: try_cast beats a hand-rolled numeric regex — it accepts
    # exactly what a later num()/toDouble() would, so the pair composes.
    (re.compile(rf"\bisNumeric\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"(try_cast(\1 AS DOUBLE) IS NOT NULL)"),
    # luhn(cc) → credit-card checksum validity (Sumo search-language
    # `luhn`); Spark 3.5+ ships the checksum natively.
    (re.compile(rf"\bluhn\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"luhn_check(\1)"),
    # haversine(lat1, lon1, lat2, lon2) → great-circle km (Sumo returns
    # kilometers, inputs in decimal degrees).
    (re.compile(
        rf"\bhaversine\(({_SIMPLE_ARG}),({_SIMPLE_ARG}),"
        rf"({_SIMPLE_ARG}),({_SIMPLE_ARG})\)", re.IGNORECASE),
     # Each capture parenthesized: _SIMPLE_ARG admits arithmetic like
     # `lat - 0.5`, which unparenthesized would rebind inside the
     # subtractions ((\3 - \1) with \1 = "lat - 0.5" reads as
     # lat2 - lat - 0.5) and silently skew distances.
     r"(2 * 6371.0 * asin(sqrt("
     r"pow(sin(radians(((\3) - (\1)) / 2)), 2) + "
     r"cos(radians((\1))) * cos(radians((\3))) * "
     r"pow(sin(radians(((\4) - (\2)) / 2)), 2))))"),
    # Callable replacements below: the regex bodies contain backslashes
    # that re.sub's escape processing would mangle in a string repl.
    (re.compile(rf"\bisValidIP\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     lambda m: "(" + m.group(1).strip()
     + " rlike '^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\\\.){3}"
       "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$')"),
    # RFC1918 ranges: 10/8, 192.168/16, 172.16/12.
    (re.compile(rf"\bisPrivateIP\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     lambda m: "(" + m.group(1).strip()
     + " rlike '^(10\\\\.|192\\\\.168\\\\.|172\\\\.(1[6-9]|2[0-9]|3[01])"
       "\\\\.)')"),
    # urlencode(s) → percent-encoding (inverse of urldecode above).
    (re.compile(rf"\burlencode\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     r"url_encode(\1)"),
    # ipv4ToNumber(ip) → 32-bit integer form (Sumo's CIDR-math helper):
    # a narrow octet fold, no UDF.
    (re.compile(rf"\bipv4ToNumber\(({_SIMPLE_ARG})\)", re.IGNORECASE),
     lambda m: _ipv4_num_sql(m.group(1).strip())),
    # parseDate(s, "fmt") → epoch millis; Sumo's format strings are Java
    # SimpleDateFormat patterns, which is exactly Spark's to_timestamp.
    (re.compile(rf"\bparseDate\(({_SIMPLE_ARG}),\s*(\"[^\"]*\"|'[^']*')\)",
                re.IGNORECASE),
     r"unix_millis(to_timestamp(\1, \2))"),
    # CIDR family (functions/ip.py holds the Column twins).  The prefix
    # length is a quoted literal in Sumo ("24"), so the mask constant
    # folds at REWRITE time — the emitted SQL is plain integer masking
    # over the ipv4 octet fold, no UDF.
    (re.compile(r"\bmaskFromCIDR\(\s*[\"']?(\d{1,2})[\"']?\s*\)",
                re.IGNORECASE),
     lambda m: _mask_from_cidr_sql(int(m.group(1)))),
    (re.compile(rf"\bgetCIDRPrefix\(({_SIMPLE_ARG}),"
                rf"\s*[\"']?(\d{{1,2}})[\"']?\s*\)", re.IGNORECASE),
     lambda m: _cidr_prefix_sql(m.group(1).strip(), int(m.group(2)))),
    (re.compile(rf"\bcompareCIDRPrefix\(({_SIMPLE_ARG}),({_SIMPLE_ARG}),"
                rf"\s*[\"']?(\d{{1,2}})[\"']?\s*\)", re.IGNORECASE),
     lambda m: "({a} = {b})".format(
         a=_cidr_net_sql(m.group(1).strip(), int(m.group(3))),
         b=_cidr_net_sql(m.group(2).strip(), int(m.group(3))))),
]


def _ipv4_num_sql(ip: str) -> str:
    return (f"aggregate(split({ip}, '\\\\.'), CAST(0 AS BIGINT), "
            "(acc, x) -> acc * 256 + CAST(x AS BIGINT))")


def _cidr_mask(prefix_len: int) -> int:
    if not 0 <= prefix_len <= 32:
        raise SumoQLError(f"CIDR prefix length out of range: {prefix_len}")
    return ((1 << 32) - 1) ^ ((1 << (32 - prefix_len)) - 1)


def _mask_from_cidr_sql(prefix_len: int) -> str:
    mask = _cidr_mask(prefix_len)
    return ("'" + ".".join(str((mask >> s) & 255)
                           for s in (24, 16, 8, 0)) + "'")


def _cidr_net_sql(ip: str, prefix_len: int) -> str:
    """Masked network number of ``ip`` under ``prefix_len`` bits."""
    return f"(CAST({_cidr_mask(prefix_len)} AS BIGINT) & {_ipv4_num_sql(ip)})"


def _cidr_prefix_sql(ip: str, prefix_len: int) -> str:
    """``a.b.c.d/len`` network-address string of ``ip``."""
    net = _cidr_net_sql(ip, prefix_len)
    octets = " , ".join(
        f"CAST((({net}) DIV {1 << s}) % 256 AS STRING)"
        for s in (24, 16, 8, 0)
    )
    return f"(concat_ws('.', {octets}) || '/{prefix_len}')"

_MATCHES_RE = re.compile(
    r"(\S+)\s+matches\s+\"([^\"]*)\"", re.IGNORECASE
)


def _glob_to_regex(glob: str) -> str:
    out = []
    for ch in glob:
        if ch == "*":
            out.append(".*")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def _rewrite_matches(expr: str) -> str:
    def repl(m: re.Match) -> str:
        # Escape backslashes for the SQL string-literal parser AND single
        # quotes: a ' inside the glob (x matches "it's*") would otherwise
        # terminate the literal — a parse error at best, expression
        # injection through F.expr at worst.
        regex = (_glob_to_regex(m.group(2))
                 .replace("\\", "\\\\")
                 .replace("'", "\\'"))
        return f"({m.group(1)} rlike '{regex}')"

    return _MATCHES_RE.sub(repl, expr)


def _rewrite_expr(expr: str) -> str:
    expr = _rewrite_matches(expr)
    for pat, repl in _EXPR_REWRITES:
        expr = pat.sub(repl, expr)
    return expr


def _scan_balanced(text: str, start: int) -> int:
    """Index just past the ')' matching the '(' at ``start`` (quotes
    respected)."""
    depth, in_q = 0, False
    for i in range(start, len(text)):
        ch = text[i]
        if ch == '"':
            in_q = not in_q
        elif not in_q and ch == "(":
            depth += 1
        elif not in_q and ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise SumoQLError(f"unbalanced parens in: {text!r}")


_JOIN_COND_RE = re.compile(
    r"^(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)$"
)


def _stage_join(df: DataFrame, rest: str, schema: SumoSchema,
                lookups: dict[str, DataFrame] | None) -> DataFrame:
    """Sumo's sub-search join:

        join (stages…) as t1, (stages…) as t2 [, …] on t1.a = t2.b [, …]

    Each parenthesized pipeline runs over the SAME input stream (the
    frame flowing into this stage), then the results are inner-joined on
    the ``on`` equalities.  Output columns are flattened to
    ``<alias>_<column>``.

    Physical shape: the sub-searches are aggregations of the input, so
    the join operands are post-agg (small) frames — Catalyst/AQE picks
    broadcast when one side is under threshold; the input scan is shared
    (same source relation), not re-read per sub on a cached/warm plan.
    """
    text = rest.strip()
    subs: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text) and text[pos] == "(":
        end = _scan_balanced(text, pos)
        sub_text = text[pos + 1:end - 1].strip()
        m = re.match(r"^\s*as\s+(\w+)\s*(,\s*)?", text[end:], re.IGNORECASE)
        if not m:
            raise SumoQLError(f"join sub-search needs 'as <alias>': {rest!r}")
        subs.append((sub_text, m.group(1)))
        pos = end + m.end()
        if not m.group(2):
            break
    om = re.match(r"^\s*on\s+(.+)$", text[pos:], re.IGNORECASE | re.DOTALL)
    if len(subs) < 2 or not om:
        raise SumoQLError(
            f"join needs >= 2 '(sub) as alias' parts and an 'on' clause: "
            f"{rest!r}"
        )
    conds = []
    for c in om.group(1).split(","):
        cm = _JOIN_COND_RE.match(c.strip())
        if not cm:
            raise SumoQLError(f"bad join condition: {c.strip()!r}")
        conds.append(cm.groups())

    compiled: dict[str, DataFrame] = {}
    for sub_text, alias in subs:
        sub = df
        for stage in _split_stages(sub_text):
            sub = _apply_stage(sub, stage, schema, lookups)
        compiled[alias] = sub.alias(alias)

    aliases = [a for _, a in subs]
    joined = compiled[aliases[0]]
    in_plan = {aliases[0]}
    for alias in aliases[1:]:
        own = [c for c in conds
               if (c[0] == alias and c[2] in in_plan)
               or (c[2] == alias and c[0] in in_plan)]
        if not own:
            raise SumoQLError(
                f"join alias {alias!r} has no 'on' condition linking it"
            )
        cond = None
        for la, lc, ra, rc in own:
            e = F.col(f"{la}.{lc}") == F.col(f"{ra}.{rc}")
            cond = e if cond is None else (cond & e)
        joined = joined.join(compiled[alias], cond, "inner")
        in_plan.add(alias)

    flat = [
        F.col(f"{alias}.{c}").alias(f"{alias}_{c}")
        for _, alias in subs
        for c in compiled[alias].columns
    ]
    return joined.select(*flat)


def _stage_lookup(df: DataFrame, rest: str,
                  lookups: dict[str, DataFrame]) -> DataFrame:
    """``lookup out1, out2 from dim on key`` / ``on left=right`` —
    always a broadcast left join (lookup tables are dimension-sized)."""
    m = re.match(r"^([\w,\s]+?)\s+from\s+(\w+)\s+on\s+([\w]+)(?:=([\w]+))?$",
                 rest.strip(), re.IGNORECASE)
    if not m:
        raise SumoQLError(f"bad lookup stage: {rest!r}")
    outs = [c.strip() for c in m.group(1).split(",")]
    name, left_key = m.group(2), m.group(3)
    right_key = m.group(4) or left_key
    if name not in lookups:
        raise SumoQLError(
            f"unknown lookup table {name!r}; registered: {sorted(lookups)}"
        )
    dim = lookups[name].select(
        F.col(right_key).alias(left_key), *outs
    )
    return df.join(F.broadcast(dim), on=left_key, how="left")


def _stage_lookup_contains(df: DataFrame, rest: str,
                           lookups: dict[str, DataFrame]) -> DataFrame:
    """``lookupContains <flag> from <table> on key[=right]`` — Sumo's
    existence probe: sets ``flag`` true when the key appears in the
    lookup table, without projecting any of its columns.  Compiled as a
    broadcast left join against the DISTINCT key column of the dim
    (never the full width), then ``flag = key matched`` — the stream
    side never shuffles, and the build side is one deduplicated column
    regardless of how wide the lookup table is."""
    m = re.match(r"^(\w+)\s+from\s+(\w+)\s+on\s+([\w]+)(?:=([\w]+))?$",
                 rest.strip(), re.IGNORECASE)
    if not m:
        raise SumoQLError(f"bad lookupContains stage: {rest!r}")
    flag, name, left_key = m.group(1), m.group(2), m.group(3)
    right_key = m.group(4) or left_key
    # membership + [] (not .get): a PersistentLookups store resolves
    # disk-resident tables through __missing__, which .get bypasses
    if name not in lookups:
        raise SumoQLError(
            f"unknown lookup table {name!r}; registered: {sorted(lookups)}"
        )
    dim = lookups[name]
    probe = dim.select(
        F.col(right_key).alias(left_key)
    ).distinct().withColumn("__lc_hit", F.lit(True))
    return (
        df.join(F.broadcast(probe), on=left_key, how="left")
        .withColumn(flag, F.coalesce(F.col("__lc_hit"), F.lit(False)))
        .drop("__lc_hit")
    )


def _stage_benchmark(df: DataFrame, rest: str,
                     lookups: dict[str, DataFrame]) -> DataFrame:
    """``benchmark <col> [as <alias>] from <table> on bkey=field, …`` —
    Sumo's benchmark operator (the reference's enterprise-account probe
    runs ``benchmark percentage as global_percent from guardduty on
    threatpurpose=threatPurpose, …``, ``sumoresource.py:56-62``): join
    the stream against a curated global-baseline table and project the
    baseline's value column beside each row.  The on-clause maps
    BENCHMARK-table keys to local fields.  Always a broadcast left join
    — benchmark tables are dimension-sized by contract, so the stream
    never shuffles."""
    m = re.match(
        r"^(\w+)(?:\s+as\s+(\w+))?\s+from\s+(\w+)\s+on\s+(.+)$",
        rest.strip(), re.IGNORECASE)
    if not m:
        raise SumoQLError(f"bad benchmark stage: {rest!r}")
    value_col, alias, name = m.group(1), m.group(2) or m.group(1), m.group(3)
    # membership + [] so PersistentLookups.__missing__ can load from disk
    if name not in lookups:
        raise SumoQLError(
            f"unknown benchmark table {name!r}; registered: "
            f"{sorted(lookups)}")
    dim = lookups[name]
    keys = []
    sel = []
    for pair in m.group(4).split(","):
        pm = re.fullmatch(r"\s*(\w+)\s*=\s*(\w+)\s*", pair)
        if not pm:
            raise SumoQLError(f"bad benchmark on-clause: {pair!r}")
        bench_key, local = pm.group(1), pm.group(2)
        keys.append(local)
        sel.append(F.col(bench_key).alias(local))
    sel.append(F.col(value_col).alias(alias))
    return df.join(F.broadcast(dim.select(*sel)), on=keys, how="left")


def _stage_keyvalue(df: DataFrame, rest: str, schema: SumoSchema) -> DataFrame:
    """``kv "user", "status"`` — extract ``key=value`` pairs from the raw
    message (Sumo's keyvalue operator; the inverse of the P9 flatten)."""
    keys = _quoted_list(rest)
    if not keys:
        raise SumoQLError(f"kv stage needs quoted keys: {rest!r}")
    out = df
    for k in keys:
        # (?:^|[\s,;]) anchors the key start so "a" never matches the
        # tail of "aa=…" (found by the hypothesis round-trip property).
        pat = r"(?:^|[\s,;])" + re.escape(k) + r'=("[^"]*"|[^\s,;]+)'
        out = out.withColumn(
            k,
            F.nullif(
                F.regexp_replace(
                    F.regexp_extract(F.col(schema.raw_col), pat, 1),
                    '^"|"$', "",
                ),
                F.lit(""),
            ),
        )
    return out


def _stage_csv(df: DataFrame, rest: str, schema: SumoSchema) -> DataFrame:
    """``csv a, b, c`` — positional comma split of the raw message."""
    names = [n.strip() for n in rest.split(",") if n.strip()]
    if not names:
        raise SumoQLError(f"csv stage needs field names: {rest!r}")
    parts = F.split(F.col(schema.raw_col), ",")
    out = df
    for i, n in enumerate(names):
        # try_element_at: a row with fewer fields than declared names
        # null-fills the missing columns (Sumo semantics) instead of
        # failing the job under ANSI element_at.
        out = out.withColumn(
            n, F.trim(F.try_element_at(parts, F.lit(i + 1)))
        )
    return out


_SPLIT_RE = re.compile(
    r"^([\w.]+)\s+delim\s*=\s*'([^']+)'\s+extract\s+(.+)$",
    re.IGNORECASE,
)


def _stage_split(df: DataFrame, rest: str, schema: SumoSchema) -> DataFrame:
    """``split <field> delim='<d>' extract n1, n2, …`` — Sumo's
    delimited-field splitter: positional pieces of ``field`` become the
    named columns (null-filled when the row has fewer pieces, same
    try_element_at semantics as ``csv``).  Narrow projection."""
    m = _SPLIT_RE.match(rest.strip())
    if not m:
        raise SumoQLError(f"bad split stage: {rest!r}")
    src, delim, names_part = m.groups()
    names = [n.strip() for n in names_part.split(",") if n.strip()]
    if not names or not all(re.fullmatch(r"\w+", n) for n in names):
        raise SumoQLError(f"bad split field list: {names_part!r}")
    parts = F.split(F.col(src), re.escape(delim))
    out = df
    for i, n in enumerate(names):
        out = out.withColumn(
            n, F.trim(F.try_element_at(parts, F.lit(i + 1)))
        )
    return out


def _stage_geoip(df: DataFrame, rest: str,
                 lookups: dict[str, DataFrame]) -> DataFrame:
    """``geoip <ip_field>`` — enrich rows with the geo row whose
    [ip_start, ip_end] range contains the IPv4 (Sumo's geoip lookup,
    backed here by a registered ``geoip`` lookup table instead of the
    bundled MaxMind database).

    The geo table is dimension-sized, so the range predicate join is a
    **broadcast** nested-loop — the stream side stays un-shuffled, same
    shape as ``range_join_value_bands``.  Left join: rows with no
    matching range (private space, unparseable) keep NULL geo columns.
    """
    from ..functions.ip import ipv4_to_number

    m = re.match(r"^(\w+)$", rest.strip())
    if not m:
        raise SumoQLError(f"bad geoip stage: {rest!r}")
    ip_field = m.group(1)
    if "geoip" not in lookups:
        raise SumoQLError(
            "geoip needs a lookup table registered as 'geoip' with "
            "ip_start/ip_end bigint range columns"
        )
    dim = lookups["geoip"]
    payload = [c for c in dim.columns if c not in ("ip_start", "ip_end")]
    dim = dim.select(
        F.col("ip_start").alias("_geo_start"),
        F.col("ip_end").alias("_geo_end"),
        *payload,
    )
    ipnum = ipv4_to_number(F.col(ip_field))
    return (
        df.join(
            F.broadcast(dim),
            (ipnum >= F.col("_geo_start")) & (ipnum <= F.col("_geo_end")),
            "left",
        )
        .drop("_geo_start", "_geo_end")
    )


def _stage_transaction(df: DataFrame, rest: str,
                       schema: SumoSchema) -> DataFrame:
    """``transaction on <key> with states s1,s2,... in <field>`` — group
    events into per-key transactions: one output row per key with a
    count column per declared state, the transaction start
    (``_begin_epoch``, epoch seconds) and span (``_duration_ms``).

    The Sumo operator additionally supports phrase-pattern states
    ("Starting session *" as init); those desugar to a ``parse``/``if``
    stage before this one, so the compiler keeps transaction itself a
    pure grouped aggregation — ONE shuffle on the transaction key,
    map-side combined, no window.  Epochs derive from integer
    microseconds (exact in any engine), never floating division.
    """
    m = re.match(
        r"^on\s+(\w+)\s+with\s+states\s+([\w\s,]+?)\s+in\s+(\w+)$",
        rest.strip(), re.IGNORECASE,
    )
    if not m:
        raise SumoQLError(f"bad transaction args: {rest!r}")
    key, states_raw, state_field = m.groups()
    states = [s.strip() for s in states_raw.split(",") if s.strip()]
    if not states:
        raise SumoQLError("transaction needs at least one state")
    if schema.ts_col not in df.columns:
        raise SumoQLError(
            f"transaction needs the bound timestamp column "
            f"{schema.ts_col!r}"
        )
    ts = F.col(schema.ts_col)
    begin_us = F.unix_micros(F.min(ts))
    dur_us = F.unix_micros(F.max(ts)) - begin_us
    return (
        df.filter(F.col(state_field).isin(states))
        .groupBy(key)
        .agg(
            *[
                F.sum(
                    F.when(F.col(state_field) == s, 1).otherwise(0)
                ).alias(s)
                for s in states
            ],
            ((begin_us - F.pmod(begin_us, 1_000_000)) / 1_000_000)
            .cast("long").alias("_begin_epoch"),
            ((dur_us - F.pmod(dur_us, 1_000)) / 1_000)
            .cast("long").alias("_duration_ms"),
        )
    )


def _field_src(name: str, df: DataFrame, schema: SumoSchema) -> str:
    """Bound source column for a Sumo field name: built-in metadata
    fields (``_sourceCategory``, ``_index``, …) resolve through
    ``schema.meta_cols`` unless the frame literally has that column —
    the shared lookup every grouping stage uses (agg ``by`` keys, top,
    count_frequent), so ``top 10 _sourceCategory`` works wherever
    ``count by _sourceCategory`` does."""
    if name in schema.meta_cols and name not in df.columns:
        return schema.meta_cols[name]
    return name


def _group_expr(name: str, df: DataFrame, schema: SumoSchema) -> Column:
    """Group-key Column for a Sumo field: groups on the BOUND column
    but keeps the Sumo field name in the output."""
    src = _field_src(name, df, schema)
    return F.col(src).alias(name) if src != name else F.col(name)


def _stage_top(df: DataFrame, rest: str,
               schema: SumoSchema = SumoSchema()) -> DataFrame:
    """``top N field`` — most-frequent values, Sumo's dashboard staple.
    Lowers to groupBy + TakeOrderedAndProject (no global sort)."""
    m = re.match(r"^(\d+)\s+([\w]+)$", rest.strip())
    if not m:
        raise SumoQLError(f"bad top stage: {rest!r}")
    n, col = int(m.group(1)), m.group(2)
    return (
        df.groupBy(_group_expr(col, df, schema))
        .agg(F.count(F.lit(1)).alias("_count"))
        .orderBy(F.col("_count").desc(), F.col(col))
        .limit(n)
    )


def _stage_count_frequent(df: DataFrame, rest: str,
                          limit: int = 100,
                          schema: SumoSchema = SumoSchema()) -> DataFrame:
    """``count_frequent f1[, f2…]`` — Sumo's most-frequent-values operator
    (dashboard panels; capped at 100 result rows, output field
    ``_approxcount``).

    Exact groupBy-count + TakeOrderedAndProject here: the count shuffle is
    map-side combinable, and the top-100 never materializes a global sort.
    Sumo's implementation is approximate (hence the field name); the
    ``approx`` suffix (``count_frequent f approx``) switches to the
    DataSketches frequent-items aggregate ``approx_top_k`` — one
    partial-aggregatable sketch pass, bounded memory at ANY key
    cardinality, no groupBy shuffle of the key universe.  The exact form
    is shuffle-identical to ``top`` and correct at any scale where the
    grouped frame fits — the cap applies to output rows, not state."""
    approx = False
    m = re.search(r"\s+approx\s*$", rest, re.IGNORECASE)
    if m:
        approx, rest = True, rest[:m.start()]
    cols = [c.strip() for c in rest.split(",") if c.strip()]
    if not cols or not all(re.fullmatch(r"[\w.]+", c) for c in cols):
        raise SumoQLError(f"bad count_frequent stage: {rest!r}")
    if approx:
        # NULL-safe composite key: concat_ws SKIPS nulls (collapsing
        # (NULL,'x') with ('x',NULL)) and the sketch aggregate ignores a
        # NULL input entirely — encode every field through a sentinel and
        # decode it back so the approx path groups exactly like the exact
        # path's groupBy.  Key columns come back as strings (the sketch
        # key is one encoded string); counts are unaffected.
        sentinel = "\x00null\x00"
        enc = [F.coalesce(
                   F.col(_field_src(c, df, schema)).cast("string"),
                   F.lit(sentinel))
               for c in cols]
        key = enc[0] if len(enc) == 1 else F.concat_ws("\x1f", *enc)
        tk = df.select(key.alias("_k")).agg(
            F.expr(f"approx_top_k(_k, {limit}, {max(10 * limit, 1000)})")
            .alias("_tk")
        )
        out = tk.select(F.explode("_tk").alias("_e"))
        if len(cols) == 1:
            pieces = [F.col("_e.item")]
        else:
            split = F.split(F.col("_e.item"), "\x1f", -1)
            pieces = [split.getItem(i) for i in range(len(cols))]
        items = [
            F.when(p == sentinel, F.lit(None)).otherwise(p).alias(c)
            for p, c in zip(pieces, cols)
        ]
        return out.select(
            *items, F.col("_e.count").alias("_approxcount")
        ).orderBy(F.col("_approxcount").desc(), *cols)
    return (
        df.groupBy(*[_group_expr(c, df, schema) for c in cols])
        .agg(F.count(F.lit(1)).alias("_approxcount"))
        .orderBy(F.col("_approxcount").desc(), *cols)
        .limit(limit)
    )


def _stage_trace(df: DataFrame, rest: str, schema: SumoSchema,
                 max_iter: int = 10) -> DataFrame:
    """``trace "<id-regex>" "<seed>"`` — Sumo's transitive ID chase:
    starting from the seed identifier, repeatedly pull in every message
    carrying an already-reached id and every id those messages carry
    (request-id ↔ session-id chains across services).

    Physical shape: ids per message come from one narrow
    ``regexp_extract_all``; within-message connectivity is a STAR on the
    row's first id (clique-equivalent for reachability, so edges are
    O(ids-per-row), not O(ids²)); the reachable set grows by iterated
    equi-joins on the checkpointed edge list (same driver-loop contract
    as ``operators.dedup.connected_components`` — fixed rounds of one
    shuffle each, converging in chain-depth rounds, capped at
    ``max_iter``).  The final membership filter broadcasts the reached
    set — a trace result is a transaction chain, small by semantics —
    so each original row is emitted exactly once (left semi).
    """
    lits = _quoted_list(rest)
    if len(lits) != 2:
        raise SumoQLError(
            f'trace needs "<id-regex>" "<seed>", got: {rest!r}')
    regex, seed = lits
    with_ids = df.withColumn(
        "_tids",
        F.regexp_extract_all(F.col(schema.raw_col), F.lit(regex), 0),
    ).filter(F.size("_tids") > 0)

    star = F.transform(
        F.slice(F.col("_tids"), F.lit(2),
                F.greatest(F.size("_tids") - 1, F.lit(0))),
        lambda x: F.struct(
            F.element_at("_tids", 1).alias("src"), x.alias("dst")),
    )
    half = with_ids.select(F.explode(star).alias("e")).select(
        F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
    edges = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint()
    if edges.count() <= 100_000:
        edges = edges.coalesce(1)

    spark = df.sparkSession
    reach = spark.createDataFrame([(seed,)], "_tid string").localCheckpoint()
    prev = 1
    for _ in range(max_iter):
        reach = (
            edges.join(reach, edges.src == reach._tid)
            .select(F.col("dst").alias("_tid"))
            .union(reach)
            .distinct()
            .localCheckpoint()
        )
        cur = reach.count()
        if cur == prev:
            break
        prev = cur

    return (
        with_ids.join(
            F.broadcast(reach),
            F.array_contains(F.col("_tids"), F.col("_tid")),
            "left_semi",
        )
        .drop("_tids")
    )


_FIELDS_LIST_RE = re.compile(r"^[\w.]+(?:\s*,\s*[\w.]+)*$")


def _split_logexplain(rest: str) -> tuple[str, str | None, str]:
    """Split ``<test> [against <ctrl>] on <fields>`` at the KEYWORDS,
    quote-aware: ``against`` / ``on`` inside a quoted literal (``msg =
    "fight against x"``) belong to the condition, not the grammar.  The
    fields clause is the LAST top-level ``on``; the control split is the
    first top-level ``against`` before it."""

    def outside_quotes(idx: int) -> bool:
        in_q = in_sq = False
        for ch in rest[:idx]:
            if ch == '"' and not in_sq:
                in_q = not in_q
            elif ch == "'" and not in_q:
                in_sq = not in_sq
        return not in_q and not in_sq

    ons = [m for m in re.finditer(r"\s+on\s+", rest, re.IGNORECASE)
           if outside_quotes(m.start())]
    if not ons:
        raise SumoQLError(f"bad logexplain stage (missing 'on'): {rest!r}")
    on_m = ons[-1]
    head, fields = rest[:on_m.start()], rest[on_m.end():].strip()
    if not _FIELDS_LIST_RE.fullmatch(fields):
        raise SumoQLError(f"bad logexplain field list: {fields!r}")
    againsts = [m for m in re.finditer(r"\s+against\s+", head,
                                       re.IGNORECASE)
                if outside_quotes(m.start())]
    if againsts:
        a = againsts[0]
        return head[:a.start()].strip(), head[a.end():].strip(), fields
    return head.strip(), None, fields


def _stage_logexplain(df: DataFrame, rest: str,
                      schema: SumoSchema) -> DataFrame:
    """``logexplain <test-cond> [against <control-cond>] on f1[, f2…]`` —
    Sumo's explanation miner: which values of the ``on`` fields
    over-index in the rows matching the test condition vs the control
    population (default control: everything NOT matching the test).

    Output per value combination: ``explanation`` ("f1=v1, f2=v2"),
    ``test_coverage`` / ``control_coverage`` (fraction of test/control
    rows carrying the combination), ``relevance``, and the raw counts.
    Sumo's relevance score is unpublished; this engine defines it
    deterministically as ``round(test_coverage * (1 - control_coverage),
    6)`` — 1.0 when a value covers every abnormal row and no normal row,
    0 when it never appears in the test group.

    Scale shape: ONE corpus pass — a groupBy on the ``on`` fields with
    two conditional counts (map-side partial agg); the denominators come
    from re-aggregating the already-grouped frame (no second scan) and
    ride a 1-row broadcast crossJoin.  The final sort orders the
    aggregated report, never the corpus.
    """
    test_text, ctrl_text, fields_text = _split_logexplain(rest.strip())
    # Sumo-facing name → bound column (meta fields like _sourceCategory
    # resolve through the schema, parsed fields pass through).
    fields = [(f.strip(), schema.meta_cols.get(f.strip(), f.strip()))
              for f in fields_text.split(",") if f.strip()]
    try:
        test = F.expr(_rewrite_expr(test_text))
        ctrl = (F.expr(_rewrite_expr(ctrl_text))
                if ctrl_text else ~test)
    except Exception as exc:
        raise SumoQLError(f"bad logexplain condition: {rest!r}") from exc
    grouped = df.groupBy(*[c for _, c in fields]).agg(
        F.sum(F.when(test, 1).otherwise(0)).alias("_tc"),
        F.sum(F.when(ctrl, 1).otherwise(0)).alias("_cc"),
    )
    totals = grouped.agg(F.sum("_tc").alias("_tt"),
                         F.sum("_cc").alias("_ct"))
    explanation = F.concat_ws(", ", *[
        F.concat(F.lit(name + "="),
                 F.coalesce(F.col(col).cast("string"), F.lit("null")))
        for name, col in fields
    ])
    test_cov = F.round(F.col("_tc") / F.col("_tt"), 6)
    ctrl_cov = F.round(F.col("_cc") / F.greatest(F.col("_ct"), F.lit(1)), 6)
    return (
        grouped.crossJoin(F.broadcast(totals))
        .filter(F.col("_tc") > 0)
        .select(
            explanation.alias("explanation"),
            F.round(test_cov * (1 - ctrl_cov), 6).alias("relevance"),
            test_cov.alias("test_coverage"),
            ctrl_cov.alias("control_coverage"),
            F.col("_tc").alias("test_count"),
            F.col("_cc").alias("control_count"),
        )
        .orderBy(F.col("relevance").desc(), "explanation")
    )


# Variable-part masks for logreduce signatures, applied in order.  Each
# is engine-portable regex (Java and RE2/DuckDB agree on every construct
# used): UUIDs, then long hex runs (ids, digests), then IPv4 addresses,
# then any remaining number.  Exposed so query oracles can replay the
# identical chain.
LOGREDUCE_MASKS: tuple[str, ...] = (
    r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
    r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b",
    r"\b[0-9a-fA-F]{8,}\b",
    r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    r"\b\d+(\.\d+)?\b",
)


def logreduce_signature(col: Column | str) -> Column:
    """Mask the variable parts of a message into its LogReduce
    signature — a pure chained ``regexp_replace`` Column (codegen-
    friendly, narrow).  NULL messages become the visible ``(null)``
    template rather than a NULL group: engines disagree on NULL sort
    placement (Spark NULLS FIRST vs DuckDB NULLS LAST), so a NULL
    group's membership at a ``limit`` cutoff would be engine-dependent."""
    sig = F.col(col) if isinstance(col, str) else col
    for pat in LOGREDUCE_MASKS:
        sig = F.regexp_replace(sig, pat, "*")
    return F.coalesce(sig, F.lit("(null)"))


def _parse_sig_opts(rest: str, schema: SumoSchema) -> tuple[str, int, str]:
    """Shared ``field=<col>`` / ``limit=N`` option parsing for the
    logreduce/logcompare twin verbs.  Returns (bound column, limit,
    leftover text) — the caller validates the leftover."""
    field, limit = schema.raw_col, 100
    rest = rest.strip()
    m = re.search(r"\bfield\s*=\s*([\w.]+)", rest)
    if m:
        field = schema.meta_cols.get(m.group(1), m.group(1))
        rest = rest[:m.start()] + rest[m.end():]
    m = re.search(r"\blimit\s*=\s*(\d+)", rest)
    if m:
        limit = int(m.group(1))
        rest = rest[:m.start()] + rest[m.end():]
    return field, limit, rest


def _stage_logreduce(df: DataFrame, rest: str,
                     schema: SumoSchema) -> DataFrame:
    """``logreduce [field=<col>] [limit=N]`` — Sumo's log-clustering
    operator: messages collapse into signatures by masking variable
    parts (ids, addresses, numbers), then signatures are ranked by
    frequency.  Sumo's signature miner is a fuzzy learned clusterer;
    this engine's deterministic analog masks with the fixed
    ``LOGREDUCE_MASKS`` chain — the published behavior users act on
    (group-by-template, rank by count) with reproducible output.

    Scale shape: masking is a narrow map stage; the only shuffle is the
    signature groupBy (map-side combined — duplicate templates collapse
    per-partition first, which is the whole premise of the operator);
    the rank is TakeOrdered (never a global sort).  Ties break on the
    signature text for determinism.
    """
    field, limit, rest = _parse_sig_opts(rest, schema)
    if rest.strip() == "keys":
        # ``logreduce keys`` — Sumo's JSON-schema clustering variant:
        # the signature is the sorted key set of the JSON message, so
        # logs cluster by SHAPE (which fields they carry) instead of by
        # masked text.  The key set is JSON-encoded (not bare-joined):
        # a comma-join would merge {"a,b":1} with {"a":..,"b":..} and a
        # literal "(no keys)" key with the sentinel — to_json escapes
        # per the JSON standard identically in every engine.  Non-JSON /
        # non-object / empty-object rows fall into one visible
        # "(no keys)" group (cross-engine-safe, like the NULL template
        # rule above).
        keys = F.json_object_keys(F.col(field))
        sig = F.when(
            keys.isNull() | (F.size(keys) == 0), F.lit("(no keys)")
        ).otherwise(F.to_json(F.array_sort(keys)))
        return (
            df.select(sig.alias("_signature"))
            .groupBy("_signature")
            .agg(F.count(F.lit(1)).alias("_count"))
            .orderBy(F.col("_count").desc(), "_signature")
            .limit(limit)
        )
    if rest.strip():
        raise SumoQLError(f"bad logreduce stage: {rest!r}")
    return (
        df.select(logreduce_signature(field).alias("_signature"))
        .groupBy("_signature")
        .agg(F.count(F.lit(1)).alias("_count"))
        .orderBy(F.col("_count").desc(), "_signature")
        .limit(limit)
    )


def _stage_logcompare(df: DataFrame, rest: str,
                      schema: SumoSchema) -> DataFrame:
    """``logcompare [field=<col>] last <duration> [limit=N]`` — Sumo's
    signature-diff operator: cluster messages into logreduce signatures,
    then compare how often each signature occurs in the trailing
    ``<duration>`` (the TARGET window) against everything before it (the
    BASELINE).  Sumo anchors the baseline with ``timeshift``; against a
    bounded batch frame the deterministic analog is the trailing-window
    split on the frame's own max timestamp.

    Output per signature: baseline/target counts, ``_is_new`` (absent
    from the baseline), and ``_change`` — the smoothed log₂ rate ratio
    ``log2(((tc+1)/(T+2)) / ((bc+1)/(B+2)))``, positive when a template
    surges, negative when it fades (Sumo's z-score is unpublished; the
    smoothed ratio is this engine's documented, reproducible scoring).

    Scale shape: ONE scalar aggregate for the time cut (1-row broadcast
    crossJoin), then ONE signature groupBy with two conditional counts
    (map-side combined — the same shape as ``logexplain``); denominators
    re-aggregate the already-grouped frame; the rank is TakeOrdered.
    """
    field, limit, rest = _parse_sig_opts(rest, schema)
    m = re.fullmatch(r"\s*last\s+(\d+)([smhd])\s*", rest)
    if not m:
        raise SumoQLError(f"bad logcompare stage (need 'last <n><unit>'):"
                          f" {rest!r}")
    seconds = int(m.group(1)) * _UNIT_SECONDS[m.group(2)]
    ts = F.col(schema.ts_col)
    cut = df.agg(
        (F.max(ts) - F.expr(f"INTERVAL {seconds} SECOND")).alias("_cut"))
    grouped = (
        df.select(logreduce_signature(field).alias("_signature"),
                  ts.alias("_ts"))
        .crossJoin(F.broadcast(cut))
        .groupBy("_signature")
        .agg(
            F.sum(F.when(F.col("_ts") < F.col("_cut"), 1).otherwise(0))
            .alias("_baseline_count"),
            F.sum(F.when(F.col("_ts") >= F.col("_cut"), 1).otherwise(0))
            .alias("_target_count"),
        )
    )
    totals = grouped.agg(F.sum("_baseline_count").alias("_bt"),
                         F.sum("_target_count").alias("_tt"))
    t_rate = (F.col("_target_count") + 1) / (F.col("_tt") + 2)
    b_rate = (F.col("_baseline_count") + 1) / (F.col("_bt") + 2)
    return (
        grouped.crossJoin(F.broadcast(totals))
        .select(
            "_signature", "_baseline_count", "_target_count",
            ((F.col("_baseline_count") == 0)
             & (F.col("_target_count") > 0)).alias("_is_new"),
            F.round(F.log2(t_rate / b_rate), 4).alias("_change"),
        )
        .orderBy(F.col("_change").desc(), "_signature")
        .limit(limit)
    )


def _stage_dedup(df: DataFrame, rest: str, schema: SumoSchema) -> DataFrame:
    """``dedup [N] [by f1, f2]`` — keep the N most recent rows per key
    (whole-row identity when no ``by``).  Ties on the timestamp break on
    the raw message for determinism."""
    from pyspark.sql import Window

    m = re.match(r"^(\d+)?\s*(?:by\s+(.+))?$", rest.strip())
    if not m:
        raise SumoQLError(f"bad dedup stage: {rest!r}")
    n = int(m.group(1)) if m.group(1) else 1
    if m.group(2):
        keys = [c.strip() for c in m.group(2).split(",")]
    else:
        # Whole-row identity: every column except the timestamp — two
        # identical messages at different times ARE duplicates.  _raw is
        # part of the row's identity and belongs in the key set.
        keys = [c for c in df.columns if c != schema.ts_col]
    # Ordering: most-recent first when a timestamp survives; the raw
    # message only as a tiebreaker when it still exists (an upstream
    # aggregation / fields / top stage may have dropped it — appending it
    # unconditionally raised an unresolved-column AnalysisException).
    order = [F.col(schema.ts_col).desc()] if schema.ts_col in df.columns else []
    if schema.raw_col in df.columns and schema.raw_col not in keys:
        order.append(F.col(schema.raw_col).desc())
    if not order:
        # Post-aggregation frames may carry neither column; rows within a
        # partition are then fully determined by the keys, so ordering by
        # them is deterministic (and row_number requires ≥1 sort column).
        order = [F.col(k) for k in keys]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_dedup_rn", F.row_number().over(w))
        .filter(F.col("_dedup_rn") <= n)
        .drop("_dedup_rn")
    )


def _stage_json(df: DataFrame, rest: str, schema: SumoSchema) -> DataFrame:
    """``json [field=<col>] "a.b", "c[0].d" as x, y`` → get_json_object
    projections (FER example ``sumoresource.py:1147-1158``).  Paths pass
    through as JSONPath, so array indices (``phones[0]``) work; an
    optional ``field=`` reads from a column other than the raw message,
    same as the parse stage."""
    fm = re.match(r"^field\s*=\s*(\w+)\s+(.*)$", rest,
                  re.IGNORECASE | re.DOTALL)
    src = F.col(fm.group(1)) if fm else F.col(schema.raw_col)
    if fm:
        rest = fm.group(2)
    if " as " in rest:
        paths_part, names_part = rest.rsplit(" as ", 1)
        names = [n.strip() for n in names_part.split(",")]
    else:
        paths_part, names = rest, []
    paths = _quoted_list(paths_part)
    if not paths:
        raise SumoQLError(f"json stage needs quoted paths: {rest!r}")
    if not names:
        # default alias: last path segment, array index stripped
        names = [p.split(".")[-1].split("[")[0] for p in paths]
    if len(names) != len(paths):
        raise SumoQLError("json stage: paths/aliases arity mismatch")
    out = df
    for p, n in zip(paths, names):
        out = out.withColumn(n, F.get_json_object(src, f"$.{p}"))
    return out


def _stage_parse(df: DataFrame, rest: str, schema: SumoSchema,
                 keep_default: bool = False) -> DataFrame:
    """Anchor parse ``"prefix*suffix" as name`` and ``regex "(?<g>...)"``.

    Sumo search semantics: rows whose message does not match the pattern
    are DROPPED unless the stage ends with ``nodrop``.  (FERs differ —
    ingest-time extractions never drop rows, so the FER compiler calls
    with ``keep_default=True``.)  An optional ``field=<col>`` reads from
    a column other than the raw message.
    """
    keep = keep_default
    if re.search(r"\bnodrop\s*$", rest, re.IGNORECASE):
        keep = True
        rest = re.sub(r"\bnodrop\s*$", "", rest, flags=re.IGNORECASE).strip()
    multi = False
    if re.search(r"\bmulti\s*$", rest, re.IGNORECASE):
        multi = True
        rest = re.sub(r"\bmulti\s*$", "", rest, flags=re.IGNORECASE).strip()

    is_regex = rest.lower().startswith("regex")
    if is_regex:
        rest = rest[len("regex"):].strip()
    fm = re.match(r"^field\s*=\s*(\w+)\s+(.*)$", rest,
                  re.IGNORECASE | re.DOTALL)
    src = F.col(fm.group(1)) if fm else F.col(schema.raw_col)
    if fm:
        rest = fm.group(2)

    if is_regex:
        pattern = _quoted_list(rest)[0]
        out = df
        # Java regex accepts (?<name>...) natively; extraction is by group
        # index so the oracle (RE2 with plain groups) can reproduce it.
        gnames = re.findall(r"\(\?<(\w+)>", pattern)
        if multi:
            # Sumo's `multi`: one output ROW per match (a UDTF shape) —
            # regexp_extract_all + explode, both built-ins.  Default drop
            # = plain explode (zero-match rows vanish); nodrop keeps them
            # with a null via explode_outer.
            if not gnames:
                raise SumoQLError(
                    "parse regex … multi needs at least one named group"
                )
            exploder = F.explode_outer if keep else F.explode
            if len(gnames) == 1:
                gname = gnames[0]
                matches = F.regexp_extract_all(
                    src, F.lit(pattern), _group_index(pattern, gname)
                )
                return df.withColumn(gname, exploder(matches))
            # Multi-group (round-14; reference FER family P19,
            # sumoresource.py:1147-1177 allows it): every match binds
            # ALL named groups in one output row — the anchor branch's
            # multi-star technique transplanted to named groups.  One
            # regexp_extract_all per group over the same pattern (the
            # match sets are identical, so the per-group arrays are
            # index-aligned by construction), arrays_zip'd into structs
            # and exploded.  Still a generator inside whole-stage
            # codegen, zero shuffle.
            zipped = F.arrays_zip(*[
                F.regexp_extract_all(
                    src, F.lit(pattern), _group_index(pattern, g)
                ).alias(f"m{i}") for i, g in enumerate(gnames)])
            mc = fresh_name(df.columns, "_pmulti")
            out = df.withColumn(mc, exploder(zipped))
            for i, g in enumerate(gnames):
                out = out.withColumn(g, F.col(mc)[f"m{i}"])
            return out.drop(mc)
        for gname in gnames:
            out = out.withColumn(
                gname,
                F.nullif(
                    F.regexp_extract(src, pattern,
                                     _group_index(pattern, gname)),
                    F.lit(""),
                ),
            )
        if not keep and gnames:
            # Drop decides on the MATCH, not on the first group's
            # post-nullif value: a row whose pattern matches but whose
            # first capture is legitimately empty must be kept (Sumo's
            # match-based drop semantics).
            out = out.filter(src.rlike(pattern))
        return out
    m = re.match(r'^"([^"]*)"\s+as\s+([\w,\s]+)$', rest)
    if not m:
        raise SumoQLError(f"bad parse stage: {rest!r}")
    template, names_part = m.groups()
    names = [n.strip() for n in names_part.split(",")]
    stars = template.count("*")
    if stars != len(names):
        raise SumoQLError("parse stage: '*' count != alias count")
    parts = [re.escape(part) for part in template.split("*")]
    # A template-final '*' must capture to end of line: a lazy (.*?) with
    # no following anchor would match the empty string.
    groups = ["(.*?)"] * (len(parts) - 1)
    if parts[-1] == "":
        groups[-1] = "(.*)"
    pattern = "".join(
        parts[i] + (groups[i] if i < len(groups) else "")
        for i in range(len(parts))
    )
    if multi:
        # Anchor-form `multi`: the template is applied repeatedly and
        # each match emits one ROW (the regex branch's UDTF shape —
        # regexp_extract_all + explode; previously the flag was
        # silently ignored here, which is worse than raising).
        exploder = F.explode_outer if keep else F.explode
        if stars == 1:
            matches = F.regexp_extract_all(src, F.lit(pattern), 1)
            return df.withColumn(names[0], exploder(matches))
        # Multi-star (round-13, full Sumo semantics): every match binds
        # ALL stars in one output row.  One regexp_extract_all per
        # group over the same pattern — the engines agree on the match
        # set, so the per-group arrays are index-aligned by
        # construction — zipped into structs and exploded.  Still a
        # generator inside whole-stage codegen, zero shuffle.
        zipped = F.arrays_zip(*[
            F.regexp_extract_all(src, F.lit(pattern), i + 1)
            .alias(f"m{i}") for i in range(stars)])
        mc = fresh_name(df.columns, "_pmulti")
        out = df.withColumn(mc, exploder(zipped))
        for i, n in enumerate(names):
            out = out.withColumn(n, F.col(mc)[f"m{i}"])
        return out.drop(mc)
    out = df
    for i, n in enumerate(names, start=1):
        out = out.withColumn(
            n,
            F.nullif(F.regexp_extract(src, pattern, i), F.lit("")),
        )
    if not keep:
        # Match-based drop (see the regex branch): an anchor template
        # whose first '*' captures an empty string still matched.
        out = out.filter(src.rlike(pattern))
    return out


def _group_index(pattern: str, gname: str) -> int:
    """1-based capture-group index of a named group."""
    return [g for g in re.findall(r"\(\?<(\w+)>", pattern)].index(gname) + 1


def _stage_timeslice(df: DataFrame, rest: str, schema: SumoSchema) -> DataFrame:
    """``timeslice 5m`` (fixed width) or ``timeslice 10 buckets`` (fixed
    count: the data span divides into N equal slices — Sumo's
    bucket-count form).  The bucket form needs the span first: one tiny
    min/max agg broadcast back onto the stream; integer epoch math only,
    so the assignment is reproducible cross-engine."""
    mb = re.match(r"^(\d+)\s+buckets$", rest.strip(), re.IGNORECASE)
    if mb:
        n = int(mb.group(1))
        e = F.unix_timestamp(F.col(schema.ts_col))
        bounds = df.agg(
            F.min(e).alias("_lo"), F.max(e).alias("_hi")
        ).withColumn("_width", F.expr(f"(_hi - _lo) div {n} + 1"))
        out = df.crossJoin(F.broadcast(bounds)).withColumn("_e", e)
        out = out.withColumn(
            "_timeslice",
            F.timestamp_seconds(
                F.expr("_lo + ((_e - _lo) div _width) * _width")
            ),
        )
        return out.drop("_lo", "_hi", "_width", "_e")
    m = re.match(r"^(\d+)([smhd])$", rest.strip())
    if not m:
        raise SumoQLError(f"bad timeslice: {rest!r}")
    n, unit = int(m.group(1)), m.group(2)
    seconds = n * _UNIT_SECONDS[unit]
    return df.withColumn(
        "_timeslice",
        F.window(F.col(schema.ts_col), f"{seconds} seconds").start,
    )


def _stage_sort(df: DataFrame, rest: str) -> DataFrame:
    """``sort by f1 [asc|desc], f2 [asc|desc], …`` — Sumo default is
    descending (newest/largest first)."""
    m = re.match(r"^by\s+(.+)$", rest.strip(), re.IGNORECASE)
    if not m:
        raise SumoQLError(f"bad sort stage: {rest!r}")
    order: list[Column] = []
    for part in m.group(1).split(","):
        pm = re.match(r"^([\w]+)(?:\s+(asc|desc))?$", part.strip(),
                      re.IGNORECASE)
        if not pm:
            raise SumoQLError(f"bad sort key: {part.strip()!r}")
        col, direction = pm.group(1), (pm.group(2) or "desc").lower()
        order.append(
            F.col(col).asc() if direction == "asc" else F.col(col).desc()
        )
    return df.orderBy(*order)


def _stage_agg(df: DataFrame, stage: str,
               schema: SumoSchema = SumoSchema()) -> DataFrame:
    """``count by a, b`` / ``sum(x), avg(y) by k`` → groupBy().agg().
    Output columns follow Sumo naming: _count, _sum_x, _avg_y,
    _pct_x_95, _first_x, _last_x …  first/last are event-time ordered
    (min_by/max_by on the timestamp column), not arrival-ordered — the
    only distributed-safe reading."""
    if " by " in stage:
        aggs_part, by_part = stage.split(" by ", 1)
        by_cols = [c.strip() for c in by_part.split(",")]
    else:
        aggs_part, by_cols = stage, []
    # Split on commas not inside parens so percentile(x, 95) survives.
    specs = re.split(r",(?![^(]*\))", aggs_part)
    agg_cols: list[Column] = []
    for spec in specs:
        spec = spec.strip()
        pm = _PCTL_RE.match(spec)
        if pm:
            arg, p = pm.group(1), float(pm.group(2))
            agg_cols.append(
                F.expr(f"percentile({arg}, {p / 100.0})").alias(
                    f"_pct_{arg}_{pm.group(2).replace('.', '_')}"
                )
            )
            continue
        m = _AGG_RE.match(spec)
        if not m:
            raise SumoQLError(f"bad aggregation: {spec!r}")
        fn, arg = m.group(1), m.group(2)
        if fn == "count":
            agg_cols.append(F.count(F.lit(1)).alias("_count"))
        elif fn == "count_distinct":
            agg_cols.append(
                F.countDistinct(arg).alias(f"_count_distinct_{arg}")
            )
        elif fn == "median":
            # Exact interpolated median (percentile 0.5) — matches Sumo's
            # median = pct(x, 50); DuckDB's quantile_cont is the oracle.
            agg_cols.append(
                F.expr(f"percentile({arg}, 0.5)").alias(f"_median_{arg}")
            )
        elif fn == "values":
            # Sumo's `values(x)`: the distinct value set.  Emitted as a
            # sorted comma-joined string — deterministic under any
            # partitioning and hash-comparable across engines (array
            # columns canonicalize differently engine to engine).
            agg_cols.append(
                F.array_join(
                    F.array_sort(F.collect_set(F.col(arg).cast("string"))),
                    ",",
                ).alias(f"_values_{arg}")
            )
        elif fn == "hll":
            # Mergeable distinct-count sketch (`_hll_x`, binary): the
            # scheduled-view-friendly form of count_distinct — partials
            # merge register-wise (hll_union_agg), so incremental
            # maintenance equals a full recompute exactly.  Read the
            # estimate with `hll_sketch_estimate(_hll_x) as n` (an eval
            # stage; the function is a Spark built-in).
            agg_cols.append(
                F.hll_sketch_agg(arg).alias(f"_hll_{arg}")
            )
        elif fn in ("first", "last"):
            if schema.ts_col not in df.columns:
                raise SumoQLError(
                    f"{fn}() needs timestamp column {schema.ts_col!r}"
                )
            picker = F.min_by if fn == "first" else F.max_by
            agg_cols.append(
                picker(arg, schema.ts_col).alias(f"_{fn}_{arg}")
            )
        else:
            agg_cols.append(
                getattr(F, fn)(arg).alias(f"_{fn}_{arg}")
            )
    if by_cols:
        # Built-in metadata fields group by their BOUND column but keep
        # the Sumo field name in the output (`count by _sourceCategory`
        # with meta_cols={"_sourceCategory": "source_category"} groups
        # on source_category, emits _sourceCategory) — the idiom every
        # shipped app's panels use.
        by_exprs = [_group_expr(c, df, schema) for c in by_cols]
        out = df.groupBy(*by_exprs).agg(*agg_cols)
        # Mark the group keys in column METADATA so later stages that
        # must split keys from measures (compare's period self-join) can
        # do it structurally instead of guessing from names/dtypes —
        # a numeric group key and an eval-derived measure are otherwise
        # indistinguishable.  Metadata survives withColumn/eval stages.
        return out.select(*[
            F.col(c).alias(c, metadata={"_sumo_group_key": True})
            if c in by_cols else F.col(c)
            for c in out.columns
        ])
    return df.agg(*agg_cols)
