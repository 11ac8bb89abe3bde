"""Property-based tests for the SumoQL parse stages (hypothesis):
anchor-parse extraction must agree with a straight-line Python ``re``
oracle for arbitrary prefix/value/suffix material, and kv extraction
must recover whatever was flattened in.

One Spark job per property run: hypothesis generates the corpus, Spark
evaluates all cases in one DataFrame, results compare row-wise.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from sumologic_aws_lambda_spark.plans.sumoql import SumoSchema, compile_query

SCHEMA = SumoSchema(raw_col="msg")

# Template/message material: printable, no quotes (the tiny grammar has no
# escaped-quote support), no '|' (stage separator), no '*' (the wildcard).
_plain = st.text(
    alphabet=st.characters(
        min_codepoint=32, max_codepoint=126, blacklist_characters='"|*'
    ),
    min_size=0, max_size=12,
)
_value = _plain.filter(lambda s: s.strip() == s)


@settings(max_examples=30, deadline=None)
@given(
    cases=st.lists(
        st.tuples(_plain, _value, _plain.filter(bool)), min_size=1,
        max_size=8,
    )
)
def test_anchor_parse_matches_python_re(spark, cases):
    """``parse "<prefix>*<suffix>" as v`` == python re with the same
    lazy-group pattern, including the no-match → null case."""
    rows, expected = [], []
    for i, (prefix, value, suffix) in enumerate(cases):
        msg = f"{prefix}{value}{suffix}"
        template = f"{prefix}*{suffix}"
        pattern = re.escape(prefix) + "(.*?)" + re.escape(suffix)
        m = re.search(pattern, msg)
        expected.append((i, m.group(1) if m and m.group(1) else None))
        rows.append((i, msg, template))

    # one template per row → compile per distinct template, union results
    got = {}
    df = spark.createDataFrame(rows, "id int, msg string, template string")
    for template in {t for _, _, t in rows}:
        sub = df.filter(df.template == template)
        out = compile_query(sub, f'* | parse "{template}" as v nodrop',
                            SCHEMA)
        for r in out.select("id", "v").collect():
            got[r["id"]] = r["v"]
    assert got == dict(expected)


_key = st.text(alphabet=st.sampled_from("abcdefgh"), min_size=1, max_size=5)
_kv_val = st.text(
    alphabet=st.characters(
        min_codepoint=33, max_codepoint=126, blacklist_characters='"|,;=',
    ),
    min_size=1, max_size=8,
)


@settings(max_examples=30, deadline=None)
@given(pairs=st.dictionaries(_key, _kv_val, min_size=1, max_size=5))
def test_kv_roundtrip(spark, pairs):
    """Flatten a dict to 'k=v k=v' (the P9 shape) then ``kv`` every key
    back out — values must round-trip exactly."""
    line = " ".join(f"{k}={v}" for k, v in pairs.items())
    df = spark.createDataFrame([(line,)], "msg string")
    keys = ", ".join(f'"{k}"' for k in pairs)
    out = compile_query(df, f"* | kv {keys}", SCHEMA)
    row = out.collect()[0]
    assert {k: row[k] for k in pairs} == pairs


_row = st.tuples(
    st.sampled_from(["click", "error", "view"]),
    st.integers(min_value=0, max_value=6),     # uid
    st.integers(min_value=0, max_value=99),    # v
)


@settings(max_examples=25, deadline=None)
@given(rows=st.lists(_row, min_size=1, max_size=20),
       threshold=st.integers(min_value=0, max_value=99))
def test_subquery_matches_python_semi_join(spark, rows, threshold):
    """`A [subquery:B | where v > t | compose uid]` must equal the
    Python-computed semi-join for arbitrary small corpora."""
    df = spark.createDataFrame(
        [(i, c, u, v) for i, (c, u, v) in enumerate(rows)],
        "id int, cat string, uid int, v int",
    )
    schema = SumoSchema(raw_col="cat",
                        meta_cols={"_sourceCategory": "cat"})
    out = compile_query(
        df,
        f"_sourceCategory=click [subquery:_sourceCategory=error"
        f" | where v > {threshold} | compose uid]",
        schema,
    )
    keys = {u for (c, u, v) in rows if c == "error" and v > threshold}
    expect = sorted(i for i, (c, u, v) in enumerate(rows)
                    if c == "click" and u in keys)
    assert sorted(r.id for r in out.collect()) == expect


_stage_word = st.sampled_from([
    "json", "parse", "kv", "csv", "where", "fields", "timeslice", "top",
    "count_frequent", "transaction", "geoip", "dedup", "logexplain",
    "trace", "sort", "limit", "count", "sum(v)", "save", "lookup",
    "compose", "accum", "diff", "smooth", "predict", "compare",
    "x as y", '"q"', "on", "against", "by", "1d", "5", ",", "(", ")",
    "[subquery:", "]", "*", "|",
])


@settings(max_examples=120, deadline=None)
@given(tokens=st.lists(_stage_word, min_size=1, max_size=8))
def test_compiler_never_raises_foreign_exceptions(spark, tokens):
    """Fuzz: any garbage query either compiles or raises SumoQLError —
    never an IndexError/TypeError/AttributeError from parser internals.
    (AnalysisException from Spark on a well-formed-but-unresolvable
    expression is also acceptable: the text reached the engine.)"""
    from sumologic_aws_lambda_spark.plans.sumoql import SumoQLError

    df = spark.createDataFrame(
        [(1, "m", "c")], "v long, msg string, cat string")
    text = "* | " + " ".join(tokens)
    try:
        compile_query(df, text, SumoSchema(raw_col="msg"), lookups={})
    except SumoQLError:
        pass
    except Exception as exc:  # noqa: BLE001
        from pyspark.errors import PySparkException
        assert isinstance(exc, PySparkException), (
            f"query {text!r} leaked {type(exc).__name__}: {exc}")
