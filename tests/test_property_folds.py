"""Property-based tests: the order-sensitive array folds (CWL requestID
carry-forward, multiline assembly) must agree with straight-line Python
re-implementations of the reference semantics on arbitrary inputs.

This is the §5 'oracle re-implementation' strategy: the Python functions
below are transliterations of the reference loops
(``cloudwatchlogs_lambda.js:42-88``), deliberately naive.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st

from sumologic_aws_lambda_spark.sources.cwl import (
    CONSOLE_FORMAT_RE,
    REQUEST_ID_RE,
)
from sumologic_aws_lambda_spark.sources.s3 import DEFAULT_BOUNDARY_RE

# -- python oracles ---------------------------------------------------------


def py_carry_forward(messages: list[str]) -> list[str | None]:
    last = None
    out = []
    for m in messages:
        m = re.sub(r"\n$", "", m)
        plain = re.search(REQUEST_ID_RE, m)
        console = re.search(CONSOLE_FORMAT_RE, m)
        own = None
        if console and console.group(1):
            own = console.group(1)
        elif plain and plain.group(1):
            own = plain.group(1)
        if own:
            last = own
        out.append(last)
    return out


def py_assemble(content: str, boundary: str) -> list[str]:
    recs: list[str] = []
    for line in re.sub(r"\n+$", "", content).split("\n"):
        if re.search(boundary, line) or not recs:
            recs.append(line)
        else:
            recs[-1] += "\n" + line
    return [r for r in recs if r.strip()]


# -- strategies -------------------------------------------------------------

_uuid = st.from_regex(r"[a-f0-9]{4}-[a-f0-9]{4}-[a-f0-9]{4}-[a-f0-9]{4}-[a-f0-9]{4}",
                      fullmatch=True)
_msg = st.one_of(
    st.text(alphabet="abc {}:\"", min_size=0, max_size=12),
    _uuid.map(lambda u: f"START RequestId: {u} Version: $LATEST"),
    _uuid.map(lambda u: f"2024-01-23T08:53:21.000Z {u} INFO handled"),
    st.just("plain line"),
    st.just('{"k":"v"}'),
)

_line = st.one_of(
    st.text(alphabet="xyz .:()", min_size=0, max_size=10),
    st.just("2024-03-01 10:00:00 INFO boundary"),
    st.just("  continuation"),
)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_msg, min_size=1, max_size=8))
def test_carry_forward_matches_python_oracle(spark, messages):
    from sumologic_aws_lambda_spark.sources.cwl import (
        decode_envelopes,
        explode_events,
    )
    from sumologic_aws_lambda_spark.testing.fixtures import _envelope, _event

    payload = _envelope("/g", "s", [
        _event(i, m) for i, m in enumerate(messages)
    ])
    df = spark.createDataFrame([(payload,)], "payload string")
    rows = sorted(
        explode_events(decode_envelopes(df)).collect(),
        key=lambda r: r.event_index,
    )
    assert [r.request_id for r in rows] == py_carry_forward(messages)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_line, min_size=1, max_size=10))
def test_multiline_assembly_matches_python_oracle(spark, lines):
    from pyspark.sql import functions as F

    from sumologic_aws_lambda_spark.sources.s3 import assemble_multiline

    content = "\n".join(lines)
    df = spark.createDataFrame([(content, "k")], "content string, s3_key string")
    got = [
        r.message
        for r in sorted(assemble_multiline(df).collect(),
                        key=lambda r: r.record_index)
    ]
    assert got == py_assemble(content, DEFAULT_BOUNDARY_RE)


def test_assembly_drops_records_of_only_empty_lines(spark):
    """Regression (hypothesis counterexample): leading empty lines fold
    into a whitespace-only record ('\\n') which Spark's space-only
    trim() kept while the reference loop's .strip() dropped it."""
    from sumologic_aws_lambda_spark.sources.s3 import assemble_multiline

    content = "\n\n2024-03-01 10:00:00 INFO boundary"
    df = spark.createDataFrame([(content, "k")],
                               "content string, s3_key string")
    got = [r.message for r in assemble_multiline(df).collect()]
    assert got == ["2024-03-01 10:00:00 INFO boundary"]
