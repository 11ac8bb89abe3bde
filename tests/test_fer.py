"""Unit tests for the FER registry (plans/fer.py, SURVEY §2.3 P19)."""

from __future__ import annotations

import pytest

from sumologic_aws_lambda_spark.plans.fer import (
    FieldExtractionRule,
    apply_fer,
    apply_fers,
)
from sumologic_aws_lambda_spark.plans.sumoql import SumoSchema

SCHEMA = SumoSchema(raw_col="msg", meta_cols={"_sourceCategory": "cat"})


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        (1, "prod/api", '{"status":"500"}'),
        (2, "prod/web", '{"status":"200"}'),
        (3, "dev/api", "plain text"),
    ]
    return spark.createDataFrame(rows, "id int, cat string, msg string")


def test_scope_masks_extraction(logs):
    rule = FieldExtractionRule(
        "api-status", "_sourceCategory=prod/api", 'json "status" as st'
    )
    rows = {r["id"]: r["st"] for r in apply_fer(logs, rule, SCHEMA).collect()}
    assert rows == {1: "500", 2: None, 3: None}


def test_wildcard_scope_and_rule_order(logs):
    rules = [
        FieldExtractionRule("a", "_sourceCategory=prod/*",
                            'json "status" as st'),
        FieldExtractionRule("b", "_sourceCategory=dev/api",
                            'parse "plain *" as st'),
    ]
    rows = {r["id"]: r["st"] for r in apply_fers(logs, rules, SCHEMA).collect()}
    assert rows == {1: "500", 2: "200", 3: "text"}


def test_earlier_rule_wins_on_overlap(logs):
    rules = [
        FieldExtractionRule("first", "_sourceCategory=prod/api",
                            'json "status" as st'),
        FieldExtractionRule("second", "_sourceCategory=prod/*",
                            'parse regex "(?<st>\\d\\d\\d)"'),
    ]
    rows = {r["id"]: r["st"] for r in apply_fers(logs, rules, SCHEMA).collect()}
    # id=1 matches both → first rule's value; id=2 only the regex rule
    assert rows[1] == "500" and rows[2] == "200"


def test_disabled_rule_skipped_and_rows_flow(logs):
    rule = FieldExtractionRule("off", "*", 'json "status" as st',
                               enabled=False)
    out = apply_fers(logs, [rule], SCHEMA)
    assert "st" not in out.columns and out.count() == 3


def test_non_extraction_stage_rejected(logs):
    rule = FieldExtractionRule("bad", "*", "where id > 1")
    with pytest.raises(ValueError, match="not an extraction"):
        apply_fers(logs, [rule], SCHEMA)


def test_fer_does_not_clobber_existing_column_out_of_scope(spark):
    """A FER extracting a name the frame already carries must mask like
    any other extraction: the original value survives on out-of-scope
    rows, the extraction wins in scope."""
    df = spark.createDataFrame(
        [("prod/api", '{"status":"extracted"}', "orig-a"),
         ("dev/x", '{"status":"extracted"}', "orig-b")],
        "cat string, msg string, status string",
    )
    rule = FieldExtractionRule(
        name="r", scope="_sourceCategory=prod/api",
        parse_expression='json field=msg "status" as status',
    )
    out = {r.cat: r.status
           for r in apply_fer(df, rule, SCHEMA).collect()}
    assert out["prod/api"] == "extracted"   # in scope: extraction wins
    assert out["dev/x"] == "orig-b"         # out of scope: original kept
