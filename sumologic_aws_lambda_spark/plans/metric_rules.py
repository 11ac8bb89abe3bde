"""Metric-rule extraction (SURVEY §2.3 P20).

Reference: metric rules carry a ``matchExpression`` like
``account=asacss FunctionName=*`` plus ``variablesToExtract`` tag-sequence
selectors like ``$FunctionName._1`` (``sumologic-app-utils/src/
sumoresource.py:959-988``; example ``Test/SampleTemplate.yaml:332-336``).
Applied to a metric stream they (a) select matching series and (b)
project new dimension columns out of existing tag values.

Model here: a metric row is (metric string, tags map<string,string>).
``$Tag._N`` extracts the N-th ``.``-separated component of that tag's
value (1-based), mirroring Sumo's tag-sequence variables.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MetricRule:
    match_expression: str                 # "k1=v1 k2=*" (AND semantics)
    variables: dict[str, str]             # new_col -> "$Tag._N"


def _match_predicate(match_expression: str) -> Column:
    cond = F.lit(True)
    for term in match_expression.split():
        if "=" not in term:
            continue
        k, v = term.split("=", 1)
        tag = F.col("tags").getItem(k)
        if v == "*":
            cond = cond & tag.isNotNull()
        elif v.endswith("*"):
            cond = cond & tag.startswith(v[:-1])
        else:
            cond = cond & (tag == v)
    return cond


def _variable_expr(selector: str) -> Column:
    m = re.match(r"^\$(\w+)\._(\d+)$", selector)
    if not m:
        raise ValueError(f"bad variablesToExtract selector: {selector!r}")
    tag, idx = m.group(1), int(m.group(2))
    parts = F.split(F.col("tags").getItem(tag), r"\.")
    return F.try_element_at(parts, F.lit(idx))


def apply_metric_rule(df: DataFrame, rule: MetricRule) -> DataFrame:
    """Filter matching series and project the extracted dimensions —
    both plain Column expressions (filter + withColumn), fully pushed
    down/codegen'd by Catalyst."""
    out = df.filter(_match_predicate(rule.match_expression))
    for name, selector in rule.variables.items():
        out = out.withColumn(name, _variable_expr(selector))
    return out
