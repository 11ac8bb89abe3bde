"""Field Extraction Rules (SURVEY §2.3 P19): stored parse programs
applied at ingest time.

Reference semantics (``sumologic-app-utils/src/sumoresource.py:1147-1177``):
an FER is ``{name, scope, parse_expression, enabled}``; the scope is a
search predicate (``_source=…``; multiple scopes merged with ``or``,
:1168-1176), and the parse expression is a pipeline of extraction stages
(e.g. ``json "eventSource", "awsRegion" as eventSource, region`` —
``Test/SampleTemplate.yaml:361-363``).

Spark-first: each rule compiles to *masked column expressions* — the
stages run through the SumoQL compiler, then every extracted column is
wrapped in ``when(scope_pred, col)``.  No UDFs and no per-rule pass: all
rules land in one projection over the stream, so Catalyst fuses them
into the ingest ``select`` (whole-stage codegen, zero extra scans).
When two rules extract the same column name, the earlier matching rule
wins (left-to-right ``coalesce``) — FERs never filter rows.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sumoql import SumoSchema, _apply_stage, _split_stages, scope_predicate

_EXTRACTION_HEADS = frozenset({"json", "parse", "kv", "keyvalue", "csv"})


@dataclass(frozen=True)
class FieldExtractionRule:
    name: str
    scope: str              # SumoQL scope, e.g. '_sourceCategory=prod/api'
    parse_expression: str   # extraction stages, e.g. 'json "k" as key'
    enabled: bool = True


def _check_extraction_only(rule: FieldExtractionRule) -> list[str]:
    stages = _split_stages(rule.parse_expression)
    for s in stages:
        head = s.split(None, 1)[0].lower()
        if head not in _EXTRACTION_HEADS:
            raise ValueError(
                f"FER {rule.name!r}: stage {head!r} is not an extraction "
                f"stage (allowed: {sorted(_EXTRACTION_HEADS)})"
            )
    return stages


def apply_fers(df: DataFrame, rules: Sequence[FieldExtractionRule],
               schema: SumoSchema = SumoSchema()) -> DataFrame:
    """Apply a rule registry at ingest.  Extracted columns are null
    wherever a rule's scope does not match; rows always flow through."""
    out = df
    # target column → [(prefixed source column, scope predicate)] in order
    targets: dict[str, list[tuple[str, Column]]] = {}
    for i, rule in enumerate(rules):
        if not rule.enabled:
            continue
        stages = _check_extraction_only(rule)
        pred = scope_predicate(rule.scope, schema)
        before = set(out.columns)
        # Snapshot every pre-existing column: extraction stages
        # overwrite colliding names IN PLACE (withColumn), so a rule
        # extracting a name the frame already has would otherwise
        # destroy the original value on every OUT-of-scope row.  The
        # gated restore below is an identity for untouched columns
        # (both branches carry the same value), so snapshotting all of
        # them is safe and needs no knowledge of which names each stage
        # writes; Catalyst collapses the extra projections.
        orig = {c: f"__fer{i}_orig_{c}" for c in before}
        for c, t in orig.items():
            out = out.withColumn(t, F.col(c))
        for stage in stages:
            # FERs are ingest-time extractions: a non-matching row keeps
            # flowing with a null field, never drops (Sumo FER semantics,
            # unlike search-time `parse` whose default drops non-matches).
            out = _apply_stage(out, stage, schema, parse_keep_default=True)
        for c in before:
            out = out.withColumn(
                c, F.when(pred, F.col(c)).otherwise(F.col(orig[c])))
        out = out.drop(*orig.values())
        for c in [c for c in out.columns if c not in before]:
            tmp = f"__fer{i}_{c}"
            out = out.withColumnRenamed(c, tmp)
            targets.setdefault(c, []).append((tmp, pred))
    for c, sources in targets.items():
        out = out.withColumn(
            c, F.coalesce(*[F.when(p, F.col(t)) for t, p in sources])
        ).drop(*[t for t, _ in sources])
    return out


def apply_fer(df: DataFrame, rule: FieldExtractionRule,
              schema: SumoSchema = SumoSchema()) -> DataFrame:
    return apply_fers(df, [rule], schema)
