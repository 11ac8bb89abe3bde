"""Entity hierarchies — the AWS Explorer analog (SURVEY §2 residue).

Reference: ``sumologic-app-utils/src/sumoresource.py:884``
(``SumoLogicAWSExplorer``) manages named entity hierarchies through
``sumologic.py:258-267`` (``create_hierarchy`` / ``update_hierarchy`` /
``delete_hierarchy`` / ``get_entity_hierarchies``).  A hierarchy is a
recursive level spec (``Test/SampleTemplate.yaml:321``)::

    {"entityType": "account",
     "nextLevelsWithConditions": [{"condition": v, "level": {...}}, ...],
     "nextLevel": {"entityType": "region", ...}}

i.e. at each depth the entity type of the NEXT level may depend on the
value of the current one (``nextLevelsWithConditions`` keyed on the
parent value, ``nextLevel`` as the unconditional fallback).  The
reference's CRUD contract: create with a duplicate name falls through to
update-by-looked-up-id (``sumoresource.py:905-916``), ``get_explorer_id``
raises when the name is absent (``:886-892``), delete honors
``remove_on_delete_stack`` (``:932-941``).

Spark-first analytics: the explorer's navigation tree over a fact table
is exactly a ROLLUP over the compiled per-depth dimension expressions —
ONE shuffle produces every prefix aggregate (each tree node), with
conditional child types compiled to CASE chains over the parent value
columns.  No per-node queries, no driver-side tree walk: at 100 TB the
whole explorer refresh is a single partial-aggregated pass.
"""

from __future__ import annotations

import json
import pathlib
import uuid
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Level spec
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class HierarchyLevel:
    """One level of the recursive spec (the reference JSON shape)."""

    entity_type: str
    next_levels_with_conditions: tuple[tuple[str, "HierarchyLevel"], ...] = ()
    next_level: "HierarchyLevel | None" = None

    @classmethod
    def from_dict(cls, d: dict) -> "HierarchyLevel":
        conds = tuple(
            (c["condition"], cls.from_dict(c["level"]))
            for c in d.get("nextLevelsWithConditions") or ()
        )
        nxt = d.get("nextLevel")
        return cls(
            entity_type=d["entityType"],
            next_levels_with_conditions=conds,
            next_level=cls.from_dict(nxt) if nxt else None,
        )

    def to_dict(self) -> dict:
        out: dict = {
            "entityType": self.entity_type,
            "nextLevelsWithConditions": [
                {"condition": c, "level": lvl.to_dict()}
                for c, lvl in self.next_levels_with_conditions
            ],
        }
        if self.next_level is not None:
            out["nextLevel"] = self.next_level.to_dict()
        return out

    def max_depth(self) -> int:
        child = [lvl.max_depth()
                 for _, lvl in self.next_levels_with_conditions]
        if self.next_level is not None:
            child.append(self.next_level.max_depth())
        return 1 + max(child, default=0)


def _branch_table(root: HierarchyLevel) -> list[list[tuple[Column, str]]]:
    """Per-depth list of ``(predicate, entity_type)`` branches.

    The predicate for a depth-``i`` branch is a conjunction of equality
    conditions over the ALREADY-COMPUTED value columns ``__v0..__v{i-2}``
    — so the same expression is valid both pre-aggregation (to pick the
    dimension that fills ``__v{i-1}``) and post-aggregation (to label
    the row's entity type), because rollup groups by every ``__v`` column.
    """
    depths: list[list[tuple[Column, str]]] = [[(F.lit(True),
                                                root.entity_type)]]
    frontier: list[tuple[Column, HierarchyLevel]] = [(F.lit(True), root)]
    depth = 0
    while True:
        nxt: list[tuple[Column, HierarchyLevel]] = []
        vcol = F.col(f"__v{depth}")
        for pred, lvl in frontier:
            conds = [vcol == c
                     for c, _ in lvl.next_levels_with_conditions]
            for (c, child), cond in zip(lvl.next_levels_with_conditions,
                                        conds):
                nxt.append((pred & cond, child))
            if lvl.next_level is not None:
                fallback = (pred & ~reduce(Column.__or__, conds)
                            if conds else pred)
                nxt.append((fallback, lvl.next_level))
        if not nxt:
            return depths
        depths.append([(p, lvl.entity_type) for p, lvl in nxt])
        frontier = nxt
        depth += 1


def _case(branches: list[tuple[Column, Column]]) -> Column:
    expr = None
    for pred, val in branches:
        expr = F.when(pred, val) if expr is None else expr.when(pred, val)
    return expr.otherwise(F.lit(None))


def explorer_rollup(df: DataFrame, level: HierarchyLevel,
                    dims: dict[str, Column],
                    measures: dict[str, Column] | None = None,
                    hierarchy_filter: Column | None = None) -> DataFrame:
    """Compile a hierarchy level spec into the explorer navigation tree.

    ``dims`` maps each ``entityType`` name to its dimension expression
    over ``df`` (must be non-null — coalesce to a sentinel upstream, the
    cross-engine NULL-ordering rule).  Returns one row per tree node:
    ``(depth, path, entity_type, entity_value, n_events, *measures)``,
    computed by ONE rollup shuffle.  Ragged branches (a node whose spec
    ends above ``max_depth``) contribute rows only down to their own
    depth — the data-null / rollup-null distinction rides on
    ``grouping_id``, not on value nullness.
    """
    table = _branch_table(level)
    d = len(table)
    staged = df.filter(hierarchy_filter) if hierarchy_filter is not None \
        else df
    for i, branches in enumerate(table):
        missing = [t for _, t in branches if t not in dims]
        if missing:
            raise KeyError(f"no dim expression for entityType {missing}")
        staged = staged.withColumn(
            f"__v{i}", _case([(p, dims[t]) for p, t in branches]))
    vcols = [f"__v{i}" for i in range(d)]

    aggs = [F.count(F.lit(1)).alias("n_events")]
    for name, expr in (measures or {}).items():
        aggs.append(expr.alias(name))
    g = staged.rollup(*vcols).agg(F.grouping_id().alias("__gid"), *aggs)

    depth = (F.lit(d) - F.bit_count(F.col("__gid"))).cast("int")
    own_value = _case([(depth == i, F.col(f"__v{i - 1}"))
                       for i in range(1, d + 1)])
    own_type = _case([
        (depth == i, _case([(p, F.lit(t)) for p, t in table[i - 1]]))
        for i in range(1, d + 1)
    ])
    return (
        g.withColumn("depth", depth)
        .filter((F.col("depth") >= 1) & own_value.isNotNull())
        .select(
            "depth",
            F.concat_ws("/", *vcols).alias("path"),
            own_type.alias("entity_type"),
            own_value.alias("entity_value"),
            "n_events",
            *[F.col(n) for n in (measures or {})],
        )
    )


# ---------------------------------------------------------------------------
# Catalog (CRUD contract of SumoLogicAWSExplorer)
# ---------------------------------------------------------------------------

@dataclass
class Hierarchy:
    name: str
    level: HierarchyLevel
    filter: dict | None = None
    hierarchy_id: str = field(
        default_factory=lambda: uuid.uuid4().hex[:12])


class HierarchyCatalog:
    """Named entity hierarchies with the reference's CRUD semantics:
    create-with-duplicate-name updates in place (``hierarchy:duplicate``
    recovery, ``sumoresource.py:905-916``), ``get_explorer_id`` raises
    on a missing name, delete honors ``remove_on_delete_stack``.
    Optional JSON persistence, same pattern as ``provisioning.
    CatalogStore``."""

    def __init__(self, path: str | None = None):
        self._path = pathlib.Path(path) if path else None
        self._hierarchies: dict[str, Hierarchy] = {}
        if self._path and self._path.exists():
            data = json.loads(self._path.read_text())
            for h in data:
                obj = Hierarchy(
                    name=h["name"],
                    level=HierarchyLevel.from_dict(h["level"]),
                    filter=h.get("filter"),
                    hierarchy_id=h["id"],
                )
                self._hierarchies[obj.hierarchy_id] = obj

    def _save(self) -> None:
        if self._path is None:
            return
        self._path.write_text(json.dumps([
            {"name": h.name, "level": h.level.to_dict(),
             "filter": h.filter, "id": h.hierarchy_id}
            for h in self._hierarchies.values()
        ]))

    def get_entity_hierarchies(self) -> list[Hierarchy]:
        return list(self._hierarchies.values())

    def get_explorer_id(self, hierarchy_name: str) -> str:
        for h in self._hierarchies.values():
            if h.name == hierarchy_name:
                return h.hierarchy_id
        raise KeyError(
            f"Hierarchy with name {hierarchy_name} not found")

    def create_hierarchy(self, name: str, level: HierarchyLevel | dict,
                         hierarchy_filter: dict | None = None) -> Hierarchy:
        if isinstance(level, dict):
            level = HierarchyLevel.from_dict(level)
        try:
            # duplicate name → update the existing hierarchy in place
            return self.update_hierarchy(
                self.get_explorer_id(name), name, level, hierarchy_filter)
        except KeyError:
            pass
        h = Hierarchy(name=name, level=level, filter=hierarchy_filter)
        self._hierarchies[h.hierarchy_id] = h
        self._save()
        return h

    def update_hierarchy(self, hierarchy_id: str, name: str,
                         level: HierarchyLevel | dict,
                         hierarchy_filter: dict | None = None) -> Hierarchy:
        if isinstance(level, dict):
            level = HierarchyLevel.from_dict(level)
        if hierarchy_id not in self._hierarchies:
            raise KeyError(f"no hierarchy {hierarchy_id}")
        h = Hierarchy(name=name, level=level, filter=hierarchy_filter,
                      hierarchy_id=hierarchy_id)
        self._hierarchies[hierarchy_id] = h
        self._save()
        return h

    def delete_hierarchy(self, hierarchy_id: str,
                         remove_on_delete_stack: bool = True) -> bool:
        if not remove_on_delete_stack:
            return False
        self._hierarchies.pop(hierarchy_id, None)
        self._save()
        return True
