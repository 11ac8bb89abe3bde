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


def _subtree_has_limit(tree) -> bool:
    node, children = tree
    cls = node.get("class", "")
    if cls.endswith(".GlobalLimit") or cls.endswith(".LocalLimit"):
        return True
    return any(_subtree_has_limit(c) for c in children)


def unbounded_global_windows(df: DataFrame) -> int:
    """Count Window nodes with an empty partitionSpec that are NOT fed
    by a Limit — each one moves its whole input to a single task."""
    nodes = json.loads(
        df._jdf.queryExecution().optimizedPlan().toJSON())
    tree, _ = _plan_tree(nodes)
    bad = 0

    def walk(t):
        nonlocal bad
        node, children = t
        if (node.get("class", "").endswith(".Window")
                and not (node.get("partitionSpec") or [])
                and not _subtree_has_limit(t)):
            bad += 1
        for c in children:
            walk(c)

    walk(tree)
    return bad
