"""Event-graph analytics: Markov transition edges and PageRank.

The shape that matters at 100 TB: the *edge list* is huge (every
consecutive event pair of every user), but the *graph* it aggregates
into is tiny (one node per event type / page / service — thousands at
most).  So the plan is a single windowed lag over (user, ts) to form
pairs, one partial-aggregatable groupBy to collapse them into weighted
edges, and then power iteration runs on the collapsed edge frame —
kilobytes, broadcast-joined against itself — never against the raw
events again.  The 100 TB of input is touched exactly once.

Reference tie-in: the Sumo apps ship dashboards over event-flow queries
(``count by fromState, toState`` patterns in the App catalog); the
transition matrix here is that verb's general form, and PageRank is the
standard importance measure over it (Page et al., 1999 — public).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_edges(events: DataFrame,
                     user_col: str = "user_id",
                     ts_col: str = "ts",
                     node_col: str = "event_type",
                     id_col: str = "event_id") -> DataFrame:
    """Consecutive-event pairs per user → weighted edge list.

    One shuffle on the user key (window lag), one partial-aggregatable
    groupBy on (src, dst).  Ties in ``ts`` are broken on ``id_col`` so
    the sequence — and therefore the edge weights — are deterministic.

    Returns (src, dst, n_transitions).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    pairs = events.select(
        F.lag(node_col).over(w).alias("src"),
        F.col(node_col).alias("dst"),
    ).filter(F.col("src").isNotNull())
    return pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )


def transition_probabilities(edges: DataFrame) -> DataFrame:
    """Edge counts → row-stochastic transition matrix.

    The per-src normalizer is a second groupBy over the *collapsed*
    edge frame (node-count² rows at most), broadcast back onto the
    edges — no second pass over raw events.

    Returns (src, dst, n_transitions, p) with p unrounded; callers
    round at the presentation edge.
    """
    totals = edges.groupBy("src").agg(
        F.sum("n_transitions").alias("src_total")
    )
    return (
        edges.join(F.broadcast(totals), "src")
        .withColumn("p", F.col("n_transitions") / F.col("src_total"))
        .drop("src_total")
    )


def pagerank(edges: DataFrame, iterations: int = 3,
             damping: float = 0.85) -> DataFrame:
    """Power-iteration PageRank over a *collapsed* weighted edge list.

    Designed for the aggregate-then-iterate regime: ``edges`` is the
    output of :func:`transition_edges` — node-count² rows, not event
    rows — so every join below is a broadcast over kilobytes.  Dangling
    nodes (no out-edges) redistribute their rank mass uniformly, the
    standard correction, applied identically in the SQL oracle.

    Returns (node, rank) with rank unrounded.
    """
    # Eagerly materialize the collapsed graph (node² rows at most) so
    # the expensive part — the one pass over raw events — runs exactly
    # once, not once per iteration reference.  Same lineage-cut
    # pattern as connected components (``operators/dedup.py``).
    probs = transition_probabilities(edges).localCheckpoint()
    nodes = (
        probs.select(F.col("src").alias("node"))
        .union(probs.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n")))
    ranks = nodes.crossJoin(n_nodes).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    out_nodes = probs.select(F.col("src").alias("node")).distinct()
    for _ in range(iterations):
        # Rank mass sitting on dangling nodes this iteration.
        dangling = (
            ranks.join(F.broadcast(out_nodes), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d_mass"))
        )
        incoming = (
            probs.join(
                F.broadcast(ranks.withColumnRenamed("node", "src")), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("in_mass"))
        )
        ranks = (
            nodes.join(F.broadcast(incoming), "node", "left")
            .crossJoin(F.broadcast(dangling))
            .crossJoin(n_nodes)
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n")
                    + damping * (
                        F.coalesce(F.col("in_mass"), F.lit(0.0))
                        + F.col("d_mass") / F.col("n")
                    )
                ).alias("rank"),
            )
            # ranks feeds BOTH the dangling aggregate and the incoming
            # join next pass; without a lineage cut the plan doubles
            # per iteration (2^iterations leaves).  The frame is
            # node-sized, so the eager cut costs one tiny job.
            .localCheckpoint()
        )
    return ranks
