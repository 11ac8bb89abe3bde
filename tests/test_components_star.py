"""Large-star/small-star components vs the min-label implementation:
property-equal on random graphs, plus the adversarial chain shape."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)

_edge = st.tuples(st.integers(0, 14), st.integers(0, 14))


def _run(spark, fn, node_ids, edges):
    nodes = spark.createDataFrame([(n,) for n in sorted(node_ids)],
                                  "node long")
    pairs = spark.createDataFrame(
        edges or [(0, 0)], "a long, b long"
    ).filter(F.col("a") != F.col("b"))
    out = fn(nodes, pairs, node_col="node")
    return {r.node: r.cluster_id for r in out.collect()}


@settings(max_examples=15, deadline=None)
@given(edges=st.lists(_edge, min_size=0, max_size=12))
def test_star_matches_min_label_on_random_graphs(spark, edges):
    node_ids = {n for e in edges for n in e} | {0, 14}
    a = _run(spark, connected_components, node_ids, edges)
    b = _run(spark, connected_components_star, node_ids, edges)
    assert a == b


def test_star_contracts_a_long_chain(spark):
    n = 40
    edges = [(i, i + 1) for i in range(n)]
    got = _run(spark, connected_components_star, set(range(n + 1)), edges)
    assert set(got.values()) == {0} and len(got) == n + 1


def test_star_handles_celebrity_hub(spark):
    # one canonical doc paired with every copy — a single high-degree
    # node; no neighborhood array is ever materialized.
    edges = [(0, i) for i in range(1, 60)]
    got = _run(spark, connected_components_star, set(range(60)), edges)
    assert set(got.values()) == {0}


def test_star_labels_only_supplied_nodes(spark):
    """Pair endpoints absent from `nodes` must not appear in the output
    — the contract shared with connected_components."""
    from sumologic_aws_lambda_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    nodes = spark.createDataFrame([(1,), (2,), (9,)], "node long")
    # edge 2~5 references node 5, which is not in `nodes`
    pairs = spark.createDataFrame([(1, 2), (2, 5)], "a long, b long")
    star = {(r.node, r.cluster_id)
            for r in connected_components_star(nodes, pairs).collect()}
    base = {(r.node, r.cluster_id)
            for r in connected_components(nodes, pairs).collect()}
    assert {n for n, _ in star} == {1, 2, 9}
    assert star == base


def test_star_no_label_relay_through_foreign_nodes(spark):
    """A foreign endpoint must not RELAY labels between member nodes
    either (r15: the star engine now pre-filters pairs to member
    endpoints exactly like connected_components, instead of only
    semi-joining the output — which hid the phantom rows but kept the
    relay connectivity)."""
    nodes = spark.createDataFrame([(2,), (7,)], "node long")
    # 2~5~7 with 5 absent from `nodes`: 2 and 7 must stay separate
    pairs = spark.createDataFrame([(2, 5), (5, 7)], "a long, b long")
    star = {(r.node, r.cluster_id)
            for r in connected_components_star(nodes, pairs).collect()}
    base = {(r.node, r.cluster_id)
            for r in connected_components(nodes, pairs).collect()}
    assert star == base == {(2, 2), (7, 7)}


def test_min_label_components_handle_string_ids(spark):
    """md5-fingerprint node ids (strings) are the natural dedup key —
    the convergence check must not cast labels to numbers."""
    from sumologic_aws_lambda_spark.operators.dedup import (
        connected_components,
    )

    # a 7-node chain: needs several rounds, exercising the signature
    names = [f"n{i}" for i in range(7)]
    nodes = spark.createDataFrame([(n,) for n in names], "node string")
    pairs = spark.createDataFrame(
        [(names[i], names[i + 1]) for i in range(6)], "a string, b string")
    out = {r.node: r.cluster_id
           for r in connected_components(nodes, pairs).collect()}
    assert set(out.values()) == {"n0"}          # one cluster, min label
