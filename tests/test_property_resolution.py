"""Property tests for blocked entity resolution and weighted reservoir
sampling: pure-Python references over arbitrary small inputs must agree
with the DataFrame plans."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st

from sumologic_aws_lambda_spark.queries.resolution import blocked_match


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def py_blocked_match(left: list[tuple[int, str]],
                     right: list[tuple[int, str]],
                     block_chars: int, max_distance: int):
    """Nested-loop reference with the same blocking restriction."""
    best: dict[int, tuple[int, int]] = {}
    for lid, lk in left:
        for rid, rk in right:
            if lk[-block_chars:] != rk[-block_chars:]:
                continue
            d = _lev(lk, rk)
            if d > max_distance:
                continue
            if lid not in best or (d, rid) < best[lid]:
                best[lid] = (d, rid)
    return {lid: (rid, d) for lid, (d, rid) in best.items()}


_keys = st.text(alphabet="ab1", min_size=2, max_size=5)
_side = st.lists(
    st.tuples(st.integers(0, 50), _keys), min_size=1, max_size=8,
    unique_by=lambda t: t[0],
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_side, _side, st.integers(0, 2))
def test_blocked_match_matches_nested_loop(spark, left, right, max_d):
    ldf = spark.createDataFrame(left, "lid int, lk string")
    rdf = spark.createDataFrame(right, "rid int, rk string")
    got = {
        r.lid: (r.rid, r.distance)
        for r in blocked_match(
            ldf, rdf, left_key="lk", right_key="rk",
            left_id="lid", right_id="rid",
            block_chars=2, max_distance=max_d,
        ).collect()
    }
    assert got == py_blocked_match(left, right, 2, max_d)


def _md5_u(doc_id: int) -> float:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return int(h[:8], 16) / 4294967296.0


def test_weighted_reservoir_matches_python(spark):
    """The A-ES draw is md5-deterministic, so a pure-Python replay of
    the exact formula must pick the same top-k in the same order."""
    from sumologic_aws_lambda_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    got = [r.doc_id for r in
           all_queries()["weighted_reservoir_sample"](spark, sf).collect()]

    import duckdb
    docs = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{sf}/documents.parquet'"
    ).fetchall()
    keyed = [
        (round(_md5_u(d) ** (1.0 / n), 9), d) for d, n in docs
    ]
    keyed.sort(key=lambda t: (-t[0], t[1]))
    assert got == [d for _, d in keyed[:25]]


def py_pagerank(edges: list[tuple[str, str, int]], iters: int = 3,
                d: float = 0.85) -> dict[str, float]:
    """Straight-line replay of operators/graph.py::pagerank."""
    out_tot: dict[str, int] = {}
    for s, _t, n in edges:
        out_tot[s] = out_tot.get(s, 0) + n
    probs = [(s, t, n / out_tot[s]) for s, t, n in edges]
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    nn = float(len(nodes))
    ranks = {v: 1.0 / nn for v in nodes}
    for _ in range(iters):
        dangling = sum(r for v, r in ranks.items() if v not in out_tot)
        incoming: dict[str, float] = {}
        for s, t, p in probs:
            incoming[t] = incoming.get(t, 0.0) + ranks[s] * p
        ranks = {
            v: (1.0 - d) / nn + d * (incoming.get(v, 0.0) + dangling / nn)
            for v in nodes
        }
    return ranks


_edges = st.lists(
    st.tuples(st.sampled_from("abcde"), st.sampled_from("abcde"),
              st.integers(1, 9)),
    min_size=1, max_size=10,
    unique_by=lambda e: (e[0], e[1]),
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_edges)
def test_pagerank_matches_python_power_iteration(spark, edges):
    from sumologic_aws_lambda_spark.operators.graph import pagerank

    df = spark.createDataFrame(
        edges, "src string, dst string, n_transitions long")
    got = {r.node: r.rank for r in pagerank(df, iterations=3).collect()}
    want = py_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
