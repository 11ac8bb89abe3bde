"""Property tests for the behavior operators: pure-Python replays of
the ordered funnel and path n-gram counting must agree with the
DataFrame plans on arbitrary event sequences."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from sumologic_aws_lambda_spark.operators.behavior import (
    funnel_stage_times,
    path_ngram_counts,
)

_STAGES = ("signup", "click", "purchase")

# (user_id, event_id, event_type, ts_seconds) — tight ranges force
# collisions: repeated stages, shared timestamps, interleaved users.
_events = st.lists(
    st.tuples(
        st.integers(1, 3),
        st.integers(0, 99),
        st.sampled_from(_STAGES + ("view",)),
        st.integers(0, 20),
    ),
    min_size=1, max_size=15,
    unique_by=lambda e: e[1],
)


def py_funnel(events):
    """Straight-line replay of funnel_stage_times: stage i's time is
    the min event time strictly after stage i-1's, per user."""
    out = {}
    by_user: dict[int, list] = {}
    for u, _i, et, ts in events:
        by_user.setdefault(u, []).append((et, ts))
    for u, evs in by_user.items():
        t1 = min((ts for et, ts in evs if et == "signup"), default=None)
        if t1 is None:
            continue
        t2 = min((ts for et, ts in evs if et == "click" and ts > t1),
                 default=None)
        t3 = None
        if t2 is not None:
            t3 = min((ts for et, ts in evs
                      if et == "purchase" and ts > t2), default=None)
        out[u] = (t1, t2, t3)
    return out


def py_trigrams(events, n=3):
    paths: dict[str, int] = {}
    by_user: dict[int, list] = {}
    for u, i, et, ts in events:
        by_user.setdefault(u, []).append((ts, i, et))
    for evs in by_user.values():
        seq = [et for _ts, _i, et in sorted(evs)]
        for k in range(len(seq) - n + 1):
            p = ">".join(seq[k:k + n])
            paths[p] = paths.get(p, 0) + 1
    return paths


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_events)
def test_funnel_stage_times_matches_python(spark, events):
    df = spark.createDataFrame(
        [(u, i, et, float(ts)) for u, i, et, ts in events],
        "user_id int, event_id int, event_type string, ts double",
    )
    rows = funnel_stage_times(df).collect()
    got = {r.user_id: (r.t1, r.t2, r.t3) for r in rows}
    assert got == py_funnel(events)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_events)
def test_path_trigram_counts_match_python(spark, events):
    df = spark.createDataFrame(
        events,
        "user_id int, event_id int, event_type string, ts long",
    )
    rows = path_ngram_counts(df, n=3).collect()
    got = {r.path: r.n for r in rows}
    assert got == py_trigrams(events)


def test_path_ngram_counts_rejects_n_below_2(spark):
    """ADVICE r6: n=1 used to die on an unresolved 'p0' column — now a
    clear ValueError at entry."""
    import pytest

    from sumologic_aws_lambda_spark.operators.behavior import (
        path_ngram_counts,
    )

    df = spark.createDataFrame(
        [("u", 1, 1, "a")], "user_id string, ts long, event_id long, "
        "event_type string")
    with pytest.raises(ValueError, match="n must be|n >= 2|n=1"):
        path_ngram_counts(df, n=1)
