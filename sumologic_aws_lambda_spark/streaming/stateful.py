"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.10 / task north-star: custom stateful operators).

The built-in surface covers the reference's needs (watermarked windows,
``session_window``); this module is the extension point for state the
built-ins can't express — demonstrated with a cross-batch running
per-key aggregate (the streaming generalization of the reference's
per-invoke ``lastRequestID``-style mutable state, but durable across
micro-batches via the state store).

Scale notes: state is partitioned by key in the state store (RocksDB in
production configs), checkpointed with the query; the pandas function
sees one key group per call with Arrow-batched rows.  Use
``GroupStateTimeout`` to bound state for keys that go quiet.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "key bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _running_totals_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"key": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_totals(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Cross-batch running (count, sum) per key.  Each micro-batch emits
    the updated cumulative row for keys seen in that batch."""
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_SCHEMA = (
    "user_id bigint, stage int, signup_s bigint, click_s bigint, "
    "purchase_s bigint"
)
FUNNEL_STATE_SCHEMA = "stage int, t1 bigint, t2 bigint, t3 bigint"

_FUNNEL_STAGES = ("signup", "click", "purchase")


def _funnel_fn(key: tuple, pdfs, state: GroupState):
    """Per-user ordered-funnel state machine (batch analog:
    ``queries/behavior.py::event_funnel_conversion``): advance
    signup → click → purchase only on events strictly later than the
    previous stage's completion time.  State is four scalars per user,
    durable across micro-batches."""
    stage, t1, t2, t3 = state.get if state.exists else (0, -1, -1, -1)
    rows = []
    # A group larger than one Arrow batch arrives as several chunks in
    # arrival order — concatenate FIRST, then sort once, or the
    # (epoch_s, event_id) ordering only holds within each chunk.
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch):
        batch = batch.sort_values(["epoch_s", "event_id"])
        for _, r in batch.iterrows():
            et, es = r["event_type"], int(r["epoch_s"])
            if stage == 0 and et == "signup":
                stage, t1 = 1, es
            elif stage == 1 and et == "click" and es > t1:
                stage, t2 = 2, es
            elif stage == 2 and et == "purchase" and es > t2:
                stage, t3 = 3, es
    state.update((stage, t1, t2, t3))
    rows.append({"user_id": key[0], "stage": stage,
                 "signup_s": t1, "click_s": t2, "purchase_s": t3})
    yield pd.DataFrame(rows)


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Streaming ordered funnel: one state row per user (4 scalars),
    key-partitioned in the state store, Arrow-batched per group.

    Input needs columns (user_id, event_id, event_type, epoch_s).
    Each micro-batch emits the user's current funnel row — 'update'
    output, so the sink sees monotone stage progression.  Within a
    micro-batch events are ordered by (epoch_s, event_id); across
    batches ordering follows arrival, the standard at-least-once
    streaming funnel semantics (late events that would have advanced a
    passed stage are ignored, exactly like the batch form's strict
    ordering).
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _funnel_fn,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


DECAY_SCHEMA = "key string, decayed_count double, last_epoch_s bigint"
DECAY_STATE_SCHEMA = "c double, last bigint"


def _decayed_counts_fn_factory(half_life_s: float):
    import math

    lam = math.log(2.0) / half_life_s

    def fn(key: tuple, pdfs, state: GroupState):
        # last = -1 means "no prior event"; epoch 0 is a valid time.
        c, last = state.get if state.exists else (0.0, -1)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values("epoch_s")
            for es, n in batch.groupby("epoch_s").size().items():
                if last >= 0:
                    c *= math.exp(-lam * max(0, int(es) - last))
                c += int(n)
                last = int(es)
        state.update((c, last))
        yield pd.DataFrame(
            {"key": [key[0]], "decayed_count": [c], "last_epoch_s": [last]}
        )

    return fn


def decayed_counts(events: DataFrame, half_life_s: float = 3600.0,
                   key_col: str = "key") -> DataFrame:
    """Exponentially-decayed per-key counts — the streaming
    heavy-hitters / "trending keys" state: each event adds 1, and mass
    halves every ``half_life_s`` of event time, so a key must keep
    producing to stay hot.  Input needs (key, epoch_s).

    State is two scalars per key in the state store; each micro-batch
    emits the updated decayed count for keys seen in that batch
    ('update' mode).  Top-k is the consumer's cheap final step over the
    keys-sized output.  Decay applies per distinct event second (counts
    within one second batch together), so replaying the same events in
    different micro-batch slicings converges to the same state.
    """
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            _decayed_counts_fn_factory(half_life_s),
            outputStructType=DECAY_SCHEMA,
            stateStructType=DECAY_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
