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
