"""Streaming multiline assembly: custom stateful operator with a
cross-batch buffer and a quiet-stream flush timeout.

The batch twin lives in ``sources/s3.py::assemble_multiline`` (per-object
array fold).  In a *stream* the lines of one log entry can straddle
micro-batches — e.g. a stack trace whose frames arrive a trigger later —
so the fold's accumulator must survive batches.  That is exactly the
reference's tailing semantics: ``s3/node.js/s3.js:17-87`` emits line-wise
records while source configs carry ``multilineProcessingEnabled`` and a
boundary regex (``sumoresource.py:287-291``); a dangling entry is flushed
on timeout rather than held forever.

Two implementations of the same operator:

- ``assemble_multiline_stream`` — ``applyInPandasWithState`` with
  ``GroupStateTimeout.ProcessingTimeTimeout``: the buffer is the group
  state, ``state.hasTimedOut`` drives the quiet-stream flush.  This is
  the **tested** path (no extra deps).
- ``MultilineAssembler`` — the same logic as a Spark 4
  ``StatefulProcessor`` for ``transformWithStateInPandas`` (typed value
  state + explicit timers).  The TWS python workers require
  ``google.protobuf``, which this container does not ship, so the class
  is import-gated and exercised only where protobuf exists
  (``tests/test_assembler.py`` skips it accordingly).

Scale notes: state is one (first_seq, joined-lines) row per *stream*,
not per line — O(active streams), RocksDB-backed in production configs.
Each key group arrives Arrow-batched; per-key work is a linear scan of
that batch's lines.  No shuffle beyond the groupBy(stream) the operator
needs anyway.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.s3 import DEFAULT_BOUNDARY_RE

OUTPUT_SCHEMA = "stream_id string, first_seq bigint, entry string, n_lines bigint"
_STATE_SCHEMA = "first_seq bigint, lines string"


def _entry_row(key: str, first_seq: int, lines: list[str]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "stream_id": [key],
            "first_seq": [first_seq],
            "entry": ["\n".join(lines)],
            "n_lines": [len(lines)],
        }
    )


def assemble_multiline_stream(lines: DataFrame,
                              boundary_re: str = DEFAULT_BOUNDARY_RE,
                              flush_after_ms: int = 60_000) -> DataFrame:
    """Streaming multiline assembly: input schema
    ``stream_id string, seq bigint, line string`` (seq orders lines
    within a stream), output one row per assembled entry.

    A line matching ``boundary_re`` closes the buffered entry and starts
    a new one; continuation lines append.  A stream quiet for
    ``flush_after_ms`` of processing time has its dangling entry flushed
    via the state timeout — state stays O(active streams).
    """
    pat = re.compile(boundary_re)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            first_seq, joined = state.get
            state.remove()
            yield _entry_row(key[0], first_seq, joined.split("\n"))
            return
        if state.exists:
            first_seq, joined = state.get
            cur: list[str] = joined.split("\n")
        else:
            first_seq, cur = -1, []
        batch = pd.concat(list(pdfs))
        # a null seq (missing field) arrives as NaN in the Arrow float
        # column and int(NaN) would kill the query — the same
        # poison-pill class as the null-line guard below.  Pin such
        # rows to -1 so they sort first, deterministically (round-10
        # streaming review).
        batch["seq"] = batch["seq"].fillna(-1)
        batch = batch.sort_values("seq")
        for seq, line in zip(batch["seq"], batch["line"]):
            # a null line (e.g. a json row missing the field) must not
            # poison the query: pat.match(None) raises TypeError and the
            # failed task is re-read forever.  Treat it as empty.
            line = line if isinstance(line, str) else ""
            if pat.match(line) and cur:
                yield _entry_row(key[0], first_seq, cur)
                first_seq, cur = int(seq), [line]
            elif not cur:
                # leading continuation with no parent starts its own
                # entry (the batch twin drops nothing either)
                first_seq, cur = int(seq), [line]
            else:
                cur.append(line)
        state.update((first_seq, "\n".join(cur)))
        state.setTimeoutDuration(flush_after_ms)

    return lines.groupBy("stream_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


try:  # the class itself imports WITHOUT protobuf — only the TWS
    # state-server runtime needs it, so the processor's logic is unit-
    # tested through a fake handle (tests/test_assembler.py) and the
    # ImportError arm below is for older PySpark without the module
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    class MultilineAssembler(StatefulProcessor):
        """``transformWithStateInPandas`` form of the same operator:
        typed value state + explicit processing-time timers.  Use
        ``lines.groupBy("stream_id").transformWithStateInPandas(
        MultilineAssembler(), OUTPUT_SCHEMA, "append",
        "ProcessingTime")`` on clusters whose python workers have
        ``google.protobuf`` (the TWS state-server protocol needs it;
        this container does not ship it)."""

        def __init__(self, boundary_re: str = DEFAULT_BOUNDARY_RE,
                     flush_after_ms: int = 60_000) -> None:
            self._boundary_re = boundary_re
            self._flush_after_ms = flush_after_ms

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._buf = handle.getValueState("buf", _STATE_SCHEMA)
            self._handle = handle

        def handleInputRows(self, key, rows, timerValues: TimerValues
                            ) -> Iterator[pd.DataFrame]:
            pat = re.compile(self._boundary_re)
            if self._buf.exists():
                first_seq, joined = self._buf.get()
                cur: list[str] = joined.split("\n")
            else:
                first_seq, cur = -1, []
            batch = pd.concat(list(rows))
            batch["seq"] = batch["seq"].fillna(-1)  # null-seq guard
            batch = batch.sort_values("seq")
            for seq, line in zip(batch["seq"], batch["line"]):
                line = line if isinstance(line, str) else ""  # null guard
                if pat.match(line) and cur:
                    yield _entry_row(key[0], first_seq, cur)
                    first_seq, cur = int(seq), [line]
                elif not cur:
                    first_seq, cur = int(seq), [line]
                else:
                    cur.append(line)
            self._buf.update((first_seq, "\n".join(cur)))
            # TWS timers ACCUMULATE per expiry timestamp (unlike the
            # GroupState twin's setTimeoutDuration, which resets): drop
            # the previous timer before arming the new one, or a stale
            # timer fires mid-stream and flushes a growing entry early.
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs()
                + self._flush_after_ms
            )

        def handleExpiredTimer(self, key, timerValues: TimerValues,
                               expiredTimerInfo: ExpiredTimerInfo
                               ) -> Iterator[pd.DataFrame]:
            if self._buf.exists():
                first_seq, joined = self._buf.get()
                self._buf.clear()
                yield _entry_row(key[0], first_seq, joined.split("\n"))

        def close(self) -> None:
            pass

except ImportError:  # pragma: no cover
    MultilineAssembler = None  # type: ignore[assignment]
