"""Search-Job service: the query half's API surface (SURVEY §3.3).

Reproduces the lifecycle the reference drives against Sumo's API
(``sumologic-app-utils/src/sumologic.py:96-116``):

    job = search_job(query, from_time, to_time)   # POST /search/jobs
    status(job)        → {state, messageCount, recordCount}
                         states: GATHERING RESULTS → DONE GATHERING RESULTS
    messages(job, limit, offset)   # raw rows  (each with its _raw map)
    records(job, limit, offset)    # aggregated rows
    delete(job)        # DELETE /search/jobs/{id}

``messages`` vs ``records`` is the raw-vs-aggregate duality
(``sumologic.py:105-113``): both come from ONE compiled plan — messages
stop before the first aggregation stage, records run the whole pipeline.

Scale notes: the job runs as a background thread over a lazy plan;
results are fetched with ``limit(cap)`` so the driver never collects an
unbounded set — paging beyond the cap would re-run with a larger cap in a
real deployment (the reference pages the API the same way, W2).
"""

from __future__ import annotations

import threading
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sumoql import SumoSchema, _AGG_RE, _split_stages, compile_query

GATHERING = "GATHERING RESULTS"
DONE = "DONE GATHERING RESULTS"
FAILED = "FAILED"


def _pre_agg_query(query: str) -> str:
    """Truncate the pipeline just before its first aggregation stage —
    the 'messages' plan (raw rows feeding the aggregation)."""
    stages = _split_stages(query)
    kept = []
    for i, s in enumerate(stages):
        head = s.split(None, 1)[0].lower().rstrip(",")
        if i > 0 and (_AGG_RE.match(head) or head.startswith("percentile")
                      or head in ("timeslice", "top")):
            break
        kept.append(s)
    return " | ".join(kept)


@dataclass
class SearchJob:
    job_id: str
    query: str
    state: str = GATHERING
    message_count: int | None = None
    record_count: int | None = None
    error: str | None = None
    _messages: list = field(default_factory=list)
    _records: list = field(default_factory=list)
    _message_cols: list = field(default_factory=list)
    _record_cols: list = field(default_factory=list)


class SearchJobService:
    """In-process twin of the Search Job API over a bound DataFrame."""

    def __init__(self, df: DataFrame, schema: SumoSchema = SumoSchema(),
                 result_cap: int = 10_000,
                 lookups: dict[str, DataFrame] | None = None):
        self._df = df
        self._schema = schema
        self._cap = result_cap
        self._lookups = lookups or {}
        self._jobs: dict[str, SearchJob] = {}

    # -- lifecycle ---------------------------------------------------------

    def search_job(self, query: str, from_time=None, to_time=None,
                   time_zone: str = "UTC", by_receipt_time: bool = False,
                   sync: bool = False) -> str:
        """Submit; returns job id immediately (thread gathers results).

        Full parameter surface of the reference client's POST /search/jobs
        (``sumologic-app-utils/src/sumologic.py:96-99``):
        ``from_time``/``to_time`` bound the time column; ``time_zone``
        interprets those wall-clock strings (the API's ``timeZone``);
        ``by_receipt_time`` switches both the range filter and message
        ordering from event time to ingest time (``byReceiptTime``),
        requiring ``SumoSchema.receipt_col``.
        """
        # Validate BEFORE registering: raising after the insert would
        # leave a zombie job stuck in GATHERING in self._jobs forever.
        time_col = self._schema.ts_col
        if by_receipt_time:
            if not self._schema.receipt_col:
                raise ValueError(
                    "byReceiptTime requires SumoSchema.receipt_col")
            time_col = self._schema.receipt_col

        job = SearchJob(job_id=uuid.uuid4().hex[:16], query=query)
        self._jobs[job.job_id] = job

        df = self._df
        ts = F.col(time_col)

        def bound(v):
            # Interpret the wall-clock string in time_zone, then convert
            # to the UTC instant the data carries — string→NTZ keeps the
            # literal zone-free, to_utc_timestamp applies the zone.
            return F.to_utc_timestamp(
                F.lit(v).cast("timestamp_ntz"), time_zone)

        if from_time is not None:
            df = df.filter(ts >= bound(from_time))
        if to_time is not None:
            df = df.filter(ts < bound(to_time))

        def run() -> None:
            try:
                pre_agg = _pre_agg_query(query)
                messages_df = compile_query(df, pre_agg,
                                            self._schema, self._lookups)
                if time_col in messages_df.columns:
                    # The API returns messages newest-first on the active
                    # time column (event vs receipt per byReceiptTime).
                    messages_df = messages_df.orderBy(F.col(time_col).desc())
                msgs = messages_df.limit(self._cap).collect()
                if pre_agg == query:
                    # No aggregation stage: the records plan IS the
                    # messages plan — compiling and collecting it again
                    # would run the full scan+filter pipeline twice.
                    recs = msgs
                    records_df = messages_df
                else:
                    records_df = compile_query(df, query, self._schema,
                                               self._lookups)
                    recs = records_df.limit(self._cap).collect()
                job._messages = msgs
                job._records = recs
                job._message_cols = messages_df.columns
                job._record_cols = records_df.columns
                job.message_count = len(msgs)
                job.record_count = len(recs)
                job.state = DONE
            except Exception as exc:  # surfaced via status()
                job.error = str(exc)
                job.state = FAILED

        if sync:
            run()
        else:
            t = threading.Thread(target=run, daemon=True)
            t.start()
        return job.job_id

    def status(self, job_id: str) -> dict:
        job = self._job(job_id)
        return {
            "state": job.state,
            "messageCount": job.message_count,
            "recordCount": job.record_count,
            **({"error": job.error} if job.error else {}),
        }

    def wait(self, job_id: str, timeout: float = 300.0,
             poll: float = 0.1) -> dict:
        """Poll-to-DONE helper (the test loop in
        ``test-guardduty-benchmark.py:171-183``)."""
        import time

        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            st = self.status(job_id)
            if st["state"] in (DONE, FAILED):
                return st
            time.sleep(poll)
        raise TimeoutError(f"search job {job_id} still gathering")

    # -- result paging (W2: limit/offset, ``sumologic.py:105-113``) -------

    def messages(self, job_id: str, limit: int = 100,
                 offset: int = 0) -> list[dict]:
        """Raw rows; each exposes a ``map`` with ``_raw`` like the API's
        message shape (``test-guardduty-benchmark.py:184-190``)."""
        job = self._finished(job_id)
        out = []
        for row in job._messages[offset:offset + limit]:
            d = row.asDict(recursive=True)
            raw = d.get(self._schema.raw_col)
            out.append({"map": {"_raw": raw, **{
                k: v for k, v in d.items() if k != self._schema.raw_col
            }}})
        return out

    def records(self, job_id: str, limit: int = 100,
                offset: int = 0) -> list[dict]:
        """Aggregate rows (``records`` shape, ``sumologic.py:110-113``)."""
        job = self._finished(job_id)
        return [
            {"map": row.asDict(recursive=True)}
            for row in job._records[offset:offset + limit]
        ]

    def delete(self, job_id: str) -> None:
        self._jobs.pop(job_id, None)

    # -- internals ---------------------------------------------------------

    def _job(self, job_id: str) -> SearchJob:
        if job_id not in self._jobs:
            raise KeyError(f"no such search job: {job_id}")
        return self._jobs[job_id]

    def _finished(self, job_id: str) -> SearchJob:
        job = self._job(job_id)
        if job.state == FAILED:
            raise RuntimeError(f"search job failed: {job.error}")
        if job.state != DONE:
            raise RuntimeError("search job still gathering results")
        return job
