"""Search-job lifecycle: submit → poll → page messages/records → delete."""

from __future__ import annotations

import pytest

from sumologic_aws_lambda_spark.catalog import table
from sumologic_aws_lambda_spark.plans.search_service import (
    DONE,
    SearchJobService,
)
from sumologic_aws_lambda_spark.plans.sumoql import SumoSchema

from .conftest import SF_DIR

SCHEMA = SumoSchema(raw_col="props", ts_col="ts",
                    meta_cols={"_sourceCategory": "event_type"})


@pytest.fixture()
def service(spark):
    return SearchJobService(table(spark, SF_DIR, "events"), SCHEMA)


def test_full_lifecycle(service):
    job = service.search_job(
        '_sourceCategory=click | json "k" | count by k')
    st = service.wait(job, timeout=120)
    assert st["state"] == DONE
    assert st["messageCount"] > 0 and st["recordCount"] > 0
    # messages = raw pre-agg rows with _raw map
    msgs = service.messages(job, limit=5)
    assert len(msgs) == 5 and "_raw" in msgs[0]["map"]
    assert msgs[0]["map"]["_raw"].startswith("{")
    # records = aggregated rows
    recs = service.records(job, limit=1000)
    assert all("_count" in r["map"] for r in recs)
    assert sum(r["map"]["_count"] for r in recs) == st["messageCount"]
    service.delete(job)
    with pytest.raises(KeyError):
        service.status(job)


def test_time_bounds_and_paging(service):
    job = service.search_job("* | count", from_time="2024-01-10",
                             to_time="2024-01-11", sync=True)
    st = service.status(job)
    assert st["state"] == DONE
    total = service.records(job)[0]["map"]["_count"]
    assert 0 < total < 1000  # one day out of a month of events
    page1 = service.messages(job, limit=10, offset=0)
    page2 = service.messages(job, limit=10, offset=10)
    assert len(page1) == 10
    assert page1 != page2


def test_by_receipt_time_switches_time_column(spark):
    """byReceiptTime (``sumologic.py:96-99``) applies the range filter and
    newest-first message ordering to the receipt column, not event time."""
    from datetime import datetime

    rows = [
        # (id, event time, receipt time) — receipt order reverses event
        # order, and row 3's receipt falls outside the queried range.
        (1, datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 6, 0), "a"),
        (2, datetime(2024, 1, 1, 1, 0), datetime(2024, 1, 1, 5, 0), "b"),
        (3, datetime(2024, 1, 1, 2, 0), datetime(2024, 1, 2, 9, 0), "c"),
    ]
    df = spark.createDataFrame(
        rows, "id int, ts timestamp, rts timestamp, msg string")
    svc = SearchJobService(
        df, SumoSchema(raw_col="msg", ts_col="ts", receipt_col="rts"))

    by_event = svc.search_job("*", from_time="2024-01-01",
                              to_time="2024-01-02", sync=True)
    assert [m["map"]["id"] for m in svc.messages(by_event)] == [3, 2, 1]

    by_receipt = svc.search_job("*", from_time="2024-01-01",
                                to_time="2024-01-02",
                                by_receipt_time=True, sync=True)
    assert [m["map"]["id"] for m in svc.messages(by_receipt)] == [1, 2]


def test_by_receipt_time_requires_receipt_col(service):
    with pytest.raises(ValueError, match="receipt_col"):
        service.search_job("*", by_receipt_time=True)


def test_time_zone_shifts_bounds(spark):
    """timeZone interprets the wall-clock from/to strings: 00:30 UTC on
    Jan 2 is still Jan 1 in UTC-5, so a UTC-5 day-window excludes it."""
    from datetime import datetime

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 2, 0, 30), "x")],
        "id int, ts timestamp, msg string")
    svc = SearchJobService(df, SumoSchema(raw_col="msg", ts_col="ts"))

    utc = svc.search_job("* | count", from_time="2024-01-02",
                         to_time="2024-01-03", sync=True)
    assert svc.records(utc)[0]["map"]["_count"] == 1

    est = svc.search_job("* | count", from_time="2024-01-02",
                         to_time="2024-01-03", time_zone="America/New_York",
                         sync=True)
    assert svc.status(est)["recordCount"] in (0, 1)
    recs = svc.records(est)
    assert not recs or recs[0]["map"]["_count"] == 0


def test_failed_job_surfaces_error(service):
    job = service.search_job("* | frobnicate", sync=True)
    st = service.status(job)
    assert st["state"] == "FAILED" and "frobnicate" in st["error"]
    with pytest.raises(RuntimeError):
        service.records(job)


def test_search_with_lookup_and_top(spark):
    """Service jobs can use registered lookup tables; `top` counts as an
    aggregation stage, so messages = pre-top raw rows."""
    from sumologic_aws_lambda_spark.plans.search_service import (
        SearchJobService,
    )
    from sumologic_aws_lambda_spark.plans.sumoql import SumoSchema

    logs = spark.createDataFrame(
        [(1, "u1", "ERROR a"), (2, "u2", "ERROR b"), (3, "u1", "WARN c")],
        "id int, uid string, msg string",
    )
    users = spark.createDataFrame(
        [("u1", "alice"), ("u2", "bob")], "uid string, uname string"
    )
    svc = SearchJobService(
        logs, SumoSchema(raw_col="msg"), lookups={"users": users}
    )
    job = svc.search_job(
        "ERROR | lookup uname from users on uid | top 1 uname", sync=True
    )
    st = svc.status(job)
    assert st["state"] == "DONE GATHERING RESULTS"
    assert st["messageCount"] == 2          # pre-top rows, lookup applied
    recs = svc.records(job)
    assert recs[0]["map"]["uname"] == "alice" or recs[0]["map"]["_count"] == 1
    msgs = svc.messages(job)
    assert all("uname" in m["map"] for m in msgs)


def test_invalid_receipt_time_request_leaves_no_zombie_job(spark):
    from sumologic_aws_lambda_spark.plans.search_service import (
        SearchJobService,
    )

    df = spark.createDataFrame([("m", "2024-01-01 00:00:00")],
                               "msg string, ts string")
    svc = SearchJobService(
        df.withColumn("ts", df.ts.cast("timestamp")),
        SumoSchema(raw_col="msg", ts_col="ts", receipt_col=None))
    with pytest.raises(ValueError, match="receipt_col"):
        svc.search_job("* | count", by_receipt_time=True)
    assert svc._jobs == {}      # nothing registered for the failed submit
