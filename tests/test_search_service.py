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
