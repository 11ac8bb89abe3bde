"""Webhook connections (``sumoresource.py:161``): payload templating,
delivery with retry, and connection CRUD on the CatalogStore."""

from __future__ import annotations

import json

from sumologic_aws_lambda_spark.provisioning import CatalogStore
from sumologic_aws_lambda_spark.streaming.webhook import (
    WebhookConnection,
    WebhookDeliverySink,
    render_payload,
)

TEMPLATE = (
    '{"Types":"{{Types}}","GeneratorID":"InsertFindingsScheduledSearch",'
    '"Severity":{{Severity}},"NumRawResults":"{{NumRawResults}}",'
    '"Rows":"{{Rows}}","Later":"{{NotMine}}"}'
)


def test_render_payload_double_encodes_rows():
    rows = [{"title": "Vulnerability", "resource_id": "10.178.11.43"}]
    body = render_payload(TEMPLATE, rows,
                          {"Types": "HIPAA Controls", "Severity": 30})
    doc = json.loads(body)                     # stays valid JSON
    assert doc["Types"] == "HIPAA Controls"
    assert doc["Severity"] == 30
    assert doc["NumRawResults"] == "1"
    # Rows is a JSON *string* embedding the rows — the reference's
    # defaultPayload shape, parseable by apigw_body_rows_parse (S9)
    assert json.loads(doc["Rows"]) == rows
    assert doc["Later"] == "{{NotMine}}"       # unknown vars left intact


def test_render_escapes_string_variables():
    body = render_payload('{"t":"{{T}}"}', [], {"T": 'say "hi"\n'})
    assert json.loads(body)["t"] == 'say "hi"\n'


def _sink(post, **kw):
    conn = WebhookConnection(
        name="securityhub", url="https://hooks.example.com/x",
        headers={"accessKey": "ak", "awsRegion": "us-east-1"},
        default_payload='{"NumRawResults":{{NumRawResults}},'
                        '"Rows":"{{Rows}}"}')
    return WebhookDeliverySink(conn, post, sleep=lambda s: None, **kw)


def test_sink_posts_rendered_batch(spark):
    calls = []
    sink = _sink(lambda url, body, headers: calls.append(
        (url, body, headers)))
    df = spark.createDataFrame(
        [(2, "b"), (1, "a")], "id int, name string")
    sink(df, batch_id=7)

    assert len(calls) == 1
    url, body, headers = calls[0]
    assert url == "https://hooks.example.com/x"
    assert headers["accessKey"] == "ak"
    doc = json.loads(body)
    assert doc["NumRawResults"] == 2
    # deterministic order regardless of input/partition order
    assert json.loads(doc["Rows"]) == [
        {"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    assert sink.reports[0].ok and sink.reports[0].attempts == 1


def test_sink_retries_then_reports_failure(spark):
    attempts = []

    def post(url, body, headers):
        attempts.append(1)
        raise RuntimeError("503")

    import pytest

    sink = _sink(post)
    df = spark.createDataFrame([(1,)], "id int")
    # no quarantine configured: exhaustion must RAISE (checkpoint must
    # not commit), never silently drop the notification
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        sink(df, batch_id=1)
    assert len(attempts) == 3                  # reference 3x linear backoff
    assert not sink.reports[0].ok and "503" in sink.reports[0].error


def test_sink_quarantines_on_exhaustion(spark, tmp_path):
    def post(url, body, headers):
        raise RuntimeError("503")

    sink = _sink(post)
    sink.quarantine_dir = str(tmp_path / "q")
    df = spark.createDataFrame([(7,)], "id int")
    sink(df, batch_id=2)                       # no raise: quarantined
    q = spark.read.parquet(str(tmp_path / "q" / "batch_id=2"))
    assert [r.id for r in q.collect()] == [7]


def test_sink_skips_empty_batch(spark):
    calls = []
    sink = _sink(lambda *a: calls.append(a))
    sink(spark.createDataFrame([], "id int"), batch_id=0)
    assert calls == [] and sink.reports == []


def test_connection_crud_round_trip(tmp_path):
    p = tmp_path / "cat.json"
    store = CatalogStore(str(p))
    c1 = store.create_connection(
        "pager", "https://hooks.example.com/p",
        headers={"accessKey": "ak"}, webhook_type="Webhook")
    assert store.create_connection(
        "pager", "https://other.example.com").connection_id \
        == c1.connection_id                    # name_already_exists → fetch

    store.update_connection(c1.connection_id,
                            url="https://hooks.example.com/v2")
    store2 = CatalogStore(str(p))              # persistence round-trip
    conns = store2.connections()
    assert [c.name for c in conns] == ["pager"]
    assert conns[0].url == "https://hooks.example.com/v2"
    assert conns[0].headers == {"accessKey": "ak"}

    store2.delete_connection(c1.connection_id)
    assert store2.connections() == []


def test_sink_tolerates_map_columns(spark):
    posts = []

    conn = WebhookConnection(
        name="c", url="https://x.example/hook",
        default_payload='{"n": {{NumRawResults}}}')
    sink = WebhookDeliverySink(conn, lambda u, b, h: posts.append(b))
    df = spark.createDataFrame(
        [(1, {"k": "v"})], "id int, attrs map<string,string>")
    sink(df, 0)
    assert posts and '"n": 1' in posts[0]


def test_webhook_quarantine_drained_by_webhook_sink(spark, tmp_path):
    """ADVICE r6: a webhook quarantine drained through drain_quarantine
    must be re-POSTed, not written out as NDJSON files.  A failing
    transport quarantines the batch; draining with a WebhookDeliverySink
    re-delivers it and empties the quarantine."""
    from sumologic_aws_lambda_spark.streaming.pipeline import (
        drain_quarantine,
    )

    q = tmp_path / "webhook_dlq"

    def bad_post(url, body, headers):
        raise RuntimeError("503")

    failing = _sink(bad_post, max_retries=2, quarantine_dir=str(q))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    failing(df, batch_id=3)
    assert (q / "batch_id=3").is_dir()
    assert not failing.reports[-1].ok

    posts = []
    drain = _sink(lambda url, body, headers: posts.append(body))
    reports = drain_quarantine(spark, str(q), sink=drain)
    assert len(posts) == 1                     # re-POSTed, not NDJSON'd
    body = json.loads(posts[0])
    assert json.loads(body["Rows"]) == [
        {"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    assert reports[-1].ok
    assert not (q / "batch_id=3").exists()     # delivered → dequarantined


def test_webhook_drain_transfers_ownership_to_drain_quarantine(
        spark, tmp_path):
    """A drain sink with its OWN quarantine dir re-quarantines a
    still-failing batch there and takes ownership: the source copy is
    RELEASED (keeping both would deliver the batch twice once the sink
    recovers — the round-10 ownership-transfer contract,
    ``streaming/pipeline.py::drain_quarantine``)."""
    from sumologic_aws_lambda_spark.streaming.pipeline import (
        drain_quarantine,
    )

    q = tmp_path / "webhook_dlq"
    q2 = tmp_path / "webhook_dlq2"

    def bad_post(url, body, headers):
        raise RuntimeError("503")

    failing = _sink(bad_post, max_retries=1, quarantine_dir=str(q))
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    failing(df, batch_id=0)

    drain = _sink(bad_post, max_retries=1, quarantine_dir=str(q2))
    drain_quarantine(spark, str(q), sink=drain)
    # ownership transferred: gone from the source, held by the drain sink
    assert not (q / "batch_id=0").exists()
    assert (q2 / "batch_id=0").is_dir()
    # the batch itself survives the transfer intact
    moved = spark.read.parquet(str(q2 / "batch_id=0"))
    assert [(r.id, r.name) for r in moved.collect()] == [(1, "a")]


def test_webhook_drain_keeps_still_failing_batch(spark, tmp_path):
    """A drain sink WITHOUT a quarantine dir persists nothing on
    failure (it raises), so the source copy must be KEPT for the next
    drain — releasing it would lose the batch entirely."""
    from sumologic_aws_lambda_spark.streaming.pipeline import (
        drain_quarantine,
    )

    q = tmp_path / "webhook_dlq"

    def bad_post(url, body, headers):
        raise RuntimeError("503")

    failing = _sink(bad_post, max_retries=1, quarantine_dir=str(q))
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    failing(df, batch_id=0)

    drain = _sink(bad_post, max_retries=1)     # no quarantine dir
    drain_quarantine(spark, str(q), sink=drain)
    assert (q / "batch_id=0").is_dir()         # kept for the next drain
