"""Chunked API delivery (A5/S14): fixed-size batching + accounting."""

from __future__ import annotations

from sumologic_aws_lambda_spark.streaming.api_sink import deliver_in_chunks


def test_chunking_and_counts(spark):
    df = spark.range(0, 47).withColumnRenamed("id", "v").repartition(3)

    def send(chunk):
        assert len(chunk) <= 20
        # simulate a partial-failure API: rows divisible by 10 fail
        return sum(1 for r in chunk if r["v"] % 10 != 0)

    summary = deliver_in_chunks(df, send, chunk_size=20).collect()
    assert sum(r.sent for r in summary) == 47 - 5     # 0,10,20,30,40 fail
    assert sum(r.failed for r in summary) == 5
    assert all(r.chunks >= 1 for r in summary if r.sent + r.failed > 0)


def test_send_exception_counts_whole_chunk(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "v").coalesce(1)

    def send(chunk):
        raise IOError("api down")

    summary = deliver_in_chunks(df, send, chunk_size=4).collect()
    assert sum(r.failed for r in summary) == 10
    assert sum(r.sent for r in summary) == 0


def test_delivery_is_eager_and_exactly_once_per_call(spark):
    """Round-10 streaming review: delivery must not be a side effect
    of a lazy RDD — zero sends if the accounting frame is unused, one
    duplicate delivery per extra action on it."""
    import json as _json
    import os as _os
    import tempfile as _tf

    from sumologic_aws_lambda_spark.streaming.api_sink import (
        deliver_in_chunks,
    )

    d = _tf.mkdtemp()
    marker = _os.path.join(d, "calls")

    def send(chunk):
        # executor-side: append one line per call to a shared file
        with open(marker, "a") as f:
            f.write(_json.dumps(len(chunk)) + "\n")
        return len(chunk)

    df = spark.range(10).withColumnRenamed("id", "doc_id").coalesce(1)
    summary = deliver_in_chunks(df, send, chunk_size=4)
    # acting on the accounting frame twice must not re-deliver
    assert summary.count() == 1
    total = summary.groupBy().sum("sent").collect()[0][0]
    assert total == 10
    with open(marker) as f:
        calls = f.readlines()
    assert len(calls) == 3  # ceil(10/4) chunks, delivered exactly once
