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
