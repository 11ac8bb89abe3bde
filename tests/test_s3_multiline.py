"""S3 line source + multiline assembly (T9)."""

from __future__ import annotations

import gzip

from sumologic_aws_lambda_spark.sources.s3 import (
    assemble_multiline,
    read_s3_lines,
    read_s3_objects,
)

LOG = (
    "2024-03-01 10:00:00 INFO starting up\n"
    "2024-03-01 10:00:01 ERROR boom\n"
    "Traceback (most recent call last):\n"
    '  File "app.py", line 1\n'
    "ValueError: nope\n"
    "2024-03-01 10:00:02 INFO recovered\n"
)


def test_gz_codec_inference(spark, tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    (d / "a.log").write_text("plain line 1\nplain line 2\n")
    (d / "b.log.gz").write_bytes(gzip.compress(b"gz line 1\n"))
    rows = read_s3_lines(spark, str(d)).collect()
    msgs = {r.message for r in rows}
    assert {"plain line 1", "plain line 2", "gz line 1"} <= msgs
    assert all(r.s3_key for r in rows)


def test_multiline_assembly(spark, tmp_path):
    d = tmp_path / "objs"
    d.mkdir()
    (d / "app.log").write_text(LOG)
    out = assemble_multiline(read_s3_objects(spark, str(d)))
    recs = [r.message for r in
            sorted(out.collect(), key=lambda r: r.record_index)]
    assert len(recs) == 3
    assert recs[0] == "2024-03-01 10:00:00 INFO starting up"
    assert recs[1].startswith("2024-03-01 10:00:01 ERROR boom\nTraceback")
    assert recs[1].endswith("ValueError: nope")
    assert recs[2] == "2024-03-01 10:00:02 INFO recovered"


def test_multiline_leading_continuation_kept(spark, tmp_path):
    d = tmp_path / "objs2"
    d.mkdir()
    (d / "weird.log").write_text(
        "orphan continuation\n2024-03-01 11:00:00 INFO ok\n"
    )
    out = assemble_multiline(read_s3_objects(spark, str(d)))
    recs = [r.message for r in
            sorted(out.collect(), key=lambda r: r.record_index)]
    assert recs == ["orphan continuation", "2024-03-01 11:00:00 INFO ok"]
