"""S3 object source + multiline assembly (SURVEY §2.1 S3, §2.8 T9).

Reference: ``s3/node.js/s3.js:17-87`` streams an S3 object, gunzips when
the key matches ``/\\.gz$/`` (:35-37), and emits line-wise records; source
configs carry ``multilineProcessingEnabled`` / ``useAutolineMatching`` /
a boundary regex (``sumoresource.py:287-291``) — continuation lines (e.g.
stack traces) must be folded into their parent record.

Spark-first:

- Line-wise + gz: ``spark.read.text`` — codec inference replaces the key
  sniff entirely.
- Multiline assembly is order-sensitive *within a file*, so it follows
  the CWL carry-forward pattern: read ``wholetext``, split to a line
  array, fold boundaries inside the row (narrow, no shuffle, no window),
  explode assembled records.  At 100 TB each task handles whole objects —
  exactly how the reference Lambda consumed them one object at a time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Default boundary: a line starting with an ISO-ish timestamp begins a new
# record (the shape Sumo's autoline matching infers for app logs).
DEFAULT_BOUNDARY_RE = r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}"


def read_s3_lines(spark: SparkSession, path: str) -> DataFrame:
    """S3: one row per line; .gz handled natively by codec inference."""
    return (
        spark.read.text(path)
        .withColumnRenamed("value", "message")
        .withColumn("s3_key", F.input_file_name())
    )


def read_s3_objects(spark: SparkSession, path: str) -> DataFrame:
    """One row per object (wholetext) — the multiline-assembly input."""
    return (
        spark.read.text(path, wholetext=True)
        .withColumnRenamed("value", "content")
        .withColumn("s3_key", F.input_file_name())
    )


def assemble_multiline(objects: DataFrame,
                       boundary_re: str = DEFAULT_BOUNDARY_RE,
                       content_col: str = "content") -> DataFrame:
    """T9: fold continuation lines into their boundary line's record.

    A line matching ``boundary_re`` starts a new record; every other line
    is appended (newline-joined) to the current one.  Leading
    continuation lines with no parent start their own record (nothing is
    dropped).  Implemented as an array fold per object — the same
    narrow, streaming-safe shape as the CWL requestID carry-forward.
    """
    # Trailing newline(s) would otherwise append an empty continuation
    # line to the last record.
    lines = F.split(F.regexp_replace(F.col(content_col), r"\n+$", ""), "\n")
    folded = F.aggregate(
        lines,
        F.array().cast("array<string>"),
        lambda acc, line: F.when(
            line.rlike(boundary_re) | (F.size(acc) == F.lit(0)),
            F.concat(acc, F.array(line)),
        ).otherwise(
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.concat(F.element_at(acc, -1), F.lit("\n"), line)
                ),
            )
        ),
    )
    return (
        objects.withColumn("_records", folded)
        .select(
            "s3_key",
            F.posexplode("_records").alias("record_index", "message"),
        )
        # rlike, not trim(): Spark's trim strips only spaces, so a
        # record assembled purely from empty lines ('\n') would survive
        # while the reference loop's .strip() drops it.
        .filter(~F.col("message").rlike(r"^\s*$"))
    )
