"""Kinesis Firehose transform stage (SURVEY §2.1 S8, §2.3 P9/P10).

Reference: ``kinesisfirehose-processor/kinesisfirehose-processor.js`` —
receive ``records[{recordId, data(base64)}]``, emit ``{recordId, result:
Ok|ProcessingFailed, data}`` (:30-57); the (disabled) JSON→``k=v`` line
flatten (:17-29) and the newline-append + re-encode (:9-15,38).

Spark-first: a status column computed in the same plan — failed rows are
routed by filter to the error sink, not thrown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kv_flatten(col) -> "F.Column":
    """P9: ``{k1:v1,k2:v2}`` → ``"k1=v1 k2=v2"`` (:17-29) — pure
    map_entries/transform, no UDF."""
    return F.concat_ws(
        " ",
        F.transform(
            F.map_entries(col),
            lambda e: F.concat(e.key, F.lit("="), e.value.cast("string")),
        ),
    )


def transform_records(df: DataFrame, data_col: str = "data",
                      flatten_json: bool = False) -> DataFrame:
    """S8/P10: decode base64 payload, optionally flatten JSON to k=v,
    append the ``\\n`` delimiter, re-encode; tag Ok/ProcessingFailed.

    A record fails when its payload is not decodable — the reference's
    try/catch per record (:32-55) becomes a VALIDATED decode chain,
    keeping the whole stage in codegen.  Validation must be explicit:
    Spark's ``unbase64`` is lenient (commons-codec silently discards
    non-alphabet characters) and ``decode(…, 'UTF-8')`` substitutes
    malformed bytes, so without the alphabet/padding check a garbage
    payload would decode to mojibake and be delivered as Ok where the
    reference's ``Buffer.from(..., 'base64')`` + try/catch tags it
    ProcessingFailed.
    """
    is_b64 = (
        F.col(data_col).isNotNull()
        & F.regexp_replace(F.col(data_col), r"\s+", "")
        .rlike("^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|"
               "[A-Za-z0-9+/]{3}=)?$")
    )
    decoded = F.when(is_b64, F.decode(F.unbase64(F.col(data_col)), "UTF-8"))
    if flatten_json:
        parsed = F.from_json(decoded, "map<string,string>")
        payload = F.when(parsed.isNotNull(), kv_flatten(parsed)).otherwise(decoded)
    else:
        payload = decoded
    out = F.concat(payload, F.lit("\n"))
    return (
        df.withColumn("_decoded", payload)
        .withColumn(
            "result",
            F.when(F.col("_decoded").isNull(), "ProcessingFailed").otherwise("Ok"),
        )
        .withColumn(
            "data_out",
            F.when(F.col("result") == "Ok", F.base64(F.encode(out, "UTF-8"))),
        )
        .drop("_decoded")
    )
