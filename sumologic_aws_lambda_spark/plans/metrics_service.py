"""Metrics query service: the single-shot metrics API twin (SURVEY §3.3).

Reference surface (``sumologic-app-utils/src/sumologic.py:185-202``):
``POST /metrics/results`` with ``{query: [{rowId, query}], startTime,
endTime, requestedDataPoints, maxDataPoints}`` → per-row time series.
Selectors are the metric-rule match language (``account=x Name=*`` —
``sumoresource.py:959-988``).

Spark-first shape: one DataFrame of (ts, metric, dims map, value); each
row's selector compiles to a Column predicate; quantization is pure
epoch arithmetic (``floor(epoch / interval) * interval``) so the same
plan runs in batch and under Structured Streaming, and any engine can
reproduce the buckets (no window-origin alignment questions).  All rows
of one request run in ONE pass: selectors become a ``rowId`` tag array +
explode, so N queries cost one scan, not N.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MetricsQuery:
    row_id: str          # "A", "B", ...
    selector: str        # 'metric=cpu host=web-*' match expression


def selector_predicate(selector: str, metric_col: str = "metric",
                       dims_col: str = "dims") -> Column:
    """``metric=cpu host=web-*`` → boolean Column.  Bare ``metric=`` keys
    hit the metric-name column; anything else matches ``dims[key]``;
    trailing ``*`` is a prefix wildcard (``sumoresource.py:959-988``)."""
    pred = F.lit(True)
    for term in selector.split():
        if "=" not in term:
            raise ValueError(f"bad selector term {term!r}")
        k, v = term.split("=", 1)
        col = F.col(metric_col) if k == "metric" else F.col(dims_col)[k]
        if v.endswith("*"):
            pred = pred & col.startswith(v[:-1])
        else:
            pred = pred & (col == v)
    return pred


def quantize_interval(start_epoch: int, end_epoch: int,
                      requested_datapoints: int,
                      max_datapoints: int = 800) -> int:
    """Bucket width in seconds: honor requestedDataPoints but never
    exceed maxDataPoints (the API's two knobs)."""
    span = max(1, end_epoch - start_epoch)
    points = min(max(1, requested_datapoints), max_datapoints)
    return max(1, math.ceil(span / points))


def metrics_results(df: DataFrame, queries: list[MetricsQuery],
                    start_epoch: int, end_epoch: int,
                    requested_datapoints: int = 100,
                    max_datapoints: int = 800,
                    ts_col: str = "ts", metric_col: str = "metric",
                    dims_col: str = "dims",
                    value_col: str = "value") -> DataFrame:
    """All request rows in one scan → (row_id, metric, bucket_start,
    avg/min/max/count).  ``bucket_start`` is epoch seconds (long)."""
    interval = quantize_interval(start_epoch, end_epoch,
                                 requested_datapoints, max_datapoints)
    epoch = F.unix_timestamp(ts_col)
    tags = F.array(*[
        F.when(selector_predicate(q.selector, metric_col, dims_col),
               F.lit(q.row_id))
        for q in queries
    ])
    return (
        df.filter((epoch >= start_epoch) & (epoch < end_epoch))
        .withColumn("row_id", F.explode(F.array_compact(tags)))
        # Buckets align to START_EPOCH, not epoch zero: zero-aligned
        # buckets straddle the range ends when start is not a multiple
        # of the interval, yielding maxDataPoints+1 distinct buckets —
        # above the cap quantize_interval promises.  Start-aligned,
        # bucket count is exactly ceil(span/interval) <= points.
        .withColumn(
            "bucket_start",
            (F.lit(start_epoch)
             + F.floor((epoch - start_epoch) / interval) * interval)
            .cast("long"),
        )
        .groupBy("row_id", metric_col, "bucket_start")
        .agg(
            F.avg(value_col).alias("avg_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def to_api_response(result_rows: list, metric_col: str = "metric") -> dict:
    """Shape collected rows like the API response: one entry per rowId
    with parallel timestamp/value arrays (sorted by bucket)."""
    by_row: dict[str, dict[str, list]] = {}
    for r in sorted(result_rows,
                    key=lambda r: (r["row_id"], r[metric_col],
                                   r["bucket_start"])):
        series = by_row.setdefault(r["row_id"], {}).setdefault(
            r[metric_col], {"timestamps": [], "values": []}
        )
        series["timestamps"].append(r["bucket_start"])
        series["values"].append(r["avg_value"])
    return {
        "response": [
            {
                "rowId": row_id,
                "results": [
                    {"metric": m, "datapoints": dp}
                    for m, dp in metrics.items()
                ],
            }
            for row_id, metrics in by_row.items()
        ]
    }
