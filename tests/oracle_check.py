"""Local replica of the driver's Spark-vs-DuckDB comparison.

Sorts columns by name, canonicalizes values (floats → repr of rounded
double, timestamps → isoformat, None → sentinel), sorts rows, compares
multisets.  Used by tests so a driver-side hash mismatch never surprises
us.
"""

from __future__ import annotations

import datetime
import math
from typing import Any


def _canon(v: Any) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, duck_rel) -> tuple[bool, str]:
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = [c.lower() for c in duck_rel.columns]
    d_rows = duck_rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    cs, cd = canonical_rows(s_cols, s_rows), canonical_rows(d_cols, d_rows)
    if cs != cd:
        diff_s = [r for r in cs if r not in set(cd)][:5]
        diff_d = [r for r in cd if r not in set(cs)][:5]
        return False, f"value mismatch: spark-only={diff_s} duck-only={diff_d}"
    return True, "ok"
