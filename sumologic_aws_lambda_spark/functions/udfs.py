"""User-defined-function surface (SURVEY §2.10).

The reference's extension points map to three Spark shapes:

- record→record transform Lambda (S8) → scalar ``pandas_udf`` /
  ``mapInPandas`` (see ``functions/codecs.gunzip_udf`` and
  ``operators/multimodal.extract_features``);
- FER parse expressions → compiled Column expressions, NOT UDFs
  (``plans/sumoql.py``);
- custom aggregations → ``pandas_udf`` GROUPED_AGG, demonstrated here.

Keep this file small on purpose: UDFs are the slow path; anything
expressible with built-ins lives as Column expressions elsewhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


@F.pandas_udf(DoubleType())
def geometric_mean_udf(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: exp(mean(ln(x))) over positive values.

    Arrow-batched; Spark runs it as partial batches per group partition —
    for a 100 TB groupBy prefer the algebraic identity
    ``exp(avg(ln(x)))`` with built-ins (that's what the oracle uses);
    this exists to exercise the UDAF extension point.
    """
    arr = v.to_numpy(dtype="float64")
    arr = arr[arr > 0]
    if arr.size == 0:
        return float("nan")
    return float(np.exp(np.log(arr).mean()))
