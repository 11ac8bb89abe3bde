"""Decode/decompress column functions (SURVEY §2.2 D1-D4).

base64 and charset decode are built-in expressions; gzip-of-a-column has no
Spark expression (file-level gzip is native), so it is the one place the
engine drops to an Arrow-batched pandas UDF — the reference's streaming
gunzip (``cloudwatchlogs-with-dlq/sumo-dlq-function-utils/lib/utils.js:
45-61``) explicitly handles multi-member gzip concatenation, which Python's
``gzip.decompress`` also does (it iterates members), unlike raw zlib.
"""

from __future__ import annotations

import gzip

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType


@F.pandas_udf(BinaryType())
def gunzip_udf(data: pd.Series) -> pd.Series:
    """Vectorized gzip decompress of a binary column (D2).

    Multi-member safe; null-in → null-out; non-gzip bytes pass through
    unchanged (mirrors the reference's sniff-then-passthrough for non-.gz
    S3 objects, ``s3/node.js/s3.js:35-37``).
    """

    def _one(b):
        if b is None:
            return None
        if len(b) >= 2 and b[0] == 0x1F and b[1] == 0x8B:
            try:
                return gzip.decompress(bytes(b))
            except (OSError, EOFError):
                # Truncated/corrupt member behind a valid magic: return
                # None so the pipeline's null-drop / DLQ path routes the
                # record (reference per-record try/catch,
                # cloudwatchlogs_lambda.js:166-175).  Raising here is a
                # poison pill — Spark retries the same split and the
                # whole stream wedges on one bad envelope.
                return None
        return bytes(b)

    return data.map(_one)


# Marked non-deterministic (it IS deterministic — this is purely an
# optimizer fence, guide §4.4): the CWL pipeline filters on
# envelope.messageType, a column derived from this UDF, and predicate
# pushdown cloned the whole decode below the pushed filter — TWO
# ArrowEvalPython stages per query, every payload gunzipped and
# JSON-parsed twice, and each task paying two Python worker round
# trips.  The fence keeps the filter above the single decode stage
# (plan verified 2 → 1 ArrowEvalPython; results byte-identical).
gunzip_udf = gunzip_udf.asNondeterministic()


def unbase64_gunzip(col: Column | str, charset: str = "UTF-8") -> Column:
    """base64(gzip(text)) → text — the CWL subscription payload decode
    (D1+D2+D4; ``cloudwatchlogs_lambda.js:159-169``)."""
    return F.decode(gunzip_udf(F.unbase64(col)), charset)
