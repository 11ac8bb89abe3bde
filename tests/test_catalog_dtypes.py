"""Catalog dtype guarantees.

Driver-regenerated fixtures have flip-flopped between timestamp[ns]
(read as long under nanosAsLong) and timestamp[us]-no-UTC-flag (read as
TIMESTAMP_NTZ by PySpark 4.x).  Every downstream consumer does epoch math
(``unix_micros``, ``cast as bigint``) which is illegal on NTZ, so
``catalog.table()`` must hand out session-zone TIMESTAMP (LTZ) columns no
matter which physical encoding the fixture carries.  This test pins that
contract for every fixture table.
"""

import os

import pytest
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

from sumologic_aws_lambda_spark import catalog

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Columns that must be usable in epoch arithmetic per-table.
EXPECTED_TS_COLS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


@pytest.mark.parametrize("name", catalog.TABLES)
def test_no_ntz_columns_post_catalog(spark, name):
    df = catalog.table(spark, SF_DIR, name)
    ntz = [f.name for f in df.schema.fields
           if isinstance(f.dataType, TimestampNTZType)]
    assert not ntz, f"{name}: NTZ columns leaked through catalog: {ntz}"


@pytest.mark.parametrize("name,cols", sorted(EXPECTED_TS_COLS.items()))
def test_known_ts_columns_are_ltz(spark, name, cols):
    df = catalog.table(spark, SF_DIR, name)
    for c in cols:
        dt = df.schema[c].dataType
        assert isinstance(dt, TimestampType), (
            f"{name}.{c} is {dt}; expected TIMESTAMP (LTZ)")
        # The real contract: epoch math must resolve.  This raises
        # AnalysisException on NTZ or raw-long regressions.
        df.selectExpr(f"unix_micros({c})").limit(1).collect()


def test_events_ts_not_raw_long(spark):
    # Under nanosAsLong a ns-encoded fixture arrives as LongType; the
    # catalog must normalize it to TIMESTAMP, never hand out raw nanos.
    df = catalog.table(spark, SF_DIR, "events")
    assert not isinstance(df.schema["ts"].dataType, LongType)
