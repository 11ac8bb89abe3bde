"""Driver-replica: exercises __spark_entry__ exactly as the round driver
does — import the module, smoke entry(spark) at sf0.001, then run every
queries()[name] at sf0.01 and compare against oracle_sql()[name] via
DuckDB (row-count + schema + order-insensitive canonical value compare).

Usage: python tools/verify_driver_contract.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from sumologic_aws_lambda_spark.catalog import TABLES  # noqa: E402
from sumologic_aws_lambda_spark.session import get_spark  # noqa: E402
from tests.oracle_check import compare  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--vanilla", action="store_true",
                    help="build a bare SparkSession like the external "
                         "driver does (no session.py confs) — catches "
                         "queries that silently depend on get_spark()")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    if args.vanilla:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[8]")
                 .appName("verify-driver-contract-vanilla")
                 .config("spark.sql.shuffle.partitions", "8")
                 .getOrCreate())
    else:
        spark = get_spark("verify-driver-contract")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    print("== entry() smoke (sf0.001) ==")
    edf = entrymod.entry(spark)
    print(f"entry rows={edf.count()} schema={edf.schema.simpleString()}")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = args.names or sorted(qs)
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf)
            if name in oracles:
                ok, msg = compare(df, con.sql(oracles[name]))
            else:
                ok, msg = df.count() >= 0, "rows-only"
        except Exception as exc:  # pragma: no cover
            ok, msg = False, f"EXCEPTION {type(exc).__name__}: {exc}"
        dt = time.time() - t0
        status = "PASS" if ok else "FAIL"
        n_pass += ok
        n_fail += not ok
        print(f"{status} {name} ({dt:.1f}s) {'' if ok else msg}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
