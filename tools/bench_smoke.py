"""Bench pre-flight: analyze every bench query's plan under a VANILLA
SparkSession (the external driver builds its own, without session.py's
confs) without executing anything.

The round-3 lesson: one AnalysisException (a TIMESTAMP_NTZ cast that only
bites on driver-built sessions) silently cost the round its entire bench
artifact.  ``explain()``-ing each query forces full analysis + optimization
— which is where AnalysisExceptions live — at ~100× less cost than the
run, so this belongs before every committed bench.

Usage: python tools/bench_smoke.py [--sf /root/testdata/sf0.1]
Exit 0 = every bench query analyzes cleanly.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from sumologic_aws_lambda_spark import queries as registry  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .appName("bench-smoke-vanilla")
             .config("spark.sql.shuffle.partitions", "8")
             .getOrCreate())

    qs = registry.all_queries()
    names = bench.HEADLINE + [n for n in bench.OPTIONAL if n in qs]
    failures: list[tuple[str, str]] = []
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            with redirect_stdout(io.StringIO()):
                df.explain("formatted")   # forces analysis + optimization
        except Exception as e:  # noqa: BLE001 — harness boundary
            failures.append((name, f"{type(e).__name__}: {e}"[:300]))
    for name, err in failures:
        print(f"FAIL {name}: {err}")
    print(f"== {len(names) - len(failures)} ok / {len(failures)} fail "
          f"of {len(names)} bench queries ==")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
