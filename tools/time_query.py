"""Time individual registry queries with the noop sink (guide §1.4).

Usage: python tools/time_query.py [--sf DIR] [--runs N] name [name ...]
Prints per-query run times; min is the comparable number.  Shares
bench.py's session/methodology so numbers line up with BENCH artifacts.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sumologic_aws_lambda_spark import queries as registry  # noqa: E402
from sumologic_aws_lambda_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = 2
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    spark = get_spark("time_query")
    qs = registry.all_queries()
    for name in names:
        times = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run {r}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            times.append(time.time() - t0)
        print(f"{name}: " + " ".join(f"{t:.3f}" for t in times)
              + f"  min={min(times):.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
