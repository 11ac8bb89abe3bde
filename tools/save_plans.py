"""Save `.explain("formatted")` output for named queries into files.

Usage: python tools/save_plans.py OUTDIR SUFFIX name [name ...]
Writes OUTDIR/<name>_<SUFFIX>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sumologic_aws_lambda_spark import queries as registry  # noqa: E402
from sumologic_aws_lambda_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("save_plans")
    for name in names:
        df = registry.all_queries()[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{path}: {len(plan)} bytes")
    spark.stop()


if __name__ == "__main__":
    main()
