"""Print compact physical-plan summaries (Exchange count, join strategy,
Python eval nodes, scan count) for named registry queries.

Usage: python tools/plan_summary.py name [name ...]   [--full name]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sumologic_aws_lambda_spark import queries as registry  # noqa: E402
from sumologic_aws_lambda_spark.session import get_spark  # noqa: E402

COUNTED = [
    "Exchange hashpartitioning", "Exchange rangepartitioning",
    "Exchange SinglePartition", "Exchange RoundRobinPartitioning",
    "BroadcastExchange", "SortMergeJoin", "BroadcastHashJoin",
    "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct",
    "ArrowEvalPython", "BatchEvalPython", "MapInPandas", "MapInArrow",
    "Scan parquet", "Window", "Sort ", "HashAggregate", "SortAggregate",
    "ObjectHashAggregate", "Generate", "Scan ExistingRDD",
]


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_summary")
    qs = registry.all_queries()
    for name in args:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        counts = {k: plan.count(k) for k in COUNTED if plan.count(k)}
        print(f"== {name}")
        for k, v in sorted(counts.items(), key=lambda kv: -kv[1]):
            print(f"   {v:3d}  {k}")
    spark.stop()


if __name__ == "__main__":
    main()
