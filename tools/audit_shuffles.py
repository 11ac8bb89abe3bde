"""Shuffle audit: count hash exchanges / sort-merge joins / cartesians in
every registered query's physical plan and flag anomalies.  The cheap,
systematic version of '.explain and iterate' — run after adding operators
to catch a plan that silently picked a scale-hostile strategy.

Usage: python tools/audit_shuffles.py [--sf DIR] [--max-exchanges N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sumologic_aws_lambda_spark import queries as registry  # noqa: E402
from sumologic_aws_lambda_spark.session import get_spark  # noqa: E402
from sumologic_aws_lambda_spark.testing.plans import (  # noqa: E402
    audit_flags,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--max-exchanges", type=int, default=4,
                    help="flag queries with more hash exchanges than this")
    args = ap.parse_args()
    spark = get_spark("audit-shuffles")
    rows = []
    for name, fn in registry.all_queries().items():
        try:
            df = fn(spark, args.sf)
            plan = (df._jdf.queryExecution()
                    .executedPlan().toString())
            # the flag computation is shared with the plan-shape
            # suite's adjudication guard (testing.plans.audit_flags)
            # so the tool and the in-code _AUDIT_FLAGS_OK set can
            # never drift (round-13 verdict item 1)
            flags = audit_flags(df, args.max_exchanges)
        except Exception as exc:  # pragma: no cover
            rows.append((name, -1, -1, -1, f"ERROR {type(exc).__name__}"))
            continue
        ex = plan.count("Exchange hashpartitioning")
        smj = plan.count("SortMergeJoin")
        cart = plan.count("CartesianProduct")
        rows.append((name, ex, smj, cart, " ".join(flags)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    print(f"{'query':40s} {'hashEx':>6s} {'smj':>4s} {'cart':>4s}  flags")
    for name, ex, smj, cart, flags in rows:
        print(f"{name:40s} {ex:6d} {smj:4d} {cart:4d}  {flags}")
    n_flagged = sum(1 for r in rows if r[4])
    print(f"\n{len(rows)} queries, {n_flagged} flagged")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
