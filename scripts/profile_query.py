"""Profile a registered query: wall time (cold + warm), executed plan, and
the plan-shape counters the scale audits care about.

Usage: python scripts/profile_query.py <query_name> [sf_dir]

Prints per-query: cold/warm seconds, #Exchange, #BroadcastHashJoin,
#SortMergeJoin, WholeStageCodegen span count, whether any
CartesianProduct / row-at-a-time Python (BatchEvalPython) / single-partition
window appears, and the formatted plan.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from flink_psl_spark import get_spark
    from flink_psl_spark.queries import QUERIES

    if name not in QUERIES:
        close = [q for q in QUERIES if name in q]
        print(f"unknown query {name!r}; close matches: {close[:10]}")
        return 2
    spark = get_spark(app_name=f"profile_{name}")

    def run() -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.time() - t0, 3)

    cold = run()
    warm = min(run() for _ in range(2))

    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    flags = {
        "exchanges": plan.count("Exchange"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "codegen_spans": plan.count("WholeStageCodegen"),
        "cartesian": "CartesianProduct" in plan,
        "row_python": "BatchEvalPython" in plan,
        "arrow_python": ("MapInPandas" in plan)
        or ("FlatMapGroupsInPandas" in plan),
        "single_partition": "SinglePartition" in plan,
    }
    print(f"query: {name} @ {sf_dir}")
    print(f"cold: {cold}s  warm(min of 2): {warm}s")
    for k, v in flags.items():
        print(f"  {k}: {v}")
    print("\n--- executed plan ---")
    print(plan)
    return 0


if __name__ == "__main__":
    sys.exit(main())
