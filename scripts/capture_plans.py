"""Capture .explain("formatted") for headline queries into plans/r{N}/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
Writes plans/r12/<query>_<suffix>.txt for each headline query (or the
explicit list). Streaming replays capture the last micro-batch's executed
plan (STREAM_PLANS) appended after the returned DataFrame's plan, since
the returned memory-sink scan carries no operator tree.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get(
    "PLANS_OUT_DIR", os.path.join(_REPO, "plans", "r13")
)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINE
    from flink_psl_spark import get_spark
    from flink_psl_spark.queries import QUERIES
    from flink_psl_spark.streaming import core as stream_core

    names = sys.argv[2:] or HEADLINE
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    for name in names:
        fn = QUERIES[name]
        n_before = len(stream_core.STREAM_PLANS)
        df = fn(spark, SF_DIR)
        jqe = df._jdf.queryExecution()
        jvm = spark.sparkContext._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = jqe.explainString(mode)
        parts = [plan]
        new_stream = stream_core.STREAM_PLANS[n_before:]
        if new_stream:
            parts.append(
                "\n=== streaming micro-batch executed plan(s) "
                "(STREAM_PLANS) ===\n"
            )
            parts.extend(new_stream)
        out = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write("\n".join(parts))
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
