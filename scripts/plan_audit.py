"""Registry-wide physical-plan audit — the scale-readiness gate.

Builds every registered query's DataFrame and mechanically sweeps the
executed-plan text for the red flags that break at 100x data:

  * BatchEvalPython   — a row-at-a-time Python UDF in the plan (the slow
                        path; every Python kernel must be Arrow-batched).
  * CartesianProduct  — an unbounded cross product.
  * BroadcastNestedLoopJoin — a non-equi join; only legitimate when the
                        broadcast side is parameter-sized (a scalar
                        threshold, a codebook, a quantile grid), never
                        data-sized. Such sites must be whitelisted here
                        WITH a reason, so the exception list is itself
                        reviewable (same discipline as the boundedness
                        table in ARCHITECTURE.md).

Queries whose pipeline executes during construction (streaming replays
into a memory sink, iterative training loops that return driver-built
results) come back as a bare LocalTableScan — no operator tree left to
sweep. Those are bucketed as "materialized" and their plan evidence
lives in tests/test_plan_shapes.py and tests/golden_plans/ instead.

Usage: python scripts/plan_audit.py [--json-out FILE] [sf_dir] [name...]

Exit code 1 if any non-whitelisted flag fires. A full-registry run is
committed once per round as PLANAUDIT_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from flink_psl_spark import get_spark
from flink_psl_spark.queries import QUERIES

# name -> reason. Every entry must name the bounded side and why it stays
# bounded at scale; an entry without that is a bug, not an exemption.
WHITELIST: dict[str, str] = {}


def audit_plan(plan: str) -> tuple[list[str], dict[str, int]]:
    """Return (flags, info_counts) for one executed-plan text."""
    flags = []
    if "BatchEvalPython" in plan:
        flags.append("BatchEvalPython")
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan:
        flags.append("BroadcastNestedLoopJoin")
    info = {
        "exchanges": plan.count("Exchange hashpartitioning"),
        "arrow_eval": plan.count("ArrowEvalPython"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
    }
    return flags, info


def is_materialized(plan: str) -> bool:
    """True when the returned DF is a driver-local relation (memory-sink
    table or createDataFrame result) — the pipeline already ran during
    construction, so there is no distributed plan left to audit."""
    local = ("LocalTableScan" in plan) or ("Scan ExistingRDD" in plan)
    return local and "FileScan" not in plan


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json-out":
        if len(argv) < 2:
            print(__doc__.strip())
            return 2
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    filters = argv[1:]

    spark = get_spark(master="local[8]", extra_conf={"spark.driver.memory": "8g"})
    report: dict[str, dict] = {}
    flagged: dict[str, list[str]] = {}
    buckets = {"clean": 0, "materialized": 0, "whitelisted": 0, "error": 0}
    for name, fn in QUERIES.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            buckets["error"] += 1
            report[name] = {"bucket": "error", "detail": f"{type(e).__name__}: {e}"}
            flagged[name] = ["build-error"]
            traceback.print_exc()
            print(f"ERROR {name}", flush=True)
            continue
        secs = time.time() - t0
        if is_materialized(plan):
            buckets["materialized"] += 1
            report[name] = {"bucket": "materialized", "seconds": round(secs, 1)}
            continue
        flags, info = audit_plan(plan)
        if flags and name in WHITELIST:
            buckets["whitelisted"] += 1
            report[name] = {
                "bucket": "whitelisted",
                "flags": flags,
                "reason": WHITELIST[name],
                **info,
            }
        elif flags:
            flagged[name] = flags
            report[name] = {"bucket": "FLAGGED", "flags": flags, **info}
            print(f"FLAG {name:32s} {flags}", flush=True)
        else:
            buckets["clean"] += 1
            report[name] = {"bucket": "clean", **info}

    print(f"\naudited {len(report)}: {buckets}, flagged={len(flagged)}")
    if flagged:
        print("flagged:", flagged)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "audited": len(report),
                    "summary": buckets,
                    "flagged": flagged,
                    "whitelist": WHITELIST,
                    "note": (
                        "materialized = pipeline ran during build (streaming "
                        "replay / training loop); plan evidence for those is "
                        "tests/test_plan_shapes.py + tests/golden_plans/"
                    ),
                    "queries": report,
                },
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
