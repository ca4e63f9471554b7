"""Empirical per-job/stage profile of a registered query (guide §1/§7).

Runs the query warm (2 passes: pass 0 absorbs codegen/Arrow spawn), then
dumps every Spark job of the LAST pass with its stages' times, shuffle
bytes, and task counts from the UI REST API.

Usage: python scripts/profile_jobs.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from flink_psl_spark import get_spark
    from flink_psl_spark.queries import QUERIES

    spark = get_spark(
        app_name=f"profjobs_{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    sc = spark.sparkContext
    fn = QUERIES[name]

    def run() -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    n_warm = int(os.environ.get("PROFILE_WARM_PASSES", "4"))
    warm0 = [run() for _ in range(n_warm)]
    # boundary marker: jobs after this id belong to the profiled pass
    marker = sc.parallelize(range(1), 1).count()
    boundary = max(
        j for j in sc.statusTracker().getJobIdsForGroup(None)
    ) if sc.statusTracker().getJobIdsForGroup(None) else -1
    t0 = time.time()
    warm1 = run()
    wall = round(time.time() - t0, 3)

    app_id = sc.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"

    def get(path: str):
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    jobs = [j for j in get("/jobs") if j["jobId"] > boundary]
    jobs.sort(key=lambda j: j["jobId"])
    stages = {s["stageId"]: s for s in get("/stages")}
    print(f"query={name} warm0={warm0}s wall(profiled pass)={wall}s")
    total_job = 0.0
    for j in jobs:
        from datetime import datetime, timezone

        def ts(s):
            return datetime.strptime(
                s, "%Y-%m-%dT%H:%M:%S.%f%Z"
            ).replace(tzinfo=timezone.utc).timestamp()

        dur = ts(j["completionTime"]) - ts(j["submissionTime"])
        total_job += dur
        print(
            f"job {j['jobId']:>4} {dur*1000:7.0f}ms tasks={j['numTasks']:>4}"
            f" desc={j.get('description') or j['name'][:90]!r}"
        )
        for sid in sorted(j["stageIds"]):
            s = stages.get(sid)
            if not s or s["status"] == "SKIPPED":
                print(f"    stage {sid}: skipped")
                continue
            print(
                f"    stage {sid}: {s['status']} tasks={s['numCompleteTasks']}"
                f" executorRunTime={s['executorRunTime']}ms"
                f" cpuTime={s['executorCpuTime']/1e6:.0f}ms"
                f" shufW={s['shuffleWriteBytes']}B shufR={s['shuffleReadBytes']}B"
                f" input={s['inputBytes']}B"
                f" name={s['name'][:70]!r}"
            )
    print(f"sum(job durations)={total_job:.3f}s  wall={wall}s "
          f"(gap = driver/plan time between jobs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
