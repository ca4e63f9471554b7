"""Per-operator (SQL-tab) profile of a registered query (guide §7.1).

Runs the query to steady state (N warm passes), then dumps every SQL
execution of the LAST pass with per-node metrics — the empirical view
that maps wall time to operators (scan, exchange, join, Python eval).

Usage: python scripts/profile_sql.py <query> [sf_dir]
Env: PROFILE_WARM_PASSES (default 4).
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
        app_name=f"profsql_{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    fn = QUERIES[name]

    def run() -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    n_warm = int(os.environ.get("PROFILE_WARM_PASSES", "4"))
    warms = [run() for _ in range(n_warm)]

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"

    def get(path: str):
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    before = {e["id"] for e in get("/sql?length=10000")}
    t0 = time.time()
    wall = run()
    execs = [
        e
        for e in get("/sql?length=10000&details=true&planDescription=false")
        if e["id"] not in before
    ]
    print(f"query={name} warms={warms} wall(profiled)={wall}s "
          f"n_sql_execs={len(execs)}")
    for e in sorted(execs, key=lambda x: x["id"]):
        print(f"\n=== SQL exec {e['id']} dur={e['duration']}ms "
              f"desc={e['description'][:80]!r}")
        for node in e.get("nodes", []):
            mets = {
                m["name"]: m["value"]
                for m in node.get("metrics", [])
                if any(
                    k in m["name"]
                    for k in (
                        "total (min, med, max",
                        "time total",
                        "time to",
                        "rows",
                        "bytes",
                        "data size",
                    )
                )
            }
            if not mets:
                continue
            interesting = {
                k: v
                for k, v in mets.items()
                if "time" in k or "rows" in k.lower() or "size" in k
            }
            print(f"  node {node['nodeId']:>3} {node['nodeName'][:45]:<45}"
                  f" {interesting}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
