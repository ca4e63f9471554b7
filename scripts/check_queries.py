"""Run every registered query against its DuckDB oracle — dev loop helper.

Usage: python scripts/check_queries.py [--json-out FILE] [--driver-style]
                                       [sf_dir] [name_filter...]

--json-out writes {name: {pass, seconds, detail}} so a full-registry run
can be committed as a scale-robustness artifact (SCALECHECK_r{N}.json)
instead of living only in session logs.

--driver-style replays the round driver's exact path: a BARE
SparkSession (no get_spark — only __spark_entry__._configure's runtime
conf applies) and the __spark_entry__.queries() wrappers. Run it from
the repo root (Python workers resolve the package through the driver's
cwd). Conf present only in the builder path passes the default mode and
fails this one — the round-4 postmortem class.
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from flink_psl_spark import get_spark
from flink_psl_spark.queries import QUERIES, ORACLES
from _oracle import duck_connection, compare, LAST_TIMINGS


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    driver_style = False
    if "--driver-style" in argv:
        driver_style = True
        argv = [a for a in argv if a != "--driver-style"]
    if argv and argv[0] == "--json-out":
        if len(argv) < 2:
            print(__doc__.strip())
            return 2
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    filters = argv[1:]
    if driver_style:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.driver.memory", "8g")
            .appName("check_queries_driver_style")
            .getOrCreate()
        )
    else:
        spark = get_spark(
            master="local[8]", extra_conf={"spark.driver.memory": "8g"}
        )
    if driver_style:
        import __spark_entry__ as _entry

        qmap = _entry.queries()  # _configure-wrapped, driver order
    else:
        qmap = QUERIES
    con = duck_connection(sf_dir)
    # Untimed session warm-up (VERDICT r11): the first checked row used
    # to absorb the whole JVM/Arrow-worker/codegen cold start — the
    # position-1 query printed ~2x its warm cost (r10: llm_bfd_packing
    # 6.1 s; r11: recursive_cte_order_chain 13.88 s vs a 4.5 s warm
    # A/B), distorting exactly the round-over-round trend the artifact
    # exists to support. One aggregate (codegen + shuffle machinery),
    # one Arrow-batched pandas op (Python worker spawn), one parquet
    # scan (datasource + footer paths) retire those one-time costs.
    spark.range(1_000_000).selectExpr("id % 7 AS k", "id") \
        .groupBy("k").sum("id").collect()
    spark.range(10_000).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).count()
    try:
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    except Exception:
        pass
    failures = []
    report: dict[str, dict] = {}
    ran = 0
    for name, fn in qmap.items():
        if filters and not any(f in name for f in filters):
            continue
        ran += 1
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            # the driver's canonicalizer (pandas sort_values over result
            # rows) cannot sort array/map/struct/binary cells — any query
            # emitting one would record an err row, so fail it here first
            from pyspark.sql import types as T

            bad_cols = [
                f.name
                for f in df.schema.fields
                if isinstance(
                    f.dataType,
                    (T.ArrayType, T.MapType, T.StructType, T.BinaryType),
                )
            ]
            if bad_cols:
                print(f"FAIL {name:32s} non-scalar result columns: {bad_cols}")
                failures.append(name)
                continue
            timings = {}
            if name in ORACLES:
                LAST_TIMINGS.update(spark_sec=None, oracle_sec=None)
                ok, msg = compare(df, con, ORACLES[name])
                timings = dict(LAST_TIMINGS)
            else:
                ts = time.time()
                n = df.count()
                timings = {"spark_sec": round(time.time() - ts, 2)}
                ok, msg = n >= 0, f"rows-only: {n} rows"
        except Exception as e:
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
            timings = {}
            traceback.print_exc()
        status = "PASS" if ok else "FAIL"
        secs = time.time() - t0
        print(f"{status} {name:32s} {secs:6.1f}s  {msg[:300]}", flush=True)
        report[name] = {
            "pass": ok,
            "seconds": round(secs, 2),
            "detail": msg[:300],
            # engine-vs-oracle attribution: a slow row names its culprit
            **{k: v for k, v in timings.items() if v is not None},
        }
        if not ok:
            failures.append(name)
    scope = "" if not filters else f" (of {len(QUERIES)} registered)"
    print(f"\n{ran - len(failures)}/{ran} pass{scope}")
    if failures:
        print("failures:", failures)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "pass": ran - len(failures),
                    "ran": ran,
                    "note": (
                        "seconds = Spark query + DuckDB oracle + compare; "
                        "per-row spark_sec/oracle_sec attribute the split — "
                        "oracle dominates for all-pairs ground-truth checks "
                        "(llm_dedup_keep_best at sf0.1: 232 s oracle, "
                        "0.4 s Spark); use bench.py for steady-state "
                        "engine timings"
                    ),
                    "queries": report,
                },
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
