"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Runs each headline query to full materialization (noop sink — no driver
collect) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family (agg, multi-join, window fn, window
# TVF, dedup, as-of join, set op, LLM dedup exact+minhash, ANN search).
HEADLINE = [
    "q1_pricing_summary",
    "join_multiway_revenue",
    "join_broadcast_dim",
    "wf_topn_per_group",
    "wf_running_rows_frame",
    "tumble_window_agg",
    "session_window_agg",
    "dedup_keep_last",
    "asof_join",
    "interval_join_batch",
    "setop_except_all",
    "llm_exact_dedup",
    "llm_minhash_dedup",
    "llm_text_stats",
    "llm_cosine_topk",
    "llm_pq_ann_topk",
    "llm_corpus_overlap_sketch",
    "llm_trained_quality_classifier",
    "window_join",
    "cep_clicks_then_purchase",
    "cdc_debezium_roundtrip",
    "udf_pandas_scalar",
    "q5_local_supplier_volume",
    "graph_pagerank",
    # streaming (real Structured Streaming runs, AvailableNow replay of the
    # events table): window agg, stream-stream join, custom stateful op
    "stream_tumble_agg",
    "stream_interval_join",
    "stream_keyed_top3",
]


def main() -> int:
    from flink_psl_spark import get_spark
    from flink_psl_spark.queries import QUERIES

    spark = get_spark(app_name="flink_psl_spark_bench")
    # warm-up: JVM/codegen startup + catalog registration (schema reads are
    # one-time metadata setup, not per-query work)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from flink_psl_spark.queries.registry import tables

    tbls = tables(spark, SF_DIR)
    # touch every fixture table once (parquet footers + vectorized-reader JIT)
    for df in tbls.values():
        df.limit(1).count()
    # pre-spawn the Python worker pool (pandas/pyarrow imports dominate the
    # first Arrow-UDF query otherwise) — one tiny pandas UDF per core
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(cpus * 4, numPartitions=cpus).select(
        F.sum(_warm(F.col("id")))
    ).collect()

    # host calibration: a fixed JVM-side compute, identical every round —
    # cross-round totals can only be compared through this number (rounds
    # run on different hosts/neighbors; a uniform per-query drift with a
    # matching calib drift is the environment, not a code regression)
    calib = min(
        _timed(lambda: spark.range(200_000_000).selectExpr(
            "sum(id * 2 + 1)").collect())
        for _ in range(3)
    )

    # five passes, min per query: steady-state cost (the first pass absorbs
    # per-shape codegen/JIT and Arrow worker spawn; warm-up bleed reaches
    # into pass 2 for Arrow-heavy queries; min over the extra passes
    # estimates the same steady state with less scheduler-jitter variance)
    per_query: dict[str, float] = {}
    for _pass in range(5):
        for name in HEADLINE:
            fn = QUERIES[name]
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            elapsed = round(time.time() - t0, 3)
            if name not in per_query or elapsed < per_query[name]:
                per_query[name] = elapsed

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "n": 5,
                "calib_sec": calib,
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    return 0


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


if __name__ == "__main__":
    sys.exit(main())
