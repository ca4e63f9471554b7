"""Generate sf1-scale fixture tables by deterministic replication of sf0.1.

The committed testdata stops at sf0.1 (~600k lineitem rows), where every
headline query is fixed-overhead-bound and the 8-vs-32-core scaling probe
says nothing (r12 verdict). This script builds a 10x corpus for the
parallel-scaling probe only — NOT for correctness runs (the DuckDB oracle
gate stays on the driver-provided sf0.01/sf0.1).

Construction (seedless, fully deterministic): each fact table is unioned
10x with keys shifted by copy_index x key_stride so referential joins
stay consistent; nation/region stay fixed (real TPC-H keeps dimension
cardinality constant); document text gets a per-copy suffix token so
shingle/dedup work scales instead of collapsing to 10 exact clones;
embeddings replicate as-is (semantic dedup then works on 10x rows).

Usage: python scripts/gen_scale_data.py [out_dir] [copies]
Default: /root/testdata_sf1, 10 copies.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SRC = "/root/testdata/sf0.1"


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from flink_psl_spark import get_spark
    from flink_psl_spark.queries.registry import tables

    spark = get_spark(app_name="gen_scale_data")
    t = tables(spark, SRC)

    def stride(df, col):
        mx = df.agg(F.max(col)).first()[0]
        return int(mx) + 1

    strides = {
        "o_orderkey": stride(t["orders"], "o_orderkey"),
        "o_custkey": stride(t["customer"], "c_custkey"),
        "p_partkey": stride(t["part"], "p_partkey"),
        "s_suppkey": stride(t["supplier"], "s_suppkey"),
        "event_id": stride(t["events"], "event_id"),
        "user_id": stride(t["events"], "user_id"),
        "doc_id": stride(t["documents"], "doc_id"),
        "vec_id": stride(t["embeddings"], "vec_id"),
    }

    def replicate(df, shifts, text_suffix_col=None, n_files=16):
        c = F.explode(
            F.sequence(F.lit(0), F.lit(copies - 1))
        ).alias("__copy")
        wide = df.select("*", c)
        exprs = []
        for name in df.columns:
            if name in shifts:
                exprs.append(
                    (F.col(name) + F.col("__copy") * F.lit(shifts[name]))
                    .alias(name)
                )
            elif name == text_suffix_col:
                exprs.append(
                    F.when(
                        F.col("__copy") == 0, F.col(name)
                    ).otherwise(
                        F.concat(
                            F.col(name),
                            F.lit(" cp"),
                            F.col("__copy").cast("string"),
                        )
                    ).alias(name)
                )
            else:
                exprs.append(F.col(name))
        return wide.select(*exprs).repartition(n_files)

    plan = {
        "lineitem": replicate(
            t["lineitem"],
            {
                "l_orderkey": strides["o_orderkey"],
                "l_partkey": strides["p_partkey"],
                "l_suppkey": strides["s_suppkey"],
            },
        ),
        "orders": replicate(
            t["orders"],
            {
                "o_orderkey": strides["o_orderkey"],
                "o_custkey": strides["o_custkey"],
            },
        ),
        "customer": replicate(
            t["customer"], {"c_custkey": strides["o_custkey"]}, n_files=4
        ),
        "supplier": replicate(
            t["supplier"], {"s_suppkey": strides["s_suppkey"]}, n_files=2
        ),
        "part": replicate(
            t["part"], {"p_partkey": strides["p_partkey"]}, n_files=2
        ),
        "nation": t["nation"],
        "region": t["region"],
        "events": replicate(
            t["events"],
            {
                "event_id": strides["event_id"],
                "user_id": strides["user_id"],
            },
        ),
        "documents": replicate(
            t["documents"],
            {"doc_id": strides["doc_id"]},
            text_suffix_col="text",
            n_files=8,
        ),
        "embeddings": replicate(
            t["embeddings"], {"vec_id": strides["vec_id"]}, n_files=8
        ),
    }
    os.makedirs(out_dir, exist_ok=True)
    for name, df in plan.items():
        dest = os.path.join(out_dir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(dest)
        print(f"wrote {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
