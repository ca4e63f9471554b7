"""Example 4 — custom connectors: Python data source + two-phase-commit sink.

The FLIP-27-style pluggable source/sink surface (SURVEY §2.1) on the Spark 4
Python Data Source API: a deterministic datagen source with filter pushdown,
batch-written to an exactly-once JSONL sink, then the same source replayed as
a stream into the epoch-committed streaming writer.

Run: python examples/custom_connector.py [out_dir]
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from flink_psl_spark import get_spark
from flink_psl_spark.sources_v2 import register_python_sources


def main(out_dir: str | None = None) -> None:
    out_dir = out_dir or tempfile.mkdtemp(prefix="fps_connector_demo_")
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    register_python_sources(spark)

    # batch read — the id predicate is pushed INTO generation (pushFilters)
    df = (
        spark.read.format("pydatagen")
        .option("n", 10_000)
        .load()
        .where((F.col("id") >= 1000) & (F.col("id") < 2000))
    )
    agg = df.groupBy("key").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    agg.show()

    # exactly-once batch write: side files → atomic rename + _SUCCESS
    agg.write.format("pyjsonl").option("path", f"{out_dir}/batch").mode(
        "append"
    ).save()

    # streaming: offset-tracked replay into the epoch-commit writer
    st = spark.readStream.format("pydatagen").option("n", 500).load()
    q = (
        st.writeStream.format("pyjsonl")
        .option("path", f"{out_dir}/stream")
        .option("checkpointLocation", f"{out_dir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    print(f"wrote {out_dir}/batch and {out_dir}/stream")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
