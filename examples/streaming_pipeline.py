"""Example 2 — streaming: watermarked window agg + stateful Top-N + CEP.

Run: python examples/streaming_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from flink_psl_spark import get_spark
from flink_psl_spark.cep import Measure, Step
from flink_psl_spark.streaming import (
    keyed_top_n,
    run_to_memory_table,
    stream_from_parquet,
    streaming_tumble_agg,
)
from flink_psl_spark.streaming.cep_stream import streaming_match_recognize


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    events = stream_from_parquet(spark, f"{sf_dir}/events.parquet", ts_col="ts")

    # watermarked tumbling window aggregation
    agg = streaming_tumble_agg(
        events, ts_col="ts", size="1 hour", delay="10 minutes",
        group_by=["event_type"],
        aggs=[F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")],
    )
    run_to_memory_table(agg, output_mode="complete").orderBy(
        "window_start", "event_type"
    ).show(8)

    # stateful streaming Top-3 per user (update stream)
    top = keyed_top_n(
        stream_from_parquet(spark, f"{sf_dir}/events.parquet", ts_col="ts"),
        "user_id", "value", 3, payload_cols=["event_id"],
    )
    run_to_memory_table(top, output_mode="update").show(6)

    # streaming MATCH_RECOGNIZE: clicks+ followed by a purchase
    ev = stream_from_parquet(spark, f"{sf_dir}/events.parquet", ts_col="ts").select(
        F.col("user_id").cast("string").alias("u"),
        F.col("event_id").alias("eid"),
        F.when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .otherwise("x").alias("et"),
        "ts",
    )
    matches = streaming_match_recognize(
        ev, "u", "ts",
        [Step.one_or_more("A", "et = 'c'"), Step.once("B", "et = 'p'")],
        [Measure("n_clicks", "A", "count"), Measure("purchase", "B", "first", "eid")],
        delay="5 minutes", tiebreak_col="eid",
    )
    run_to_memory_table(matches, output_mode="append").show(6)


def monitoring_extras(sf_dir: str = "/root/testdata/sf0.001") -> None:
    """Round-6 closers: the online EWMA monitor and continuous SFT masks."""
    from pyspark.sql import functions as F

    from flink_psl_spark import get_spark
    from flink_psl_spark.streaming import (
        run_to_memory_table,
        stream_ewma_anomaly,
        stream_from_parquet,
        stream_sft_loss_mask,
    )

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    ev = stream_from_parquet(spark, f"{sf_dir}/events.parquet", ts_col="ts")

    # EWMA recurrence as keyed state: anomalies flag as the watermark
    # finalizes each daily bucket
    out = stream_ewma_anomaly(
        ev.select("event_type", "ts", "value"),
        "event_type", "ts", "value",
        bucket_ms=86_400_000, alpha=0.25, threshold=120.0,
        delay="1 second",
    )
    run_to_memory_table(out, output_mode="append").orderBy(
        F.desc("anomaly"), "bucket_ts"
    ).show(6)

    # SFT loss-mask spans emitted as sessions close
    masks = stream_sft_loss_mask(
        ev.select("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_type", "event_id",
        gap="30 minutes", delay="1 second",
    )
    run_to_memory_table(masks, output_mode="append").show(6)


if __name__ == "__main__":
    main(*sys.argv[1:])
