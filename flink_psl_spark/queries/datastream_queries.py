"""DataStream-facade query inventory (SURVEY §2.2 rows: DataStream row
ops, keyed rolling aggregates, side outputs — reference DataStream.java /
KeyedStream.java / OutputTag side outputs).

These rows were previously pytest-verified only; each query here drives the
facade end-to-end with an exact SQL oracle so the driver can hash-check
them like the relational surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_psl_spark.queries.registry import query, tables


@query(
    "datastream_side_output_split",
    # OutputTag split: overlapping tags allowed; 'rest' collects rows
    # matching neither condition (NULL-condition rows fall nowhere, the
    # same three-valued WHERE semantics in both engines)
    oracle="""
    SELECT 'errors' AS tag, COUNT(*) AS n FROM events
    WHERE event_type = 'error'
    UNION ALL
    SELECT 'high_value' AS tag, COUNT(*) AS n FROM events
    WHERE value > 8
    UNION ALL
    SELECT 'rest' AS tag, COUNT(*) AS n FROM events
    WHERE NOT (event_type = 'error') AND NOT (value > 8)
    """,
)
def datastream_side_output_split(spark, sf_dir):
    """Side outputs (reference OutputTag / ProcessFunction.Context.output):
    one pass split into tagged outputs plus a rest channel, counted per
    tag (operators/misc.py:side_outputs)."""
    from flink_psl_spark.operators.misc import side_outputs

    t = tables(spark, sf_dir)
    outs = side_outputs(
        t["events"],
        {
            "errors": F.col("event_type") == "error",
            "high_value": F.col("value") > 8,
        },
        rest_tag="rest",
    )
    parts = [
        df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(tag).alias("tag"), "n"
        )
        for tag, df in outs.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@query(
    "datastream_keyed_sum",
    oracle="""
    SELECT user_id, ROUND(SUM(value), 2) AS value FROM events GROUP BY user_id
    """,
)
def datastream_keyed_sum(spark, sf_dir):
    """KeyedStream rolling sum's final value (reference KeyedStream.sum:767)
    through the DataStream facade — keyBy + sum compiles to a plain
    hash aggregation (map-side partial combine, one shuffle)."""
    from flink_psl_spark.datastream import DataStream

    t = tables(spark, sf_dir)
    ds = (
        DataStream(t["events"].select("user_id", "value"))
        .key_by("user_id")
        .sum("value")
    )
    return ds.df.select("user_id", F.round("value", 2).alias("value"))


@query(
    "datastream_map_filter",
    # map (mapInPandas, Arrow-batched) then filter: doubling a float is
    # bit-exact in both engines, so the oracle replays the arithmetic
    oracle="""
    SELECT event_id, user_id, value * 2 AS v2 FROM events
    WHERE value * 2 > 10
    """,
)
def datastream_map_filter(spark, sf_dir):
    """DataStream.map -> DataStream.filter (reference DataStream.map:585 /
    filter:638): an Arrow-batched row transform feeding a predicate, the
    canonical row-ops pipeline."""
    from flink_psl_spark.datastream import DataStream

    t = tables(spark, sf_dir)
    src = t["events"].select("event_id", "user_id", "value")

    def double(row):
        return {
            "event_id": row["event_id"],
            "user_id": row["user_id"],
            "v2": row["value"] * 2,
        }

    ds = (
        DataStream(src)
        .map(double, "event_id long, user_id long, v2 double")
        .filter("v2 > 10")
    )
    return ds.df
