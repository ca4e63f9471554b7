"""Table registry over parquet directories.

The reference registers tables through its catalog + DDL
(reference: flink-table/flink-table-api-java/.../TableEnvironmentImpl.java:722
``executeSql`` on CREATE TABLE). Our counterpart registers each parquet file
of a scale-factor directory as a temp view so both the DataFrame API and
``spark.sql`` can reach them.

Event-time columns arrive as parquet timestamp[ns]; Spark reads them as
TIMESTAMP (µs). We additionally normalize ``events.ts`` to TimestampType and
keep schemas otherwise untouched so predicate pushdown & column pruning hit
the parquet scan directly (no wrapping projections).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table as a DataFrame (plain parquet scan — prunable)."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        from pyspark.sql import functions as F

        if ts_type == "bigint":
            # TIMESTAMP(NANOS) read as long (see session.py); truncate to µs
            # exactly like DuckDB does, so oracles agree to the microsecond.
            # Integer div — float division would lose precision on 1.7e18 ns.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # timestamp[us] with isAdjustedToUTC=false reads as TIMESTAMP_NTZ;
            # session tz is pinned UTC, so the cast is value-preserving and
            # keeps tz-sensitive fns (unix_millis, window TVFs) working.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every table of ``sf_dir`` as a temp view; return the DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
