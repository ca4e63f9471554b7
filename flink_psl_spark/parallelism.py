"""Scan-parallelism guard for compute-heavy map stages.

Small parquet files arrive as one (or few) input partitions, which serializes
expensive per-row expressions (shingle explosion, hash families, vector math)
on a single core. At production scale (100 TB) scans already carry thousands
of partitions, so the guard is conditional: fan out ONLY when the input is
under-parallel, and hash-partition on the operator's downstream grouping key
so the following groupBy reuses the exchange instead of adding one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` to the cluster's default parallelism iff its plan
    currently has fewer partitions — a no-op on well-partitioned inputs.

    With ``key_cols``, partitions by hash of those columns so a downstream
    groupBy/join on the same keys reuses the exchange (ENSURE_REQUIREMENTS
    sees compatible HashPartitioning); without, round-robin.

    ONLY call this on scan-shaped inputs (a table straight off the catalog,
    possibly filtered/projected). ``df.rdd`` on a plan containing joins or
    aggregates makes AQE compile and EXECUTE its query stages eagerly — the
    probe itself would run the upstream pipeline once before the real action
    runs it again.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # plan not convertible cheaply — leave untouched
        return df
    if current >= target:
        return df
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
