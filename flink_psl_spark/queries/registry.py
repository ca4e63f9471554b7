"""Query/oracle registry and table-registration cache."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_psl_spark.catalog import register_tables

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

_registered: dict[tuple[int, str], dict[str, DataFrame]] = {}


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register (once per session+dir) and return the fixture tables."""
    key = (id(spark), sf_dir)
    if key not in _registered:
        _registered[key] = register_tables(spark, sf_dir)
    return _registered[key]


def query(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query.

    ``oracle`` is the equivalent DuckDB SQL; omit for ops that aren't
    SQL-expressible (the driver then records a weaker rows-only check).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def sql_query(name: str, spark_sql: str, oracle: str | None = None) -> None:
    """Register a SQL-text query; oracle defaults to the same text.

    Used when the Spark SQL and DuckDB dialects agree verbatim — one source
    of truth, zero drift.
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        tables(spark, sf_dir)
        return spark.sql(spark_sql)

    QUERIES[name] = fn
    ORACLES[name] = oracle if oracle is not None else spark_sql
