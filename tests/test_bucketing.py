"""Bucketed-table co-located joins (operators/bucketing.py): the written
bucket layout must eliminate the join exchanges (and sorts, when
bucket-sorted) — asserted on the executed plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_pair(spark, t):
    from flink_psl_spark.operators.bucketing import write_bucketed

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force SMJ so the exchange-elision (not broadcast) is what we observe
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    write_bucketed(
        t["orders"], "b_orders",
        bucket_cols=["o_custkey"], num_buckets=4, sort_cols=["o_custkey"],
    )
    write_bucketed(
        t["customer"], "b_customer",
        bucket_cols=["c_custkey"], num_buckets=4, sort_cols=["c_custkey"],
    )
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, t, bucketed_pair):
    joined = (
        spark.table("b_orders")
        .join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "c_name", "o_totalprice")
    )
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    # correctness against the unbucketed join
    expect = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .count()
    )
    assert joined.count() == expect


def test_bucketed_agg_has_no_exchange(spark, bucketed_pair):
    agged = (
        spark.table("b_orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("sv"))
    )
    plan = _plan(agged)
    assert "Exchange" not in plan, plan


def test_bucket_info_and_validation(spark, t, bucketed_pair):
    from flink_psl_spark.operators.bucketing import (
        bucket_info,
        cobucketed_join,
        write_bucketed,
    )

    info = bucket_info(spark, "b_orders")
    assert info["num_buckets"] == 4
    assert info["bucket_cols"] == ["o_custkey"]
    assert info["sort_cols"] == ["o_custkey"]

    # compatible layouts: join builds and carries no exchange... but the
    # key names differ between the two tables, so validation is per-table
    with pytest.raises(ValueError, match="bucketed on"):
        cobucketed_join(spark, "b_orders", "b_customer", on=["o_custkey"])

    # same-name co-bucketed layout
    write_bucketed(
        t["orders"].select(F.col("o_custkey").alias("custkey"), "o_totalprice"),
        "bo2", bucket_cols=["custkey"], num_buckets=4,
    )
    write_bucketed(
        t["customer"].select(F.col("c_custkey").alias("custkey"), "c_name"),
        "bc2", bucket_cols=["custkey"], num_buckets=4,
    )
    try:
        joined = cobucketed_join(spark, "bo2", "bc2", on=["custkey"])
        assert "Exchange" not in _plan(joined)
        assert joined.count() > 0
        # mismatched bucket counts are refused
        write_bucketed(
            t["customer"].select(F.col("c_custkey").alias("custkey")),
            "bc8", bucket_cols=["custkey"], num_buckets=8,
        )
        with pytest.raises(ValueError, match="bucket counts differ"):
            cobucketed_join(spark, "bo2", "bc8", on=["custkey"])
        with pytest.raises(ValueError, match="not bucketed"):
            t["nation"].write.mode("overwrite").saveAsTable("nb")
            cobucketed_join(spark, "bo2", "nb", on=["custkey"])
    finally:
        for tbl in ("bo2", "bc2", "bc8", "nb"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
