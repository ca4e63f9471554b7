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


def test_zorder_key_interleave_and_bounds(spark):
    """Morton key: known interleave values, clamping, NULL→0, and the
    63-bit budget / arity guards."""
    import pytest as _pytest

    from flink_psl_spark.operators.bucketing import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 1), (255, 255), (0, 255), (None, 3), (999, -5)],
        "x int, y int",
    )
    z = zorder_key(["x", "y"], ranges=[(0, 256), (0, 256)], bits=8)
    got = [r["z"] for r in df.select(z.alias("z")).collect()]
    #  (1,1) → 0b11 = 3; (255,255) → 65535; (0,255) → odd bit planes
    assert got[0] == 0 and got[1] == 3 and got[2] == 65535
    assert got[3] == 0b1010101010101010
    assert got[4] == 0b1010  # NULL x → 0; y=3 → odd planes 1 and 3
    assert got[5] == 0b0101010101010101  # x clamps to 255, y clamps to 0
    with _pytest.raises(ValueError, match="63-bit"):
        zorder_key(["x", "y"], ranges=[(0, 1), (0, 1)], bits=32)
    with _pytest.raises(ValueError, match="at least 2"):
        zorder_key(["x"], ranges=[(0, 1)], bits=8)


def test_write_zordered_clusters_files(spark, t, tmp_path):
    """A z-ordered write produces range-disjoint files in key order so
    BOTH dimensions stay tight per file — read back and check each
    partition's spans are narrower than the global span."""
    from pyspark.sql import functions as F

    from flink_psl_spark.operators.bucketing import write_zordered

    path = str(tmp_path / "zev")
    ev = t["events"].select("user_id", "value")
    write_zordered(
        ev, path, ["user_id", "value"],
        ranges=[(0.0, 256.0), (0.0, 512.0)], bits=8, num_files=8,
    )
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    spans = (
        back.withColumn("__f", F.input_file_name())
        .groupBy("__f")
        .agg(
            (F.max("user_id") - F.min("user_id")).alias("du"),
            (F.max("value") - F.min("value")).alias("dv"),
        )
        .collect()
    )
    assert len(spans) >= 4
    # average per-file span is well under the global span in both dims
    avg_du = sum(r["du"] for r in spans) / len(spans)
    avg_dv = sum(r["dv"] for r in spans) / len(spans)
    assert avg_du < 150 * 0.8 and avg_dv < 490 * 0.8
