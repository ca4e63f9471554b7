"""JDBC source/sink (SURVEY §2.1 'jdbc' connector row) — exercised against
the embedded Derby database that ships with Spark (no external services)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url():
    return f"jdbc:derby:memory:fps_{uuid.uuid4().hex[:8]};create=true"


def test_jdbc_write_read_round_trip(spark, t, derby_url):
    nation = t["nation"]
    (
        nation.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "nation_jdbc")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    back = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "nation_jdbc")
        .option("driver", DRIVER)
        .load()
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_jdbc_pushdown(spark, t, derby_url):
    """Filter pushdown must reach the JDBC source (reference
    SupportsFilterPushDown on the jdbc connector)."""
    (
        t["customer"].select("c_custkey", "c_acctbal", "c_mktsegment")
        .write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "cust_jdbc")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    df = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "cust_jdbc")
        .option("driver", DRIVER)
        .load()
        .where(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "c_acctbal" in plan
    want = t["customer"].where(F.col("c_acctbal") > 5000).count()
    assert df.count() == want


def test_jdbc_partitioned_read(spark, t, derby_url):
    """Parallel JDBC read via partitionColumn/bounds (the scale knob for
    JDBC sources: N concurrent range queries instead of one cursor)."""
    mx = t["customer"].agg(F.max("c_custkey")).first()[0]
    df = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "cust_jdbc")
        .option("driver", DRIVER)
        .option("partitionColumn", "c_custkey")
        .option("lowerBound", "1")
        .option("upperBound", str(mx))
        .option("numPartitions", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == t["customer"].count()
