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


def test_jdbc_upsert_write(spark, t, derby_url):
    """Upsert sink: existing keys update, new keys insert, in-batch
    duplicate keys collapse deterministically (last-write-wins dedup)."""
    from flink_psl_spark.sources import jdbc_upsert_write, jdbc_table

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k int, v double"
    )
    (
        base.write.format("jdbc").option("url", derby_url)
        .option("dbtable", "upsert_tgt").option("driver", DRIVER)
        .mode("overwrite").save()
    )
    # Spark's overwrite creates a plain table without a PK — Derby MERGE
    # only needs the join condition, so that's fine for the semantics test
    batch = spark.createDataFrame(
        [(2, 99.0), (3, 30.0), (3, 25.0)], "k int, v double"
    )
    n = jdbc_upsert_write(batch, derby_url, "upsert_tgt", "k", driver=DRIVER)
    assert n == 2  # one update (k=2), one insert (k=3 after dedup)
    back = jdbc_table(spark, derby_url, "upsert_tgt", driver=DRIVER)
    got = sorted((r["k"], r["v"]) for r in back.collect())
    assert got == [(1, 10.0), (2, 99.0), (3, 30.0)]  # max-v dedup kept 30.0


def test_jdbc_upsert_multi_batch_state_machine(spark, derby_url):
    """Sequences of upsert batches behave as a keyed dict: the table state
    after N batches equals applying each batch's last-write-wins dedup in
    order (the reference sink's changelog-batch contract)."""
    from flink_psl_spark.sources import jdbc_table, jdbc_upsert_write

    spark.createDataFrame(
        [(1, 1.0)], "k int, v double"
    ).write.format("jdbc").option("url", derby_url).option(
        "dbtable", "upsert_sm"
    ).option("driver", DRIVER).mode("overwrite").save()

    model = {1: 1.0}
    batches = [
        [(1, 5.0), (2, 2.0)],
        [(2, 7.0), (2, 3.0), (4, 4.0)],  # in-batch dup: max wins
        [(1, 0.5), (5, 5.0)],
    ]
    for batch in batches:
        bdf = spark.createDataFrame(batch, "k int, v double")
        jdbc_upsert_write(bdf, derby_url, "upsert_sm", "k", driver=DRIVER)
        staged = {}
        for k, v in batch:
            staged[k] = max(staged.get(k, float("-inf")), v)
        model.update(staged)
        back = jdbc_table(spark, derby_url, "upsert_sm", driver=DRIVER)
        got = {r["k"]: r["v"] for r in back.collect()}
        assert got == model


def test_jdbc_upsert_drops_stage_on_merge_failure(spark, derby_url):
    """A failing MERGE must not leak the staging table (try/finally
    drop): force a failure by upserting into a nonexistent target, then
    assert no *_STAGE_* tables remain in Derby's catalog."""
    from flink_psl_spark.sources import jdbc_table, jdbc_upsert_write

    batch = spark.createDataFrame([(1, 1.0)], "k int, v double")
    with pytest.raises(Exception):
        jdbc_upsert_write(
            batch, derby_url, "no_such_target", "k", driver=DRIVER
        )
    leftovers = (
        jdbc_table(
            spark, derby_url,
            "(SELECT tablename FROM sys.systables "
            " WHERE tablename LIKE '%STAGE%') t",
            driver=DRIVER,
        ).collect()
    )
    assert leftovers == []


def test_jdbc_upsert_quoted_mixed_case_table(spark, derby_url):
    """quote_table_identifiers=True treats the table name as an exact
    case-sensitive identifier (DDL and MERGE agree on quoting)."""
    from flink_psl_spark.sources import jdbc_table, jdbc_upsert_write

    (
        spark.createDataFrame([(1, 1.0)], "k int, v double")
        .write.format("jdbc").option("url", derby_url)
        .option("dbtable", '"MiXed_Tgt"').option("driver", DRIVER)
        .mode("overwrite").save()
    )
    batch = spark.createDataFrame([(1, 9.0), (2, 2.0)], "k int, v double")
    n = jdbc_upsert_write(
        batch, derby_url, "MiXed_Tgt", "k", driver=DRIVER,
        quote_table_identifiers=True,
    )
    assert n == 2
    back = jdbc_table(spark, derby_url, '"MiXed_Tgt"', driver=DRIVER)
    assert sorted((r["k"], r["v"]) for r in back.collect()) == [
        (1, 9.0), (2, 2.0),
    ]


def test_upsert_with_string_key_column_types(spark):
    """String MERGE keys need explicit VARCHAR DDL on Derby (StringType
    maps to CLOB, which is not comparable): create_column_types pins the
    staging table's DDL; the pre-created target uses the same types."""
    import uuid

    from flink_psl_spark.sources import jdbc_table, jdbc_upsert_write

    url = f"jdbc:derby:memory:fpsk_{uuid.uuid4().hex[:8]};create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    ddl = "k VARCHAR(32)"
    base = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    (
        base.write.format("jdbc").option("url", url)
        .option("dbtable", "skey").option("driver", driver)
        .option("createTableColumnTypes", ddl).mode("overwrite").save()
    )
    batch = spark.createDataFrame([("b", 20), ("c", 30)], "k string, v int")
    jdbc_upsert_write(
        batch, url, "skey", "k", driver=driver, create_column_types=ddl
    )
    got = {
        r["K"] if "K" in r else r["k"]: r["V"] if "V" in r else r["v"]
        for r in jdbc_table(spark, url, "skey", driver=driver).collect()
    }
    assert got == {"a": 1, "b": 20, "c": 30}
