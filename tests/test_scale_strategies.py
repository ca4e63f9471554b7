"""Scale-strategy tests: bucketed co-located joins (shuffle elimination),
salted aggregation, embedding-dedup LSH path, AQE configuration."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_eliminates_shuffle(spark, t):
    """Bucketing both sides on the join key (reference: co-located joins /
    pre-partitioning, SURVEY 'bucketing for co-located joins') removes the
    Exchange under the sort-merge join."""
    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"orders_b_{suffix}", f"li_b_{suffix}"
    try:
        (t["orders"].write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .mode("overwrite").saveAsTable(ta))
        (t["lineitem"].write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .mode("overwrite").saveAsTable(tb))
        # disable broadcast so the join would normally shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(ta).join(
            spark.table(tb),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        want = t["orders"].join(
            t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey")
        ).count()
        assert joined.count() == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_salted_agg_matches_plain(spark, t):
    from flink_psl_spark.operators.skew import salted_agg

    out = salted_agg(
        t["events"],
        "event_type",
        {
            "total": ("sum", "value"),
            "n": ("count", "event_id"),
            "avg_v": ("avg", "value"),
            "uniq_users": ("count_distinct", "user_id"),
        },
        salt_buckets=16,
    )
    got = {
        r["event_type"]: (round(r["total"], 6), r["n"], round(r["avg_v"], 6),
                          r["uniq_users"])
        for r in out.collect()
    }
    plain = (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.round(F.sum("value"), 6).alias("total"),
            F.count("event_id").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_v"),
            F.countDistinct("user_id").alias("u"),
        )
    )
    want = {
        r["event_type"]: (r["total"], r["n"], r["avg_v"], r["u"])
        for r in plain.collect()
    }
    assert got == want


def test_salted_agg_two_shuffles(spark, t):
    """The salted plan must be exactly two hash exchanges (key+salt, key)."""
    from flink_psl_spark.operators.skew import salted_agg

    out = salted_agg(t["events"], "event_type", {"total": ("sum", "value")})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2


def test_embedding_dedup_lsh_vs_exact(spark, t):
    from flink_psl_spark.llm import embedding_dedup

    emb = t["embeddings"]
    exact = {
        r["vec_id"]
        for r in embedding_dedup(emb, threshold=0.2, exact=True).collect()
    }
    approx = {
        r["vec_id"]
        for r in embedding_dedup(
            emb, threshold=0.2, n_planes=4, n_tables=16
        ).collect()
    }
    # LSH may miss candidate pairs → keeps a superset of the exact survivors
    assert exact <= approx
    missed = len(approx - exact)
    assert missed / max(len(exact), 1) < 0.25, f"LSH missed too many: {missed}"


def test_aqe_session_settings(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert (
        "RocksDB" in spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    )


def test_join_strategy_hints(spark, t):
    """Join strategy hints (reference FlinkHints BROADCAST / SHUFFLE_HASH /
    SHUFFLE_MERGE / NEST_LOOP — same names in Spark)."""
    t["orders"].createOrReplaceTempView("o_h")
    t["lineitem"].createOrReplaceTempView("l_h")

    merge = spark.sql(
        "SELECT /*+ MERGE(l_h) */ COUNT(*) AS n FROM o_h "
        "JOIN l_h ON o_orderkey = l_orderkey"
    )
    assert "SortMergeJoin" in merge._jdf.queryExecution().executedPlan().toString()

    shash = spark.sql(
        "SELECT /*+ SHUFFLE_HASH(l_h) */ COUNT(*) AS n FROM o_h "
        "JOIN l_h ON o_orderkey = l_orderkey"
    )
    assert "ShuffledHashJoin" in shash._jdf.queryExecution().executedPlan().toString()

    bcast = spark.sql(
        "SELECT /*+ BROADCAST(o_h) */ COUNT(*) AS n FROM o_h "
        "JOIN l_h ON o_orderkey = l_orderkey"
    )
    assert "BroadcastHashJoin" in bcast._jdf.queryExecution().executedPlan().toString()
    n = t["orders"].join(
        t["lineitem"], t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"]
    ).count()
    assert merge.first()["n"] == shash.first()["n"] == bcast.first()["n"] == n


def test_nonequi_join_is_broadcast_nlj(spark, t):
    """Theta joins plan as BroadcastNestedLoopJoin (reference
    BatchExecNestedLoopJoin.java:46)."""
    df = t["nation"].alias("a").join(
        t["nation"].alias("b"),
        F.expr("a.n_nationkey < b.n_nationkey"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
