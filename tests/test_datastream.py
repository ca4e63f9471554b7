"""DataStream facade tests (PyFlink DataStream API parity)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from flink_psl_spark.datastream import DataStream


def test_map_filter_expression_path(spark):
    ds = DataStream.from_collection(
        spark, [(1, 2), (3, 4), (5, 6)], "a int, b int"
    )
    out = (
        ds.map([F.col("a"), (F.col("a") + F.col("b")).alias("s")])
        .filter("s > 3")
        .execute_and_collect()
    )
    assert sorted((r["a"], r["s"]) for r in out) == [(3, 7), (5, 11)]


def test_map_flatmap_callable_path(spark):
    ds = DataStream.from_collection(spark, [("a b",), ("c",)], "line string")

    def splitter(row):
        for w in row["line"].split():
            yield {"word": w, "n": 1}

    words = ds.flat_map(splitter, "word string, n int")
    got = sorted(r["word"] for r in words.execute_and_collect())
    assert got == ["a", "b", "c"]

    mapped = words.map(
        lambda r: {"word": r["word"].upper(), "n": r["n"] * 2},
        "word string, n int",
    )
    assert {(r["word"], r["n"]) for r in mapped.execute_and_collect()} == {
        ("A", 2), ("B", 2), ("C", 2)
    }


def test_keyed_reduce_and_aggs(spark):
    ds = DataStream.from_collection(
        spark,
        [("k", 1, 10.0), ("k", 2, 5.0), ("j", 1, 7.0)],
        "k string, seq int, v double",
    )

    def take_latest_sum(acc, row):
        return {"k": acc["k"], "seq": row["seq"], "v": acc["v"] + row["v"]}

    red = ds.key_by("k").reduce(take_latest_sum, order_by="seq")
    got = {(r["k"], r["seq"], r["v"]) for r in red.execute_and_collect()}
    assert got == {("k", 2, 15.0), ("j", 1, 7.0)}

    s = ds.key_by("k").sum("v")
    assert {(r["k"], r["v"]) for r in s.execute_and_collect()} == {
        ("k", 15.0), ("j", 7.0)
    }
    mb = ds.key_by("k").max_by("v", "seq")
    assert {(r["k"], r["seq"]) for r in mb.execute_and_collect()} == {
        ("k", 1), ("j", 1)
    }


def test_union_sequence_sink(spark):
    a = DataStream.from_sequence(spark, 1, 3)
    b = DataStream.from_sequence(spark, 10, 11)
    u = a.union(b)
    assert sorted(r["value"] for r in u.execute_and_collect()) == [1, 2, 3, 10, 11]
    d = tempfile.mkdtemp(prefix="fps_ds_")
    u.write_to(d, "parquet")
    assert spark.read.parquet(d).count() == 5


def test_broadcast_join(spark, t):
    ds = DataStream(t["nation"])
    out = ds.broadcast_join(
        t["region"], F.col("n_regionkey") == F.col("r_regionkey")
    )
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.df.count() == t["nation"].count()

def test_iterate_bounded_loop(spark):
    # Flink's canonical iterate example: subtract 1 until non-positive;
    # rows leave the loop the round they fail the feedback condition.
    ds = DataStream.from_collection(
        spark, [(5,), (2,), (0,)], "value int"
    )
    out = ds.iterate(
        body=lambda s: s.map([(F.col("value") - F.lit(1)).alias("value")]),
        feedback="value > 0",
        max_iterations=50,
    )
    # every row converges to exactly 0 or below after its first failing step
    assert sorted(r["value"] for r in out.execute_and_collect()) == [-1, 0, 0]


def test_iterate_budget_exhausted_drains(spark):
    # max_iterations caps the loop; in-flight rows drain to the output.
    ds = DataStream.from_collection(spark, [(10,)], "value int")
    out = ds.iterate(
        body=lambda s: s.map([(F.col("value") - F.lit(1)).alias("value")]),
        feedback="value > 0",
        max_iterations=3,
    )
    assert [r["value"] for r in out.execute_and_collect()] == [7]


def test_keyed_window_kinds(spark):
    """KeyedStream.window: tumbling aggregate, sliding row multiplication,
    session gap merging, and windowed reduce all through the fluent API."""
    import datetime as dt

    from pyspark.sql import functions as F

    from flink_psl_spark.datastream import DataStream

    TS = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        ("a", TS(1), 1.0), ("a", TS(5), 2.0),     # tumble win 0
        ("a", TS(11), 4.0),                        # tumble win 1
        ("b", TS(59), 8.0),
    ]
    ds = DataStream(
        spark.createDataFrame(rows, "k string, ts timestamp, v double")
    )

    tumbled = (
        ds.key_by("k").window("ts", size="10 minutes")
        .aggregate(F.sum("v").alias("s")).df
    )
    got = {
        (r["k"], r["window_start"].minute, r["s"]) for r in tumbled.collect()
    }
    assert got == {("a", 0, 3.0), ("a", 10, 4.0), ("b", 50, 8.0)}

    slid = (
        ds.key_by("k").window("ts", size="10 minutes", slide="5 minutes")
        .aggregate(F.count("*").alias("n")).df
    )
    # row at minute 1 lands in windows [-5,5) and [0,10) -> 2 windows
    assert slid.where("k = 'a'").agg(F.sum("n")).collect()[0][0] == 6

    sess = (
        ds.key_by("k").window("ts", gap="5 minutes")
        .aggregate(F.count("*").alias("n")).df
    )
    assert sorted(r["n"] for r in sess.where("k = 'a'").collect()) == [1, 2]

    reduced = (
        ds.key_by("k").window("ts", size="10 minutes")
        .reduce(lambda a, b: {**b, "v": a["v"] + b["v"]}, order_by="ts").df
    )
    got_r = {
        (r["k"], r["v"]) for r in reduced.collect()
    }
    assert got_r == {("a", 3.0), ("a", 4.0), ("b", 8.0)}


def test_window_all_non_keyed(spark):
    """windowAll: one window family over ALL rows (no key)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from flink_psl_spark.datastream import DataStream

    TS = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    ds = DataStream(
        spark.createDataFrame(
            [("a", TS(1), 1.0), ("b", TS(2), 2.0), ("a", TS(15), 4.0)],
            "k string, ts timestamp, v double",
        )
    )
    out = ds.window_all("ts", size="10 minutes").aggregate(
        F.sum("v").alias("s")
    ).df
    assert {
        (r["window_start"].minute, r["s"]) for r in out.collect()
    } == {(0, 3.0), (10, 4.0)}
