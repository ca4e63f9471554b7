"""CDC layer tests: envelope parsers, pure MERGE, streaming upsert sink."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

SCHEMA = "struct<id: bigint, v: string>"


def test_parse_debezium(spark):
    msgs = [
        ('{"before": null, "after": {"id": 1, "v": "a"}, "op": "c", "ts_ms": 10}',),
        ('{"before": {"id": 1, "v": "a"}, "after": {"id": 1, "v": "b"}, "op": "u", "ts_ms": 20}',),
        ('{"before": {"id": 1, "v": "b"}, "after": null, "op": "d", "ts_ms": 30}',),
        ('{"before": null, "after": {"id": 2, "v": "x"}, "op": "r", "ts_ms": 5}',),
    ]
    from flink_psl_spark.cdc import parse_debezium

    raw = spark.createDataFrame(msgs, "value string")
    out = parse_debezium(raw, SCHEMA).collect()
    got = {(r["id"], r["v"], r["__op"], r["__ts_ms"]) for r in out}
    assert got == {
        (1, "a", "I", 10),
        (1, "b", "U", 20),
        (1, "b", "D", 30),  # delete carries the before-image
        (2, "x", "I", 5),
    }


def test_parse_canal_multi_row(spark):
    msgs = [
        ('{"data": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}], '
         '"type": "INSERT", "ts": 1}',),
        ('{"data": [{"id": 1, "v": "z"}], "type": "DELETE", "ts": 2}',),
    ]
    from flink_psl_spark.cdc import parse_canal

    raw = spark.createDataFrame(msgs, "value string")
    got = {(r["id"], r["v"], r["__op"]) for r in parse_canal(raw, SCHEMA).collect()}
    assert got == {(1, "a", "I"), (2, "b", "I"), (1, "z", "D")}


def test_parse_maxwell(spark):
    msgs = [
        ('{"data": {"id": 7, "v": "m"}, "type": "insert", "ts": 1}',),
        ('{"data": {"id": 7, "v": "n"}, "type": "update", "ts": 2}',),
    ]
    from flink_psl_spark.cdc import parse_maxwell

    raw = spark.createDataFrame(msgs, "value string")
    got = {(r["id"], r["v"], r["__op"]) for r in parse_maxwell(raw, SCHEMA).collect()}
    assert got == {(7, "m", "I"), (7, "n", "U")}


def test_merge_upsert(spark):
    from flink_psl_spark.cdc import merge_upsert

    current = spark.createDataFrame(
        [(1, "old"), (2, "keep")], "id bigint, v string"
    )
    changes = spark.createDataFrame(
        [(1, "new", "U", 100), (3, "ins", "I", 100), (2, None, "D", 100)],
        "id bigint, v string, __op string, __ts_ms bigint",
    )
    out = merge_upsert(current, changes, "id", "__ts_ms")
    got = {(r["id"], r["v"]) for r in out.select("id", "v").collect()}
    assert got == {(1, "new"), (3, "ins")}  # 2 deleted, 1 updated, 3 inserted


def test_merge_upsert_no_current(spark):
    from flink_psl_spark.cdc import merge_upsert

    changes = spark.createDataFrame(
        [(1, "a", "I", 1), (1, "b", "U", 2)],
        "id bigint, v string, __op string, __ts_ms bigint",
    )
    out = merge_upsert(None, changes, "id", "__ts_ms")
    assert [(r["id"], r["v"]) for r in out.select("id", "v").collect()] == [(1, "b")]


def test_upsert_into_parquet_stream(spark):
    """foreachBatch MERGE sink: stream a changelog, check the final image."""
    from flink_psl_spark.cdc import upsert_into_parquet

    d = tempfile.mkdtemp(prefix="fps_cdc_")
    src, table, ckpt = f"{d}/src", f"{d}/table", f"{d}/ckpt"
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "a", "I", 1), (2, "b", "I", 1), (1, "a2", "U", 2), (2, None, "D", 2)],
        "id bigint, v string, __op string, __ts_ms bigint",
    ).write.parquet(src, mode="overwrite")

    stream = (
        spark.readStream.schema("id bigint, v string, __op string, __ts_ms bigint")
        .parquet(src)
    )
    q = upsert_into_parquet(stream, table, "id", "__ts_ms", checkpoint=ckpt)
    q.processAllAvailable()
    q.stop()

    img = spark.read.parquet(table)
    assert {(r["id"], r["v"]) for r in img.select("id", "v").collect()} == {(1, "a2")}


def test_upsert_into_partitioned_parquet_prunes(spark):
    """Partition-pruned upsert: only buckets containing batch keys are
    rewritten; untouched buckets' files stay byte-identical on disk."""
    from flink_psl_spark.cdc import key_bucket, upsert_into_partitioned_parquet

    d = tempfile.mkdtemp(prefix="fps_cdcp_")
    src, table, ckpt = f"{d}/src", f"{d}/table", f"{d}/ckpt"
    os.makedirs(src)
    n_buckets = 8

    # seed the table image across all buckets
    seed = spark.range(0, 64).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v"),
        F.lit("I").alias("__op"), F.lit(1).alias("__ts_ms").cast("bigint"),
    )
    (seed.withColumn("__bucket", key_bucket("id", n_buckets))
     .write.partitionBy("__bucket").parquet(table, mode="overwrite"))

    def snapshot():
        out = {}
        for root, _, files in os.walk(table):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.path.getmtime(p)
        return out

    before = snapshot()

    # one batch touching exactly two keys
    spark.createDataFrame(
        [(3, "updated", "U", 2), (64, "new", "I", 2)],
        "id bigint, v string, __op string, __ts_ms bigint",
    ).write.parquet(src, mode="overwrite")
    stream = (
        spark.readStream.schema("id bigint, v string, __op string, __ts_ms bigint")
        .parquet(src)
    )
    q = upsert_into_partitioned_parquet(
        stream, table, "id", "__ts_ms", checkpoint=ckpt, num_buckets=n_buckets
    )
    q.processAllAvailable()
    q.stop()

    after = snapshot()
    touched_buckets = {
        r[0]
        for r in spark.createDataFrame([(3,), (64,)], "id bigint")
        .select(key_bucket("id", n_buckets))
        .collect()
    }
    untouched_before = {
        p: m for p, m in before.items()
        if not any(f"__bucket={b}/" in p for b in touched_buckets)
    }
    # untouched bucket files survive the batch unmodified
    for p, mtime in untouched_before.items():
        assert p in after and after[p] == mtime, f"untouched file rewritten: {p}"
    # and the image itself is the correct merge result
    img = spark.read.parquet(table)
    rows = {r["id"]: r["v"] for r in img.select("id", "v").collect()}
    assert rows[3] == "updated" and rows[64] == "new" and rows[5] == "v5"
    assert len(rows) == 65


def test_cdc_queries_vs_oracle(spark, sf_dir):
    import sys

    sys.path.insert(0, "tests")
    from _oracle import compare, duck_connection

    from flink_psl_spark.queries import ORACLES, QUERIES

    con = duck_connection(sf_dir)
    for name in ["cdc_debezium_roundtrip", "cdc_canal_roundtrip",
                 "cdc_maxwell_roundtrip"]:
        df = QUERIES[name](spark, sf_dir)
        ok, msg = compare(df, con, ORACLES[name])
        assert ok, f"{name}: {msg}"
    con.close()


def test_upsert_restart_idempotent(spark):
    """Restarting the upsert sink with the same checkpoint must not
    re-apply processed batches (checkpoint + idempotent MERGE ≈ the
    reference's exactly-once sink contract)."""
    from flink_psl_spark.cdc import upsert_into_parquet

    d = tempfile.mkdtemp(prefix="fps_cdc_restart_")
    src, table, ckpt = f"{d}/src", f"{d}/table", f"{d}/ckpt"
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "a", "I", 1), (1, "b", "U", 2)],
        "id bigint, v string, __op string, __ts_ms bigint",
    ).write.parquet(src, mode="overwrite")

    def run_once():
        stream = spark.readStream.schema(
            "id bigint, v string, __op string, __ts_ms bigint"
        ).parquet(src)
        q = upsert_into_parquet(stream, table, "id", "__ts_ms", checkpoint=ckpt)
        q.processAllAvailable()
        q.stop()

    run_once()
    first = sorted(map(tuple, spark.read.parquet(table).collect()))
    run_once()  # same checkpoint, no new files → no reprocessing
    second = sorted(map(tuple, spark.read.parquet(table).collect()))
    assert first == second
    assert [(r[0], r[1]) for r in first] == [(1, "b")]


def test_cdc_malformed_records_are_quarantined_not_fatal(spark):
    """Unparseable JSON and unknown ops behave like the reference's
    ignore-parse-errors mode: NULL rows / NULL __op that the normalize
    filter excludes, never a job failure."""
    from pyspark.sql import functions as F

    from flink_psl_spark.cdc import merge_upsert, parse_debezium

    rows = [
        ('{"op":"c","after":{"id":1,"v":"x"},"before":null,"ts_ms":1}',),
        ("{not json at all",),
        ('{"op":"zz","after":{"id":9,"v":"y"},"ts_ms":2}',),
        (None,),
    ]
    df = spark.createDataFrame(rows, "value string")
    parsed = parse_debezium(df, "struct<id: int, v: string>")
    assert parsed.count() == 4  # nothing crashed
    quarantined = parsed.where(F.col("__op").isNull())
    assert quarantined.count() == 3
    image = merge_upsert(None, parsed, "id", "__ts_ms")
    assert [(r["id"], r["v"]) for r in image.collect()] == [(1, "x")]


def test_parse_upsert_tombstone_semantics(spark):
    """upsert-kafka format: NULL value deletes its key; latest offset
    wins; metadata columns pass through for versioning."""
    from flink_psl_spark.cdc import parse_upsert
    from flink_psl_spark.operators.changelog import changelog_normalize

    rows = [
        ('{"k":1}', '{"x":"a"}', 1),
        ('{"k":1}', '{"x":"b"}', 2),
        ('{"k":2}', '{"x":"c"}', 3),
        ('{"k":2}', None, 4),          # tombstone deletes key 2
        ('{"k":3}', None, 5),          # delete of a never-seen key
    ]
    df = spark.createDataFrame(rows, "key string, value string, offset long")
    parsed = parse_upsert(df, "struct<k: bigint>", "struct<x: string>")
    assert set(parsed.columns) == {"k", "x", "__op", "offset"}
    image = changelog_normalize(parsed, ["k"], ["offset"])
    assert [(r["k"], r["x"]) for r in image.orderBy("k").collect()] == [(1, "b")]


def test_ndu_analysis_flags_and_gates(spark, t):
    """Non-deterministic-update analysis (reference NDU strategy): rand /
    uuid / monotonically_increasing_id are flagged via Catalyst's own
    deterministic metadata; a deterministic frame passes TRY_RESOLVE."""
    import pytest
    from pyspark.sql import functions as F

    from flink_psl_spark.operators.changelog import (
        assert_deterministic_updates,
        non_deterministic_expressions,
    )

    clean = t["nation"].select(
        "n_nationkey", F.md5(F.col("n_name")).alias("h")
    )
    assert non_deterministic_expressions(clean) == []
    assert assert_deterministic_updates(clean) == []

    dirty = t["nation"].select(
        "n_nationkey",
        F.rand().alias("r"),
        F.expr("uuid()").alias("u"),
        F.monotonically_increasing_id().alias("m"),
    ).where(F.col("r") > 0.0)
    nd = non_deterministic_expressions(dirty)
    assert "rand" in nd and "uuid" in nd
    assert assert_deterministic_updates(dirty, strategy="IGNORE") == nd
    with pytest.raises(ValueError, match="non-deterministic"):
        assert_deterministic_updates(dirty)


def test_scd2_history_versions_and_temporal_probe(spark):
    """SCD2: I/U open versions, the next event closes them, D closes
    without opening; the produced intervals answer point-in-time
    probes (the temporal-join contract)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from flink_psl_spark.operators.changelog import scd2_history

    TS = lambda h: dt.datetime(2024, 1, 1, h)  # noqa: E731
    ch = spark.createDataFrame(
        [
            (1, TS(1), "v1", "I", 1),
            (1, TS(3), "v2", "U", 2),
            (1, TS(5), None, "D", 3),
            (1, TS(7), "v3", "I", 4),   # re-insert after delete
            (2, TS(2), "w1", "I", 5),
        ],
        "k int, ts timestamp, attr string, __op string, seq int",
    )
    hist = scd2_history(ch, "k", "ts", tiebreak=["seq"])
    rows = sorted(
        (r["k"], r["attr"], r["valid_from"].hour,
         r["valid_to"].hour if r["valid_to"] else None, r["is_current"])
        for r in hist.collect()
    )
    assert rows == [
        (1, "v1", 1, 3, False),
        (1, "v2", 3, 5, False),   # closed by the delete
        (1, "v3", 7, None, True),
        (2, "w1", 2, None, True),
    ]
    # point-in-time probe at hour 4 resolves to v2; at hour 6 (after the
    # delete, before the re-insert) resolves to nothing
    at4 = hist.where(
        (F.col("k") == 1)
        & (F.col("valid_from") <= TS(4))
        & ((F.col("valid_to") > TS(4)) | F.col("valid_to").isNull())
    )
    assert [r["attr"] for r in at4.collect()] == ["v2"]
    at6 = hist.where(
        (F.col("k") == 1)
        & (F.col("valid_from") <= TS(6))
        & ((F.col("valid_to") > TS(6)) | F.col("valid_to").isNull())
    )
    assert at6.count() == 0


def test_scd2_into_parquet_multibatch_converges(spark, tmp_path):
    """The streaming SCD2 sink must converge to the batch scd2_history
    even when a key's events are SPLIT ACROSS micro-batches (one input
    file per trigger forces multiple batches here)."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    from flink_psl_spark.cdc import scd2_into_parquet
    from flink_psl_spark.operators.changelog import scd2_history
    from flink_psl_spark.streaming import stream_from_parquet

    TS = lambda h: dt.datetime(2024, 1, 1, h)  # noqa: E731
    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1: the LATER half of key 1's history arrives first
    spark.createDataFrame(
        [(1, TS(5), "v3", "U", 3), (2, TS(2), "w1", "I", 4)],
        "k int, ts timestamp, attr string, __op string, seq int",
    ).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(
        [(1, TS(1), "v1", "I", 1), (1, TS(3), "v2", "U", 2)],
        "k int, ts timestamp, attr string, __op string, seq int",
    ).coalesce(1).write.parquet(src + "/f2")

    files = spark.read.option("recursiveFileLookup", "true").parquet(src)
    all_events = files
    stream = (
        spark.readStream.schema(files.schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = scd2_into_parquet(
        stream, str(tmp_path / "dim"), "k", "ts",
        checkpoint=str(tmp_path / "ckpt"),
        events_path=str(tmp_path / "store"),
        tiebreak=["seq"], available_now=True,
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "dim"))
            .select("k", "attr", "valid_from", "valid_to", "is_current")
            .collect())
    )
    want = sorted(
        map(tuple, scd2_history(all_events, "k", "ts", tiebreak=["seq"])
            .select("k", "attr", "valid_from", "valid_to", "is_current")
            .collect())
    )
    assert got == want
    # key 1 history: v1[1,3) v2[3,5) v3[5,∞) — the late-arriving early
    # events re-opened and closed correctly
    k1 = [r for r in got if r[0] == 1]
    assert len(k1) == 3 and k1[-1][4] is True


def test_retract_rows_expands_updates_to_pairs(spark):
    from pyspark.sql import functions as F

    from flink_psl_spark.operators import retract_rows

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 25.0), (4, 40.0)], "k int, v double"
    )
    rows = {
        (r["k"], r["v"], r["__sign"])
        for r in retract_rows(old, new, "k").collect()
    }
    # unchanged key 1 emits nothing; update k=2 is the -UB/+UA pair;
    # delete k=3 is -1 before-image; insert k=4 is +1 after-image
    assert rows == {
        (2, 20.0, -1), (2, 25.0, 1), (3, 30.0, -1), (4, 40.0, 1),
    }
    # distributive aggregates advance by the signed deltas exactly
    delta = (
        retract_rows(old, new, "k")
        .agg(
            F.sum("__sign").alias("dn"),
            F.sum(F.col("__sign") * F.col("v")).alias("dv"),
        )
        .collect()[0]
    )
    assert delta["dn"] == 0 and delta["dv"] == 15.0
