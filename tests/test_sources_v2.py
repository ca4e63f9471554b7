"""Python Data Source API (FLIP-27 Source parity, SURVEY §2.1): batch splits,
filter pushdown, and offset-tracked streaming."""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def _register(spark):
    from flink_psl_spark.sources_v2 import register_python_sources

    register_python_sources(spark)


def test_batch_read_deterministic(spark):
    _register(spark)
    df = spark.read.format("pydatagen").option("n", 50).load()
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert len(rows) == 50
    assert rows[10]["key"] == "k3" and rows[10]["value"] == 7.0  # 10*7%1000/10
    assert rows[10]["ts"].minute == 10


def test_batch_partition_count(spark):
    _register(spark)
    df = (
        spark.read.format("pydatagen")
        .option("n", 100)
        .option("numPartitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 100


def test_filter_pushdown_prunes_generation(spark):
    _register(spark)
    df = spark.read.format("pydatagen").option("n", 1000).load()
    flt = df.where((F.col("id") >= 100) & (F.col("id") < 110))
    got = sorted(r["id"] for r in flt.collect())
    assert got == list(range(100, 110))
    # the id bounds are absorbed by pushFilters: no post-scan range
    # comparison remains in the plan (only the residual isnotnull guard)
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert ">= 100" not in plan and "< 110" not in plan


def test_unsupported_filter_still_correct(spark):
    _register(spark)
    df = spark.read.format("pydatagen").option("n", 100).load()
    got = df.where("key = 'k3' AND id < 20").collect()
    assert sorted(r["id"] for r in got) == [3, 10, 17]


def test_stream_available_now_reads_everything(spark):
    from flink_psl_spark.streaming import run_to_memory_table

    _register(spark)
    st = spark.readStream.format("pydatagen").option("n", 300).load()
    mem = run_to_memory_table(
        st.groupBy("key").agg(F.count("*").alias("n")), output_mode="complete"
    )
    assert sum(r["n"] for r in mem.collect()) == 300


def test_stream_rate_limited_multi_batch(spark):
    """rowsPerBatch paces a processing-time trigger; every batch's committed
    offset range is read in full (no silent skips)."""
    import tempfile
    import uuid

    _register(spark)
    st = (
        spark.readStream.format("pydatagen")
        .option("n", 250)
        .option("rowsPerBatch", 100)
        .load()
    )
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        st.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="fps_pds_"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table(name).count() >= 250:
                break
            time.sleep(0.5)
        got = spark.table(name).count()
    finally:
        q.stop()
    assert got == 250
    batches = q.recentProgress
    assert len([p for p in batches if p["numInputRows"] > 0]) >= 3


def test_jsonl_two_phase_commit_sink(spark, tmp_path):
    import json
    import os

    _register(spark)
    out = str(tmp_path / "sinkout")
    df = spark.read.format("pydatagen").option("n", 120).load()
    df.repartition(3).write.format("pyjsonl").option("path", out).mode(
        "append"
    ).save()

    files = sorted(os.listdir(out))
    assert "_SUCCESS" in files
    assert not [f for f in files if f.endswith(".inprogress")]
    parts = [f for f in files if f.endswith(".jsonl")]
    assert len(parts) == 3
    rows = []
    for p in parts:
        with open(os.path.join(out, p)) as fh:
            rows += [json.loads(line) for line in fh]
    assert len(rows) == 120
    assert sorted(r["id"] for r in rows) == list(range(120))
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["rows"] == 120


def test_jsonl_stream_writer_epoch_commit(spark, tmp_path):
    import json
    import os

    _register(spark)
    out = str(tmp_path / "streamout")
    st = spark.readStream.format("pydatagen").option("n", 80).load()
    import tempfile

    q = (
        st.writeStream.format("pyjsonl")
        .option("path", out)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="fps_sw_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    files = sorted(os.listdir(out))
    parts = [f for f in files if f.endswith(".jsonl")]
    assert parts and all(f.startswith("epoch-") for f in parts)
    assert not [f for f in files if f.endswith(".inprogress")]
    rows = []
    for p in parts:
        with open(os.path.join(out, p)) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["id"] for r in rows) == list(range(80))


def test_jsonl_sink_abort_publishes_nothing(spark, tmp_path):
    """2PC abort path: a failing task must leave the sink unpublished — no
    .jsonl part becomes visible and no _SUCCESS manifest is written (the
    all-or-nothing half of the protocol)."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    _register(spark)
    out = str(tmp_path / "abortout")
    df = spark.read.format("pydatagen").option("n", 120).load()
    poisoned = df.select(
        F.when(
            F.col("id") == 77,
            F.expr("CAST(raise_error('sink abort test') AS BIGINT)"),
        )
        .otherwise(F.col("id"))
        .alias("id"),
        "ts",
        "key",
        "value",
    )
    with _pytest.raises(Exception, match="sink abort test"):
        poisoned.repartition(3).write.format("pyjsonl").option(
            "path", out
        ).mode("append").save()
    files = os.listdir(out) if os.path.isdir(out) else []
    assert not [f for f in files if f.endswith(".jsonl")]
    assert "_SUCCESS" not in files


def test_datagen_field_kinds(spark):
    """schema + fields.<f>.kind options: sequence offsets, md5-uniform
    randoms within [min,max), sized random strings — all deterministic
    across reads."""
    from flink_psl_spark.sources_v2 import register_python_sources

    register_python_sources(spark)

    def load():
        return (
            spark.read.format("pydatagen")
            .option("n", 50)
            .option("schema", "uid bigint, score double, tag string")
            .option("fields.uid.start", "7")
            .option("fields.score.kind", "random")
            .option("fields.score.min", "2")
            .option("fields.score.max", "4")
            .load()
        )

    rows = sorted(map(tuple, load().collect()))
    assert [r[0] for r in rows] == list(range(7, 57))
    assert all(2.0 <= r[1] < 4.0 for r in rows)
    assert all(r[2].startswith("tag_") for r in rows)
    assert rows == sorted(map(tuple, load().collect()))  # deterministic
