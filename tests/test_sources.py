"""Sources/formats tests: round trips per format, partitioned layout +
partition pruning, datagen/rate stream, noop sink."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sample(spark, t):
    return t["nation"]


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_format_round_trip(spark, sample, fmt):
    from flink_psl_spark.sources import read_table, write_table

    d = tempfile.mkdtemp(prefix=f"fps_fmt_{fmt}_")
    write_table(sample, d, fmt)
    back = read_table(
        spark, d, fmt,
        schema="n_nationkey int, n_name string, n_regionkey int",
    ).select("n_nationkey", "n_name", "n_regionkey")
    want = sorted(map(tuple, sample.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want


def test_text_round_trip(spark, sample):
    from flink_psl_spark.sources import read_table, write_table

    d = tempfile.mkdtemp(prefix="fps_fmt_text_")
    write_table(sample.select(F.col("n_name").alias("value")), d, "text")
    got = {r["value"] for r in read_table(spark, d, "text").collect()}
    assert got == {r["n_name"] for r in sample.collect()}


def test_partitioned_write_prunes(spark, t):
    """Partitioned layout must produce partition pruning on a filtered read
    (reference SupportsPartitionPushDown ≈ Spark partition pruning)."""
    from flink_psl_spark.sources import read_table, write_table

    d = tempfile.mkdtemp(prefix="fps_part_")
    write_table(t["orders"], d, "parquet", partition_by="o_orderpriority")
    back = read_table(spark, d, "parquet").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    # pruned scan reads a single partition directory
    assert "PartitionFilters: [" in plan and "o_orderpriority" in plan
    want = t["orders"].where(F.col("o_orderpriority") == "1-URGENT").count()
    assert back.count() == want


def test_datagen_stream(spark):
    from flink_psl_spark.sources import datagen_stream
    from flink_psl_spark.streaming import run_to_memory_table

    import uuid

    st = datagen_stream(spark, rows_per_second=500)
    name = f"dg_{uuid.uuid4().hex[:8]}"
    q = (
        st.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table(name).count() > 0:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = spark.table(name)
    assert got.columns == ["id", "ts", "user_id", "amount", "label"]
    row = got.first()
    assert row["user_id"] == row["id"] % 100
    assert row["label"] == f"u_{row['id'] % 100}"


def test_blackhole_sink(spark, sf_dir):
    from flink_psl_spark.sources import to_blackhole
    from flink_psl_spark.streaming import stream_from_parquet

    ev = stream_from_parquet(spark, f"{sf_dir}/events.parquet", ts_col="ts")
    q = to_blackhole(ev.select("event_id")).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert not q.isActive or q.stop() is None


def test_unsupported_format_raises(spark, sample):
    from flink_psl_spark.sources import write_table

    with pytest.raises(ValueError):
        write_table(sample, "/tmp/x", "avrox")


def test_socket_source_stream(spark):
    """DataStream socketTextStream parity (SURVEY §2.1): format('socket')
    against an in-process TCP listener."""
    import socket
    import tempfile
    import threading
    import time
    import uuid

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    lines = [f"msg-{i}" for i in range(5)]

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(("\n".join(lines) + "\n").encode())
            time.sleep(8)  # keep the stream open while batches drain

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    st = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        st.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="fps_sock_"))
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table(name).count() >= len(lines):
                break
            time.sleep(0.5)
        got = sorted(r["value"] for r in spark.table(name).collect())
    finally:
        q.stop()
        srv.close()
    assert got == sorted(lines)


def test_compact_table_merges_small_files(spark, t, tmp_path):
    """FileSink-compaction parity: many small files -> ~target-sized few,
    same rows; under-threshold dirs are left untouched."""
    import os

    from flink_psl_spark.sources import compact_table, compaction_plan

    path = str(tmp_path / "li")
    t["lineitem"].select("l_orderkey", "l_partkey", "l_quantity").repartition(
        40
    ).write.parquet(path)

    def data_files():
        return [
            f
            for _r, _d, fs in os.walk(path)
            for f in fs
            if not f.startswith(("_", "."))
        ]

    n_before = len(data_files())
    assert n_before >= 40
    before = spark.read.parquet(path)
    rows = before.count()
    chk = before.agg(F.sum("l_quantity")).first()[0]

    plan = compact_table(spark, path, target_file_bytes=1 << 20)
    assert plan["should_compact"] and plan["compacted"]
    assert len(data_files()) == plan["target_files"] < n_before

    after = spark.read.parquet(path)
    assert after.count() == rows
    assert after.agg(F.sum("l_quantity")).first()[0] == chk

    # already-compacted dir: trigger does not fire, files untouched
    plan2 = compaction_plan(path, target_file_bytes=1 << 20)
    n = len(data_files())
    compact_table(spark, path, target_file_bytes=1 << 20)
    assert len(data_files()) == n
    assert plan2["n_files"] == n


def test_compact_partitioned_table_touches_only_firing_partitions(spark, t, tmp_path):
    import os

    from flink_psl_spark.sources import compact_partitioned_table

    path = str(tmp_path / "orders_p")
    orders = t["orders"].select("o_orderkey", "o_totalprice", "o_orderpriority")
    # partition 1-URGENT fragmented (20 files), others single-file
    frag = orders.where(F.col("o_orderpriority") == "1-URGENT").repartition(20)
    rest = orders.where(F.col("o_orderpriority") != "1-URGENT").coalesce(1)
    frag.unionByName(rest).write.partitionBy("o_orderpriority").parquet(path)

    def files_in(part):
        d = os.path.join(path, f"o_orderpriority={part}")
        return sorted(
            (f, os.path.getsize(os.path.join(d, f)))
            for f in os.listdir(d)
            if not f.startswith(("_", "."))
        )

    before_other = files_in("3-MEDIUM")
    rows = spark.read.parquet(path).count()

    res = compact_partitioned_table(spark, path, target_file_bytes=1 << 20)
    assert res["compacted"] == 1  # only the fragmented partition fired
    assert len(files_in("1-URGENT")) == 1
    assert files_in("3-MEDIUM") == before_other  # byte-identical, untouched
    assert spark.read.parquet(path).count() == rows


def test_sql_script_client(spark, sf_dir, tmp_path):
    """sql-client -f parity: statement splitting, SET/RESET, DDL + DML +
    query over the registered fixture tables."""
    from flink_psl_spark.sql_client import run_script_file, split_statements

    assert split_statements(
        "SELECT 1; -- trailing comment; with semicolon\n"
        "SELECT ';' AS semi;\nSET 'a.b' = 'c;d';"
    ) == ["SELECT 1", "SELECT ';' AS semi", "SET 'a.b' = 'c;d'"]

    out_dir = tmp_path / "script_out"
    script = f"""
    -- session config, reference SET syntax
    SET 'my.pipeline.flag' = 'on';

    CREATE OR REPLACE TEMPORARY VIEW big_orders AS
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000;

    CREATE TABLE script_sink USING parquet LOCATION '{out_dir}'
      AS SELECT COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
         FROM big_orders;

    SELECT n, total FROM script_sink;

    RESET 'my.pipeline.flag';
    """
    p = tmp_path / "job.sql"
    p.write_text(script)
    results = run_script_file(spark, str(p), sf_dir=sf_dir)
    kinds = [r.kind for r in results]
    assert kinds == ["set", "query", "query", "query", "reset"]

    row = results[3].df.first()
    expected = (
        spark.table("orders")
        .where(F.col("o_totalprice") > 100000)
        .agg(F.count("*"), F.round(F.sum("o_totalprice"), 2))
        .first()
    )
    assert (row["n"], row["total"]) == (expected[0], expected[1])
    spark.sql("DROP TABLE script_sink")


def test_avro_py_codec_spec_vectors():
    """Binary-encoding vectors from the public Avro spec (zigzag varints,
    length-prefixed strings), plus union/float handling."""
    from flink_psl_spark.formats.avro_py import (
        decode_record,
        encode_record,
        zigzag_decode,
        zigzag_encode,
    )

    assert [zigzag_encode(n) for n in (0, -1, 1, -2, 2, -64, 64)] == [
        b"\x00", b"\x01", b"\x02", b"\x03", b"\x04", b"\x7f", b"\x80\x01",
    ]
    for n in (0, 1, -1, 63, -64, 64, 2**40, -(2**40), 2**62):
        assert zigzag_decode(zigzag_encode(n), 0)[0] == n

    sch = {"type": "record", "name": "r", "fields": [{"name": "s", "type": "string"}]}
    assert encode_record(sch, {"s": "foo"}) == b"\x06foo"  # spec example

    sch2 = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": "double"},
            {"name": "d", "type": "boolean"},
        ],
    }
    for rec in (
        {"a": 27, "b": None, "c": 3.5, "d": True},
        {"a": -27, "b": "hi", "c": -0.25, "d": False},
    ):
        assert decode_record(sch2, encode_record(sch2, rec)) == rec


def test_avro_py_dataframe_roundtrip(spark, t):
    """orders subset → Avro binary → back: values identical, one Arrow hop
    each way."""
    from flink_psl_spark.formats.avro_py import from_avro_py, to_avro_py

    schema = {
        "type": "record",
        "name": "order",
        "fields": [
            {"name": "o_orderkey", "type": "long"},
            {"name": "o_totalprice", "type": "double"},
            {"name": "o_orderpriority", "type": ["null", "string"]},
        ],
    }
    src = t["orders"].select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).limit(500)
    back = from_avro_py(to_avro_py(src, schema), schema)
    a = {r["o_orderkey"]: r for r in src.collect()}
    b = {r["o_orderkey"]: r for r in back.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k]


def test_protobuf_py_codec_spec_vectors():
    """Wire-format vectors from the public protobuf encoding guide."""
    from flink_psl_spark.formats.protobuf_py import (
        decode_message,
        encode_message,
        varint_encode,
    )

    # docs example: message Test1 { int32 a = 1; } with a=150 -> 08 96 01
    f1 = [("a", 1, "int32")]
    assert encode_message(f1, {"a": 150}) == b"\x08\x96\x01"
    # docs example: string b = 2 with "testing" -> 12 07 "testing"
    f2 = [("b", 2, "string")]
    assert encode_message(f2, {"b": "testing"}) == b"\x12\x07testing"
    # negative int64 is 10-byte two's-complement varint
    assert len(varint_encode(-1)) == 10

    fields = [
        ("k", 1, "int64"),
        ("price", 2, "double"),
        ("name", 3, "string"),
        ("neg", 4, "sint64"),
        ("flag", 5, "bool"),
    ]
    for rec in (
        {"k": 150, "price": 3.5, "name": "testing", "neg": -2, "flag": True},
        {"k": -7, "price": 0.0, "name": "", "neg": 0, "flag": False},
    ):
        assert decode_message(fields, encode_message(fields, rec)) == rec


def test_avro_py_nested_complex_types():
    """Nested record + array + map + enum + fixed roundtrip, plus the
    spec's array block-encoding byte vector."""
    from flink_psl_spark.formats.avro_py import decode_record, encode_record

    sch = {
        "type": "record", "name": "R", "fields": [
            {"name": "id", "type": "long"},
            {"name": "meta", "type": {
                "type": "record", "name": "M", "fields": [
                    {"name": "s", "type": "string"},
                    {"name": "x", "type": ["null", "double"]}]}},
            {"name": "words", "type": {"type": "array", "items": "string"}},
            {"name": "attrs", "type": {"type": "map", "values": "long"}},
            {"name": "color", "type": {
                "type": "enum", "name": "C", "symbols": ["RED", "GREEN"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "F", "size": 3}},
        ],
    }
    for rec in (
        {"id": 7, "meta": {"s": "hi", "x": None}, "words": ["a", "bb", ""],
         "attrs": {"k1": 1, "k2": -5}, "color": "GREEN", "fx": b"abc"},
        {"id": 0, "meta": {"s": "", "x": 2.5}, "words": [], "attrs": {},
         "color": "RED", "fx": b"xyz"},
    ):
        assert decode_record(sch, encode_record(sch, rec)) == rec
    # spec vector: array [3, 27] of long -> count 2, zigzag 3, zigzag 27, 0
    asch = {"type": "record", "name": "A", "fields": [
        {"name": "a", "type": {"type": "array", "items": "long"}}]}
    assert encode_record(asch, {"a": [3, 27]}) == bytes(
        [0x04, 0x06, 0x36, 0x00]
    )
    # block-with-size form (negative count) accepted on read
    blocky = bytes([0x03, 0x04, 0x06, 0x36, 0x00])  # -2 items, 2 bytes
    assert decode_record(asch, blocky) == {"a": [3, 27]}


def test_protobuf_py_nested_repeated():
    """Submessages, repeated strings/messages, packed numerics (encoding
    guide vector), expanded-form read compatibility, proto3 defaults."""
    from flink_psl_spark.formats.protobuf_py import (
        decode_message,
        encode_message,
    )

    pf = [
        ("id", 1, "int64"),
        ("user", 2, ("message", [("uid", 1, "int64"), ("name", 2, "string")])),
        ("tags", 3, ("repeated", "string")),
        ("vals", 4, ("repeated", "int64")),
        ("pts", 5, ("repeated", ("message", [("x", 1, "double")]))),
    ]
    msg = {"id": 5, "user": {"uid": 9, "name": "bob"},
           "tags": ["a", "b"], "vals": [3, 270, -1],
           "pts": [{"x": 1.5}, {"x": 0.0}]}
    assert decode_message(pf, encode_message(pf, msg)) == msg
    # docs packed example: repeated int32 [3, 270, 86942] as field 4
    pf2 = [("f", 4, ("repeated", "int32"))]
    assert encode_message(pf2, {"f": [3, 270, 86942]}) == bytes.fromhex(
        "2206038E029EA705"
    )
    # the same values written expanded (one varint tag per element)
    expanded = bytes.fromhex("2003" + "208E02" + "209EA705")
    assert decode_message(pf2, expanded) == {"f": [3, 270, 86942]}
    # proto3 defaults: absent message -> None, absent repeated -> []
    assert decode_message(pf, b"") == {
        "id": 0, "user": None, "tags": [], "vals": [], "pts": [],
    }


def test_protobuf_py_unknown_fields_and_malformed_varints():
    """Spec behavior: unknown field numbers are skipped per wire type (a
    newer writer's extra fields degrade gracefully); malformed/truncated
    varints fail cleanly instead of over-reading."""
    import pytest as _pytest

    from flink_psl_spark.formats.protobuf_py import (
        decode_message,
        encode_message,
        varint_decode,
    )

    reader = [("a", 1, "int32"), ("name", 3, "string")]
    writer = [
        ("a", 1, "int32"),
        ("extra_d", 2, "double"),    # wire 1 (8 bytes)
        ("name", 3, "string"),
        ("extra_s", 4, "string"),    # wire 2 (len-delimited)
        ("extra_f", 5, "float"),     # wire 5 (4 bytes)
        ("extra_v", 6, "int64"),     # wire 0 (varint)
    ]
    payload = encode_message(
        writer,
        {"a": 7, "extra_d": 1.5, "name": "x", "extra_s": "zz",
         "extra_f": 2.5, "extra_v": -3},
    )
    assert decode_message(reader, payload) == {"a": 7, "name": "x"}

    # truncated varint: continuation bit set at end of buffer
    with _pytest.raises(ValueError, match="truncated"):
        varint_decode(b"\xff\xff", 0)
    # >10 continuation bytes cannot be a valid 64-bit varint
    with _pytest.raises(ValueError, match="10 bytes"):
        varint_decode(b"\xff" * 11 + b"\x00", 0)


def test_protobuf_py_dataframe_roundtrip(spark, t):
    from flink_psl_spark.formats.protobuf_py import from_protobuf_py, to_protobuf_py

    fields = [
        ("o_orderkey", 1, "int64"),
        ("o_totalprice", 2, "double"),
        ("o_orderpriority", 3, "string"),
    ]
    src = t["orders"].select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).limit(500)
    back = from_protobuf_py(to_protobuf_py(src, fields), fields)
    a = {r["o_orderkey"]: r for r in src.collect()}
    b = {r["o_orderkey"]: r for r in back.collect()}
    assert a == b


def test_avro_py_schema_resolution():
    """Avro spec schema-resolution rules: reader != writer."""
    from flink_psl_spark.formats.avro_py import decode_record, encode_record

    writer = {
        "type": "record",
        "name": "Rec",
        "fields": [
            {"name": "a", "type": "int"},
            {"name": "gone", "type": "string"},
            {"name": "b", "type": "string"},
            {"name": "tags", "type": {"type": "array", "items": "int"}},
        ],
    }
    reader = {
        "type": "record",
        "name": "Rec",
        "fields": [
            # reordered; int -> long promotion
            {"name": "b", "type": "string"},
            {"name": "a", "type": "long"},
            # writer's 'gone' is skipped; new field takes its default
            {"name": "added", "type": "double", "default": 1.5},
            # array items promoted int -> double
            {"name": "tags", "type": {"type": "array", "items": "double"}},
        ],
    }
    buf = encode_record(writer, {"a": 7, "gone": "x", "b": "hi", "tags": [1, 2]})
    got = decode_record(writer, buf, reader_schema=reader)
    assert got == {"b": "hi", "a": 7, "added": 1.5, "tags": [1.0, 2.0]}
    assert isinstance(got["tags"][0], float)

    # field matched through a reader alias (renamed column)
    reader_alias = {
        "type": "record",
        "name": "Rec",
        "fields": [
            {"name": "a2", "aliases": ["a"], "type": "int"},
            {"name": "gone", "type": "string"},
            {"name": "b", "type": "string"},
            {"name": "tags", "type": {"type": "array", "items": "int"}},
        ],
    }
    assert decode_record(writer, buf, reader_schema=reader_alias)["a2"] == 7

    # missing reader default is an error
    bad = {
        "type": "record",
        "name": "Rec",
        "fields": [{"name": "nope", "type": "int"}],
    }
    with pytest.raises(ValueError, match="no default"):
        decode_record(writer, buf, reader_schema=bad)


def test_avro_py_resolution_unions_enums_promotions():
    from flink_psl_spark.formats.avro_py import decode_record, encode_record

    writer = {
        "type": "record",
        "name": "U",
        "fields": [
            {"name": "v", "type": ["null", "int"]},
            {"name": "s", "type": "string"},
            {
                "name": "e",
                "type": {"type": "enum", "name": "E", "symbols": ["A", "B", "OLD"]},
            },
        ],
    }
    reader = {
        "type": "record",
        "name": "U",
        "fields": [
            # reader union widens: int value resolves into the long branch
            {"name": "v", "type": ["null", "long"]},
            # string -> bytes promotion
            {"name": "s", "type": "bytes"},
            # writer symbol OLD absent from reader: falls to reader default
            {
                "name": "e",
                "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]},
                # enum-level default lives on the reader enum per the spec;
                # our resolver also accepts it on the field's type dict
            },
        ],
    }
    reader["fields"][2]["type"]["default"] = "A"
    buf = encode_record(writer, {"v": 5, "s": "hi", "e": "OLD"})
    got = decode_record(writer, buf, reader_schema=reader)
    assert got == {"v": 5, "s": b"hi", "e": "A"}
    # null branch roundtrip under resolution
    buf2 = encode_record(writer, {"v": None, "s": "x", "e": "B"})
    assert decode_record(writer, buf2, reader_schema=reader)["v"] is None


def test_avro_py_dataframe_evolution_roundtrip(spark):
    from flink_psl_spark.formats.avro_py import from_avro_py, to_avro_py

    writer = {
        "type": "record",
        "name": "Ev",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "legacy", "type": "string"},
            {"name": "score", "type": "float"},
        ],
    }
    reader = {
        "type": "record",
        "name": "Ev",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "score", "type": "double"},
            {"name": "note", "type": "string", "default": "n/a"},
        ],
    }
    df = spark.createDataFrame(
        [(1, "x", 0.5), (2, "y", 1.25)], "id int, legacy string, score float"
    )
    out = from_avro_py(
        to_avro_py(df, writer), writer, reader_schema=reader
    ).orderBy("id")
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "double", "string",
    ]
    assert [tuple(r) for r in out.collect()] == [
        (1, 0.5, "n/a"), (2, 1.25, "n/a"),
    ]


def test_protobuf_py_map_fields(spark):
    """proto map<K,V> — wire-compatible with repeated entry messages."""
    from flink_psl_spark.formats.protobuf_py import (
        decode_message,
        encode_message,
        from_protobuf_py,
        to_protobuf_py,
    )

    fields = [
        ("id", 1, "int64"),
        ("attrs", 2, ("map", "string", "int64")),
        ("scores", 3, ("map", "string", "double")),
    ]
    row = {"id": 9, "attrs": {"a": 1, "b": 2}, "scores": {"x": 0.5}}
    buf = encode_message(fields, row)
    assert decode_message(fields, buf) == row
    # empty / absent maps decode to {}
    assert decode_message(fields, encode_message(fields, {"id": 1}))["attrs"] == {}

    # a map field and its repeated-entry-message formulation are
    # byte-identical on the wire (the spec's equivalence)
    entry = ("message", [("key", 1, "string"), ("value", 2, "int64")])
    as_repeated = [
        ("id", 1, "int64"),
        ("attrs", 2, ("repeated", entry)),
        ("scores", 3, ("map", "string", "double")),
    ]
    row2 = dict(row, attrs=[{"key": "a", "value": 1}, {"key": "b", "value": 2}])
    assert encode_message(as_repeated, row2) == buf
    got = decode_message(as_repeated, buf)
    assert got["attrs"] == row2["attrs"]

    # DataFrame roundtrip: MapType column through the codec
    df = spark.createDataFrame(
        [(9, {"a": 1, "b": 2}, {"x": 0.5}), (10, {}, {})],
        "id long, attrs map<string,bigint>, scores map<string,double>",
    )
    back = from_protobuf_py(to_protobuf_py(df, fields), fields).orderBy("id")
    rows = back.collect()
    assert rows[0]["attrs"] == {"a": 1, "b": 2} and rows[0]["scores"] == {"x": 0.5}
    assert rows[1]["attrs"] == {} and rows[1]["scores"] == {}


def test_read_with_metadata_columns(spark, sf_dir):
    """Connector metadata columns (reference SupportsReadingMetadata /
    METADATA VIRTUAL DDL) via Spark's _metadata struct."""
    import os

    from flink_psl_spark.sources import read_with_metadata

    path = os.path.join(sf_dir, "nation.parquet")
    df = read_with_metadata(
        spark, path,
        metadata={"src_file": "file.name", "src_size": "file.size",
                  "src_path": "file.path"},
    )
    rows = df.collect()
    assert len(rows) == 25
    assert all(r["src_file"] == "nation.parquet" for r in rows)
    assert all(r["src_path"].endswith("nation.parquet") for r in rows)
    assert rows[0]["src_size"] == os.path.getsize(path)
    # list form surfaces spark field names
    df2 = read_with_metadata(spark, path, metadata=["file.name"])
    assert "file_name" in df2.columns
    # unknown keys are rejected
    with pytest.raises(ValueError, match="unknown metadata key"):
        read_with_metadata(spark, path, metadata={"x": "kafka.offset"})


def test_sql_client_analyze_table_statistics(spark, t):
    """ANALYZE TABLE (reference FLIP-240 `ANALYZE TABLE ... COMPUTE
    STATISTICS`) passes through the script client to Spark's native
    implementation on managed tables; stats land in the catalog for CBO."""
    from flink_psl_spark.operators.bucketing import drop_table
    from flink_psl_spark.sql_client import run_script

    drop_table(spark, "stats_nation")
    try:
        t["nation"].write.saveAsTable("stats_nation")
        run_script(
            spark,
            """
            ANALYZE TABLE stats_nation COMPUTE STATISTICS;
            ANALYZE TABLE stats_nation COMPUTE STATISTICS
              FOR COLUMNS n_nationkey, n_regionkey;
            """,
        )
        detail = {
            r["col_name"]: r["data_type"]
            for r in spark.sql("DESCRIBE TABLE EXTENDED stats_nation").collect()
        }
        assert "25 rows" in detail.get("Statistics", "")
        col = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                "DESCRIBE EXTENDED stats_nation n_regionkey"
            ).collect()
        }
        assert col.get("distinct_count") == "5"
        assert col.get("max") == "4"
    finally:
        drop_table(spark, "stats_nation")


def test_partitioned_sink_commits_on_watermark(spark, tmp_path):
    """Partition commit (filesystem sink success-file policy): hour
    partitions the watermark has passed get a _SUCCESS marker; the
    still-open tail partition does not."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    from flink_psl_spark.sources import partitioned_streaming_sink

    TS = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    rows = [
        ("a", TS(0, 5), 1.0), ("b", TS(0, 30), 2.0),
        ("c", TS(1, 10), 3.0),
        ("d", TS(3, 0), 4.0),  # watermark driver: wm = 02:50
    ]
    src_dir = str(tmp_path / "src")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        rows, "k string, ts timestamp, v double"
    ).coalesce(1).write.parquet(src_dir)
    st = spark.readStream.schema("k string, ts timestamp, v double").parquet(
        src_dir
    )
    q = partitioned_streaming_sink(
        st,
        out,
        ts_col="ts",
        partition_expr=F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd-HH"),
        delay="10 minutes",
        partition_duration="1 hour",
    )
    assert q.awaitTermination(120)

    def committed(part):
        return os.path.exists(os.path.join(out, f"part={part}", "_SUCCESS"))

    # hours 00 and 01 end at 01:00/02:00 <= wm 02:50 -> committed
    assert committed("2024-01-01-00") and committed("2024-01-01-01")
    # hour 03 ends at 04:00 > wm -> data present but NOT committed
    assert os.path.isdir(os.path.join(out, "part=2024-01-01-03"))
    assert not committed("2024-01-01-03")
    # every row landed
    assert spark.read.parquet(out).count() == 4


def test_partitioned_sink_hive_escaped_values_and_fs_api(spark, tmp_path):
    """Partition commit with Hive path-escaped values: the docstring's own
    recommended partition_expr (date_trunc('hour') as string) yields
    values with colons, which Spark escapes as %3A in directory names —
    the committer must unescape before parsing, and all commit I/O must
    go through the Hadoop FileSystem API (portable to hdfs/s3a)."""
    import datetime as dt
    import inspect
    import os

    from pyspark.sql import functions as F

    from flink_psl_spark.sources import partitioned_streaming_sink

    TS = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    rows = [("a", TS(0, 5), 1.0), ("b", TS(1, 10), 2.0), ("c", TS(3, 0), 3.0)]
    src_dir = str(tmp_path / "src")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        rows, "k string, ts timestamp, v double"
    ).coalesce(1).write.parquet(src_dir)
    st = spark.readStream.schema("k string, ts timestamp, v double").parquet(
        src_dir
    )
    q = partitioned_streaming_sink(
        st,
        out,
        ts_col="ts",
        # the docstring's recommended form — renders '2024-01-01 00:00:00'
        partition_expr=F.date_trunc("hour", "ts").cast("string"),
        delay="10 minutes",
        partition_duration="1 hour",
    )
    assert q.awaitTermination(120)

    def committed(hour):
        d = f"part=2024-01-01 {hour:02d}%3A00%3A00"  # Hive-escaped ':'
        assert os.path.isdir(os.path.join(out, d)), sorted(os.listdir(out))
        return os.path.exists(os.path.join(out, d, "_SUCCESS"))

    # wm = 03:00 - 10min = 02:50 -> hours 00, 01 committed; 03 open
    assert committed(0) and committed(1)
    assert not committed(3)
    assert spark.read.parquet(out).count() == 3

    # the commit path is Hadoop-FS-API only — no POSIX os.listdir/open()
    src = inspect.getsource(partitioned_streaming_sink)
    assert "listStatus" in src and "getFileSystem" in src
    assert "os.listdir" not in src and "_os.listdir" not in src

    # a non-ISO partition value is a loud error, not a silent skip
    from flink_psl_spark.sources import partitioned_streaming_sink as _p  # noqa: F401
    import pytest as _pytest
    bad = str(tmp_path / "bad")
    st2 = spark.readStream.schema("k string, ts timestamp, v double").parquet(
        src_dir
    )
    q2 = partitioned_streaming_sink(
        st2, bad, ts_col="ts",
        partition_expr=F.lit("not-a-time"),
        delay="10 minutes", partition_duration="1 hour",
    )
    with _pytest.raises(Exception, match="not an ISO timestamp"):
        q2.awaitTermination(120)
        q2.processAllAvailable()


def test_compressed_write_produces_gz_parts(spark, t, tmp_path):
    """The codec actually applies (part files carry the .gz suffix) and
    non-text formats are rejected."""
    import glob

    import pytest as _pytest

    from flink_psl_spark.sources import read_compressed, write_compressed

    path = str(tmp_path / "gz")
    df = t["documents"].select("doc_id", "source")
    write_compressed(df, path, fmt="json", codec="gzip")
    assert glob.glob(path + "/*.json.gz")
    assert read_compressed(spark, path, fmt="json").count() == df.count()
    with _pytest.raises(ValueError, match="text-family"):
        write_compressed(df, path, fmt="parquet")


def test_sequence_file_roundtrip_bytes(spark, tmp_path):
    """SequenceFile (key,value) round-trips exactly, including unicode
    and empty values."""
    from flink_psl_spark.sources import read_sequence_file, write_sequence_file

    df = spark.createDataFrame(
        [(1, "héllo"), (2, ""), (3, "tab\tsep")], "k int, v string"
    )
    path = str(tmp_path / "seq")
    write_sequence_file(df, path, "k", "v")
    got = sorted(
        (int(r["key"]), r["value"])
        for r in read_sequence_file(spark, path).collect()
    )
    assert got == [(1, "héllo"), (2, ""), (3, "tab\tsep")]
