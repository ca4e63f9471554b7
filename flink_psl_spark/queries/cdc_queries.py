"""CDC / changelog query inventory (SURVEY §7 M4; reference debezium/canal/
maxwell JSON formats + ChangelogNormalize).

Each query SERIALIZES the events fixture into the real CDC envelope (JSON
text), parses it back with the format parser, and materializes the upsert
image — so the parser, the op-mapping, and the normalize step are all under
oracle check. The oracle reconstructs the same image directly from events.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_psl_spark.cdc import parse_canal, parse_debezium, parse_maxwell
from flink_psl_spark.operators.changelog import changelog_normalize
from flink_psl_spark.queries.registry import query, tables

_PAYLOAD = "struct<user_id: bigint, event_id: bigint, value: double>"

_IMAGE_ORACLE = """
    SELECT user_id, event_id, value FROM (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM events) t
    WHERE rn = 1 AND op <> 'D'
"""


def _payload_struct():
    return F.struct(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("value").alias("value"),
    )


def _events_src(spark, sf_dir):
    """events fixture, fanned out for the serialize→parse CPU stage: the
    fixture parquet is a single row group (1 scan partition), which would
    run the double-JSON work on one core. Partitioning on user_id lets the
    changelog_normalize window downstream reuse the exchange."""
    from flink_psl_spark.parallelism import ensure_parallelism

    return ensure_parallelism(tables(spark, sf_dir)["events"], "user_id")


@query("cdc_debezium_roundtrip", oracle=_IMAGE_ORACLE)
def cdc_debezium_roundtrip(spark, sf_dir):
    """events → Debezium JSON envelope → parse_debezium → normalized image.
    op mapping: signup→c (insert), error→d (delete), else u (update)."""
    raw = _events_src(spark, sf_dir).select(
        F.to_json(
            F.struct(
                F.when(F.col("event_type") == "error", _payload_struct())
                .alias("before"),
                F.when(F.col("event_type") != "error", _payload_struct())
                .alias("after"),
                F.when(F.col("event_type") == "signup", F.lit("c"))
                .when(F.col("event_type") == "error", F.lit("d"))
                .otherwise(F.lit("u"))
                .alias("op"),
                F.unix_millis("ts").alias("ts_ms"),
            )
        ).alias("value")
    )
    changes = parse_debezium(raw, _PAYLOAD)
    # wellformed: the envelope is constructed above with op in c/u/d only,
    # so the quarantine filter would be an identity — and Catalyst clones
    # its from_json(to_json(...)) argument below the fan-out exchange,
    # costing a full wasted JSON round trip per row (changelog_normalize)
    return changelog_normalize(
        changes, "user_id", ["__ts_ms", "event_id"], wellformed=True
    ).select("user_id", "event_id", "value")


@query("cdc_canal_roundtrip", oracle=_IMAGE_ORACLE)
def cdc_canal_roundtrip(spark, sf_dir):
    """events → Canal JSON envelope (data is an array) → parse_canal →
    normalized image."""
    raw = _events_src(spark, sf_dir).select(
        F.to_json(
            F.struct(
                F.array(_payload_struct()).alias("data"),
                F.when(F.col("event_type") == "signup", F.lit("INSERT"))
                .when(F.col("event_type") == "error", F.lit("DELETE"))
                .otherwise(F.lit("UPDATE"))
                .alias("type"),
                F.unix_millis("ts").alias("ts"),
            )
        ).alias("value")
    )
    changes = parse_canal(raw, _PAYLOAD)
    # wellformed: self-constructed envelope, op always known (see
    # cdc_debezium_roundtrip note)
    return changelog_normalize(
        changes, "user_id", ["__ts_ms", "event_id"], wellformed=True
    ).select("user_id", "event_id", "value")


@query("cdc_maxwell_roundtrip", oracle=_IMAGE_ORACLE)
def cdc_maxwell_roundtrip(spark, sf_dir):
    """events → Maxwell JSON envelope → parse_maxwell → normalized image."""
    raw = _events_src(spark, sf_dir).select(
        F.to_json(
            F.struct(
                _payload_struct().alias("data"),
                F.when(F.col("event_type") == "signup", F.lit("insert"))
                .when(F.col("event_type") == "error", F.lit("delete"))
                .otherwise(F.lit("update"))
                .alias("type"),
                F.unix_millis("ts").alias("ts"),
            )
        ).alias("value")
    )
    changes = parse_maxwell(raw, _PAYLOAD)
    # wellformed: self-constructed envelope, op always known (see
    # cdc_debezium_roundtrip note)
    return changelog_normalize(
        changes, "user_id", ["__ts_ms", "event_id"], wellformed=True
    ).select("user_id", "event_id", "value")


@query(
    "cdc_drop_update_before",
    # retract stream: view rows model -U (update-before), purchase +U,
    # signup I, error D; DropUpdateBefore keeps everything except -U
    oracle="""
    SELECT event_id, user_id,
           CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D'
                           ELSE '+U' END AS __op
    FROM events
    WHERE event_type IN ('signup', 'error', 'purchase', 'click')
    """,
)
def cdc_drop_update_before(spark, sf_dir):
    """Retract-stream handling (reference StreamExecDropUpdateBefore.java:55):
    strip -U rows from an explicit ±U changelog; I/+U/D pass through."""
    from flink_psl_spark.operators.changelog import drop_update_before

    changelog = _events_src(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "view", F.lit("-U"))
        .otherwise(F.lit("+U"))
        .alias("__op"),
    )
    return drop_update_before(changelog)


@query("cdc_ogg_roundtrip", oracle=_IMAGE_ORACLE)
def cdc_ogg_roundtrip(spark, sf_dir):
    """events → Oracle GoldenGate JSON envelope → parse_ogg → normalized
    image (reference OggJsonDeserializationSchema.java)."""
    from flink_psl_spark.cdc import parse_ogg

    raw = _events_src(spark, sf_dir).select(
        F.to_json(
            F.struct(
                _payload_struct().alias("before"),
                _payload_struct().alias("after"),
                F.when(F.col("event_type") == "signup", F.lit("I"))
                .when(F.col("event_type") == "error", F.lit("D"))
                .otherwise(F.lit("U"))
                .alias("op_type"),
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("op_ts"),
            )
        ).alias("value")
    )
    changes = parse_ogg(raw, _PAYLOAD)
    # wellformed: self-constructed envelope, op always known (see
    # cdc_debezium_roundtrip note)
    return changelog_normalize(
        changes, "user_id", ["__ts_ms", "event_id"], wellformed=True
    ).select("user_id", "event_id", "value")


@query(
    "avro_py_roundtrip",
    # encode -> decode is identity on the selected columns, so the plain
    # projection is an exact oracle for the pure-Python Avro binary codec
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    """,
)
def avro_py_roundtrip(spark, sf_dir):
    """Avro binary format fallback (reference flink-formats/flink-avro,
    factory ID "avro"): rows → spec-conformant Avro binary → rows via the
    dependency-free codec (formats/avro_py.py). With the spark-avro jar
    present, from_avro/to_avro replace this path unchanged."""
    from flink_psl_spark.formats.avro_py import from_avro_py, to_avro_py
    from flink_psl_spark.parallelism import ensure_parallelism

    schema = {
        "type": "record",
        "name": "order",
        "fields": [
            {"name": "o_orderkey", "type": "long"},
            {"name": "o_totalprice", "type": "double"},
            {"name": "o_orderpriority", "type": ["null", "string"]},
        ],
    }
    t = tables(spark, sf_dir)
    src = ensure_parallelism(
        t["orders"].select("o_orderkey", "o_totalprice", "o_orderpriority")
    )
    return from_avro_py(to_avro_py(src, schema), schema)


@query(
    "protobuf_py_roundtrip",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    """,
)
def protobuf_py_roundtrip(spark, sf_dir):
    """Protobuf wire-format fallback (reference flink-formats/flink-protobuf,
    factory ID "protobuf"): rows → wire bytes → rows via the dependency-free
    codec (formats/protobuf_py.py); from_protobuf/to_protobuf replace this
    path when the spark-protobuf jar is present."""
    from flink_psl_spark.formats.protobuf_py import (
        from_protobuf_py,
        to_protobuf_py,
    )
    from flink_psl_spark.parallelism import ensure_parallelism

    fields = [
        ("o_orderkey", 1, "int64"),
        ("o_totalprice", 2, "double"),
        ("o_orderpriority", 3, "string"),
    ]
    t = tables(spark, sf_dir)
    src = ensure_parallelism(
        t["orders"].select("o_orderkey", "o_totalprice", "o_orderpriority")
    )
    return from_protobuf_py(to_protobuf_py(src, fields), fields)


@query(
    "avro_py_nested_roundtrip",
    # encode -> decode is identity; the oracle recomputes the flattened
    # projection of the nested record (struct / array / map columns) in SQL
    oracle="""
    SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS total,
           STRING_SPLIT(o_orderpriority, '-')[2] AS prio_word,
           CAST(LEN(STRING_SPLIT(o_orderpriority, '-')) AS INTEGER) AS n_parts,
           CAST(o_custkey AS VARCHAR) AS cust
    FROM orders
    """,
)
def avro_py_nested_roundtrip(spark, sf_dir):
    """Nested Avro: record-in-record + array + map through the binary codec
    (reference flink-formats/flink-avro supports the full complex-type
    lattice — AvroSchemaConverter). Flattened after decode so the driver
    can hash scalar columns."""
    from pyspark.sql import functions as F

    from flink_psl_spark.formats.avro_py import from_avro_py, to_avro_py
    from flink_psl_spark.parallelism import ensure_parallelism

    schema = {
        "type": "record",
        "name": "order_doc",
        "fields": [
            {"name": "o_orderkey", "type": "long"},
            {
                "name": "meta",
                "type": {
                    "type": "record",
                    "name": "meta_t",
                    "fields": [
                        {"name": "status", "type": "string"},
                        {"name": "total", "type": "double"},
                    ],
                },
            },
            {"name": "prio_parts", "type": {"type": "array", "items": "string"}},
            {"name": "attrs", "type": {"type": "map", "values": "string"}},
        ],
    }
    t = tables(spark, sf_dir)
    src = ensure_parallelism(
        t["orders"].select(
            "o_orderkey",
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").alias("total"),
            ).alias("meta"),
            F.split(F.col("o_orderpriority"), "-").alias("prio_parts"),
            F.create_map(
                F.lit("cust"), F.col("o_custkey").cast("string")
            ).alias("attrs"),
        )
    )
    dec = from_avro_py(to_avro_py(src, schema), schema)
    return dec.select(
        "o_orderkey",
        F.col("meta.status").alias("status"),
        F.col("meta.total").alias("total"),
        F.element_at("prio_parts", 2).alias("prio_word"),
        F.size("prio_parts").alias("n_parts"),
        F.element_at("attrs", F.lit("cust")).alias("cust"),
    )


@query(
    "protobuf_py_nested_roundtrip",
    oracle="""
    SELECT event_id, user_id AS uid, event_type AS etype,
           STRING_SPLIT(event_type, '_')[1] AS tag1,
           CAST(LEN(STRING_SPLIT(event_type, '_')) AS INTEGER) AS n_tags,
           event_id % 100 AS num2
    FROM events
    """,
)
def protobuf_py_nested_roundtrip(spark, sf_dir):
    """Nested protobuf: submessage + repeated string + packed repeated
    int64 through the wire codec (reference flink-formats/flink-protobuf
    supports nested/repeated via its row converters). Flattened after decode
    for scalar hashing."""
    from pyspark.sql import functions as F

    from flink_psl_spark.formats.protobuf_py import (
        from_protobuf_py,
        to_protobuf_py,
    )
    from flink_psl_spark.parallelism import ensure_parallelism

    fields = [
        ("event_id", 1, "int64"),
        (
            "who",
            2,
            ("message", [("uid", 1, "int64"), ("etype", 2, "string")]),
        ),
        ("tags", 3, ("repeated", "string")),
        ("nums", 4, ("repeated", "int64")),
    ]
    t = tables(spark, sf_dir)
    src = ensure_parallelism(
        t["events"].select(
            "event_id",
            F.struct(
                F.col("user_id").alias("uid"),
                F.col("event_type").alias("etype"),
            ).alias("who"),
            F.split(F.col("event_type"), "_").alias("tags"),
            F.array(F.col("user_id"), F.col("event_id") % 100).alias("nums"),
        ),
        "event_id",
    )
    dec = from_protobuf_py(to_protobuf_py(src, fields), fields)
    return dec.select(
        "event_id",
        F.col("who.uid").alias("uid"),
        F.col("who.etype").alias("etype"),
        F.element_at("tags", 1).alias("tag1"),
        F.size("tags").alias("n_tags"),
        F.element_at("nums", 2).alias("num2"),
    )


@query(
    "avro_schema_evolution",
    # resolution is deterministic: promoted ints read back as the same
    # values, the renamed field maps through its alias, the dropped writer
    # field vanishes, and the reader-only field takes its default
    oracle="""
    SELECT o_orderkey, o_totalprice AS total, 'web' AS channel FROM orders
    """,
)
def avro_schema_evolution(spark, sf_dir):
    """Avro schema evolution (reference flink-formats/flink-avro resolves
    reader vs writer schemas through the Avro library; spec 'Schema
    Resolution'): payloads written with schema v1 are decoded under an
    evolved v2 reader — int→long promotion on the key, a field renamed via
    reader alias, a dropped writer field skipped on read, and a new reader
    field filled from its default."""
    from flink_psl_spark.formats.avro_py import from_avro_py, to_avro_py
    from flink_psl_spark.parallelism import ensure_parallelism
    from pyspark.sql import functions as F

    writer = {
        "type": "record",
        "name": "order",
        "fields": [
            {"name": "o_orderkey", "type": "int"},
            {"name": "o_orderpriority", "type": "string"},  # dropped in v2
            {"name": "o_totalprice", "type": "double"},
        ],
    }
    reader = {
        "type": "record",
        "name": "order",
        "fields": [
            {"name": "o_orderkey", "type": "long"},  # int -> long
            {"name": "total", "aliases": ["o_totalprice"], "type": "double"},
            {"name": "channel", "type": "string", "default": "web"},
        ],
    }
    t = tables(spark, sf_dir)
    src = ensure_parallelism(
        t["orders"].select(
            F.col("o_orderkey").cast("int").alias("o_orderkey"),
            "o_orderpriority",
            "o_totalprice",
        )
    )
    return from_avro_py(to_avro_py(src, writer), writer, reader_schema=reader)


@query(
    "protobuf_py_map_roundtrip",
    # encode -> decode is identity on the map entries; the oracle rebuilds
    # the projected entries straight from the source columns
    oracle="""
    SELECT o_orderkey, o_orderstatus AS status, o_orderpriority AS priority,
           CAST(2 AS INTEGER) AS n_attrs
    FROM orders
    """,
)
def protobuf_py_map_roundtrip(spark, sf_dir):
    """Protobuf map fields (proto map<K,V>, wire-identical to repeated
    {key,value} entry messages): a MapType column survives the encode →
    decode roundtrip; projects entries back out for the exact oracle."""
    from flink_psl_spark.formats.protobuf_py import (
        from_protobuf_py,
        to_protobuf_py,
    )
    from flink_psl_spark.parallelism import ensure_parallelism
    from pyspark.sql import functions as F

    fields = [
        ("o_orderkey", 1, "int64"),
        ("attrs", 2, ("map", "string", "string")),
    ]
    t = tables(spark, sf_dir)
    src = ensure_parallelism(
        t["orders"].select(
            "o_orderkey",
            F.create_map(
                F.lit("status"), F.col("o_orderstatus"),
                F.lit("priority"), F.col("o_orderpriority"),
            ).alias("attrs"),
        )
    )
    back = from_protobuf_py(to_protobuf_py(src, fields), fields)
    return back.select(
        "o_orderkey",
        F.col("attrs")["status"].alias("status"),
        F.col("attrs")["priority"].alias("priority"),
        F.size("attrs").alias("n_attrs"),
    )


@query(
    "cdc_upsert_format_image",
    # the upsert-kafka contract replayed: per key, the record with the
    # highest offset wins; keys whose winning record is a tombstone are
    # absent from the image
    oracle="""
    WITH last AS (
      SELECT user_id, event_id, value, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_id, value AS amount
    FROM last WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_upsert_format_image(spark, sf_dir):
    """upsert-kafka format semantics without a broker (reference
    UpsertKafkaDynamicTableFactory: NULL value = keyed tombstone DELETE):
    the events table is rendered as (key-json, value-json-or-tombstone,
    offset) records — errors become tombstones — parsed with
    parse_upsert, and normalized to the per-key latest image."""
    from flink_psl_spark.cdc import parse_upsert
    from flink_psl_spark.operators.changelog import changelog_normalize

    t = tables(spark, sf_dir)
    records = t["events"].select(
        F.to_json(F.struct("user_id")).alias("key"),
        F.when(
            F.col("event_type") != "error",
            F.to_json(
                F.struct(
                    "event_id", F.col("value").alias("amount")
                )
            ),
        ).alias("value"),
        F.col("event_id").alias("offset"),
    )
    parsed = parse_upsert(
        records,
        "struct<user_id: bigint>",
        "struct<event_id: bigint, amount: double>",
    )
    image = changelog_normalize(parsed, ["user_id"], ["offset"])
    return image.select("user_id", "event_id", "amount")


# ---------------------------------------------------------------------------
# NDU analysis (SURVEY §2 row 57; reference
# StreamNonDeterministicUpdatePlanVisitor.java +
# `table.optimizer.non-deterministic-update.strategy`)
# ---------------------------------------------------------------------------


@query(
    "ndu_analysis",
    # analysis metadata, not data: the oracle is the FIXED contract the
    # analyzer must produce over one known-clean and one known-dirty
    # changelog pipeline (root-cause expressions only, wrapper nodes
    # excluded by design)
    oracle="""
    SELECT * FROM (VALUES
      ('clean_image', '<deterministic>', TRUE),
      ('dirty_image', 'monotonically_increasing_id', FALSE),
      ('dirty_image', 'rand', FALSE),
      ('dirty_image', 'uuid', FALSE)
    ) AS t(plan, nd_expr, try_resolve_ok)
    """,
)
def ndu_analysis(spark, sf_dir):
    """Non-deterministic-update analysis over changelog pipelines
    (reference StreamNonDeterministicUpdatePlanVisitor, FLINK-1.16 NDU):
    a clean keyed-upsert image plan (md5-derived column) must report no
    ND expressions and pass TRY_RESOLVE; the same plan with rand/uuid/
    monotonically_increasing_id columns must name each root-cause ND
    expression and fail TRY_RESOLVE. One output row per (plan, finding).
    """
    from flink_psl_spark.operators.changelog import (
        assert_deterministic_updates,
        non_deterministic_expressions,
        to_changelog,
    )

    t = tables(spark, sf_dir)

    def image(extra_cols):
        df = t["events"].select(
            "user_id", "event_id", "ts",
            F.md5(F.col("event_type")).alias("h"),
            *extra_cols,
        )
        return changelog_normalize(
            to_changelog(df, "U"), ["user_id"], ["ts", "event_id"]
        )

    clean = image([])
    dirty = image([
        F.rand().alias("r"),
        F.expr("uuid()").alias("u"),
        F.monotonically_increasing_id().alias("m"),
    ])

    rows = []
    for name, df in [("clean_image", clean), ("dirty_image", dirty)]:
        nd = non_deterministic_expressions(df)
        try:
            assert_deterministic_updates(df, strategy="TRY_RESOLVE")
            ok = True
        except ValueError:
            ok = False
        for expr_name in (nd or ["<deterministic>"]):
            rows.append((name, expr_name, ok))

    return spark.createDataFrame(
        rows, "plan string, nd_expr string, try_resolve_ok boolean"
    )


@query(
    "scd2_dimension_history",
    # events as a user-dimension changelog (signup=I, error=D, rest=U):
    # LEAD over (ts, op, event_id) closes each version; D rows close
    # without opening
    oracle="""
    WITH ch AS (
      SELECT user_id, ts, value, event_id,
             CASE event_type WHEN 'signup' THEN 'I'
                             WHEN 'error' THEN 'D'
                             ELSE 'U' END AS op
      FROM events),
    c2 AS (
      SELECT user_id, ts, value, op,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, op, event_id) AS valid_to
      FROM ch)
    SELECT user_id, ROUND(value, 6) AS value,
           ts AS valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM c2 WHERE op <> 'D'
    """,
)
def scd2_dimension_history(spark, sf_dir):
    """SCD Type 2 dimension maintenance from a changelog: every I/U
    opens a version, the key's next event closes it, D closes without
    opening — producing exactly the versioned-table shape the
    temporal/as-of join layer consumes. One shuffle on the key."""
    from flink_psl_spark.operators.changelog import scd2_history

    t = tables(spark, sf_dir)
    ch = t["events"].select(
        "user_id",
        "ts",
        F.round("value", 6).alias("value"),
        "event_id",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("__op"),
    )
    return scd2_history(
        ch, "user_id", "ts", tiebreak=["event_id"]
    ).select("user_id", "value", "valid_from", "valid_to", "is_current")


@query(
    "stream_scd2_dimension",
    # identical contract to the batch scd2_dimension_history: the
    # recompute-affected-keys sink must converge to the batch history
    # regardless of micro-batch splits
    oracle="""
    WITH ch AS (
      SELECT user_id, ts, value, event_id,
             CASE event_type WHEN 'signup' THEN 'I'
                             WHEN 'error' THEN 'D'
                             ELSE 'U' END AS op
      FROM events),
    c2 AS (
      SELECT user_id, ts, value, op,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, op, event_id) AS valid_to
      FROM ch)
    SELECT user_id, ROUND(value, 6) AS value,
           ts AS valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM c2 WHERE op <> 'D'
    """,
)
def stream_scd2_dimension(spark, sf_dir):
    """STREAMING SCD2: the events changelog replayed as a stream into
    the recompute-affected-keys foreachBatch sink (idempotent per-batch
    event-store partitions — exactly-once under replay); the
    materialized dimension must equal the batch scd2_history exactly."""
    import tempfile

    from flink_psl_spark.cdc import scd2_into_parquet
    from flink_psl_spark.streaming import stream_from_parquet

    base = tempfile.mkdtemp(prefix="fps_scd2_")
    dim, ev_store, ckpt = f"{base}/dim", f"{base}/events", f"{base}/ckpt"
    stream = stream_from_parquet(spark, f"{sf_dir}/events.parquet")
    ch = stream.select(
        "user_id",
        "ts",
        F.round("value", 6).alias("value"),
        "event_id",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("__op"),
    )
    q = scd2_into_parquet(
        ch, dim, "user_id", "ts",
        checkpoint=ckpt, events_path=ev_store,
        tiebreak=["event_id"], available_now=True,
    )
    q.awaitTermination(300)
    return spark.read.parquet(dim).select(
        "user_id", "value", "valid_from", "valid_to", "is_current"
    )


@query(
    "incremental_agg_retract_apply",
    # the oracle recomputes the NEW snapshot's aggregate from scratch;
    # the query must reach the same numbers by applying signed retract
    # deltas (+I/-D/-UB/+UA) to the OLD snapshot's materialized
    # aggregate — integer-cent money keeps delta-vs-recompute exact
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders),
    b AS (
      SELECT o_orderkey, o_custkey,
             cents + CASE WHEN o_custkey % 7 = 0 THEN 1000 ELSE 0 END
               AS cents
      FROM o WHERE o_custkey % 11 <> 3
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, cents
      FROM o WHERE o_orderkey % 13 = 0)
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM b GROUP BY o_custkey
    """,
)
def incremental_agg_retract_apply(spark, sf_dir):
    """Retract-mode incremental aggregation (reference RowKind -U/+U
    semantics): a deterministic mutation of the orders snapshot (deletes,
    price updates, inserts) flows as SIGNED retract rows into per-key
    count/sum deltas, which merge into the OLD materialized aggregate —
    no rescan of the base. The oracle recomputes the new snapshot from
    scratch; equality proves agg(new) = agg(old) + agg(deltas)."""
    from flink_psl_spark.operators import retract_rows

    t = tables(spark, sf_dir)
    o = t["orders"].select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    new = (
        o.where(F.col("o_custkey") % 11 != 3)
        .select(
            "o_orderkey",
            "o_custkey",
            (
                F.col("cents")
                + F.when(F.col("o_custkey") % 7 == 0, 1000).otherwise(0)
            ).alias("cents"),
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 13 == 0).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_custkey",
                "cents",
            )
        )
    )
    base_agg = o.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )
    deltas = (
        retract_rows(o, new, "o_orderkey")
        .groupBy("o_custkey")
        .agg(
            F.sum("__sign").cast("bigint").alias("dn"),
            F.sum(F.col("__sign") * F.col("cents"))
            .cast("bigint")
            .alias("dc"),
        )
    )
    return (
        base_agg.join(deltas, on="o_custkey", how="full_outer")
        .select(
            "o_custkey",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0)))
            .cast("bigint")
            .alias("n"),
            (
                F.coalesce("total_cents", F.lit(0))
                + F.coalesce("dc", F.lit(0))
            )
            .cast("bigint")
            .alias("total_cents"),
        )
        .where(F.col("n") > 0)
    )


@query(
    "stream_retract_agg_ingest",
    # same truth as incremental_agg_retract_apply: the oracle recomputes
    # the NEW snapshot's aggregate; the stream must reach it by summing
    # SIGNED rows (base inserts + retract deltas) across micro-batches
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders),
    b AS (
      SELECT o_orderkey, o_custkey,
             cents + CASE WHEN o_custkey % 7 = 0 THEN 1000 ELSE 0 END
               AS cents
      FROM o WHERE o_custkey % 11 <> 3
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, cents
      FROM o WHERE o_orderkey % 13 = 0)
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM b GROUP BY o_custkey
    """,
)
def stream_retract_agg_ingest(spark, sf_dir):
    """STREAMING changelog aggregation (the reference's retract-mode
    GroupAggFunction): the base snapshot as +1 inserts plus the
    -UB/+UA/-D/+I retract deltas stream through an update-mode keyed
    SUM-of-signed-rows across multiple micro-batches; the final per-key
    state equals a from-scratch recompute of the new snapshot. Signed
    sums are commutative integers, so replay order is irrelevant —
    exactly why the reference carries retractions."""
    import tempfile

    from flink_psl_spark.operators import deduplicate, retract_rows
    from flink_psl_spark.streaming import (
        run_to_memory_table,
        stream_from_parquet,
    )

    t = tables(spark, sf_dir)
    o = t["orders"].select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    new = (
        o.where(F.col("o_custkey") % 11 != 3)
        .select(
            "o_orderkey",
            "o_custkey",
            (
                F.col("cents")
                + F.when(F.col("o_custkey") % 7 == 0, 1000).otherwise(0)
            ).alias("cents"),
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 13 == 0).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_custkey",
                "cents",
            )
        )
    )
    signed = o.select(
        "o_custkey", "cents", F.lit(1).cast("int").alias("__sign")
    ).unionByName(
        retract_rows(o, new, "o_orderkey").select(
            "o_custkey", "cents", "__sign"
        )
    )
    path = tempfile.mkdtemp(prefix="fps_retract_") + "/log"
    # 4 part files -> 4 micro-batches exercise cross-batch accumulation
    signed.repartition(4).write.parquet(path)
    stream = stream_from_parquet(spark, path, max_files_per_trigger=1)
    agg = stream.groupBy("o_custkey").agg(
        F.sum("__sign").cast("bigint").alias("n"),
        F.sum(F.col("__sign") * F.col("cents"))
        .cast("bigint")
        .alias("total_cents"),
    )
    mem = run_to_memory_table(agg, output_mode="update")
    final = deduplicate(
        mem.withColumn("__seq", F.monotonically_increasing_id()),
        ["o_custkey"],
        ["__seq"],
        keep="last",
    ).select("o_custkey", "n", "total_cents")
    return final.where(F.col("n") > 0)


@query(
    "scd2_temporal_join",
    # the dimensional-model composition: the scd2 oracle's history CTE,
    # then each purchase matched to the version whose
    # [valid_from, valid_to) interval contains its timestamp
    oracle="""
    WITH ch AS (
      SELECT user_id, ts, value, event_id,
             CASE event_type WHEN 'signup' THEN 'I'
                             WHEN 'error' THEN 'D'
                             ELSE 'U' END AS op
      FROM events),
    c2 AS (
      SELECT user_id, ts, value, op,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, op, event_id) AS valid_to
      FROM ch),
    hist AS (
      SELECT user_id, ROUND(value, 6) AS dim_value,
             ts AS valid_from, valid_to
      FROM c2 WHERE op <> 'D')
    SELECT p.event_id, p.user_id, h.dim_value,
           h.valid_from, h.valid_to
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    JOIN hist h
      ON h.user_id = p.user_id
     AND p.ts >= h.valid_from
     AND (h.valid_to IS NULL OR p.ts < h.valid_to)
    """,
)
def scd2_temporal_join(spark, sf_dir):
    """The dimensional-model composition end to end: maintain the SCD2
    user dimension from the changelog, then join every purchase to the
    version valid at its event time ([valid_from, valid_to) containment)
    — the fact-to-versioned-dimension pattern the reference's
    FOR SYSTEM_TIME AS OF serves. One user-keyed equi-join with a range
    residual; versions tile each key's timeline, so the match is
    unique."""
    from flink_psl_spark.operators.changelog import scd2_history

    t = tables(spark, sf_dir)
    ch = t["events"].select(
        "user_id",
        "ts",
        F.round("value", 6).alias("value"),
        "event_id",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("__op"),
    )
    hist = scd2_history(ch, "user_id", "ts", tiebreak=["event_id"]).select(
        F.col("user_id").alias("h_user"),
        F.col("value").alias("dim_value"),
        "valid_from",
        "valid_to",
    )
    p = (
        t["events"]
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    return (
        p.join(
            hist,
            (F.col("user_id") == F.col("h_user"))
            & (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        )
        .select("event_id", "user_id", "dim_value", "valid_from", "valid_to")
    )
