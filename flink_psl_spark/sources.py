"""Sources / sinks / formats (SURVEY §2.1).

Reference surface → Spark construction:

- filesystem connector (FileSystemTableSource.java) with formats csv / json
  / parquet / orc / text (flink-formats/*) → ``read_table`` / ``write_table``
  with ``fmt=``; partitioned layouts via ``partition_by`` (reference
  partitioned filesystem tables; Spark gives static + dynamic partition
  pruning on the read side).
- datagen connector (DataGenTableSourceFactory.java:45, IDENTIFIER
  "datagen"): rate-limited synthetic rows per schema → ``datagen_stream``
  (rate source + deterministic column synthesis).
- print/blackhole sinks (PrintTableSinkFactory.java:64,
  BlackHoleTableSinkFactory.java:45) → ``format("console")`` /
  ``format("noop")`` passthroughs.
- socket source (StreamExecutionEnvironment.socketTextStream) →
  ``format("socket")`` (exercised in tests/test_sources.py against an
  in-process TCP listener).

Kafka (KafkaDynamicSource.java:80) maps 1:1 to Spark's ``format("kafka")``
reader/writer options; the package is not bundled in this environment, so
``kafka_stream`` raises a clear error when the connector jar is absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BATCH_FORMATS = ("parquet", "csv", "json", "orc", "text")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    *,
    mode: str = "overwrite",
    partition_by: str | list[str] | None = None,
    **options: str,
) -> None:
    """Write a DataFrame as a (optionally partitioned) file table.

    csv defaults to header=true so round-trips keep column names.
    """
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {BATCH_FORMATS}")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    for k, v in options.items():
        w = w.option(k, v)
    if partition_by:
        keys = [partition_by] if isinstance(partition_by, str) else partition_by
        w = w.partitionBy(*keys)
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    *,
    schema: str | None = None,
    streaming: bool = False,
    **options: str,
) -> DataFrame:
    """Read a file table (batch or streaming). Schemas are explicit for
    text formats (reference: DDL-declared schemas; inference is dev-only —
    and file *streams* require a schema in Spark)."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {BATCH_FORMATS}")
    reader = spark.readStream if streaming else spark.read
    reader = reader.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json") and not streaming:
        reader = reader.option("inferSchema", "true")
    return reader.load(path)


def datagen_stream(
    spark: SparkSession,
    rows_per_second: int = 100,
    *,
    fields: dict[str, str] | None = None,
) -> DataFrame:
    """datagen source: rate stream + deterministic synthesized columns.

    ``fields`` maps column name → SQL expression over ``value`` (the rate
    source's monotonically increasing BIGINT) and ``timestamp``; defaults
    mirror the reference's datagen kinds (sequence / random / sized string).
    """
    base = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    fields = fields or {
        "id": "value",
        "ts": "timestamp",
        "user_id": "value % 100",
        "amount": "pmod(hash(value), 10000) / 100.0",
        "label": "concat('u_', value % 100)",
    }
    return base.select(*[F.expr(e).alias(n) for n, e in fields.items()])


def to_console(df: DataFrame, **options: str):
    """print sink (PrintTableSinkFactory.java:64)."""
    return df.writeStream.format("console").options(**options)


def to_blackhole(df: DataFrame):
    """blackhole sink (BlackHoleTableSinkFactory.java:45) — benchmark sink."""
    return df.writeStream.format("noop")


def jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC source (reference JdbcDynamicTableFactory, ID "jdbc").

    Filters and projections push into the database (SupportsFilterPushDown
    parity); pass partition_column + bounds for parallel range reads — the
    scale knob that turns one cursor into ``num_partitions`` concurrent
    queries. Works out of the box against Spark's bundled Derby
    (``org.apache.derby.jdbc.EmbeddedDriver``); other databases need their
    driver jar on the classpath.
    """
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        r = r.option("driver", driver)
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    mode: str = "overwrite",
    **options: str,
) -> None:
    """JDBC sink (reference jdbc connector sink side)."""
    w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        w = w.option("driver", driver)
    for k, v in options.items():
        w = w.option(k, v)
    w.mode(mode).save()


def jdbc_upsert_write(
    df: DataFrame,
    url: str,
    table: str,
    primary_key: list[str] | str,
    *,
    driver: str | None = None,
    connection_properties: dict | None = None,
    quote_table_identifiers: bool = False,
    create_column_types: str | None = None,
) -> int:
    """UPSERT JDBC sink (reference JdbcDynamicTableSink with a PRIMARY KEY
    → upsert mode, JdbcOutputFormat building ON-CONFLICT/MERGE row
    statements).

    Two-phase, set-based strategy instead of per-row statements: (1) the
    DataFrame appends DISTRIBUTED into a staging table (every executor
    writes its partitions concurrently — the scalable half); (2) ONE
    driver-issued ``MERGE INTO target USING staging ON pk`` statement
    upserts set-wise inside the database (the DB's own join machinery —
    no rows ever move through the driver). Duplicate keys WITHIN the
    batch are last-write-wins by a deterministic pre-dedup (max over
    non-key columns ordered by key — matching the reference's
    sink.buffer-flush dedup of changelog batches).

    The staging table is dropped whether or not the MERGE succeeds (no
    leak on failure). ``connection_properties`` (e.g. user/password) are
    passed to the driver-side JDBC connection AND the Spark staging
    write. Table names are case-folded by the database when unquoted —
    the consistent default; pass ``quote_table_identifiers=True`` to
    treat ``table`` as an exact, case-sensitive identifier (the staging
    table's DDL is then quoted too, so DDL and MERGE agree).

    Returns the number of rows the MERGE touched.
    """
    pk = [primary_key] if isinstance(primary_key, str) else list(primary_key)
    import uuid as _uuid

    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    # in-batch dedup (keep one deterministic row per key)
    others = [c for c in df.columns if c not in pk]
    w = _W.partitionBy(*pk).orderBy(
        *[_F.desc(c) for c in others] if others else [_F.lit(1)]
    )
    deduped = (
        df.withColumn("__rn", _F.row_number().over(w))
        .where("__rn = 1")
        .drop("__rn")
    )
    qt = '"{}"'.format
    stage = f"{table}_stage_{_uuid.uuid4().hex[:8]}"
    # quoted mode: the Spark writer gets the quoted name so the staging
    # DDL preserves case exactly as the MERGE below will reference it
    tgt_sql, stage_sql = (
        (qt(table), qt(stage)) if quote_table_identifiers else (table, stage)
    )
    stage_opts = dict(connection_properties or {})
    if create_column_types:
        # databases that map StringType to a non-comparable LOB (Derby:
        # CLOB) cannot MERGE on a string key — callers pass explicit
        # DDL types ("event_type VARCHAR(64)") applied to the staging
        # table here and expected on the pre-created target
        stage_opts["createTableColumnTypes"] = create_column_types
    write_jdbc_table(
        deduped, url, stage_sql, driver=driver, mode="overwrite",
        **stage_opts,
    )

    spark = df.sparkSession
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    if connection_properties:
        props = jvm.java.util.Properties()
        for k, v in connection_properties.items():
            props.setProperty(str(k), str(v))
        con = jvm.java.sql.DriverManager.getConnection(url, props)
    else:
        con = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = con.createStatement()
        # Spark's JDBC writer quotes COLUMN identifiers (case-preserving
        # DDL) — the MERGE must quote them too or the DB case-folds
        on = " AND ".join(f"t.{qt(c)} = s.{qt(c)}" for c in pk)
        sets = ", ".join(f"{qt(c)} = s.{qt(c)}" for c in others)
        cols = ", ".join(qt(c) for c in df.columns)
        vals = ", ".join(f"s.{qt(c)}" for c in df.columns)
        merge = (
            f"MERGE INTO {tgt_sql} t USING {stage_sql} s ON {on} "
            + (f"WHEN MATCHED THEN UPDATE SET {sets} " if others else "")
            + f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
        )
        try:
            return st.executeUpdate(merge)
        finally:
            # the stage must never outlive the call — drop even when the
            # MERGE throws (nothing here is transactional)
            try:
                st.executeUpdate(f"DROP TABLE {stage_sql}")
            except Exception:
                pass
    finally:
        con.close()


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source (KafkaDynamicSource.java:80 ≈ format('kafka')).

    Requires the spark-sql-kafka connector on the classpath (not bundled in
    this environment)."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # pragma: no cover - env without the jar
        raise RuntimeError(
            "kafka connector jar not available; add "
            "org.apache.spark:spark-sql-kafka-0-10 to spark.jars.packages"
        ) from e


# ---------------------------------------------------------------------------
# Small-file compaction (reference: FileSink compaction,
# flink-connector-files .../file/sink/compactor/FileCompactStrategy.java +
# ConcatFileCompactor.java — sinks concatenate undersized files once a
# size/count trigger fires). Spark-first shape: compaction is a maintenance
# pass over the sink directory — read, re-bucket to the target file size,
# two-phase swap — run post-hoc or from foreachBatch on a cadence.
# ---------------------------------------------------------------------------


def compaction_plan(
    path: str, *, target_file_bytes: int = 128 * 1024 * 1024, min_files: int = 2
) -> dict:
    """Inspect a file-table directory and decide whether/how to compact.

    Mirrors FileCompactStrategy's triggers: compaction fires when more than
    ``min_files`` data files exist AND at least one is under the target
    size. Returns {should_compact, n_files, total_bytes, target_files}.
    """
    import math
    import os

    sizes = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue  # _SUCCESS, hidden/in-progress files
            sizes.append(os.path.getsize(os.path.join(root, f)))
    total = sum(sizes)
    target_files = max(1, math.ceil(total / target_file_bytes))
    return {
        # target < current makes compaction a fixpoint: once file count
        # reaches the target, the trigger can never re-fire on its output
        "should_compact": len(sizes) > min_files
        and any(s < target_file_bytes for s in sizes)
        and target_files < len(sizes),
        "n_files": len(sizes),
        "total_bytes": total,
        "target_files": target_files,
    }


def compact_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
    schema: str | None = None,
    work_dir: str | None = None,
) -> dict:
    """Compact a file table's small files to ~``target_file_bytes`` each.

    Scale shape: ``coalesce`` (not repartition) merges input splits without
    a shuffle — the reference's ConcatFileCompactor cost model (read +
    concatenated rewrite, no redistribution). The rewrite lands whole in a
    work directory OUTSIDE the table path and is swapped in via two
    directory renames. Readers never see a mix of old and new files, but
    the swap is NOT atomic: between the two renames the table path briefly
    does not exist, so a reader listing at exactly that instant can fail
    and must retry. Deployments needing a zero-window swap should route
    this through a catalog/manifest pointer or an object store's
    atomic-rename primitive (same scope note as the 2PC sink,
    sources_v2.py). Returns the (possibly no-op) plan.

    ``work_dir``: where the transient tmp/old directories live; defaults to
    a ``<path>.compact-work`` sibling. Must NOT be inside a partitioned
    table's root, or concurrent partition discovery would pick it up —
    ``compact_partitioned_table`` routes every leaf's work dir outside the
    table root for exactly that reason.
    """
    import os
    import shutil

    plan = compaction_plan(
        path, target_file_bytes=target_file_bytes, min_files=min_files
    )
    if not plan["should_compact"]:
        return plan
    base = work_dir if work_dir else path.rstrip("/") + ".compact-work"
    tmp = os.path.join(base, "tmp")
    old = os.path.join(base, "old")
    os.makedirs(base, exist_ok=True)
    df = read_table(spark, path, fmt, schema=schema)
    df.coalesce(plan["target_files"]).write.mode("overwrite").format(fmt).save(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(base)
    plan["compacted"] = True
    return plan


def compact_partitioned_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
    schema: str | None = None,
) -> dict:
    """Per-partition compaction for ``key=value``-partitioned tables.

    The 100 TB shape of compaction: a streaming sink leaves small files in
    the partitions it recently touched, so the maintenance pass walks
    leaf partition directories, evaluates the FileCompactStrategy trigger
    per partition, and rewrites ONLY the partitions that fire — untouched
    partitions are never read, never rewritten (same pruning idea as the
    partition-pruned upsert sink, cdc.py). Transient tmp/old directories
    live under a ``<root>.compact-work`` sibling of the TABLE ROOT (keyed
    by partition relpath), never inside it, so concurrent readers' partition
    discovery over the root can't trip on them. Returns
    {scanned, compacted, skipped, partitions: {relpath: plan}}.
    """
    import os

    # leaf dirs = directories containing at least one data file
    leaves = []
    for root, _dirs, files in os.walk(path):
        if any(not f.startswith(("_", ".")) for f in files):
            leaves.append(root)
    work_root = path.rstrip("/") + ".compact-work"
    out = {"scanned": len(leaves), "compacted": 0, "skipped": 0, "partitions": {}}
    for leaf in sorted(leaves):
        plan = compact_table(
            spark,
            leaf,
            fmt,
            target_file_bytes=target_file_bytes,
            min_files=min_files,
            schema=schema,
            work_dir=os.path.join(work_root, os.path.relpath(leaf, path)),
        )
        rel = os.path.relpath(leaf, path)
        out["partitions"][rel] = plan
        if plan.get("compacted"):
            out["compacted"] += 1
        else:
            out["skipped"] += 1
    if os.path.isdir(work_root):
        import shutil

        shutil.rmtree(work_root, ignore_errors=True)
    return out


# Flink metadata key (SupportsReadingMetadata / DDL `METADATA FROM ...
# VIRTUAL`, file connector keys in FileSystemTableSource) -> Spark
# `_metadata` struct subfield
FILE_METADATA_KEYS = {
    "file.path": "file_path",
    "file.name": "file_name",
    "file.size": "file_size",
    "file.modification-time": "file_modification_time",
}


def read_with_metadata(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    *,
    metadata: dict[str, str] | list[str] | None = None,
    schema: str | None = None,
    streaming: bool = False,
    **options: str,
) -> DataFrame:
    """File read with connector metadata columns (reference:
    `SupportsReadingMetadata.java:65`; DDL ``name TYPE METADATA FROM
    'file.path' VIRTUAL``; file-connector keys in FileSystemTableSource).

    ``metadata`` maps output column name -> Flink metadata key (or a list
    of keys, each surfaced under its Spark field name). Spark's hidden
    ``_metadata`` struct supplies the values at scan time — a constant per
    file, so projecting it costs nothing and the scan stays fully
    vectorized/pushdown-capable.
    """
    df = read_table(
        spark, path, fmt, schema=schema, streaming=streaming, **options
    )
    if not metadata:
        return df
    if isinstance(metadata, list):
        metadata = {FILE_METADATA_KEYS[k]: k for k in metadata}
    cols = [F.col(c) for c in df.columns]
    for out_name, key in metadata.items():
        try:
            field = FILE_METADATA_KEYS[key]
        except KeyError:
            raise ValueError(
                f"unknown metadata key {key!r}; one of {sorted(FILE_METADATA_KEYS)}"
            ) from None
        cols.append(F.col(f"_metadata.{field}").alias(out_name))
    return df.select(*cols)


def partitioned_streaming_sink(
    stream_df: DataFrame,
    path: str,
    *,
    ts_col: str,
    partition_expr,
    partition_col: str = "part",
    delay: str = "10 minutes",
    partition_duration: str = "1 hour",
    success_file: str = "_SUCCESS",
) -> "object":
    """Streaming filesystem sink with PARTITION COMMIT (reference
    filesystem connector: ``sink.partition-commit.trigger='partition-time'``
    + ``sink.partition-commit.policy.kind='success-file'``,
    PartitionTimeCommitTrigger / SuccessFileCommitPolicy): rows stream
    into ``partition_col``-partitioned parquet, and once the watermark
    passes a partition's end time (+delay), the partition is COMMITTED by
    dropping a success marker into its directory — the downstream signal
    that the partition is complete and will not receive late rows.

    ``partition_expr``: Column mapping ``ts_col`` to the partition value —
    must be the floor of a ``partition_duration`` bucket (e.g.
    ``date_trunc('hour', ts)`` cast to string), because commit time is
    partition value + duration.

    Idempotent across restarts: the marker's existence IS the commit
    state (no driver memory needed); re-processing a batch re-checks and
    skips. Returns the StreamingQuery (caller awaits/stops).

    Late-data caveat (same as the reference's partition-time trigger): a
    row older than the watermark still lands in its (already committed)
    partition — the marker signals "the watermark passed", not "no late
    writes can ever occur". Downstream consumers needing a hard seal
    should pair the marker with the watermark delay as their lateness
    bound, exactly as with the reference's success-file policy.
    """
    import datetime as _dt
    import tempfile
    from urllib.parse import unquote as _unquote

    from pyspark.sql import functions as _F

    units = {"seconds": 1000, "minutes": 60000, "hours": 3600000,
             "days": 86400000}

    def _ms(spec: str) -> int:
        n, unit = spec.split()
        return int(n) * units[unit if unit.endswith("s") else unit + "s"]

    delay_ms = _ms(delay)
    dur_ms = _ms(partition_duration)

    src = stream_df.withWatermark(ts_col, delay).withColumn(
        partition_col, partition_expr
    )

    handle: dict = {}  # filled with the StreamingQuery after .start()

    def _engine_watermark_ms():
        """The query's TRUE watermark (lastProgress eventTime.watermark,
        a UTC ISO instant) — None before the first progress report."""
        q = handle.get("query")
        if q is None:
            return None
        try:
            p = q.lastProgress
            wm = (p.eventTime or {}).get("watermark") if p else None
        except Exception:
            return None
        if not wm:
            return None
        inst = _dt.datetime.fromisoformat(wm.replace("Z", "+00:00"))
        return int(inst.timestamp() * 1000)

    def _part_start_ms(dirname: str, raw_val: str) -> int:
        """Partition value -> UTC epoch ms. Values are Hive path-escaped
        (Spark escapes ':', '=', '%', ... as %XX — e.g. a
        date_trunc('hour') string partition renders 00%3A00%3A00), so
        unescape BEFORE parsing, and pin the naive result to UTC (the
        session timezone that formatted it) — naive .timestamp() would
        read it in the driver's local zone."""
        val = _unquote(raw_val)
        try:
            part_start = _dt.datetime.fromisoformat(val)
        except ValueError as exc:
            raise ValueError(
                f"partition directory {dirname!r}: value {val!r} is not "
                "an ISO timestamp/date — partition_expr must floor "
                f"{ts_col!r} to a {partition_duration!r} bucket rendered "
                "as an ISO string for partition-time commit"
            ) from exc
        if part_start.tzinfo is None:
            part_start = part_start.replace(tzinfo=_dt.timezone.utc)
        return int(part_start.timestamp() * 1000)

    def commit(batch: DataFrame, batch_id: int) -> None:
        (
            batch.write.mode("append")
            .partitionBy(partition_col)
            .parquet(path)
        )
        # prefer the engine's own watermark; before the first progress
        # report fall back to the batch proxy (max event time - delay,
        # computed as UTC epoch ms via unix_millis — tz-independent)
        wm_ms = _engine_watermark_ms()
        if wm_ms is None:
            mx = batch.agg(
                _F.unix_millis(_F.max(ts_col)).alias("mx")
            ).collect()[0]["mx"]
            if mx is None:
                return
            wm_ms = mx - delay_ms
        # portable commit I/O: all listing / existence / marker writes go
        # through the Hadoop FileSystem API, so the same code commits on
        # file://, hdfs://, s3a://, ... — no POSIX-only calls
        sess = batch.sparkSession
        jvm = sess._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(sess._jsc.hadoopConfiguration())
        if not fs.exists(hpath):
            return
        prefix = f"{partition_col}="
        for st in fs.listStatus(hpath):
            if not st.isDirectory():
                continue
            d = st.getPath().getName()
            if not d.startswith(prefix):
                continue
            end_ms = _part_start_ms(d, d.split("=", 1)[1]) + dur_ms
            marker = jvm.org.apache.hadoop.fs.Path(st.getPath(), success_file)
            if end_ms <= wm_ms and not fs.exists(marker):
                fs.create(marker, True).close()

    q = (
        src.writeStream.foreachBatch(commit)
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="fps_pcommit_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    handle["query"] = q
    return q


def write_compressed(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "json",
    codec: str = "gzip",
    mode: str = "overwrite",
    **options,
) -> None:
    """Compressed text-family writes (reference flink-compress:
    flink-formats/flink-compress/.../CompressWriterFactory.java —
    hadoop-codec'd bulk writers for text formats). Spark maps the whole
    capability to the writer's ``compression`` option: every text-family
    sink (text/csv/json) accepts gzip/bzip2/deflate/snappy/lz4/zstd,
    applied per part-file, splittable codecs stay scan-parallel."""
    if fmt not in ("text", "csv", "json"):
        raise ValueError("compressed writes are for text-family formats")
    (
        df.write.format(fmt)
        .mode(mode)
        .option("compression", codec)
        .options(**options)
        .save(path)
    )


def read_compressed(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "json",
    schema=None,
    **options,
):
    """Read back compressed text-family files — Hadoop codec discovery
    is extension-driven, so no codec option is needed on the read."""
    reader = spark.read.format(fmt).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_sequence_file(
    df: DataFrame, path: str, key_col: str, value_col: str
) -> None:
    """Hadoop SequenceFile sink (reference flink-sequence-file:
    SequenceFileWriterFactory.java) — the (key, value) container format
    of classic Hadoop pipelines. Spark's native route is the RDD
    ``saveAsSequenceFile`` (string writables here); this is one of the
    rare justified RDD drops — there is no DataFrame writer for the
    format, and the conversion is a row-local map."""
    (
        df.select(
            F.col(key_col).cast("string"), F.col(value_col).cast("string")
        )
        .rdd.map(tuple)
        .saveAsSequenceFile(path)
    )


def read_sequence_file(spark: SparkSession, path: str) -> DataFrame:
    """Read a string-keyed SequenceFile back as (key, value) strings."""
    rdd = spark.sparkContext.sequenceFile(path)
    return spark.createDataFrame(rdd, "key string, value string")
