"""Flink DDL dialect mapping (ddl.py): CREATE TABLE ... WITH (...) ->
Spark DDL, WATERMARK/PRIMARY KEY metadata capture, versioned-table
auto-registration, connector guidance errors."""

from __future__ import annotations

import pytest

from flink_psl_spark.ddl import (
    clear_ddl_metadata,
    primary_key,
    rewrite_create_table,
    watermark_spec,
)
from flink_psl_spark.temporal_sql import clear_versioned_tables


@pytest.fixture(autouse=True)
def _clean():
    clear_ddl_metadata()
    clear_versioned_tables()
    yield
    clear_ddl_metadata()
    clear_versioned_tables()


def test_filesystem_ddl_rewrite():
    out = rewrite_create_table(
        """CREATE TABLE rates (
             cur STRING,
             rate DOUBLE,
             valid_from TIMESTAMP(3),
             WATERMARK FOR valid_from AS valid_from - INTERVAL '5' SECOND,
             PRIMARY KEY (cur) NOT ENFORCED
           ) WITH (
             'connector' = 'filesystem',
             'path' = '/tmp/rates',
             'format' = 'parquet'
           )"""
    )
    assert out == (
        "CREATE TABLE IF NOT EXISTS rates (cur STRING, rate DOUBLE, "
        "valid_from TIMESTAMP) USING parquet LOCATION '/tmp/rates'"
    )
    assert watermark_spec("rates") == ("valid_from", "5 second")
    assert primary_key("rates") == ["cur"]
    # PK + watermark -> auto-registered as a version table
    from flink_psl_spark.temporal_sql import rewrite_system_time_joins

    rewritten = rewrite_system_time_joins(
        "SELECT * FROM o JOIN rates FOR SYSTEM_TIME AS OF o.ts AS r "
        "ON r.cur = o.cur"
    )
    assert "LEAD(valid_from)" in rewritten


def test_ddl_type_normalization_and_row():
    out = rewrite_create_table(
        "CREATE TABLE t (ts TIMESTAMP_LTZ(3), nested ROW<a INT, b STRING>) "
        "WITH ('connector' = 'filesystem', 'path' = '/tmp/t')"
    )
    assert "ts TIMESTAMP" in out and "STRUCT<a INT, b STRING>" in out
    assert "USING parquet" in out  # format defaults to parquet


def test_ddl_connector_guidance():
    with pytest.raises(ValueError, match="datagen_stream"):
        rewrite_create_table(
            "CREATE TABLE g (id BIGINT) WITH ('connector' = 'datagen')"
        )
    with pytest.raises(ValueError, match="requires a 'path'"):
        rewrite_create_table(
            "CREATE TABLE t (id BIGINT) WITH ('connector' = 'filesystem')"
        )
    # computed columns expand to the view form
    out_cc = rewrite_create_table(
        "CREATE TABLE t (id BIGINT, d AS id * 2) "
        "WITH ('connector' = 'filesystem', 'path' = '/tmp/x')"
    )
    assert isinstance(out_cc, list) and "(id * 2) AS d" in out_cc[1]
    # non-WITH statements pass through
    assert rewrite_create_table("CREATE TABLE t (id BIGINT)") == (
        "CREATE TABLE t (id BIGINT)"
    )


def test_ddl_end_to_end_script(spark, tmp_path):
    """DDL -> insert -> temporal join, all through the script client."""
    import datetime as dt

    from flink_psl_spark.sql_client import run_script

    path = str(tmp_path / "rates_tbl")
    spark.sql("DROP TABLE IF EXISTS rates_ddl")
    t0 = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [("eur", 1.0, t0), ("eur", 2.0, t0 + dt.timedelta(hours=10))],
        "cur string, rate double, valid_from timestamp",
    ).write.parquet(path)
    try:
        res = run_script(
            spark,
            f"""
            CREATE TABLE rates_ddl (
              cur STRING, rate DOUBLE, valid_from TIMESTAMP(3),
              WATERMARK FOR valid_from AS valid_from - INTERVAL '5' SECOND,
              PRIMARY KEY (cur) NOT ENFORCED
            ) WITH ('connector' = 'filesystem', 'path' = '{path}',
                    'format' = 'parquet');
            SELECT o.id, r.rate
            FROM (SELECT 1 AS id, 'eur' AS cur,
                         TIMESTAMP '2024-01-01 12:00:00' AS ts) o
            JOIN rates_ddl FOR SYSTEM_TIME AS OF o.ts AS r
              ON r.cur = o.cur;
            """,
        )[-1].df
        assert [(r["id"], r["rate"]) for r in res.collect()] == [(1, 2.0)]
    finally:
        spark.sql("DROP TABLE IF EXISTS rates_ddl")


def test_ddl_partitioned_by(spark, tmp_path):
    import datetime as dt

    from flink_psl_spark.ddl import rewrite_create_table
    from flink_psl_spark.sql_client import run_script

    out = rewrite_create_table(
        "CREATE TABLE pt (id BIGINT, region STRING) PARTITIONED BY (region) "
        "WITH ('connector' = 'filesystem', 'path' = '/tmp/pt')"
    )
    assert "PARTITIONED BY (region)" in out and "USING parquet" in out
    # end to end: DDL + insert + partition-pruned read
    path = str(tmp_path / "pt_tbl")
    spark.sql("DROP TABLE IF EXISTS pt_ddl")
    try:
        res = run_script(
            spark,
            f"""
            CREATE TABLE pt_ddl (id BIGINT, region STRING)
            PARTITIONED BY (region)
            WITH ('connector' = 'filesystem', 'path' = '{path}',
                  'format' = 'parquet');
            INSERT INTO pt_ddl VALUES (1, 'eu'), (2, 'us'), (3, 'eu');
            SELECT COUNT(*) AS n FROM pt_ddl WHERE region = 'eu';
            """,
        )
        assert res[-1].df.first()["n"] == 2
        import os

        assert "region=eu" in os.listdir(path)  # hive-style layout
    finally:
        spark.sql("DROP TABLE IF EXISTS pt_ddl")


def test_ddl_metadata_columns(spark, tmp_path, sf_dir):
    """METADATA FROM columns map to a base table + a view projecting the
    scan-time _metadata struct."""
    import shutil

    from flink_psl_spark.ddl import rewrite_create_table
    from flink_psl_spark.sql_client import run_script

    out = rewrite_create_table(
        "CREATE TABLE mt (id BIGINT, src STRING METADATA FROM 'file.name' "
        "VIRTUAL, mtime TIMESTAMP_LTZ(3) METADATA FROM "
        "'file.modification-time') "
        "WITH ('connector' = 'filesystem', 'path' = '/tmp/mt')"
    )
    assert isinstance(out, list) and len(out) == 2
    assert "mt__base" in out[0]
    assert "_metadata.file_name AS src" in out[1]
    assert "_metadata.file_modification_time AS mtime" in out[1]
    with pytest.raises(ValueError, match="no file-connector mapping"):
        rewrite_create_table(
            "CREATE TABLE x (id BIGINT, o STRING METADATA FROM 'k.offset') "
            "WITH ('connector' = 'filesystem', 'path' = '/tmp/x')"
        )

    # end to end over a real file
    path = str(tmp_path / "mt_tbl")
    shutil.copytree(f"{sf_dir}", path, ignore=shutil.ignore_patterns("*"))
    spark.sql("DROP TABLE IF EXISTS nat_meta__base")
    spark.read.parquet(f"{sf_dir}/nation.parquet").write.parquet(
        path + "/data"
    )
    try:
        res = run_script(
            spark,
            f"""
            CREATE TABLE nat_meta (
              n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT,
              src STRING METADATA FROM 'file.name' VIRTUAL
            ) WITH ('connector' = 'filesystem', 'path' = '{path}/data',
                    'format' = 'parquet');
            SELECT COUNT(*) AS n, COUNT(DISTINCT src) AS files FROM nat_meta;
            """,
        )
        row = res[-1].df.first()
        assert row["n"] == 25 and row["files"] >= 1
    finally:
        spark.sql("DROP VIEW IF EXISTS nat_meta")
        spark.sql("DROP TABLE IF EXISTS nat_meta__base")


def test_ddl_computed_columns_end_to_end(spark, tmp_path):
    from flink_psl_spark.sql_client import run_script

    path = str(tmp_path / "cc_tbl")
    spark.createDataFrame([(1,), (2,), (3,)], "id bigint").write.parquet(path)
    spark.sql("DROP VIEW IF EXISTS cc_ddl")
    spark.sql("DROP TABLE IF EXISTS cc_ddl__base")
    try:
        res = run_script(
            spark,
            f"""
            CREATE TABLE cc_ddl (id BIGINT, double_id AS id * 2)
            WITH ('connector' = 'filesystem', 'path' = '{path}');
            SELECT SUM(double_id) AS s FROM cc_ddl;
            """,
        )
        assert res[-1].df.first()["s"] == 12
    finally:
        spark.sql("DROP VIEW IF EXISTS cc_ddl")
        spark.sql("DROP TABLE IF EXISTS cc_ddl__base")
