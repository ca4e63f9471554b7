"""The Spark-vs-DuckDB compare harness itself: on a value mismatch the
detail must NAME the diverging column(s) so a red driver row
self-localizes (round-8 lesson: llm_bfd_packing's corpus-wide token sum
cost a forensic session without this)."""

from __future__ import annotations

import duckdb

from _oracle import compare


def _duck():
    return duckdb.connect()


def test_mismatch_detail_names_the_column(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id bigint, k string, v bigint"
    )
    ok, detail = compare(
        df, _duck(),
        "SELECT * FROM (VALUES (1, 'a', 10), (2, 'b', 99)) t(id, k, v)",
    )
    assert not ok
    assert "columns ['v']" in detail, detail


def test_mismatch_detail_row_association_only(spark):
    # per-column multisets equal, tuple associations swapped
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id bigint, k string")
    ok, detail = compare(
        df, _duck(),
        "SELECT * FROM (VALUES (1, 'y'), (2, 'x')) t(id, k)",
    )
    assert not ok
    assert "<row association only>" in detail, detail


def test_match_still_ok(spark):
    df = spark.createDataFrame([(1, "a")], "id bigint, k string")
    ok, detail = compare(
        df, _duck(), "SELECT * FROM (VALUES (1, 'a')) t(id, k)"
    )
    assert ok and detail == "ok"


def test_spark_type_tripwire_catches_decimal(spark):
    """Spark-side arm of the portable-type tripwire: a decimal(p,s)
    output column (the classic uncast-Spark-aggregate shape) classes as
    "float" on both sides — invisible to the CLASS gate — but sits
    outside the driver-proven dtype surface, so compare() must refuse
    it BEFORE fetching values; CASTing to double clears it."""
    from _oracle import non_portable_spark_dtypes

    bad = spark.sql("SELECT CAST(1.5 AS DECIMAL(38,18)) AS x")
    assert non_portable_spark_dtypes(bad.dtypes) == ["decimal(38,18)"]
    ok_df = spark.sql("SELECT CAST(1.5 AS DOUBLE) AS x")
    assert non_portable_spark_dtypes(ok_df.dtypes) == []

    ok, detail = compare(bad, _duck(), "SELECT 1.5::DOUBLE AS x")
    assert not ok
    assert "non-portable Spark dtypes" in detail, detail
    ok, detail = compare(ok_df, _duck(), "SELECT 1.5::DOUBLE AS x")
    assert ok, detail


def test_spark_type_allowlist_matches_registry_surface():
    """The allowlist IS the measured r10 dtype surface of the full
    376-query registry (all driver-green) plus the three narrower
    numeric widths the hasher provably normalizes with their wider
    class peers — shrinking it below the measured surface would
    red-flag green queries; widening it must be a conscious edit."""
    from _oracle import _PORTABLE_SPARK_DTYPES

    measured_r10_surface = {
        "bigint", "boolean", "date", "double", "int", "string",
        "timestamp", "timestamp_ntz",
    }
    assert measured_r10_surface <= _PORTABLE_SPARK_DTYPES
    assert _PORTABLE_SPARK_DTYPES - measured_r10_surface == {
        "tinyint", "smallint", "float",
    }
