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
