"""Relational correctness: run the registered queries against the DuckDB
oracle at the smoke scale factor (the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from _oracle import compare, duck_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


# a representative cross-section; scripts/check_queries.py covers everything
SAMPLE = [
    "q1_pricing_summary",
    "calc_project_filter",
    "agg_rollup",
    "agg_listagg",
    "join_multiway_revenue",
    "q5_local_supplier_volume",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "join_semi",
    "join_anti",
    "setop_except_all",
    "subquery_correlated",
    "wf_topn_per_group",
    "wf_running_rows_frame",
    "tumble_window_agg",
    "hop_window_agg",
    "cumulate_window_agg",
    "session_window_agg",
    "dedup_keep_last",
    "interval_join_batch",
    "asof_join",
    "llm_text_stats",
    "llm_cosine_topk",
]


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, sf_dir, con, name):
    from flink_psl_spark.queries import ORACLES, QUERIES

    df = QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, con, ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_all_oracle_keys_have_queries():
    from flink_psl_spark.queries import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) >= 40


def test_approx_count_distinct_accuracy(spark, sf_dir):
    from flink_psl_spark.queries import QUERIES

    rows = QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    # the query emits the ±10% accuracy invariant directly (oracle-able form)
    assert rows and all(r["within_10pct"] for r in rows), rows


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 40


def test_broadcast_join_plan(spark, sf_dir):
    """The dim joins must be broadcast — no fact-side shuffle before agg."""
    from flink_psl_spark.queries import QUERIES

    df = QUERIES["join_broadcast_dim"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """Predicate + projection must reach the parquet scan."""
    from flink_psl_spark.queries.registry import tables

    t = tables(spark, sf_dir)
    df = t["lineitem"].where(F.col("l_quantity") > 45).select("l_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity" in plan
    assert "ReadSchema" in plan


def test_hoisted_view_is_per_thread_safe(spark):
    """_hoisted_view must never drop a view another LIVE thread
    registered but has not yet analyzed (ADVICE r10): the drop set is
    keyed by (thread, tag), so B's invocation leaves A's fresh view
    resolvable, while A's own next invocation still reaps A's previous
    view. Once B exits without re-invoking, its orphaned view is reaped
    by the next call on any thread (ADVICE r11: the old ident-keyed map
    leaked one catalog-pinned checkpoint per exited thread, and a
    recycled ident handed a dead caller's slot to an unrelated one)."""
    import threading

    from flink_psl_spark.queries.relational import _hoisted_view

    df = spark.range(3)
    tag = "hoist_thread_test"
    name_a1 = _hoisted_view(df, tag)

    names_b = []
    registered = threading.Event()
    release = threading.Event()

    def other():
        names_b.append(_hoisted_view(df, tag))
        registered.set()
        release.wait(30)

    th = threading.Thread(target=other)
    th.start()
    assert registered.wait(30)
    # B's call (same tag, different thread) must NOT have dropped A's view
    assert spark.sql(f"SELECT COUNT(*) AS n FROM {name_a1}").first()["n"] == 3
    # A's own next call reaps only A's previous view...
    name_a2 = _hoisted_view(df, tag)
    assert not spark.catalog.tableExists(name_a1)
    # ...and leaves the still-LIVE B's view alone
    assert spark.sql(f"SELECT COUNT(*) AS n FROM {names_b[0]}").first()["n"] == 3
    release.set()
    th.join()
    # B exited without re-invoking: the next call reaps B's orphan (and
    # A's previous view, as always)
    name_a3 = _hoisted_view(df, tag)
    assert not spark.catalog.tableExists(name_a2)
    assert not spark.catalog.tableExists(names_b[0])
    spark.catalog.dropTempView(name_a3)
