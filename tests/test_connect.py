"""connect/CoProcess tests: dynamic-threshold alerting — a control stream
updates per-key thresholds, the data stream alerts when value exceeds the
threshold in effect AT ITS EVENT TIME (broadcast-state pattern). The batch
oracle is an as-of join of events against threshold updates."""

from __future__ import annotations

import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _make_alerting_process():
    """Factory so the closure is pickled BY VALUE (a module-level function
    in a test module would be cloudpickled by reference, and Spark workers
    cannot import the test module)."""

    def alerting_process(key, rows: pd.DataFrame, st: dict):
        thr = st.get("thr")
        alerts = []
        for _, r in rows.iterrows():
            p = r["payload"]
            if r["side"] == "control":
                thr = p["threshold"]
            elif thr is not None and p["value"] > thr:
                alerts.append(
                    {"user": key, "event_id": p["event_id"],
                     "value": p["value"], "thr": float(thr)}
                )
        out = pd.DataFrame(alerts) if alerts else None
        return out, {"thr": thr}

    return alerting_process


@pytest.fixture(scope="module")
def streams(spark):
    d = tempfile.mkdtemp(prefix="fps_conn_")
    data_rows = [
        ("u1", 1, 1, 5.0), ("u1", 3, 2, 50.0), ("u1", 5, 3, 15.0),
        ("u1", 7, 4, 30.0), ("u2", 2, 5, 100.0), ("u2", 6, 6, 100.0),
    ]
    ctrl_rows = [("u1", 2, 10.0), ("u1", 6, 20.0), ("u2", 4, 50.0)]
    spark.createDataFrame(
        data_rows, "user string, seq long, event_id long, value double"
    ).coalesce(1).write.parquet(f"{d}/data")
    spark.createDataFrame(
        ctrl_rows, "user string, seq long, threshold double"
    ).coalesce(1).write.parquet(f"{d}/ctrl")
    return d


def test_connect_keyed_threshold_alerts(spark, streams):
    from flink_psl_spark.streaming import connect_keyed, run_to_memory_table

    d = streams
    data = spark.readStream.schema(
        "user string, seq long, event_id long, value double"
    ).parquet(f"{d}/data")
    ctrl = spark.readStream.schema(
        "user string, seq long, threshold double"
    ).parquet(f"{d}/ctrl")

    out = connect_keyed(
        data, ctrl, "user", "seq", _make_alerting_process(),
        "user string, event_id long, value double, thr double",
    )
    got = {
        (r["event_id"], r["thr"])
        for r in run_to_memory_table(out, output_mode="append").collect()
    }
    # u1: ev1 (seq1) before any threshold → no alert; ev2 (seq3, 50>10) ✓;
    # ev3 (seq5, 15>10) ✓; ev4 (seq7, 30>20) ✓
    # u2: ev5 (seq2) before threshold → no; ev6 (seq6, 100>50) ✓
    assert got == {(2, 10.0), (3, 10.0), (4, 20.0), (6, 50.0)}


def test_connect_matches_asof_oracle(spark, streams, sf_dir):
    """The same result via batch as-of join — the two formulations of
    'value exceeds the threshold in effect at event time' must agree."""
    from flink_psl_spark.operators import asof_join
    from flink_psl_spark.streaming import connect_keyed, run_to_memory_table

    d = streams
    data_b = spark.read.parquet(f"{d}/data")
    ctrl_b = spark.read.parquet(f"{d}/ctrl")
    oracle = (
        asof_join(
            data_b, ctrl_b, on="user", left_time="seq", right_time="seq",
            how="inner",
        )
        .where(F.col("value") > F.col("r_threshold"))
        .select("event_id", F.col("r_threshold").alias("thr"))
    )
    want = {(r["event_id"], r["thr"]) for r in oracle.collect()}

    data = spark.readStream.schema(
        "user string, seq long, event_id long, value double"
    ).parquet(f"{d}/data")
    ctrl = spark.readStream.schema(
        "user string, seq long, threshold double"
    ).parquet(f"{d}/ctrl")
    out = connect_keyed(
        data, ctrl, "user", "seq", _make_alerting_process(),
        "user string, event_id long, value double, thr double",
    )
    got = {
        (r["event_id"], r["thr"])
        for r in run_to_memory_table(out, output_mode="append").collect()
    }
    assert got == want


def test_table_environment_facade(spark, sf_dir):
    from flink_psl_spark.api import TableEnvironment

    t_env = TableEnvironment(spark)
    t_env.register_fixture_tables(sf_dir)
    assert "lineitem" in t_env.list_tables()

    out = t_env.sql_query(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1"
    )
    assert out.count() > 0

    # compat functions are SQL-visible through the facade
    row = t_env.execute_sql("SELECT SPLIT_INDEX('a|b', '|', 1) AS x").first()
    assert row["x"] == "b"

    # file-backed table declaration (CREATE TABLE ... WITH path/format)
    import tempfile

    d = tempfile.mkdtemp(prefix="fps_api_")
    t_env.from_path("nation").write.mode("overwrite").csv(d, header=True)
    t_env.create_table(
        "nation_csv", path=d, fmt="csv",
        schema="n_nationkey int, n_name string, n_regionkey int",
    )
    assert t_env.sql_query("SELECT COUNT(*) AS n FROM nation_csv").first()[
        "n"
    ] == t_env.from_path("nation").count()

    # scalar + table function registration
    t_env.create_temporary_function("double_it", lambda x: x * 2, "int")
    assert t_env.execute_sql("SELECT double_it(21) AS x").first()["x"] == 42
    t_env.drop_temporary_view("nation_csv")
