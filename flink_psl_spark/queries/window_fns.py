"""OVER-window function inventory (SURVEY §2.5, reference
BatchExecOverAggregate.java:79 — full ROWS/RANGE frame support — and the
ranking/analytic function set at FlinkSqlOperatorTable.java:925-935).

All of these share one SQL text between Spark and DuckDB (ANSI window
functions), with deterministic tie-breakers in every ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_psl_spark.queries.registry import query, sql_query, tables

sql_query(
    "wf_topn_per_group",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey)
                  AS INTEGER) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey) t
    WHERE rn <= 3
    """,
)

sql_query(
    "wf_rank_dense_rank",
    """
    SELECT p_brand, p_partkey, p_size,
           CAST(RANK() OVER w AS INTEGER) AS rk,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drk
    FROM part
    WHERE p_partkey <= 500
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_size, p_partkey)
    """,
)

sql_query(
    "wf_lag_lead",
    """
    SELECT event_id, user_id, value,
           LAG(value) OVER w AS prev_v,
           LEAD(value) OVER w AS next_v,
           LAG(value, 2, -1.0) OVER w AS prev2_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)

sql_query(
    "wf_running_rows_frame",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 3) AS run_sum,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 3) AS mavg3,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cnt
    FROM events
    """,
)

sql_query(
    "wf_range_frame",
    """
    SELECT p_partkey, p_brand, p_size,
           COUNT(*) OVER (PARTITION BY p_brand ORDER BY p_size
                 RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_near,
           ROUND(SUM(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_size
                 RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING), 2) AS near_price
    FROM part WHERE p_partkey <= 500
    """,
)

sql_query(
    "wf_ntile_percentiles",
    """
    SELECT c_custkey,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr,
           ROUND(CUME_DIST() OVER w, 6) AS cd
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)

sql_query(
    "wf_first_last_value",
    """
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_ok,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)


@query(
    "wf_dataframe_api",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey)
                AS INTEGER) AS rn,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
    FROM orders
    """,
)
def wf_dataframe_api(spark, sf_dir):
    """Table API OverWindow surface (reference Over.java:43) — same window
    specs expressed through pyspark.sql.Window."""
    t = tables(spark, sf_dir)
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_cum = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w_rank).alias("rn"),
        F.round(F.sum("o_totalprice").over(w_cum), 2).alias("cum_spend"),
    )
