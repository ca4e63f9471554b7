"""CEP / MATCH_RECOGNIZE query inventory (SURVEY §2.9, reference
flink-cep Pattern/NFA + StreamExecMatch.java:59).

The oracle for the contiguous one-or-more pattern is a gaps-and-islands
reconstruction in DuckDB SQL — exact, order-deterministic.
"""

from __future__ import annotations

from flink_psl_spark.cep import Measure, Step, match_recognize
from flink_psl_spark.queries.registry import query, tables


@query(
    "cep_clicks_then_purchase",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    base AS (
      SELECT *,
             SUM(CASE WHEN event_type <> 'click' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM ordered)
    SELECT c.user_id,
           c.n_clicks,
           c.first_click_ts,
           ROUND(c.click_value_sum, 3) AS click_value_sum,
           p.event_id AS purchase_id
    FROM (SELECT user_id, grp, COUNT(*) AS n_clicks, MIN(ts) AS first_click_ts,
                 SUM(value) AS click_value_sum
          FROM base WHERE event_type = 'click' GROUP BY user_id, grp) c
    JOIN (SELECT user_id, grp, event_id, event_type FROM base
          WHERE event_type <> 'click') p
      ON c.user_id = p.user_id AND c.grp = p.grp - 1
    WHERE p.event_type = 'purchase'
    """,
)
def cep_clicks_then_purchase(spark, sf_dir):
    """PATTERN (A+ B) — a maximal contiguous run of clicks immediately
    followed by a purchase, per user (greedy A+, SKIP PAST LAST ROW).
    Columns must avoid 'match_seq' in the compare (oracle islands carry no
    sequence number), so it is not selected."""
    t = tables(spark, sf_dir)
    out = match_recognize(
        t["events"],
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern=[
            Step.one_or_more("A", "event_type = 'click'"),
            Step.once("B", "event_type = 'purchase'"),
        ],
        measures=[
            Measure("n_clicks", "A", "count"),
            Measure("first_click_ts", "A", "first", "ts"),
            Measure("click_value_sum", "A", "sum", "value"),
            Measure("purchase_id", "B", "last", "event_id"),
        ],
    )
    from pyspark.sql import functions as F

    return out.select(
        "user_id",
        "n_clicks",
        "first_click_ts",
        F.round("click_value_sum", 3).alias("click_value_sum"),
        "purchase_id",
    )


@query(
    "cep_error_burst",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    base AS (
      SELECT *,
             SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM ordered)
    SELECT user_id, COUNT(*) AS n_errors,
           MIN(ts) AS burst_start, MAX(ts) AS burst_end
    FROM base WHERE event_type = 'error'
    GROUP BY user_id, grp HAVING COUNT(*) >= 3
    """,
)
def cep_error_burst(spark, sf_dir):
    """PATTERN (E{3,}) — maximal runs of >=3 consecutive error events per
    user (reference Pattern.timesOrMore; the WITHIN clause is exercised in
    tests/test_cep.py)."""
    t = tables(spark, sf_dir)
    return match_recognize(
        t["events"],
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern=[Step.at_least("E", "event_type = 'error'", 3)],
        measures=[
            Measure("n_errors", "E", "count"),
            Measure("burst_start", "E", "first", "ts"),
            Measure("burst_end", "E", "last", "ts"),
        ],
    ).select("user_id", "n_errors", "burst_start", "burst_end")
