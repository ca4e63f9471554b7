"""Example 1 — batch ETL: the reference's TableEnvironment program shape.

Run: python examples/batch_etl.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from flink_psl_spark import TableEnvironment
from flink_psl_spark.operators import asof_join, top_n


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    t_env = TableEnvironment.create(master="local[4]")
    t_env.register_fixture_tables(sf_dir)

    # SQL path — full Spark SQL plus the compat functions (SPLIT_INDEX, …)
    t_env.sql_query(
        """
        SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY revenue DESC LIMIT 5
        """
    ).show()

    # DataFrame path with engine operators
    events = t_env.from_path("events")
    purchases = events.where(F.col("event_type") == "purchase")
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    enriched = asof_join(
        purchases.select("event_id", "user_id", "ts"),
        clicks, on="user_id", left_time="ts", right_time="ts", how="left",
    )
    top_n(enriched, "user_id", [F.col("ts").desc()], 1).show(5)


if __name__ == "__main__":
    main(*sys.argv[1:])
