"""Example 5 — SQL dialect parity + REST gateway.

A reference-engine user's SQL workflow, unchanged: connector DDL with a
WATERMARK and PRIMARY KEY, a temporal join written as FOR SYSTEM_TIME AS
OF, window aggregation in both the TVF and legacy GROUP BY clauses — all
through the script client — then the same engine served over the REST
gateway (open session → execute → paginated fetch).

Run: python examples/sql_dialect_gateway.py [sf_dir]
"""

import datetime as dt
import sys
import tempfile

sys.path.insert(0, ".")


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from flink_psl_spark import get_spark
    from flink_psl_spark.gateway import GatewayClient, SqlGateway
    from flink_psl_spark.sql_client import run_script

    spark = get_spark(app_name="sql_dialect_example", master="local[4]",
                      shuffle_partitions=4)

    # -- versioned dim via Flink DDL, fact rows, temporal join ------------
    rates_path = tempfile.mkdtemp(prefix="ex5_rates_") + "/t"
    t0 = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [("eur", 1.1, t0), ("eur", 1.3, t0 + dt.timedelta(hours=12)),
         ("usd", 1.0, t0)],
        "cur string, rate double, valid_from timestamp",
    ).write.parquet(rates_path)
    spark.sql("DROP TABLE IF EXISTS rates_ex")

    results = run_script(
        spark,
        f"""
        CREATE TABLE rates_ex (
          cur STRING, rate DOUBLE, valid_from TIMESTAMP(3),
          WATERMARK FOR valid_from AS valid_from - INTERVAL '5' SECOND,
          PRIMARY KEY (cur) NOT ENFORCED
        ) WITH ('connector' = 'filesystem', 'path' = '{rates_path}',
                'format' = 'parquet');

        SELECT o.id, o.cur, r.rate
        FROM (SELECT 1 AS id, 'eur' AS cur,
                     TIMESTAMP '2024-01-01 18:00:00' AS ts
              UNION ALL
              SELECT 2, 'eur', TIMESTAMP '2024-01-01 03:00:00') o
        JOIN rates_ex FOR SYSTEM_TIME AS OF o.ts AS r ON r.cur = o.cur;
        """,
    )
    print("temporal join via FOR SYSTEM_TIME AS OF:")
    results[-1].df.show()

    # -- the LEGACY temporal table function form of the same join ---------
    from flink_psl_spark.temporal_sql import register_temporal_table_function

    register_temporal_table_function(
        "rates_fn", "rates_ex", time_col="valid_from", primary_key="cur"
    )
    res_ttf = run_script(
        spark,
        """
        SELECT o.id, o.cur, r.rate
        FROM (SELECT 1 AS id, 'eur' AS cur,
                     TIMESTAMP '2024-01-01 18:00:00' AS ts) o,
             LATERAL TABLE (rates_fn(o.ts)) AS r
        WHERE r.cur = o.cur;
        """,
    )
    print("same join via LATERAL TABLE (temporal table function):")
    res_ttf[-1].df.show()

    # -- window TVF + legacy group-window clauses over the fixture --------
    res = run_script(
        spark,
        """
        SELECT window_start, COUNT(*) AS n
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start ORDER BY n DESC LIMIT 3;

        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS ws, COUNT(*) AS n
        FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)
        ORDER BY n DESC LIMIT 3;
        """,
        sf_dir=sf_dir,
    )
    print("window TVF clause:")
    res[-2].df.show()
    print("legacy GROUP BY TUMBLE clause:")
    res[-1].df.show()

    # -- the same engine over REST ----------------------------------------
    gw = SqlGateway(spark).start()
    try:
        client = GatewayClient(gw.url)
        h = client.open_session()
        op = client.execute(
            h, "SELECT cur, COUNT(*) AS versions FROM rates_ex GROUP BY cur"
        )
        cols, rows = client.fetch_all(h, op, page_size=1)
        print(f"gateway at {gw.url}: {cols} -> {rows}")
        client.close_session(h)
    finally:
        gw.stop()
    spark.sql("DROP TABLE IF EXISTS rates_ex")


if __name__ == "__main__":
    main(*sys.argv[1:])
