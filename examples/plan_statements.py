"""Plan-introspection statements: EXPLAIN with detail flags, COMPILE
PLAN / EXECUTE PLAN, and golden-plan signatures.

Reference parity: the EXPLAIN statement with ExplainDetail flags
(ExplainDetail.java) and the compiled-plan surface (CompiledPlan.java,
ExecNodeGraph.java:29), re-expressed on Catalyst — see
flink_psl_spark/plans.py for the mapping notes.

Run: python examples/plan_statements.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_psl_spark import get_spark
from flink_psl_spark.sql_client import run_script

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(master="local[4]")

    # 1. Multi-section EXPLAIN — AST, optimized logical, formatted physical
    [res] = run_script(
        spark,
        """
        EXPLAIN PLAN FOR
        SELECT o_orderpriority, count(*) AS n
        FROM orders WHERE o_totalprice > 100
        GROUP BY o_orderpriority;
        """,
        sf_dir=SF_DIR,
    )
    print(res.df.collect()[0][0][:600], "...\n")

    # 2. Detail flags: cost estimates, changelog modes, advisor, JSON plan
    [res] = run_script(
        spark,
        "EXPLAIN (ESTIMATED_COST, PLAN_ADVICE) "
        "SELECT c_custkey, rand() AS r FROM customer;",
        sf_dir=SF_DIR,
    )
    text = res.df.collect()[0][0]
    print(text[text.index("== Plan Advice =="):], "\n")

    # 3. EXPLAIN of a Flink-dialect statement — the window TVF is
    #    rewritten before planning, so the report shows the real plan
    [res] = run_script(
        spark,
        """
        EXPLAIN SELECT window_start, count(*) AS n
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start;
        """,
        sf_dir=SF_DIR,
    )

    # 4. COMPILE PLAN persists the statement + parse-tree signature
    #    WITHOUT running it; EXECUTE PLAN re-plans through Catalyst and
    #    fails if the statement no longer parses to the stored tree
    plan_file = os.path.join(tempfile.mkdtemp(), "top_orders.json")
    results = run_script(
        spark,
        f"""
        COMPILE PLAN '{plan_file}' FOR
          SELECT o_custkey, sum(o_totalprice) AS spend
          FROM orders GROUP BY o_custkey ORDER BY spend DESC LIMIT 5;
        EXECUTE PLAN '{plan_file}';
        """,
        sf_dir=SF_DIR,
    )
    results[-1].df.show()

    # 5. The restore gate is catalog-aware for pure queries: replace a
    #    table the compiled plan reads with a different shape and
    #    EXECUTE PLAN refuses to run (recompile to accept the change)
    spark.sql("CREATE OR REPLACE TEMP VIEW dim AS SELECT 1 AS id")
    drift_file = os.path.join(tempfile.mkdtemp(), "dim_q.json")
    run_script(spark, f"COMPILE PLAN '{drift_file}' FOR SELECT id FROM dim;")
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW dim AS SELECT CAST(1 AS BIGINT) AS id"
    )
    try:
        run_script(spark, f"EXECUTE PLAN '{drift_file}';")
    except ValueError as e:
        print(f"drift gate: {e}\n")

    # 6. CHANGELOG_MODE reads the engine's __op/__sign convention: a
    #    retract pipeline explains with retract modes, not a blanket [I]
    from flink_psl_spark.operators.changelog import retract_rows

    old = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    new = spark.createDataFrame([(1, 11), (3, 30)], "k int, v int")
    retract_rows(old, new, "k").createOrReplaceTempView("retr")
    [res] = run_script(spark, "EXPLAIN CHANGELOG_MODE SELECT * FROM retr;")
    text = res.df.collect()[0][0]
    start = text.index("== Optimized Physical Plan ==")
    print(text[start : start + 400], "...\n")

    # 7. Golden-plan signatures for your own regression files
    from flink_psl_spark.plans import plan_signature

    df = spark.table("orders").where("o_totalprice > 100").groupBy(
        "o_orderpriority"
    ).count()
    print(plan_signature(df, "optimized"))


if __name__ == "__main__":
    main()
