"""Named query inventory — the driver-facing correctness surface.

Every operator from SURVEY.md §2 that we implement is exercised by at least
one named query here, each paired (where SQL-expressible) with an ANSI-SQL
oracle that DuckDB executes over the same parquet tables. The driver
hash-compares both sides (CORRECTNESS_r{N}.json).

Modules register themselves into the shared registry on import.
"""

from flink_psl_spark.queries.registry import (  # noqa: F401
    QUERIES,
    ORACLES,
    query,
    tables,
)

# registration side effects
import flink_psl_spark.queries.relational  # noqa: F401, E402
import flink_psl_spark.queries.tpch_suite  # noqa: F401, E402
import flink_psl_spark.queries.window_fns  # noqa: F401, E402
import flink_psl_spark.queries.windows_tvf  # noqa: F401, E402
import flink_psl_spark.queries.llm_queries  # noqa: F401, E402
import flink_psl_spark.queries.streaming_queries  # noqa: F401, E402
import flink_psl_spark.queries.cep_queries  # noqa: F401, E402
import flink_psl_spark.queries.cdc_queries  # noqa: F401, E402
import flink_psl_spark.queries.functions_ext  # noqa: F401, E402
import flink_psl_spark.queries.graph_queries  # noqa: F401, E402
