"""Batch relational operators the reference has but Spark lacks as primitives.

Everything here is a composition of DataFrame operations (window functions,
unions, explodes) — declarative plans Catalyst can optimize — never
driver-side loops. See each module for the reference operator it mirrors.
"""

from flink_psl_spark.operators.joins import (  # noqa: F401
    asof_join,
    fuzzy_join,
    interval_join,
    binned_interval_join,
)
from flink_psl_spark.operators.ranking import top_n, deduplicate  # noqa: F401
from flink_psl_spark.operators.windows import (  # noqa: F401
    tumble,
    hop,
    cumulate,
    ewma_anomaly,
    gap_fill,
    session,
)
from flink_psl_spark.operators.misc import (  # noqa: F401
    async_lookup,
    async_lookup_with_retry,
    incremental_refresh,
    side_outputs,
    write_side_outputs,
)
from flink_psl_spark.operators.changelog import (  # noqa: F401
    ROWKIND_COL,
    changelog_normalize,
    drop_update_before,
    scd2_history,
    retract_rows,
    snapshot_diff,
    to_changelog,
)
from flink_psl_spark.operators.skew import salted_agg, salted_join  # noqa: F401
from flink_psl_spark.operators.validation import (  # noqa: F401
    bucket_counts,
    detect_metric_anomalies,
    distribution_drift,
    expect_schema,
    foreign_key,
    psi_report,
    in_range,
    in_set,
    matches,
    min_rows,
    non_negative,
    not_null,
    satisfies,
    unique,
    validate_stream,
    validate_table,
)
