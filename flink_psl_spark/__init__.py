"""flink_psl_spark — a PySpark-native batch + streaming analytics engine.

Provides the query and data-processing capability surface of the reference
system (an Apache Flink 1.16.3 fork, see SURVEY.md) re-expressed idiomatically
on Spark DataFrames / Spark SQL / Structured Streaming, plus LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

Layout
------
- ``session``    : SparkSession factory tuned for the engine.
- ``catalog``    : table registry over parquet dirs (temp views).
- ``functions``  : scalar-function compat layer (reference built-ins that
                   differ in name/semantics from Spark's).
- ``operators``  : batch relational operators Spark lacks as primitives
                   (as-of/temporal join, interval join, Top-N, dedup,
                   cumulate windows, changelog transforms).
- ``streaming``  : Structured Streaming helpers (watermarks, stateful keyed
                   processing, streaming dedup/Top-N, replay utilities).
- ``llm``        : large-scale training-data pipeline operators (exact &
                   near dedup, ANN similarity search, text analysis,
                   multimodal plumbing).
"""

__version__ = "0.1.0"

from flink_psl_spark.session import get_spark  # noqa: F401
from flink_psl_spark.catalog import register_tables, TABLES  # noqa: F401
from flink_psl_spark.api import TableEnvironment  # noqa: F401
