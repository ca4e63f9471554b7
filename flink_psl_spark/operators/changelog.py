"""Changelog / CDC layer (reference §2.6 + RowKind).

The reference models every table-layer stream as a changelog of
+I / -U / +U / -D rows (flink-core/.../types/RowKind.java:25) and plans
per-operator changelog modes (FlinkChangelogModeInferenceProgram.scala:43).
Spark has no in-engine retractions, so our engine's design decision
(SURVEY §7 M4) is: changelogs are *explicit data* — an ``__op`` column —
processed with ordinary relational operators, and materialized to upsert
sinks via ``foreachBatch`` MERGE.

Row kinds: ``I`` insert, ``U`` update (after-image), ``D`` delete.
``-U`` (update-before) rows carry no information a keyed upsert needs, so
``drop_update_before`` removes them (reference: StreamExecDropUpdateBefore
.java:55) and ``changelog_normalize`` collapses a keyed changelog to its
latest consistent image (reference: StreamExecChangelogNormalize.java:74).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_psl_spark.operators.ranking import deduplicate

ROWKIND_COL = "__op"
UPDATE_BEFORE = "-U"


def to_changelog(df: DataFrame, op: str = "I") -> DataFrame:
    """Stamp a static DataFrame as insert-only changelog rows."""
    return df.withColumn(ROWKIND_COL, F.lit(op))


def drop_update_before(df: DataFrame, op_col: str = ROWKIND_COL) -> DataFrame:
    """Strip update-before records — sinks keyed by PK don't need them."""
    return df.where(F.col(op_col) != UPDATE_BEFORE)


def changelog_normalize(
    df: DataFrame,
    keys: str | list[str],
    version_by: str | list[str],
    op_col: str = ROWKIND_COL,
) -> DataFrame:
    """Collapse a keyed changelog to the current image of each key.

    Keeps the newest row per key by ``version_by`` (event time / LSN /
    offset + a unique tie-breaker), then drops keys whose newest op is a
    delete. Single shuffle on the key — identical cost shape to the
    reference's ChangelogNormalize state op.
    """
    latest = deduplicate(
        drop_update_before(df, op_col), keys, version_by, keep="last"
    )
    return latest.where(F.col(op_col) != "D").drop(op_col)
