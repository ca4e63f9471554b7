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


def non_deterministic_expressions(df: DataFrame) -> list[str]:
    """All non-deterministic expressions in the frame's analyzed plan —
    the engine-level input to non-deterministic-update (NDU) analysis
    (reference: StreamNonDeterministicUpdatePlanVisitor.java /
    `table.optimizer.non-deterministic-update.strategy`, FLINK 1.16's
    NDU handling for changelog pipelines).

    Walks Catalyst's own per-expression ``deterministic`` flag over every
    plan node and expression subtree, so the answer matches what Spark
    will actually recompute differently on retry/retraction (rand, uuid,
    shuffle, monotonically_increasing_id, ND UDFs, ...). Only ROOT-CAUSE
    expressions are reported: a node that is itself non-deterministic
    while all its children are deterministic (an ``alias`` or comparison
    wrapping ``rand()`` inherits the flag but isn't the source). Subquery
    expressions' inner plans are not descended into (same scope note as
    the reference's visitor, which treats them at the operator boundary).
    """
    found: set[str] = set()

    def walk_expr(e) -> None:
        ch = e.children()
        try:
            if not e.deterministic() and all(
                ch.apply(i).deterministic() for i in range(ch.size())
            ):
                found.add(e.prettyName())
        except Exception:
            pass
        for i in range(ch.size()):
            walk_expr(ch.apply(i))

    def walk_plan(p) -> None:
        exprs = p.expressions()
        for i in range(exprs.size()):
            walk_expr(exprs.apply(i))
        ch = p.children()
        for i in range(ch.size()):
            walk_plan(ch.apply(i))

    walk_plan(df._jdf.queryExecution().analyzed())
    return sorted(found)


def assert_deterministic_updates(
    df: DataFrame, *, strategy: str = "TRY_RESOLVE"
) -> list[str]:
    """NDU gate for update/upsert pipelines (reference
    OptimizerConfigOptions `table.optimizer.non-deterministic-update
    .strategy`): a non-deterministic column that feeds a keyed upsert or
    retraction recomputes DIFFERENTLY when the update fires, corrupting
    the sink's image — the reference's TRY_RESOLVE strategy fails the
    plan with guidance rather than emit wrong retractions.

    strategy='IGNORE' returns the (possibly empty) list without raising;
    'TRY_RESOLVE' raises ValueError naming each offending expression.
    Call before wiring a frame into merge_upsert / an upsert sink.
    """
    nd = non_deterministic_expressions(df)
    if strategy.upper() == "IGNORE":
        return nd
    if strategy.upper() != "TRY_RESOLVE":
        raise ValueError("strategy must be TRY_RESOLVE or IGNORE")
    if nd:
        raise ValueError(
            "non-deterministic expressions feed an update pipeline: "
            f"{nd} — materialize them before the changelog boundary "
            "(write once, then upsert from the materialized column) or "
            "replace with a deterministic derivation (hash of row keys), "
            "as the reference's NDU TRY_RESOLVE strategy requires"
        )
    return nd
