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
    *,
    wellformed: bool = False,
) -> DataFrame:
    """Collapse a keyed changelog to the current image of each key.

    Keeps the newest row per key by ``version_by`` (event time / LSN /
    offset + a unique tie-breaker), then drops keys whose newest op is a
    delete. Single shuffle on the key — identical cost shape to the
    reference's ChangelogNormalize state op.

    ``wellformed=True`` skips the pre-rank quarantine filter (drop -U /
    NULL-op rows) for producers that PROVE every row carries op ∈
    {I, U, D} — e.g. the CDC roundtrip queries, which construct their
    own envelopes. The filter is then an identity, but Catalyst pushes
    it below the changelog's fan-out exchange and clones the whole
    from_json(to_json(...)) envelope expression into the scan stage —
    one wasted full JSON round trip per input row (measured in the
    debezium roundtrip plan). Leave False for real feeds (retract
    streams with -U, ignore-parse-errors quarantine semantics).
    """
    src = df if wellformed else drop_update_before(df, op_col)
    latest = deduplicate(src, keys, version_by, keep="last")
    return latest.where(F.col(op_col) != "D").drop(op_col)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: str | list[str],
    *,
    compare_cols: list[str] | None = None,
    op_col: str = ROWKIND_COL,
) -> DataFrame:
    """Keyed diff of two table snapshots → a changelog of I / U / D rows
    — the batch complement of the CDC formats: where debezium/canal/ogg
    DELIVER a changelog, ``snapshot_diff`` DERIVES one from two full
    images (the standard bootstrap when a source system offers only
    periodic dumps; the emitted ``__op`` rows feed the same
    ``changelog_normalize`` / MERGE-upsert machinery, reference RowKind
    semantics per flink-core/.../types/RowKind.java:25).

    Classification per key (null-safe on both keys and values):

    - key only in ``new``  → ``I`` (after-image)
    - key only in ``old``  → ``D`` (before-image — the row being retired)
    - key in both, any ``compare_cols`` value differs → ``U``
      (after-image; update-before rows carry no information a keyed
      upsert needs — see ``drop_update_before``)
    - unchanged keys are not emitted.

    ``compare_cols`` defaults to every shared non-key column. Scale
    shape: ONE full-outer sort-merge join keyed by ``keys`` (both sides
    shuffle once — the minimum for a cross-partition keyed comparison);
    the value comparison is a null-safe struct equality evaluated in the
    join's projection, so nothing materializes beyond the changed rows.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c in set(old.columns) and c not in keys
        ]
    # presence markers, not key-null probes: a genuinely NULL key value
    # still classifies correctly (eqNullSafe matches NULL==NULL)
    o = old.select(*keys, *compare_cols).withColumn(
        "__in_o", F.lit(True)
    ).alias("__o")
    n = new.select(*keys, *compare_cols).withColumn(
        "__in_n", F.lit(True)
    ).alias("__n")
    cond = None
    for k in keys:
        eq = F.col(f"__o.{k}").eqNullSafe(F.col(f"__n.{k}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(n, on=cond, how="full_outer")
    in_old = F.col("__o.__in_o").isNotNull()
    in_new = F.col("__n.__in_n").isNotNull()
    changed = ~F.struct(
        *[F.col(f"__o.{c}") for c in compare_cols]
    ).eqNullSafe(F.struct(*[F.col(f"__n.{c}") for c in compare_cols]))
    op = (
        F.when(~in_old, F.lit("I"))
        .when(~in_new, F.lit("D"))
        .when(changed, F.lit("U"))
    )
    side = lambda c: F.when(  # noqa: E731 — after-image, D keeps before
        F.col(op_col) == "D", F.col(f"__o.{c}")
    ).otherwise(F.col(f"__n.{c}"))
    return (
        joined.withColumn(op_col, op)
        .where(F.col(op_col).isNotNull())
        .select(
            *[side(k).alias(k) for k in keys],
            *[side(c).alias(c) for c in compare_cols],
            op_col,
        )
    )


def scd2_history(
    changes: DataFrame,
    keys: str | list[str],
    version_ts: str,
    *,
    op_col: str = ROWKIND_COL,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type 2 history from a keyed changelog:
    every I/U event opens a version valid from its timestamp; the next
    event on the key closes it; a D closes the open version without
    opening one. Output adds ``valid_from``, ``valid_to`` (NULL while
    open) and ``is_current`` — exactly the versioned-table shape the
    temporal/as-of join layer consumes (``FOR SYSTEM_TIME AS OF``
    probes resolve to the version whose [valid_from, valid_to) interval
    contains the probe time), so ``snapshot_diff`` → ``scd2_history`` →
    ``asof_join`` is the full periodic-dump-to-temporal-join pipeline.

    One shuffle keyed by ``keys``; the closing timestamp is a ``lead``
    over the per-key event order ``(version_ts, op_col, *tiebreak)`` —
    pass a unique ``tiebreak`` (an event/LSN id) when a key can carry
    several changes at one timestamp, else version boundaries on ties
    are engine-arbitrary.
    """
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    w = Window.partitionBy(*keys).orderBy(
        version_ts, op_col, *(tiebreak or [])
    )
    closed = changes.withColumn(
        "valid_to", F.lead(version_ts).over(w)
    ).withColumn("valid_from", F.col(version_ts))
    versions = closed.where(F.col(op_col) != "D")
    return versions.withColumn(
        "is_current", F.col("valid_to").isNull()
    ).drop(op_col)


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


def retract_rows(
    old: DataFrame,
    new: DataFrame,
    keys: str | list[str],
    *,
    compare_cols: list[str] | None = None,
    sign_col: str = "__sign",
) -> DataFrame:
    """The RETRACT-stream form of :func:`snapshot_diff`: emit signed
    rows (+1 inserts / after-images, -1 deletes / before-images) — an
    update materializes as the UPDATE_BEFORE(-1)/UPDATE_AFTER(+1) PAIR
    the reference's retract mode carries (RowKind.java:25 -U/+U; what
    ``drop_update_before`` strips for upsert sinks). This is the input
    shape that lets ANY distributive aggregate advance incrementally:
    ``agg(new) = agg(old) + agg(sign-weighted retract rows)``.

    Unchanged keys emit nothing. Scale shape: ONE full-outer keyed join
    (identical to ``snapshot_diff``); the ± expansion is a row-local
    ``explode`` of the signed row(s) each joined key produces. A union
    of two projections of the join would look equivalent but is not:
    Catalyst plans each union branch as an independent subtree, so the
    join (and both input scans/shuffles) would execute TWICE — the
    single-join shape is pinned by the ``retract_rows`` golden-plan
    snapshot (tests/golden_plans/).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c in set(old.columns) and c not in keys
        ]
    o = old.select(*keys, *compare_cols).withColumn(
        "__in_o", F.lit(True)
    ).alias("__o")
    n = new.select(*keys, *compare_cols).withColumn(
        "__in_n", F.lit(True)
    ).alias("__n")
    cond = None
    for k in keys:
        eq = F.col(f"__o.{k}").eqNullSafe(F.col(f"__n.{k}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(n, on=cond, how="full_outer")
    in_old = F.col("__o.__in_o").isNotNull()
    in_new = F.col("__n.__in_n").isNotNull()
    changed = ~F.struct(
        *[F.col(f"__o.{c}") for c in compare_cols]
    ).eqNullSafe(F.struct(*[F.col(f"__n.{c}") for c in compare_cols]))

    def signed(side: str, sign: int):
        return F.struct(
            *[F.col(f"{side}.{k}").alias(k) for k in keys],
            *[F.col(f"{side}.{c}").alias(c) for c in compare_cols],
            F.lit(sign).cast("int").alias(sign_col),
        )

    minus, plus = signed("__o", -1), signed("__n", 1)
    rows = (
        F.when(~in_old, F.array(plus))  # insert → +after-image
        .when(~in_new, F.array(minus))  # delete → -before-image
        .when(changed, F.array(minus, plus))  # update → -U/+U pair
        # unchanged key → empty array of the same struct type: explode
        # emits nothing for it
        .otherwise(F.slice(F.array(plus), 1, 0))
    )
    return joined.select(F.explode(rows).alias("__r")).select("__r.*")
