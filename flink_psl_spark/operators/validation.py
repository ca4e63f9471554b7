"""Declarative data-quality constraint validation (Deequ-style).

The training-data pipelines this engine targets gate every new table
drop behind a constraint suite — the operational counterpart of
``profile_table`` (operators/misc.py): instead of describing the data,
``validate_table`` checks it against declared expectations and emits a
machine-readable pass/fail report. The check vocabulary follows the
published Deequ/Great-Expectations core set (completeness, uniqueness,
range, set membership, pattern, referential integrity, volume); the
implementation is pure DataFrame aggregation so Catalyst plans it.

Scale shape (the design constraint):

- ALL row-level checks (not_null / in_range / in_set / matches /
  non_negative) plus min_rows fold into ONE aggregation over ONE scan —
  conditional sums partial-aggregate map-side, the exchange carries one
  partial row per partition regardless of how many checks are declared.
- Each ``unique`` check is a two-level aggregation keyed by the
  candidate key — one shuffle, the same cost as any distinct-count, and
  unavoidable: uniqueness is a cross-partition property.
- Each ``foreign_key`` check is a left-anti join against the DISTINCT
  referenced keys; the distinct side is broadcast when small (dimension
  tables — the common case), else falls back to a shuffled anti join.

The report is a DataFrame (no driver collect): one row per check with
its violation count, unioned from the per-check aggregate branches.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One declared constraint. ``kind`` drives planning: 'row' checks
    fold into the shared single-scan aggregate; 'unique' / 'fk' /
    'min_rows' plan their own branch."""

    kind: str
    name: str
    target: str
    predicate: Column | None = None  # row kinds: TRUE == violation
    columns: tuple[str, ...] = ()
    ref: DataFrame | None = None
    ref_col: str | None = None
    min_count: int = 0
    broadcast_ref: bool = field(default=True)


def not_null(col: str) -> Check:
    """Completeness: ``col`` has no NULLs."""
    return Check("row", "not_null", col, predicate=F.col(col).isNull())


def in_range(col: str, lo=None, hi=None) -> Check:
    """Bounds (inclusive). NULLs are not range violations — declare
    ``not_null`` separately; conflating them double-counts."""
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < F.lit(lo))
    if hi is not None:
        cond = cond | (F.col(col) > F.lit(hi))
    return Check("row", "in_range", col, predicate=cond & F.col(col).isNotNull())


def in_set(col: str, values) -> Check:
    """Set membership. NULLs are excluded (see in_range)."""
    return Check(
        "row", "in_set", col,
        predicate=(~F.col(col).isin(list(values))) & F.col(col).isNotNull(),
    )


def matches(col: str, pattern: str) -> Check:
    """Regex pattern (Java regex via ``rlike``, unanchored — anchor with
    ^...$ in the pattern when full-match semantics are wanted)."""
    return Check(
        "row", "matches", col,
        predicate=(~F.col(col).rlike(pattern)) & F.col(col).isNotNull(),
    )


def non_negative(col: str) -> Check:
    """Sugar: in_range(col, lo=0)."""
    c = in_range(col, lo=0)
    return Check("row", "non_negative", col, predicate=c.predicate)


def satisfies(name: str, violation: Column, target: str = "*") -> Check:
    """Escape hatch: any boolean Column where TRUE marks a violation —
    arbitrary cross-column business rules without leaving the
    single-scan fold."""
    return Check("row", name, target, predicate=violation)


def unique(*cols: str) -> Check:
    """Candidate-key uniqueness over ``cols``. Violations = number of
    EXTRA rows (sum of count-1 over duplicated key groups), so a clean
    table reports 0 and each duplicate row counts once."""
    return Check("unique", "unique", ",".join(cols), columns=tuple(cols))


def foreign_key(
    col: str, ref: DataFrame, ref_col: str, *, broadcast_ref: bool = True
) -> Check:
    """Referential integrity: every non-NULL ``col`` value exists in
    ``ref[ref_col]``. ``broadcast_ref=False`` for reference sides too
    large to broadcast (the anti join then shuffles both sides)."""
    return Check(
        "fk", "foreign_key", f"{col}->{ref_col}",
        columns=(col,), ref=ref, ref_col=ref_col, broadcast_ref=broadcast_ref,
    )


def min_rows(n: int) -> Check:
    """Volume floor: the table has at least ``n`` rows. Violations =
    the shortfall (max(0, n - count))."""
    return Check("min_rows", "min_rows", "*", min_count=n)


def _fold_row_checks(
    df: DataFrame, row_checks: list[Check], vol_checks: list[Check]
) -> DataFrame:
    """The shared single-scan fold: one aggregate with one conditional
    sum per row check (+ the row count for volume floors), exploded to
    the long report shape. Works identically on batch and streaming
    frames — a streaming ``df`` yields a complete-mode global aggregate."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(row_checks):
        aggs.append(
            # coalesce: SUM over an EMPTY table is NULL — an empty
            # input has zero violations, not an unknown count
            F.coalesce(
                F.sum(F.when(c.predicate, 1).otherwise(0)), F.lit(0)
            ).cast("bigint").alias(f"__v_{i}")
        )
    wide = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c.name).alias("check"),
            F.lit(c.target).alias("target"),
            F.col(f"__v_{i}").alias("violations"),
        )
        for i, c in enumerate(row_checks)
    ] + [
        F.struct(
            F.lit(c.name).alias("check"),
            F.lit(c.target).alias("target"),
            F.greatest(
                F.lit(0).cast("bigint"),
                F.lit(c.min_count).cast("bigint") - F.col("__n"),
            ).alias("violations"),
        )
        for c in vol_checks
    ]
    return wide.select(
        F.explode(F.array(*entries)).alias("r")
    ).select("r.*")


def validate_table(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check and return the report frame
    ``(check, target, violations, passed)`` — one row per declared
    check, ``passed = (violations == 0)``.

    Row-level checks and min_rows share one scan (a single aggregate
    with one conditional sum per check); unique and foreign_key checks
    each add one keyed branch. Everything stays a DataFrame — callers
    gate a pipeline with ``report.where(~F.col('passed'))`` or sink the
    report; nothing collects on the driver.
    """
    row_checks = [c for c in checks if c.kind == "row"]
    vol_checks = [c for c in checks if c.kind == "min_rows"]
    branches: list[DataFrame] = []

    if row_checks or vol_checks:
        branches.append(_fold_row_checks(df, row_checks, vol_checks))

    for c in checks:
        if c.kind == "unique":
            dup_extra = (
                df.groupBy(*c.columns)
                .agg(F.count(F.lit(1)).alias("__cnt"))
                .where(F.col("__cnt") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("__cnt") - 1), F.lit(0))
                    .cast("bigint").alias("violations")
                )
            )
            branches.append(
                dup_extra.select(
                    F.lit(c.name).alias("check"),
                    F.lit(c.target).alias("target"),
                    "violations",
                )
            )
        elif c.kind == "fk":
            ref_keys = c.ref.select(
                F.col(c.ref_col).alias(c.columns[0])
            ).distinct()
            if c.broadcast_ref:
                ref_keys = F.broadcast(ref_keys)
            dangling = (
                df.select(*c.columns)
                .where(F.col(c.columns[0]).isNotNull())
                .join(ref_keys, on=list(c.columns), how="left_anti")
                .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
            )
            branches.append(
                dangling.select(
                    F.lit(c.name).alias("check"),
                    F.lit(c.target).alias("target"),
                    "violations",
                )
            )

    report = branches[0]
    for b in branches[1:]:
        report = report.unionByName(b)
    return report.withColumn("passed", F.col("violations") == 0)


def validate_stream(sdf: DataFrame, checks: list[Check]) -> DataFrame:
    """Constraint monitoring ON A STREAM: the same declarative checks
    evaluated continuously — each trigger updates the global violation
    counts over everything ingested so far (run the returned frame in
    complete output mode; the counters are classic streaming aggregation
    state, one row per partition partial-merged per micro-batch).

    Only row-level checks and ``min_rows`` are admissible: their
    violation counts are associative conditional sums, so arrival order
    and batch boundaries cannot change the result (the batch
    ``validate_table`` over the same prefix is an exact oracle at every
    trigger). ``unique`` / ``foreign_key`` are rejected — uniqueness
    over an unbounded stream needs per-key state that grows with the
    keyspace and is exactly what ``changelog_normalize`` + batch
    validation over the materialized image is for.
    """
    bad = [c.kind for c in checks if c.kind not in ("row", "min_rows")]
    if bad:
        raise ValueError(
            f"streaming validation supports row-level checks and min_rows "
            f"only (got {sorted(set(bad))}); materialize the stream and "
            "run validate_table for keyed checks"
        )
    row_checks = [c for c in checks if c.kind == "row"]
    vol_checks = [c for c in checks if c.kind == "min_rows"]
    return _fold_row_checks(sdf, row_checks, vol_checks).withColumn(
        "passed", F.col("violations") == 0
    )


def distribution_drift(
    old: DataFrame,
    new: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    n_buckets: int = 20,
) -> DataFrame:
    """Population-stability (PSI) drift report between two snapshots of
    a numeric column — the standard "did the data shift under me" gate
    a training pipeline runs before reusing yesterday's thresholds.
    Fixed-width buckets over [lo, hi) (outliers clamp into the edge
    buckets), add-1-smoothed shares (every bucket defined even when
    empty — the same Laplace discipline as ``importance_resample``), and
    each bucket's PSI contribution ``(p−q)·ln(p/q)`` quantized to an
    integer at 1e-9 so the report is bit-identical across engines.
    Total PSI = sum(psi_q)/1e9; the usual read: <0.1 stable, 0.1–0.25
    drifting, >0.25 shifted.

    Fixed edges, not quantiles, on purpose: quantile edges derived from
    one side make the comparison asymmetric and engine-dependent;
    fixed-width buckets keep both sides exact counts.

    Scale shape: one conditional-count aggregation per side keyed by
    bucket (map-side partials; n_buckets output rows), joined onto a
    ``range(n_buckets)`` spine, totals cross-joined as one broadcast
    row. Nothing is corpus-sized after the scans.
    """
    oc = bucket_counts(
        old, col, lo=lo, hi=hi, n_buckets=n_buckets, out="n_old"
    )
    nc = bucket_counts(
        new, col, lo=lo, hi=hi, n_buckets=n_buckets, out="n_new"
    )
    return psi_report(oc, nc, n_buckets=n_buckets)


def bucket_counts(
    df: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    n_buckets: int = 20,
    out: str = "n",
) -> DataFrame:
    """Fixed-width bucket counts of a numeric column over [lo, hi) —
    outliers clamp into the edge buckets, NULLs drop. Works on batch
    AND streaming frames (a streaming input yields a complete-mode
    global count aggregation — the live side of a drift monitor)."""
    width = (hi - lo) / n_buckets
    b = F.least(
        F.lit(n_buckets - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (F.col(col).cast("double") - F.lit(float(lo)))
                / F.lit(float(width))
            ).cast("int"),
        ),
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias(out))
    )


def psi_report(
    old_counts: DataFrame,
    new_counts: DataFrame,
    *,
    n_buckets: int = 20,
) -> DataFrame:
    """The PSI math over two pre-bucketed count frames
    (``(bucket, n_old)`` / ``(bucket, n_new)``) — split out of
    ``distribution_drift`` so a STREAMED side (complete-mode
    ``bucket_counts`` materialized per trigger) composes with a static
    reference. Everything here is parameter-sized: the spine is
    ``range(n_buckets)``, totals come from an unpartitioned window over
    the n_buckets-row frame (one lineage — a totals aggregate + cross
    join would recompute the upstream scans)."""
    from pyspark.sql import Window

    spark = old_counts.sparkSession
    spine = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    j = (
        spine.join(old_counts, on="bucket", how="left")
        .join(new_counts, on="bucket", how="left")
        .na.fill({"n_old": 0, "n_new": 0})
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    j = j.withColumn("__no", F.sum("n_old").over(w_all)).withColumn(
        "__nn", F.sum("n_new").over(w_all)
    )
    p = (F.col("n_old") + F.lit(1.0)) / (F.col("__no") + F.lit(float(n_buckets)))
    q = (F.col("n_new") + F.lit(1.0)) / (F.col("__nn") + F.lit(float(n_buckets)))
    return j.withColumn(
        "psi_q",
        F.floor((p - q) * F.log(p / q) * F.lit(1000000000.0)).cast("bigint"),
    ).select("bucket", "n_old", "n_new", "psi_q")


def expect_schema(df: DataFrame, expected_ddl: str) -> DataFrame:
    """Schema contract check — the handshake a pipeline runs before
    touching a new table drop: compare the frame's actual schema against
    a declared DDL string (``"a INT, b STRING"``) and report one row per
    column with status ``ok`` / ``type_mismatch`` / ``missing`` (declared
    but absent) / ``unexpected`` (present but undeclared). Column order
    is NOT part of the contract (names bind columns); types compare on
    Spark's canonical simpleString.

    Control-plane only — the report derives from schema metadata, no
    data is scanned; it composes with ``validate_table`` (schema gate
    first, then content checks).
    """
    from pyspark.sql.types import StructType

    spark = df.sparkSession
    expected = StructType.fromDDL(expected_ddl)
    want = {f.name: f.dataType.simpleString() for f in expected.fields}
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    rows = []
    for name, wtype in want.items():
        if name not in have:
            rows.append((name, wtype, None, "missing"))
        elif have[name] != wtype:
            rows.append((name, wtype, have[name], "type_mismatch"))
        else:
            rows.append((name, wtype, have[name], "ok"))
    for name, htype in have.items():
        if name not in want:
            rows.append((name, None, htype, "unexpected"))
    return spark.createDataFrame(
        rows,
        "column string, expected_type string, actual_type string, "
        "status string",
    )


def detect_metric_anomalies(
    metrics: DataFrame,
    *,
    metric_col: str = "metric",
    order_col: str,
    value_col: str = "value",
    window: int = 5,
    k2: int = 9,
    min_history: int = 3,
) -> DataFrame:
    """Anomaly detection over a metric history — the "metrics over
    time" half of the Deequ recipe: per metric series (ordered by
    ``order_col``), flag points that sit more than k standard deviations
    from the trailing-``window`` mean (``k2`` = k², default 9 ⇒ k=3).

    Exact cross-engine arithmetic, no stddev() call: with integer
    values, the trailing count/sum/sum-of-squares are exact, and
    |x − mean| > k·std is squared into

        (n·x − s1)² · (n−1)  >  k² · (n·s2 − s1²) · n

    — products of exact integers, bit-identical in any engine (evaluated
    in doubles: exact while magnitudes stay under 2⁵³, i.e. values to
    ~1e6 over windows of thousands; rescale larger metrics first). A
    flat history (variance 0) flags ANY deviation from the constant.
    Points with fewer than ``min_history`` predecessors are unscored
    (``is_anomaly`` NULL) — no baseline, no verdict.

    Scale shape: one shuffle keyed by the metric name, one sequential
    frame per series — history windows are parameter-sized.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(metric_col)
        .orderBy(order_col)
        .rowsBetween(-window, -1)
    )
    x = F.col(value_col).cast("double")
    n = F.count(x).over(w).cast("double")
    s1 = F.sum(x).over(w)
    s2 = F.sum(x * x).over(w)
    lhs = (
        (n * x - s1) * (n * x - s1) * (n - F.lit(1.0))
    )
    rhs = F.lit(float(k2)) * (n * s2 - s1 * s1) * n
    return metrics.select(
        metric_col,
        order_col,
        value_col,
        n.cast("bigint").alias("n_hist"),
        F.when(n >= min_history, lhs > rhs).alias("is_anomaly"),
    )


def k_anonymize(
    df: DataFrame,
    quasi_cols: list[str],
    *,
    k: int = 5,
    sum_cols: list[str] | None = None,
    suppressed: str = "*",
) -> DataFrame:
    """k-anonymity aggregation: publish per-group statistics only for
    quasi-identifier combinations shared by at least ``k`` rows; smaller
    groups are coalesced into ONE residual bucket whose quasi columns are
    the ``suppressed`` token. If even that residual covers fewer than
    ``k`` rows it is dropped entirely, so EVERY published row describes
    ≥ k individuals — the release-gating step privacy reviews require
    before row-count tables leave a training-data pipeline.

    Plan shape: one grouped aggregation over one scan (map-side partial
    combine), then ONE group-count-sized re-aggregation that keeps ≥k
    groups under their own keys and folds under-k groups into the
    suppressed bucket — counts and sums compose losslessly, which is
    why the measure vocabulary is count + sum. (A kept ∪ residual union
    of two filters of the first aggregate would plan that aggregate —
    and its full scan — twice: Catalyst treats union branches as
    independent subtrees, the same duplication retract_rows had.)

    Quasi columns are published as strings so the suppression token is
    representable regardless of their source type.
    """
    measures = sum_cols or []
    quasi = [F.col(c).cast("string").alias(c) for c in quasi_cols]
    g = df.select(*quasi, *measures).groupBy(*quasi_cols).agg(
        F.count("*").alias("n"),
        *[F.sum(c).alias(f"sum_{c}") for c in measures],
    )
    under_k = F.col("n") < k
    relabeled = g.select(
        *[
            F.when(under_k, F.lit(suppressed)).otherwise(F.col(c)).alias(c)
            for c in quasi_cols
        ],
        "n",
        *[F.col(f"sum_{c}") for c in measures],
    )
    return (
        relabeled.groupBy(*quasi_cols)
        .agg(
            F.sum("n").alias("n"),
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in measures],
        )
        .where(F.col("n") >= k)
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit — k-anonymity's companion check: a group can
    cover >= k rows yet still leak its members' sensitive attribute if
    they all SHARE one value. Reports, per quasi-identifier group, the
    row count, the number of distinct sensitive values, and whether the
    group meets distinct l-diversity. One grouped aggregation (the
    distinct count shuffles on (group, sensitive) then (group) — the
    standard two-level distinct-agg split, skew-safe)."""
    return df.groupBy(*[F.col(c).cast("string").alias(c) for c in quasi_cols]).agg(
        F.count("*").alias("n"),
        F.countDistinct(sensitive_col).alias("n_sensitive"),
    ).withColumn("diverse", F.col("n_sensitive") >= l)


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    *,
    epsilon: float = 1.0,
    seed: str = "42",
) -> DataFrame:
    """Laplace-noised group counts (ε-DP release MECHANISM with a
    deterministic test-mode noise source).

    Noise is Laplace(1/ε) via inverse-CDF over a uniform derived from
    md5(group || seed) — DETERMINISTIC by design so releases are
    reproducible and engine-checkable (the DuckDB oracle replays the
    exact noise). A production ε-DP deployment MUST swap the seeded
    uniform for a cryptographic RNG: with a public seed the noise is
    recomputable and the guarantee is void — this operator provides the
    mechanism/sensitivity plumbing (unit count sensitivity 1, noise
    scale 1/ε, post-processing-safe rounding), not the entropy. The
    same honest-stub contract as the multimodal decode path.
    """
    b = 1.0 / epsilon
    g = df.groupBy(*[F.col(c).cast("string").alias(c) for c in group_cols]).agg(
        F.count("*").alias("n")
    )
    # u ∈ (0,1): 24 hex-bit md5 bucket, +0.5 to dodge the endpoints
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(c) for c in group_cols], F.lit(seed)
                    )
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16 ** 6))
    centered = u - F.lit(0.5)
    noise = (
        -F.lit(b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return g.select(
        *group_cols,
        F.round(F.col("n") + noise, 4).alias("noisy_n"),
    )


def histogram_quantiles(
    df: DataFrame,
    col: str,
    quantiles: list[float],
    *,
    lo: float,
    hi: float,
    n_buckets: int = 256,
) -> DataFrame:
    """Mergeable histogram quantiles — the quantile member of the sketch
    suite (distinct: KMV, frequency: CMS/Space-Saving, membership:
    Bloom): one fixed-width bucket-count aggregation (mergeable by
    addition, streaming-safe), then each requested quantile resolves to
    the upper edge of the first bucket whose cumulative count reaches
    q·N — deterministic, so the estimate replays exactly in SQL, unlike
    an opaque approx_percentile blob. Error bound: one bucket width.

    Returns ``(q, est_value, bucket, cum_n, total_n)``; the
    cumulative window runs over n_buckets rows, parameter-sized.
    """
    from pyspark.sql import Window

    width = (hi - lo) / n_buckets
    counts = bucket_counts(df, col, lo=lo, hi=hi, n_buckets=n_buckets)
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        "bucket",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("n").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total_n"),
    )
    qdf = df.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .where(
            F.col("cum_n")
            >= F.col("q") * F.col("total_n")
        )
        .groupBy("q")
        .agg(
            F.min("bucket").alias("bucket"),
            F.max("total_n").alias("total_n"),
        )
        .join(cum.select("bucket", "cum_n"), on="bucket")
    )
    return hit.select(
        "q",
        (
            F.lit(float(lo))
            + (F.col("bucket") + 1) * F.lit(float(width))
        ).alias("est_value"),
        F.col("bucket").cast("int").alias("bucket"),
        F.col("cum_n").cast("bigint").alias("cum_n"),
        F.col("total_n").cast("bigint").alias("total_n"),
    )


def delete_sweep(
    df: DataFrame,
    requests: DataFrame,
    key_cols: list[str],
    *,
    broadcast_requests: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Right-to-be-forgotten sweep: purge every row matching a delete
    request and emit the audit trail — returns ``(purged, audit)``.

    ``purged`` is the corpus minus matching rows (one anti join;
    requests broadcast — deletion lists are tiny next to a corpus);
    ``audit`` has one row PER REQUEST with the number of rows it
    matched (left join + count, so unmatched requests audit as 0 —
    the compliance-relevant case: a request that silently matches
    nothing needs review, not silence).

    Composes with the changelog layer: feed ``audit`` keys as '-D'
    __op rows to propagate the deletion through downstream
    materializations (scd2_history closes version intervals; the
    upsert sinks MERGE the tombstones).
    """
    req = requests.select(*key_cols).distinct()
    reqb = F.broadcast(req) if broadcast_requests else req
    purged = df.join(reqb, on=key_cols, how="left_anti")
    audit = (
        req.join(
            df.select(*key_cols).withColumn("__hit", F.lit(1)),
            on=key_cols,
            how="left",
        )
        .groupBy(*key_cols)
        .agg(
            F.coalesce(F.sum("__hit"), F.lit(0))
            .cast("bigint")
            .alias("rows_deleted")
        )
        .withColumn("matched", F.col("rows_deleted") > 0)
    )
    return purged, audit


def migrate_to_contract(
    df: DataFrame,
    target_ddl: str,
    *,
    defaults: dict | None = None,
    strict_casts: bool = True,
) -> DataFrame:
    """Reshape a frame to a declared contract (``"a INT, b STRING"``):
    columns reorder by contract order, undeclared columns drop, missing
    columns materialize from ``defaults`` (NULL otherwise), and
    type-mismatched columns cast — ``try_cast`` under ``strict_casts``
    =False (uncastable values become NULL instead of failing the job),
    plain ``cast`` otherwise (fail fast, the schema-gate default).

    The write-side companion of ``expect_schema``: the read gate
    REPORTS drift, this applies the declared shape so a conforming
    frame reaches the sink. Expression-only — one projection, no
    shuffle, no data scan beyond the projected columns.
    """
    from pyspark.sql.types import StructType

    target = StructType.fromDDL(target_ddl)
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    defaults = defaults or {}
    cols = []
    for f in target.fields:
        want = f.dataType.simpleString()
        if f.name not in have:
            cols.append(
                F.lit(defaults.get(f.name)).cast(f.dataType).alias(f.name)
            )
        elif have[f.name] != want:
            src = F.col(f.name)
            casted = (
                src.cast(f.dataType)
                if strict_casts
                else F.expr(
                    f"try_cast(`{f.name}` AS {f.dataType.simpleString()})"
                )
            )
            cols.append(casted.alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)
