"""Side outputs + async lookup (SURVEY §2.2 'side outputs', §2.9 'Async I/O').

- ``side_outputs``: the reference's OutputTag split-stream
  (flink-streaming-java/.../SideOutputDataStream.java; ProcessFunction
  Context.output). Spark has no multi-output operator; the equivalent is N
  filters over one cached pass — Catalyst reuses the scan, and
  ``write_side_outputs`` performs the one-pass multi-write inside
  ``foreachBatch`` (each batch cached once, written N times).
- ``async_lookup``: AsyncDataStream.orderedWait (AsyncDataStream.java:165)
  — per-record async calls into an external service with bounded
  concurrency. Spark shape: ``mapInPandas`` with a thread pool per Arrow
  batch — I/O overlaps within the batch, results stay in input order
  (ordered-wait semantics), and concurrency is bounded per task so
  executor memory stays flat.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from concurrent.futures import ThreadPoolExecutor

import pandas as pd

from pyspark.sql import Column, DataFrame


def side_outputs(
    df: DataFrame, tags: dict[str, Column], *, rest_tag: str | None = None
) -> dict[str, DataFrame]:
    """Split one DataFrame into tagged outputs (≈ OutputTag side outputs).

    ``tags`` maps name → boolean Column; ``rest_tag`` (optional) collects
    rows matching none of the tags. Filters may overlap (a row can go to
    several outputs) — same as the reference, where an element can be
    emitted to any number of side outputs.
    """
    out = {name: df.where(cond) for name, cond in tags.items()}
    if rest_tag is not None:
        none_match = None
        for cond in tags.values():
            none_match = ~cond if none_match is None else none_match & ~cond
        out[rest_tag] = df.where(none_match)
    return out


def write_side_outputs(
    stream_df: DataFrame,
    tags: dict[str, Column],
    writer: Callable[[str, DataFrame, int], None],
    *,
    checkpoint: str,
    rest_tag: str | None = None,
):
    """Streaming multi-write: one pass, N sinks, via foreachBatch.

    ``writer(tag, batch_df, batch_id)`` performs the per-sink write. The
    batch is persisted once so the source is read once per trigger
    regardless of the number of outputs.
    """

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            for tag, part in side_outputs(batch, tags, rest_tag=rest_tag).items():
                writer(tag, part, batch_id)
        finally:
            batch.unpersist()

    return (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def async_lookup(
    df: DataFrame,
    fn: Callable[[dict], dict],
    out_schema: str,
    *,
    key_cols: list[str] | None = None,
    max_concurrency: int = 16,
    submit_chunk: int = 128,
) -> DataFrame:
    """Ordered async enrichment: call ``fn(row_dict) -> dict`` for every row
    with up to ``max_concurrency`` in-flight calls per task; append the
    returned fields. Result order matches input order within each partition
    (AsyncDataStream.orderedWait semantics).

    ``out_schema`` is the FULL output schema DDL (input cols + appended).
    ``fn`` runs in worker threads — it must be thread-safe and is expected
    to be I/O-bound (an RPC/HTTP call); CPU-bound work belongs in a plain
    pandas UDF instead.

    ``submit_chunk`` batches pool submissions: one thread-pool task per
    ``submit_chunk`` rows instead of per row (ordering, per-row ``fn``
    calls and the ``max_concurrency`` thread bound are unchanged). A/B at
    10k rows: per-row submission 214 ms vs 21 ms at 128 — per-row futures
    were ~90% of the stage on cheap lookups. Chunks only coarsen how work
    is handed to threads; with rows ≫ max_concurrency × chunk the I/O
    overlap is the same.

    Partitioning is the CALLER's: this operator preserves the input's
    partition layout (per-partition order is part of its contract), so
    an under-parallel scan serializes every lookup on one core — fan the
    input out first (``parallelism.ensure_parallelism``) when its
    partition order carries no meaning.
    """
    key_cols = key_cols or list(df.columns)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            for pdf in batches:
                reqs = pdf[key_cols].to_dict("records")
                # keep every thread busy even on small batches
                c = max(
                    1,
                    min(
                        submit_chunk,
                        -(-len(reqs) // max_concurrency),  # ceil div
                    ),
                )
                chunks = [reqs[i : i + c] for i in range(0, len(reqs), c)]
                results: list[dict] = []
                for part in pool.map(
                    lambda ch: [fn(r) for r in ch], chunks
                ):
                    results.extend(part)
                extra = pd.DataFrame(results, index=pdf.index)
                yield pd.concat([pdf, extra], axis=1)

    return df.mapInPandas(run, out_schema)


def async_lookup_with_retry(
    df: DataFrame,
    fn: Callable[[dict], dict],
    out_schema: str,
    *,
    key_cols: list[str] | None = None,
    max_concurrency: int = 16,
    max_retries: int = 3,
    backoff_s: float = 0.05,
) -> DataFrame:
    """``async_lookup`` with bounded exponential-backoff retries per element
    (reference: AsyncDataStream.orderedWaitWithRetry + the fixed-delay /
    exponential-backoff AsyncRetryStrategies). The last failure re-raises —
    matching the reference's exhausted-retry semantics (task failure, not
    silent nulls)."""
    import time as _time

    def wrapped(req: dict) -> dict:
        for attempt in range(max_retries + 1):
            try:
                return fn(req)
            except Exception:
                if attempt == max_retries:
                    raise
                _time.sleep(backoff_s * (2**attempt))
        raise AssertionError("unreachable")

    return async_lookup(
        df, wrapped, out_schema,
        key_cols=key_cols, max_concurrency=max_concurrency,
    )


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact_distinct: bool = False,
) -> DataFrame:
    """Column profile report — the data-quality pass a pipeline runs
    before training on a new table: per column (rows, nulls, distincts,
    min, max) in ONE corpus scan.

    With the default ``exact_distinct=False``, distincts use HLL
    (approx_count_distinct): every statistic partial-aggregates
    map-side, the exchange is one sketch row per partition, and the scan
    dominates at 100 TB. ``exact_distinct=True`` swaps in exact
    count_distinct — Catalyst's multi-distinct planning then Expands the
    input (the exchange carries ~rows × profiled-columns rows), which is
    the right trade only when exact cardinalities matter and the table
    is modest. min/max render as canonical strings so the long-format
    report schema is column-type-independent.
    """
    from pyspark.sql import functions as F

    nd = F.count_distinct if exact_distinct else F.approx_count_distinct
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.count(c).alias(f"__nn_{c}"),
            nd(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__n_{c}").alias("n_rows"),
                        (F.col(f"__n_{c}") - F.col(f"__nn_{c}")).alias(
                            "n_null"
                        ),
                        F.col(f"__nd_{c}").alias("n_distinct"),
                        F.col(f"__mn_{c}").alias("min_value"),
                        F.col(f"__mx_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")


def profile_topk(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    k: int = 5,
) -> DataFrame:
    """Most-frequent values per column — the companion report to
    ``profile_table``: for each profiled column the top-``k`` values
    with counts (category skew, default-value pollution, and
    enum-drift jump straight out of this view).

    Single-scan shape: every column's values stack into (column, value)
    pairs via one row-local explode (values render as canonical strings
    so the long report is type-independent; NULLs are counted as a
    value — their share is data-quality signal), then ONE aggregation
    keyed by (column, value) and a rank-then-filter that compiles to
    WindowGroupLimit — only k rows per column survive the exchange.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cols = columns or df.columns
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.*")
    counts = stacked.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("column").orderBy(F.desc("n"), F.asc_nulls_first("value"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("column", "value", "n", F.col("rank").cast("int").alias("rank"))
    )


def dataset_fingerprint(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Order-independent content fingerprint of a table — the
    reproducibility primitive a pipeline stamps next to every artifact:
    re-running a deterministic job must reproduce the fingerprint
    bit-for-bit, on any engine, under any partitioning or row order.

    Construction: per row, md5 over the '|'-joined canonical string
    rendering (NULLs get an explicit sentinel so ``(NULL,'a')`` and
    ``('a',NULL)`` differ); the first 15 hex digits (60 bits) parse to
    an integer, and the fingerprint is the SUM of row hashes modulo a
    63-bit prime — commutative, so row order and partial-aggregation
    order cannot matter, and exact (the sum accumulates in
    DECIMAL(38,0): 60-bit terms stay exact past 10^18 rows).

    One scan, map-side partials, a one-row result
    ``(n_rows, fingerprint)``.
    """
    from pyspark.sql import functions as F

    cols = columns or df.columns
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("␀")) for c in cols
    ]
    rh = F.conv(F.substring(F.md5(F.concat_ws("|", *parts)), 1, 15), 16, 10)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum(rh.cast("decimal(38,0)"))
            % F.lit(9223372036854775783).cast("decimal(38,0)")
        )
        .cast("bigint")
        .alias("fingerprint"),
    )


def incremental_refresh(
    old_agg: DataFrame,
    updated_base: DataFrame,
    changed_keys: DataFrame,
    partition_cols: list[str],
    agg_fn: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: refresh ONLY the
    partitions a changelog touched instead of recomputing the world —
    the batch counterpart of the reference's incremental view
    maintenance (changelog-driven aggregate state updates), and the
    pattern every 100 TB nightly pipeline uses for backfills.

    ``old_agg`` is the previously materialized ``agg_fn`` output (one
    row per ``partition_cols`` group), ``updated_base`` the post-change
    base table, ``changed_keys`` the DISTINCT partition keys the
    changelog touched (derive it from the changelog's before AND after
    images — a row moving between partitions dirties both). The result
    is exactly ``agg_fn(updated_base)``:

    - clean partitions: their ``old_agg`` rows pass through via one
      broadcast ANTI join against the (changelog-bounded, tiny) dirty
      key set — the aggregate is NOT recomputed, no base-table scan
      feeds them;
    - dirty partitions: recomputed by ``agg_fn`` over ONLY the matching
      base rows (broadcast SEMI join pushes the key filter to the scan).

    Cost: one base scan filtered to dirty partitions + one pass over the
    (already aggregate-sized) old result, vs a full recompute's complete
    scan — the win is the dirty fraction, typically 1/300th of the
    partitions on a daily-partitioned table.
    """
    from pyspark.sql import functions as F

    dirty = changed_keys.select(*partition_cols).distinct()
    untouched = old_agg.join(
        F.broadcast(dirty), on=partition_cols, how="left_anti"
    )
    recomputed = agg_fn(
        updated_base.join(F.broadcast(dirty), on=partition_cols, how="left_semi")
    )
    return untouched.unionByName(recomputed)


def incremental_join_refresh(
    old_result: DataFrame,
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: list[str],
    *,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Incremental maintenance of a materialized INNER JOIN under
    append-only deltas — the join-side counterpart of
    ``incremental_refresh``. Algebra:

        (A ∪ dA) ⋈ (B ∪ dB)
          = A⋈B  ∪  dA⋈(B ∪ dB)  ∪  A⋈dB

    The three terms are disjoint by construction (each pairs a distinct
    old/delta provenance), so the refreshed view is exactly the full
    recompute — but ``old_result`` passes through WITHOUT being
    re-joined, and every new join is delta-driven: with
    ``broadcast_deltas`` the appended rows ship to the executors and the
    big stored sides stream past them, no re-shuffle of A⋈B. On a daily
    100 TB pipeline the cost is proportional to the day's arrivals, not
    the corpus.

    Updates/deletes need retraction semantics — that changelog-driven
    form is the streaming join (streaming/core.py) fed by the CDC
    decoders; this operator is the batch append-only fast path.
    """
    from pyspark.sql import functions as F

    da = F.broadcast(delta_a) if broadcast_deltas else delta_a
    db = F.broadcast(delta_b) if broadcast_deltas else delta_b
    b_new = b_old.unionByName(delta_b)
    fresh = da.join(b_new, on=on, how="inner").unionByName(
        a_old.join(db, on=on, how="inner")
    )
    return old_result.unionByName(fresh)
