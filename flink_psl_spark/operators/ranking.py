"""Top-N and deduplication (reference §2.6).

- ``top_n``       — reference StreamExecRank.java:83 / BatchExecRank.java:46:
  the ROW_NUMBER() <= k pattern as a first-class operator.
- ``deduplicate`` — reference StreamExecDeduplicate.java:85 (the
  ROW_NUMBER() = 1 keep-first/keep-last pattern over a key).

Scale notes
-----------
Both compile to a single hash shuffle on the partition key + per-partition
sort — Catalyst rewrites rank-then-filter into WindowGroupLimit
(InferWindowGroupLimit), which pushes the limit into the sort so only k rows
per key survive the exchange. Skewed keys are handled by AQE; for a known
hot key, pre-aggregate with a salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_RANK_FNS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
}


def top_n(
    df: DataFrame,
    partition_by: str | list[str],
    order_by: list[Column | str],
    n: int,
    *,
    rank_fn: str = "row_number",
    rank_col: str | None = "rn",
) -> DataFrame:
    """Keep the top ``n`` rows per key, ordered by ``order_by``.

    ``order_by`` entries may be Columns (e.g. ``F.col("v").desc()``) or
    column-name strings (ascending). Pass a tie-breaking column for
    deterministic results — same requirement as the reference's
    RankProcessStrategy.
    """
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    fn = _RANK_FNS[rank_fn]
    out = df.withColumn("__rn", fn().over(w)).where(F.col("__rn") <= n)
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def deduplicate(
    df: DataFrame,
    keys: str | list[str],
    order_by: str | list[str],
    *,
    keep: str = "first",
) -> DataFrame:
    """Keep exactly one row per key: the first (or last) in ``order_by`` order.

    ``keep='first'`` ≈ reference keep-first dedup (RowTimeDeduplicateFunction
    with keepLastRow=false); ``keep='last'`` flips the order (keepLastRow=true).
    ``order_by`` takes column names (ascending event order); include a unique
    tie-breaker for determinism.
    """
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be first|last, got {keep}")
    names = [order_by] if isinstance(order_by, str) else list(order_by)
    order_cols = [
        F.col(c).asc() if keep == "first" else F.col(c).desc() for c in names
    ]
    return top_n(df, keys, order_cols, 1, rank_col=None)
