"""Skew-handling utilities (SURVEY §4.1 'Skewed distinct-agg split' /
SplitAggregateRule; the manual salting strategy for hot keys).

AQE's skew-join splitting handles joins automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in our session factory); hot
GROUP BY keys are the remaining manual case. ``salted_agg`` implements the
reference's partial/final split (SplitAggregateRule.scala,
table.optimizer.distinct-agg.split.enabled) as a library transform:

    stage 1:  group by (key, salt)  — spreads a hot key over N reducers,
              map-side partial agg still applies
    stage 2:  group by key          — merges the N partials

Supported aggregates are the algebraic ones (sum/count/min/max/avg —
avg decomposed as sum+count) plus count_distinct (exact, via two-level
distinct: stage 1 dedups (key, salt, value), stage 2 counts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partials
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: str | list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output column → (fn, input column) with fn in
    sum/count/min/max/avg/count_distinct.

    The salt is derived from stable per-row content (``rand()`` would break
    retry idempotence): a hash of all columns mod ``salt_buckets``.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    salt = (F.abs(F.hash(*[F.col(c) for c in df.columns])) % salt_buckets).alias(
        "__salt"
    )
    salted = df.select("*", salt)

    partials: list[Column] = []
    finals: list[Column] = []
    distinct_cols: list[tuple[str, str]] = []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            partials += [
                F.sum(col).alias(f"__s_{out}"),
                F.count(col).alias(f"__c_{out}"),
            ]
            finals.append(
                (F.sum(f"__s_{out}") / F.sum(f"__c_{out}")).alias(out)
            )
        elif fn == "count_distinct":
            distinct_cols.append((out, col))
        elif fn in _MERGE:
            agg_fn = F.count if fn == "count" else _MERGE[fn]
            partials.append(agg_fn(col).alias(f"__p_{out}"))
            finals.append(_MERGE[fn](f"__p_{out}").alias(out))
        else:
            raise ValueError(f"unsupported salted agg fn {fn!r}")

    out_df = None
    if partials:
        stage1 = salted.groupBy(*key_list, "__salt").agg(*partials)
        out_df = stage1.groupBy(*key_list).agg(*finals)
    for out, col in distinct_cols:
        # two-level exact distinct: dedup on (key, salt-by-value, value)
        # then count per key — the hot key's distinct set is built across
        # salt_buckets reducers instead of one
        lvl1 = (
            df.select(*key_list, F.col(col).alias("__v"))
            .withColumn("__vsalt", F.abs(F.hash("__v")) % salt_buckets)
            .groupBy(*key_list, "__vsalt")
            .agg(F.collect_set("__v").alias("__vs"))
        )
        cnt = lvl1.groupBy(*key_list).agg(
            F.sum(F.size("__vs")).alias(out)
        )
        out_df = cnt if out_df is None else out_df.join(cnt, key_list)
    return out_df


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    n_salts: int = 16,
    hot_keys: DataFrame | None = None,
    salt_source: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join by selective key salting — the manual fix for
    hot join keys where AQE's runtime skew split can't apply (stream-
    static joins, or when one key dwarfs even a split partition).

    Mechanics: rows of ``big`` whose key is hot get a deterministic salt
    in [0, n_salts) (xxhash64 of ``salt_source``, default the key's row
    content via all columns — any high-cardinality column works); cold
    rows keep salt 0. ``small`` replicates ONLY its hot-key rows
    n_salts× (cold rows once), and the join keys on (key, salt) — the
    hot key's probe rows spread over n_salts reducers instead of one.

    ``hot_keys``: one-column DataFrame of hot key values — pair with
    :func:`flink_psl_spark.llm.text.heavy_keys`, which finds them
    without a full-cardinality key exchange. None ⇒ salt every key
    (uniform n_salts× replication of ``small``).

    Supports how='inner'/'left'. Result equals ``big.join(small, on,
    how)`` exactly (salting is a pure partitioning rewrite).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    src = (
        F.col(salt_source)
        if isinstance(salt_source, str)
        else salt_source
        if salt_source is not None
        else F.struct(*[F.col(c) for c in big.columns])
    )
    # coalesce: a NULL salt_source must still join (salt 0), not drop rows
    salt_expr = F.coalesce(
        F.pmod(F.xxhash64(src), F.lit(n_salts)).cast("int"), F.lit(0)
    )
    salts = F.sequence(F.lit(0), F.lit(n_salts - 1))

    if hot_keys is None:
        b = big.withColumn("__salt", salt_expr)
        s = small.withColumn("__salt", F.explode(salts))
    else:
        hot = F.broadcast(
            hot_keys.toDF(on).select(on).distinct().withColumn(
                "__hot", F.lit(True)
            )
        )
        b = (
            big.join(hot, on, "left")
            .withColumn(
                "__salt",
                F.when(F.col("__hot"), salt_expr).otherwise(F.lit(0)),
            )
            .drop("__hot")
        )
        s = (
            small.join(hot, on, "left")
            .withColumn(
                "__salt",
                F.explode(
                    F.when(F.col("__hot"), salts).otherwise(F.array(F.lit(0)))
                ),
            )
            .drop("__hot")
        )
    return b.join(s, [on, "__salt"], how).drop("__salt")


def cms_join_size(
    left,
    right,
    key_col: str,
    *,
    eps: float = 0.001,
    confidence: float = 0.99,
) -> int:
    """Estimate an inner equi-join's output cardinality WITHOUT running
    the join — the shuffle-planning advisor for 100 TB joins (is this
    join explosion-safe? does it need salting first?): the classic
    count-min inner-product estimate (Cormode & Muthukrishnan 2005,
    §4.2). Both sides build row-aligned CMS tables (one scan each,
    sketch-bounded exchange); the estimate is

        min over rows i of  dot(table_left[i], table_right[i])

    — an OVERESTIMATE always (one-sided, like every CMS bound), within
    eps · |left| · |right| of the true size with probability
    ``confidence``. Driver cost is two parameter-sized tables.
    """
    import numpy as np

    from flink_psl_spark.llm.text import cms_table

    items_l = left.select(F.col(key_col).cast("string").alias(key_col))
    items_r = right.select(F.col(key_col).cast("string").alias(key_col))
    tl = cms_table(items_l, key_col, eps=eps, confidence=confidence)
    tr = cms_table(items_r, key_col, eps=eps, confidence=confidence)
    return int(min(np.dot(tl[i], tr[i]) for i in range(tl.shape[0])))
