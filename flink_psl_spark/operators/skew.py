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
