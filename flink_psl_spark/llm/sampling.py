"""Dataset sampling & mixing for training-data curation (beyond-reference,
SURVEY §7 M5 family).

All sampling here is DETERMINISTIC (hash-threshold, not rand()): re-running
the pipeline — or retrying a failed task — selects the same rows, which is
what makes sampled training mixes reproducible at 100 TB. Each helper is a
single narrow transformation (a filter on a hash) — no shuffle, no driver
involvement, fully pushdown-friendly.

The bucket hash is MD5-derived (first 6 hex digits of
``md5(concat_ws('|', keys..., seed))``) rather than xxhash64: md5 is
available in every engine, so the *exact row selection* reproduces in
DuckDB/Trino/Snowflake — auditable sampled corpora, not just stable ones.
md5 on a short key string costs nanoseconds per row; selection stays a
narrow pushdown-friendly filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_BUCKETS = 16**6  # bucket = first 6 hex digits of md5 → [0, 16^6)


def _bucket(cols: list[str], seed: int) -> Column:
    """Uniform bucket in [0, 16^6): parse the first 6 hex chars of
    md5('key1|key2|...|seed'). Cross-engine SQL equivalent (DuckDB):
    ``CAST('0x' || SUBSTR(MD5(CONCAT_WS('|', keys..., 'seed')), 1, 6) AS BIGINT)``.
    """
    s = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in cols], F.lit(str(seed))
    )
    return F.conv(F.substring(F.md5(s), 1, 6), 16, 10).cast("bigint")


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    *,
    key_cols: list[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by hash threshold.

    ``key_cols`` defaults to all columns; passing a stable id column makes
    the sample invariant to column additions.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    keys = key_cols or list(df.columns)
    return df.where(_bucket(keys, seed) < int(fraction * _HASH_BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    *,
    key_cols: list[str] | None = None,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (≈ df.sampleBy, but reproducible
    under retries): e.g. ``{"en": 1.0, "fr": 0.5}`` keeps all English docs
    and half the French ones."""
    keys = key_cols or [c for c in df.columns if c != strata_col]
    frac = F.lit(default_fraction)
    for value, f in fractions.items():
        frac = F.when(F.col(strata_col) == value, F.lit(float(f))).otherwise(frac)
    return df.where(_bucket(keys, seed) < (frac * _HASH_BUCKETS).cast("long"))


def mix_datasets(
    parts: list[tuple[DataFrame, float]],
    *,
    key_cols: list[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Weighted training mix: downsample each source to its weight and
    union, tagging provenance in ``__mix_source``.

    Weights are per-source keep-fractions (1.0 = take everything), the
    standard way corpus mixes are specified; relative proportions then
    follow from the sources' sizes.
    """
    out = None
    for i, (df, w) in enumerate(parts):
        sampled = deterministic_sample(
            df, w, key_cols=key_cols, seed=seed + i
        ).withColumn("__mix_source", F.lit(i))
        out = sampled if out is None else out.unionByName(sampled)
    return out
