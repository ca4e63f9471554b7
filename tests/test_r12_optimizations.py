"""Focused contracts for the r12 optimization flags.

Two operators gained opt-in fast paths this round; these tests pin that
(a) the fast path returns the SAME rows as the default on inputs that
qualify for it, and (b) the default path's protective semantics are
unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_changelog_normalize_wellformed_identity(spark):
    """wellformed=True must equal the default on a changelog whose every
    op is I/U/D (the CDC-roundtrip invariant that justifies skipping the
    quarantine filter)."""
    from flink_psl_spark.operators.changelog import changelog_normalize

    rows = [
        (1, 1, "I", 10.0),
        (1, 2, "U", 11.0),
        (2, 1, "I", 20.0),
        (2, 2, "D", 0.0),
        (3, 1, "U", 30.0),
    ]
    df = spark.createDataFrame(
        rows, "k bigint, v bigint, __op string, x double"
    )
    base = sorted(
        map(tuple, changelog_normalize(df, "k", ["v"]).collect())
    )
    fast = sorted(
        map(
            tuple,
            changelog_normalize(df, "k", ["v"], wellformed=True).collect(),
        )
    )
    assert fast == base
    # key 2's newest op is D -> dropped; key 1 keeps v=2
    assert [r[0] for r in fast] == [1, 3]


def test_changelog_normalize_default_still_quarantines(spark):
    """The DEFAULT path must keep dropping -U and NULL-op rows BEFORE
    ranking (an unknown-op row must not shadow a real newest row)."""
    from flink_psl_spark.operators.changelog import changelog_normalize

    rows = [
        (1, 1, "I", 10.0),
        (1, 2, "-U", 99.0),   # retract record: newest by version but -U
        (2, 1, "I", 20.0),
        (2, 2, None, 99.0),   # unparseable op: quarantined
    ]
    df = spark.createDataFrame(
        rows, "k bigint, v bigint, __op string, x double"
    )
    out = {
        r["k"]: (r["v"], r["x"])
        for r in changelog_normalize(df, "k", ["v"]).collect()
    }
    # both keys resolve to their newest WELL-FORMED record
    assert out == {1: (1, 10.0), 2: (1, 20.0)}


def test_run_to_memory_table_nodata_skip_same_rows_and_conf_restored(
    spark, tmp_path
):
    """final_nodata_batch=False must (a) produce the same rows as the
    default for an eagerly-emitting program and (b) restore the session
    conf afterwards."""
    from flink_psl_spark.streaming import run_to_memory_table

    src = tmp_path / "src"
    spark.range(20).select(
        F.col("id"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
    ).write.parquet(str(src))

    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    before = spark.conf.get(key, None)

    def replay(skip: bool):
        stream = (
            spark.readStream.schema("id bigint, ts timestamp")
            .parquet(str(src))
            .withWatermark("ts", "1 second")
        )
        return sorted(
            r["id"]
            for r in run_to_memory_table(
                stream.select("id", "ts"),
                output_mode="append",
                final_nodata_batch=not skip,
            ).collect()
        )

    assert replay(skip=True) == replay(skip=False) == list(range(20))
    after = spark.conf.get(key, None)
    assert after == before, "pinned conf leaked out of the replay"
