"""Streaming CEP tests: watermark-finalized emission, cross-batch buffering,
exactly-once match output, agreement with batch match_recognize."""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest
from pyspark.sql import functions as F

from flink_psl_spark.cep import Measure, Step

TS = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731

SCHEMA = "u string, eid long, et string, ts timestamp"


def _pattern():
    return [
        Step.one_or_more("A", "et = 'c'"),
        Step.once("B", "et = 'p'"),
    ]


def _measures():
    return [
        Measure("n_c", "A", "count"),
        Measure("first_c", "A", "first", "eid"),
        Measure("p_id", "B", "first", "eid"),
    ]


def _run(spark, files: list[list[tuple]], delay="5 minutes", horizon_ms=None):
    from flink_psl_spark.streaming import run_to_memory_table
    from flink_psl_spark.streaming.cep_stream import streaming_match_recognize

    d = tempfile.mkdtemp(prefix="fps_scep_")
    for rows in files:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(f"{d}/src")
    st = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/src")
    )
    out = streaming_match_recognize(
        st, "u", "ts", _pattern(), _measures(),
        delay=delay, horizon_ms=horizon_ms, tiebreak_col="eid",
    )
    return run_to_memory_table(out, output_mode="append")


def test_streaming_cep_basic(spark):
    """ccp + later watermark-advancing rows → exactly one match emitted."""
    mem = _run(
        spark,
        [
            [("k", 1, "c", TS(0)), ("k", 2, "c", TS(1)), ("k", 3, "p", TS(2))],
            # second batch advances the watermark past TS(2) + delay
            [("k", 9, "x", TS(30))],
        ],
    )
    got = [(r["n_c"], r["first_c"], r["p_id"]) for r in mem.collect()]
    assert got == [(2, 1, 3)]


def test_streaming_cep_match_spans_batches(spark):
    """clicks in batch 1, purchase in batch 2 → buffered state completes the
    match across the batch boundary."""
    mem = _run(
        spark,
        [
            [("k", 1, "c", TS(0)), ("k", 2, "c", TS(1))],
            [("k", 3, "p", TS(2))],
            [("k", 9, "x", TS(30))],
        ],
    )
    got = [(r["n_c"], r["first_c"], r["p_id"]) for r in mem.collect()]
    assert got == [(2, 1, 3)]


def test_streaming_cep_no_premature_emission(spark):
    """without watermark advance past the match, nothing is emitted —
    matches finalize only when no earlier row can still arrive."""
    mem = _run(
        spark,
        [[("k", 1, "c", TS(0)), ("k", 2, "p", TS(1))]],
    )
    assert mem.count() == 0


def test_streaming_cep_late_row_lands_inside(spark):
    """a late-but-within-watermark click arriving in batch 2 lands BETWEEN
    buffered rows and changes the match — buffering by event time, not
    arrival order."""
    mem = _run(
        spark,
        [
            [("k", 1, "c", TS(0)), ("k", 3, "p", TS(4))],
            [("k", 2, "c", TS(2))],  # late arrival, ts between the two
            [("k", 9, "x", TS(30))],
        ],
    )
    got = [(r["n_c"], r["first_c"], r["p_id"]) for r in mem.collect()]
    assert got == [(2, 1, 3)]


def test_streaming_cep_matches_batch_on_fixture(spark, sf_dir, t):
    """Full-fixture agreement: streaming CEP (with a final watermark-advancing
    sentinel) equals batch match_recognize on the same prefix."""
    from flink_psl_spark.cep import match_recognize
    from flink_psl_spark.streaming import run_to_memory_table
    from flink_psl_spark.streaming.cep_stream import streaming_match_recognize

    d = tempfile.mkdtemp(prefix="fps_scep_fx_")
    ev = t["events"].select(
        F.col("user_id").cast("string").alias("u"),
        F.col("event_id").alias("eid"),
        F.when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .otherwise("x")
        .alias("et"),
        "ts",
    )
    ev.coalesce(1).write.parquet(f"{d}/src")
    far = ev.select(F.max("ts")).first()[0] + dt.timedelta(days=30)
    spark.createDataFrame([("zz", 0, "x", far)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(f"{d}/src")

    st = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/src")
    )
    out = streaming_match_recognize(
        st, "u", "ts", _pattern(), _measures(), delay="5 minutes",
        tiebreak_col="eid",
    )
    mem = run_to_memory_table(out, output_mode="append")
    got = sorted(
        (r["u"], r["n_c"], r["first_c"], r["p_id"]) for r in mem.collect()
    )

    batch = match_recognize(
        ev, "u", ["ts", "eid"], _pattern(), _measures()
    )
    want = sorted(
        (r["u"], r["n_c"], r["first_c"], r["p_id"]) for r in batch.collect()
    )
    assert got == want


def test_streaming_rejects_terminal_not_followed_by(spark, t):
    """Unbounded-future negation can't finalize on a stream prefix — the
    reference imposes the same 'notFollowedBy cannot be last without
    within' restriction."""
    import pytest as _pytest

    from flink_psl_spark.streaming.cep_stream import streaming_match_recognize

    with _pytest.raises(ValueError, match="not_followed_by"):
        streaming_match_recognize(
            t["events"],
            "user_id",
            "ts",
            [
                Step.once("c", "event_type = 'click'"),
                Step.not_followed_by("np", "event_type = 'purchase'"),
            ],
            [Measure("n", "c", "count")],
        )


def _run_pattern(spark, files, pattern, measures, delay="5 minutes", **kw):
    from flink_psl_spark.streaming import run_to_memory_table
    from flink_psl_spark.streaming.cep_stream import streaming_match_recognize

    d = tempfile.mkdtemp(prefix="fps_scep_nn_")
    for rows in files:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(f"{d}/src")
    st = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/src")
    )
    out = streaming_match_recognize(
        st, "u", "ts", pattern, measures, delay=delay, tiebreak_col="eid", **kw
    )
    return run_to_memory_table(out, output_mode="append")


def test_streaming_terminal_not_next_defers_at_prefix_boundary(spark):
    """A terminal notNext asserting at the end of the finalized prefix is
    unconfirmed — a future row can still land there. Emission must wait for
    the next finalized row; when that row satisfies the negated predicate,
    the match (which a vacuous boundary pass would have emitted) is
    correctly rejected, matching the batch NFA."""
    pattern = [
        Step.once("a", "et = 'a'"),
        Step.not_next("nb", "et = 'b'"),
    ]
    measures = [Measure("aid", "a", "first", "eid")]
    mem = _run_pattern(
        spark,
        [
            [("k", 1, "a", TS(0))],
            # advances the watermark past a@0 while b@6 hasn't arrived:
            # the finalized prefix ends at the 'a' and the old vacuous
            # check would emit here
            [("k", 8, "x", TS(10))],
            # the row right after 'a' turns out to satisfy the negation
            [("k", 2, "b", TS(6))],
            [("k", 9, "x", TS(30))],
        ],
        pattern,
        measures,
    )
    assert mem.count() == 0


def test_streaming_terminal_not_next_resolves_when_confirmed(spark):
    """Same boundary deferral, but the next finalized row does NOT satisfy
    the negated predicate — the deferred match emits exactly once."""
    pattern = [
        Step.once("a", "et = 'a'"),
        Step.not_next("nb", "et = 'b'"),
    ]
    measures = [Measure("aid", "a", "first", "eid")]
    mem = _run_pattern(
        spark,
        [
            [("k", 1, "a", TS(0))],
            [("k", 8, "x", TS(10))],
            [("k", 2, "x", TS(6))],
            [("k", 9, "x", TS(30))],
        ],
        pattern,
        measures,
    )
    got = [r["aid"] for r in mem.collect()]
    assert got == [1]


def test_streaming_group_pattern_matches_batch(spark):
    """Group patterns run unchanged on the streaming matcher (shared spec):
    (A B){2} over a replayed stream equals the batch result."""
    pattern = [
        Step.group(
            "G", [Step.once("A", "et = 'a'"), Step.once("B", "et = 'b'")], 2
        )
    ]
    measures = [
        Measure("a1", "A", "first", "eid"),
        Measure("nb", "B", "count"),
    ]
    mem = _run_pattern(
        spark,
        [
            [("k", 1, "a", TS(0)), ("k", 2, "b", TS(1))],
            [("k", 3, "a", TS(2)), ("k", 4, "b", TS(3))],
            [("k", 9, "x", TS(30))],
        ],
        pattern,
        measures,
    )
    assert [(r["a1"], r["nb"]) for r in mem.collect()] == [(1, 2)]


def test_streaming_match_recognize_sql(spark):
    """The SQL clause front-end drives the streaming matcher: same matches
    as the library API over a replayed stream."""
    import tempfile

    from flink_psl_spark.match_recognize_sql import streaming_match_recognize_sql
    from flink_psl_spark.streaming import run_to_memory_table

    d = tempfile.mkdtemp(prefix="fps_scep_sql_")
    files = [
        [("k", 1, "c", TS(0)), ("k", 2, "c", TS(1)), ("k", 3, "p", TS(2))],
        [("k", 9, "x", TS(30))],
    ]
    for rows in files:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(f"{d}/src")
    st = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/src")
    )
    out = streaming_match_recognize_sql(
        st,
        """
        MATCH_RECOGNIZE (
            PARTITION BY u
            ORDER BY ts
            MEASURES COUNT(A.*) AS n_c, FIRST(B.eid) AS p_id
            PATTERN (A+ B)
            DEFINE A AS A.et = 'c', B AS B.et = 'p'
        )
        """,
        delay="5 minutes",
        tiebreak_col="eid",
    )
    mem = run_to_memory_table(out, output_mode="append")
    assert [(r["n_c"], r["p_id"]) for r in mem.collect()] == [(2, 3)]


def test_streaming_terminal_nfb_with_within(spark):
    """A WITHIN bound legalizes the trailing notFollowedBy on streams:
    emission waits for the watermark to close each match's window, so an
    in-window purchase arriving later still kills the match, and a clean
    window emits exactly once."""
    pattern = [
        Step.once("c", "et = 'c'"),
        Step.not_followed_by("np", "et = 'p'"),
    ]
    measures = [Measure("cid", "c", "first", "eid")]
    # purchase lands inside the 1h window but AFTER the watermark first
    # passed the click — the deferred match must be rejected
    mem = _run_pattern(
        spark,
        [
            [("k", 1, "c", TS(0))],
            [("k", 8, "x", TS(10))],   # wm advances past the click
            [("k", 2, "p", TS(30))],   # in-window purchase, late batch
            [("k", 9, "x", dt.datetime(2024, 1, 1, 3, 0))],
        ],
        pattern,
        measures,
        within="1 hour",
    )
    assert mem.count() == 0
    # clean window: emitted once the watermark passes click + 1h
    mem2 = _run_pattern(
        spark,
        [
            [("k", 1, "c", TS(0))],
            [("k", 8, "x", TS(10))],
            [("k", 9, "x", dt.datetime(2024, 1, 1, 3, 0))],
        ],
        pattern,
        measures,
        within="1 hour",
    )
    assert [r["cid"] for r in mem2.collect()] == [1]
    # without within the trailing NOT still rejects
    import pytest as _pytest

    from flink_psl_spark.streaming.cep_stream import streaming_match_recognize

    with _pytest.raises(ValueError, match="within"):
        streaming_match_recognize(
            spark.createDataFrame([], SCHEMA), "u", "ts", pattern, measures
        )


def test_streaming_mid_pattern_negation_matches_batch(spark, t, sf_dir):
    """Mid-pattern notFollowedBy finalizes with the closing positive step —
    streaming bounded replay must equal the batch NFA."""
    from pyspark.sql import functions as F

    from flink_psl_spark.cep import Measure, Step, match_recognize
    from flink_psl_spark.streaming.cep_stream import streaming_match_recognize
    from flink_psl_spark.streaming.core import run_to_memory_table, stream_from_parquet

    pattern = [
        Step.once("s", "event_type = 'signup'"),
        Step.not_followed_by("ne", "event_type = 'error'"),
        Step.once("p", "event_type = 'purchase'"),
    ]
    measures = [Measure("pid", "p", "first", "event_id")]

    batch_ev = t["events"].where(
        F.col("event_type").isin("signup", "purchase", "error")
    )
    expected = {
        (r["user_id"], r["pid"])
        for r in match_recognize(
            batch_ev, "user_id", ["ts", "event_id"], pattern, measures
        ).collect()
    }

    stream_ev = stream_from_parquet(
        spark, f"{sf_dir}/events.parquet", ts_col="ts"
    ).where(F.col("event_type").isin("signup", "purchase", "error"))
    out = streaming_match_recognize(
        stream_ev, "user_id", "ts", pattern, measures,
        tiebreak_col="event_id",
    )
    got = {
        (r["user_id"], r["pid"])
        for r in run_to_memory_table(out).collect()
    }
    assert got == expected


def test_streaming_define_aggregates_parity(spark):
    """Running aggregates in DEFINE (SUM cap) produce identical matches
    through the streaming matcher — the agg accessor rides the state
    buffer like FIRST/LAST history refs."""
    import tempfile as _tf

    from flink_psl_spark.match_recognize_sql import (
        match_recognize_sql,
        streaming_match_recognize_sql,
    )
    from flink_psl_spark.streaming import run_to_memory_table

    # TWO trailing sentinels: the second finalizes the first, so the
    # greedy terminal block's frontier deferral resolves (a match ending
    # at the last finalized row only emits once a finalized row exists
    # past it)
    rows = [
        ("k", TS(0), 4.0), ("k", TS(1), 4.0), ("k", TS(2), 4.0),
        ("k", TS(3), 10.0), ("k", TS(4), 1.0),
        ("k", TS(50), 100.0), ("k", TS(59), 100.0),
    ]
    schema = "k string, ts timestamp, v double"
    clause = """
        MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY ts
          MEASURES COUNT(S.*) AS n, SUM(S.v) AS tot
          PATTERN (S{2,})
          DEFINE S AS SUM(S.v) <= 12)"""
    batch = match_recognize_sql(spark.createDataFrame(rows, schema), clause)
    want = {(r["n"], r["tot"]) for r in batch.collect()}
    assert want == {(3, 12.0), (2, 11.0)}

    d = _tf.mkdtemp(prefix="fps_aggdef_")
    spark.createDataFrame(rows[:3], schema).coalesce(1).write.mode(
        "append"
    ).parquet(f"{d}/src")
    spark.createDataFrame(rows[3:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(f"{d}/src")
    st = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/src")
    )
    out = streaming_match_recognize_sql(st, clause, delay="5 minutes")
    mem = run_to_memory_table(out, output_mode="append")
    assert {(r["n"], r["tot"]) for r in mem.collect()} == want


def test_streaming_terminal_greedy_loop_defers_at_frontier(spark):
    """A match whose greedy terminal block ends AT the finalized frontier
    must not emit (a future row could extend it); it emits once a
    finalized row exists past it."""
    import tempfile as _tf

    from flink_psl_spark.cep import Measure, Step
    from flink_psl_spark.streaming import run_to_memory_table
    from flink_psl_spark.streaming.cep_stream import streaming_match_recognize

    schema = "k string, ts timestamp, v double"
    pat = [
        Step.at_least("S", "true", 2).where_history(
            lambda get, first, last, agg: (agg("sum", "S", "v") or 0) <= 12,
            ["v"],
        )
    ]
    meas = [Measure("n", "S", "count"), Measure("tot", "S", "sum", "v")]

    d = _tf.mkdtemp(prefix="fps_frontier_")
    spark.createDataFrame(
        [("k", TS(0), 4.0), ("k", TS(1), 4.0), ("k", TS(10), 100.0)], schema
    ).coalesce(1).write.mode("append").parquet(f"{d}/src")
    st = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/src")
    )
    out = streaming_match_recognize(
        st, "k", "ts", pat, meas, delay="5 minutes"
    )
    # watermark reaches TS(5): [4,4] is finalized AND ends at the frontier
    # -> deferred (TS(10) is not yet finalized, so the stop is unproven)
    mem = run_to_memory_table(out, output_mode="append")
    assert mem.count() == 0

    # a later file finalizes TS(10): the block's stop is content-determined
    spark.createDataFrame([("k", TS(20), 0.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(f"{d}/src")
    st2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/src")
    )
    out2 = streaming_match_recognize(
        st2, "k", "ts", pat, meas, delay="5 minutes"
    )
    mem2 = run_to_memory_table(out2, output_mode="append")
    got = {(r["n"], r["tot"]) for r in mem2.collect()}
    assert got == {(2, 8.0)}
