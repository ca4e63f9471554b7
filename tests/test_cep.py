"""CEP NFA tests (reference flink-cep NFATest-style harness cases):
quantifiers, greedy vs reluctant, after-match skip, within, empty matches."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flink_psl_spark.cep import (
    SKIP_TO_NEXT_ROW,
    Measure,
    Step,
    match_recognize,
)

TS = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731


@pytest.fixture(scope="module")
def seq(spark):
    #  u1: c c c p c p     u2: p c c
    rows = [
        ("u1", 1, "c", TS(0), 1.0),
        ("u1", 2, "c", TS(1), 2.0),
        ("u1", 3, "c", TS(2), 3.0),
        ("u1", 4, "p", TS(3), 10.0),
        ("u1", 5, "c", TS(4), 4.0),
        ("u1", 6, "p", TS(5), 20.0),
        ("u2", 7, "p", TS(0), 30.0),
        ("u2", 8, "c", TS(1), 5.0),
        ("u2", 9, "c", TS(2), 6.0),
    ]
    return spark.createDataFrame(
        rows, "u string, eid long, et string, ts timestamp, v double"
    )


def _pat(greedy=True):
    return [
        Step.one_or_more("A", "et = 'c'", greedy=greedy),
        Step.once("B", "et = 'p'"),
    ]


def test_greedy_one_or_more(spark, seq):
    out = match_recognize(
        seq, "u", ["ts", "eid"], _pat(),
        [Measure("n", "A", "count"), Measure("pid", "B", "first", "eid")],
    )
    got = {(r["u"], r["n"], r["pid"]) for r in out.collect()}
    # u1: (ccc)p and (c)p; u2: leading p has no clicks before it → no match
    assert got == {("u1", 3, 4), ("u1", 1, 6)}


def test_measures(spark, seq):
    out = match_recognize(
        seq, "u", ["ts", "eid"], _pat(),
        [
            Measure("s", "A", "sum", "v"),
            Measure("avg_v", "A", "avg", "v"),
            Measure("f", "A", "first", "eid"),
            Measure("l", "A", "last", "eid"),
            Measure("mx", "A", "max", "v"),
        ],
    )
    first = {r["f"]: r for r in out.collect()}
    m = first[1]
    assert (m["s"], m["avg_v"], m["l"], m["mx"]) == (6.0, 2.0, 3, 3.0)


def test_times_quantifier(spark, seq):
    out = match_recognize(
        seq, "u", ["ts", "eid"],
        [Step.at_least("A", "et = 'c'", 2), Step.once("B", "et = 'p'")],
        [Measure("n", "A", "count")],
    )
    # only the ccc-run qualifies (>=2 clicks before p)
    assert [(r["u"], r["n"]) for r in out.collect()] == [("u1", 3)]


def test_optional_and_zero_or_more(spark, seq):
    out = match_recognize(
        seq, "u", ["ts", "eid"],
        [Step.zero_or_more("A", "et = 'c'"), Step.once("B", "et = 'p'")],
        [Measure("n", "A", "count"), Measure("pid", "B", "first", "eid")],
    )
    got = {(r["u"], r["n"], r["pid"]) for r in out.collect()}
    # u2's leading p now matches with an empty A
    assert got == {("u1", 3, 4), ("u1", 1, 6), ("u2", 0, 7)}


def test_after_match_policies(spark):
    rows = [
        ("k", 1, "c", TS(0), 1.0),
        ("k", 2, "c", TS(1), 1.0),
        ("k", 3, "p", TS(2), 1.0),
    ]
    df = spark.createDataFrame(
        rows, "u string, eid long, et string, ts timestamp, v double"
    )
    past_last = match_recognize(
        df, "u", ["ts", "eid"], _pat(), [Measure("n", "A", "count")]
    )
    assert [r["n"] for r in past_last.collect()] == [2]
    nxt = match_recognize(
        df, "u", ["ts", "eid"], _pat(), [Measure("n", "A", "count")],
        after_match=SKIP_TO_NEXT_ROW,
    )
    # restart from row 2: (cc)p and (c)p both match
    assert sorted(r["n"] for r in nxt.collect()) == [1, 2]


def test_reluctant_quantifier(spark):
    rows = [
        ("k", 1, "c", TS(0), 1.0),
        ("k", 2, "c", TS(1), 1.0),
        ("k", 3, "c", TS(2), 1.0),
    ]
    df = spark.createDataFrame(
        rows, "u string, eid long, et string, ts timestamp, v double"
    )
    pat = [
        Step.one_or_more("A", "et = 'c'", greedy=False),
        Step.once("B", "et = 'c'"),
    ]
    out = match_recognize(df, "u", ["ts", "eid"], pat, [Measure("n", "A", "count")])
    # reluctant A+ takes 1 row, B the next; skip past last → matches (c)(c)
    assert [r["n"] for r in out.collect()] == [1]


def test_within_clause(spark):
    rows = [
        ("k", 1, "e", TS(0), 1.0),
        ("k", 2, "e", TS(1), 1.0),
        ("k", 3, "e", TS(50), 1.0),  # 50 min after start → outside within
        ("k", 4, "e", TS(51), 1.0),
        ("k", 5, "e", TS(52), 1.0),
    ]
    df = spark.createDataFrame(
        rows, "u string, eid long, et string, ts timestamp, v double"
    )
    out = match_recognize(
        df, "u", ["ts", "eid"],
        [Step.at_least("E", "et = 'e'", 3)],
        [Measure("n", "E", "count"), Measure("s", "E", "first", "eid")],
        within="30 minutes", time_col="ts",
    )
    got = {(r["s"], r["n"]) for r in out.collect()}
    # greedy 5-row match spans 52min → rejected; retry at row 2 (4 rows,
    # 51min) → rejected; at row 3: rows 3-5 span 2min → match
    assert got == {(3, 3)}


def test_no_matches_empty_schema(spark, seq):
    out = match_recognize(
        seq, "u", ["ts", "eid"],
        [Step.once("Z", "et = 'zzz'")],
        [Measure("n", "Z", "count")],
    )
    assert out.count() == 0
    assert out.columns == ["u", "match_seq", "n"]


def test_null_partition_key(spark):
    # null keys form a group like Spark groupBy: matches must still emit
    rows = [
        (None, 1, "c", TS(0), 1.0),
        (None, 2, "p", TS(1), 10.0),
        ("u1", 3, "c", TS(0), 2.0),
        ("u1", 4, "p", TS(1), 20.0),
    ]
    seq = spark.createDataFrame(
        rows, "u string, eid long, et string, ts timestamp, v double"
    )
    out = match_recognize(
        seq, "u", ["ts", "eid"], _pat(),
        [Measure("n", "A", "count"), Measure("pid", "B", "first", "eid")],
    )
    got = {(r["u"], r["n"], r["pid"]) for r in out.collect()}
    assert got == {(None, 1, 2), ("u1", 1, 4)}


def test_cep_query_vs_oracle(spark, sf_dir):
    import sys

    sys.path.insert(0, "tests")
    from _oracle import compare, duck_connection

    from flink_psl_spark.queries import ORACLES, QUERIES

    con = duck_connection(sf_dir)
    df = QUERIES["cep_clicks_then_purchase"](spark, sf_dir)
    ok, msg = compare(df, con, ORACLES["cep_clicks_then_purchase"])
    con.close()
    assert ok, msg


# ---------------------------------------------------------------------------
# negation + relaxed contiguity (Pattern.followedBy / notNext / notFollowedBy)
# ---------------------------------------------------------------------------


def _seq(spark, types):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            ("k", base + dt.timedelta(minutes=i), t, float(i))
            for i, t in enumerate(types)
        ],
        "k string, ts timestamp, et string, v double",
    )


def _match_counts(df, pattern, spark):
    from flink_psl_spark.cep import Measure, match_recognize

    out = match_recognize(
        df,
        "k",
        "ts",
        pattern,
        [Measure("n", pattern[0].name, "count")],
    )
    return out.count()


def test_cep_not_next(spark):
    from flink_psl_spark.cep import Step

    # a NOT-immediately-followed-by b
    pat = [Step.once("a", "et = 'a'"), Step.not_next("nb", "et = 'b'")]
    assert _match_counts(_seq(spark, ["a", "c"]), pat, spark) == 1
    assert _match_counts(_seq(spark, ["a", "b"]), pat, spark) == 0
    assert _match_counts(_seq(spark, ["a"]), pat, spark) == 1  # end of data


def test_cep_followed_by_skips_gap(spark):
    from flink_psl_spark.cep import Step

    # strict: a then immediately b — gap breaks it
    strict = [Step.once("a", "et = 'a'"), Step.once("b", "et = 'b'")]
    relaxed = [Step.once("a", "et = 'a'"), Step.followed_by("b", "et = 'b'")]
    gap = _seq(spark, ["a", "x", "x", "b"])
    assert _match_counts(gap, strict, spark) == 0
    assert _match_counts(gap, relaxed, spark) == 1


def test_cep_not_followed_by_middle_and_terminal(spark):
    from flink_psl_spark.cep import Step

    # login (no logout in between) purchase
    mid = [
        Step.once("login", "et = 'login'"),
        Step.not_followed_by("nl", "et = 'logout'"),
        Step.once("buy", "et = 'buy'"),
    ]
    assert _match_counts(_seq(spark, ["login", "x", "buy"]), mid, spark) == 1
    assert _match_counts(_seq(spark, ["login", "logout", "buy"]), mid, spark) == 0
    # terminal NOT: click with no later purchase
    term = [
        Step.once("click", "et = 'click'"),
        Step.not_followed_by("np", "et = 'buy'"),
    ]
    assert _match_counts(_seq(spark, ["click", "x", "x"]), term, spark) == 1
    assert _match_counts(_seq(spark, ["click", "x", "buy"]), term, spark) == 0


def test_cep_mode_validation(spark):
    import pytest as _pytest

    from flink_psl_spark.cep import Measure, Step, match_recognize

    df = _seq(spark, ["a"])
    with _pytest.raises(ValueError, match="begin with a NOT"):
        match_recognize(
            df, "k", "ts",
            [Step.not_next("n", "et = 'b'"), Step.once("a", "et = 'a'")],
            [Measure("n", "a", "count")],
        )
    with _pytest.raises(ValueError, match="consecutive NOT"):
        match_recognize(
            df, "k", "ts",
            [
                Step.once("a", "et = 'a'"),
                Step.not_next("n1", "et = 'b'"),
                Step.not_followed_by("n2", "et = 'c'"),
            ],
            [Measure("n", "a", "count")],
        )


def test_cep_negation_brute_force(spark):
    """login notFollowedBy logout, then buy — NFA vs a python replica over
    random-ish sequences."""
    import itertools

    from flink_psl_spark.cep import Measure, Step, match_recognize

    import datetime as dt

    alphabet = ["login", "logout", "buy", "x"]
    pat = [
        Step.once("login", "et = 'login'"),
        Step.not_followed_by("nl", "et = 'logout'"),
        Step.once("buy", "et = 'buy'"),
    ]
    # all 256 sequences ride ONE DataFrame, one partition key per sequence
    base = dt.datetime(2024, 1, 1)
    rows = []
    cases = list(itertools.product(alphabet, repeat=4))
    for ci, types in enumerate(cases):
        rows += [
            (f"s{ci}", base + dt.timedelta(minutes=i), t, float(i))
            for i, t in enumerate(types)
        ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, et string, v double")
    got = {
        r["k"]: r["cnt"]
        for r in match_recognize(
            df, "k", "ts", pat, [Measure("n", "login", "count")]
        )
        .groupBy("k")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }

    for ci, types in enumerate(cases):
        # replica: scan for login; then first buy before any logout
        want, i, n = 0, 0, len(types)
        while i < n:
            if types[i] == "login":
                j = i + 1
                matched_end = None
                while j < n:
                    if types[j] == "buy":
                        matched_end = j
                        break
                    if types[j] == "logout":
                        break
                    j += 1
                if matched_end is not None:
                    want += 1
                    i = matched_end + 1  # skip_past_last_row
                    continue
            i += 1
        assert got.get(f"s{ci}", 0) == want, (types, want)


def test_cep_terminal_negation_bounded_by_within(spark):
    """click notFollowedBy purchase WITHIN 10 minutes — the reference's only
    legal trailing-NOT form: purchases outside the window don't kill the
    match; purchases inside do."""
    from flink_psl_spark.cep import Measure, Step, match_recognize

    def run(types_minutes):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [
                ("k", base + dt.timedelta(minutes=m), t, float(i))
                for i, (t, m) in enumerate(types_minutes)
            ],
            "k string, ts timestamp, et string, v double",
        )
        return match_recognize(
            df, "k", "ts",
            [
                Step.once("c", "et = 'click'"),
                Step.not_followed_by("np", "et = 'buy'"),
            ],
            [Measure("n", "c", "count")],
            within="10 minutes", time_col="ts",
        ).count()

    assert run([("click", 0), ("buy", 5)]) == 0       # inside window
    assert run([("click", 0), ("buy", 15)]) == 1      # outside window
    assert run([("click", 0), ("x", 5), ("buy", 9)]) == 0
    assert run([("click", 0)]) == 1                   # nothing after
    # boundary: delta == within is still inside (<=)
    assert run([("click", 0), ("buy", 10)]) == 0


def test_cep_within_anchor_is_first_bound_row(spark):
    """The WITHIN window of a terminal notFollowedBy measures from the first
    BOUND row, not the match-attempt origin: a relaxed first step can bind
    well after the origin, and negated events inside the true window (from
    the binding) must still kill the match."""
    import datetime as dt

    from flink_psl_spark.cep import Measure, Step, match_recognize

    def run(types_minutes):
        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [
                ("k", base + dt.timedelta(minutes=m), t, float(i))
                for i, (t, m) in enumerate(types_minutes)
            ],
            "k string, ts timestamp, et string, v double",
        )
        return match_recognize(
            df, "k", "ts",
            [
                Step.followed_by("c", "et = 'click'"),
                Step.not_followed_by("np", "et = 'buy'"),
            ],
            [Measure("n", "c", "count")],
            within="10 minutes", time_col="ts",
        ).count()

    # click binds 5 min after the scan origin; buy@12 is 7 min after the
    # click — inside the true window (an origin-anchored scan would stop at
    # minute 10 and emit a false match)
    assert run([("x", 0), ("click", 5), ("buy", 12)]) == 0
    # buy 12 min after the click — outside the window, match survives
    assert run([("x", 0), ("click", 5), ("buy", 17)]) == 1
    # boundary: exactly 10 min after the click is still inside (<=)
    assert run([("x", 0), ("click", 5), ("buy", 15)]) == 0


def _am_run(spark, types, pattern, am, meas, **kw):
    import datetime as dt

    from flink_psl_spark.cep import match_recognize

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("k", i, t, base + dt.timedelta(minutes=i))
            for i, t in enumerate(types)
        ],
        "k string, eid long, et string, ts timestamp",
    )
    out = match_recognize(
        df, "k", ["ts", "eid"], pattern, meas, after_match=am, **kw
    )
    return sorted(tuple(r[m.out_name] for m in meas) for r in out.collect())


def test_after_match_all_five_strategies(spark):
    """Reference aftermatch/ parity: the five skip strategies produce their
    distinct match sets on overlap-heavy fixtures (NFATest-style)."""
    from flink_psl_spark.cep import (
        NO_SKIP,
        SKIP_PAST_LAST_ROW,
        SKIP_TO_NEXT_ROW,
        Measure,
        Step,
        skip_to_first,
        skip_to_last,
    )

    # A+ B strict on "cccp": suffix runs overlap
    pat = [Step.one_or_more("A", "et = 'c'"), Step.once("B", "et = 'p'")]
    m = [Measure("a1", "A", "first", "eid"), Measure("n", "A", "count")]
    assert _am_run(spark, "cccp", pat, SKIP_PAST_LAST_ROW, m) == [(0, 3)]
    assert _am_run(spark, "cccp", pat, SKIP_TO_NEXT_ROW, m) == [
        (0, 3), (1, 2), (2, 1),
    ]
    # skip to last A: full run, then its last row as a 1-run
    assert _am_run(spark, "cccp", pat, skip_to_last("A"), m) == [
        (0, 3), (2, 1),
    ]

    # followedByAny + NO_SKIP enumerates ALL later bindings, which
    # SKIP_TO_NEXT's preferred-match scan cannot reach: c x p p.
    # Plain followedBy stops at the first occurrence (the NFA's ignore edge
    # carries ¬condition) even under NO_SKIP.
    pat2 = [Step.once("A", "et = 'c'"), Step.followed_by_any("B", "et = 'p'")]
    m2 = [Measure("cid", "A", "first", "eid"), Measure("pid", "B", "first", "eid")]
    assert _am_run(spark, "cxpp", pat2, NO_SKIP, m2) == [(0, 2), (0, 3)]
    assert _am_run(spark, "cxpp", pat2, SKIP_TO_NEXT_ROW, m2) == [(0, 2)]
    pat2n = [Step.once("A", "et = 'c'"), Step.followed_by("B", "et = 'p'")]
    assert _am_run(spark, "cxpp", pat2n, NO_SKIP, m2) == [(0, 2)]

    # skip to first C: the closing purchase opens the next chain link
    pat3 = [
        Step.once("A", "et = 'p'"),
        Step.one_or_more("B", "et = 'c'"),
        Step.once("C", "et = 'p'"),
    ]
    m3 = [Measure("o", "A", "first", "eid"), Measure("c", "C", "first", "eid")]
    assert _am_run(spark, "pccpcp", pat3, skip_to_first("C"), m3) == [
        (0, 3), (3, 5),
    ]
    assert _am_run(spark, "pccpcp", pat3, SKIP_PAST_LAST_ROW, m3) == [(0, 3)]


def test_after_match_validation(spark):
    import pytest as _pytest

    from flink_psl_spark.cep import Measure, Step, skip_to_first

    pat = [Step.once("A", "et = 'c'"), Step.once("B", "et = 'p'")]
    m = [Measure("n", "A", "count")]
    # SKIP TO FIRST of the first variable loops — compile-time rejection
    with _pytest.raises(ValueError, match="would loop"):
        _am_run(spark, "cp", pat, skip_to_first("A"), m)
    with _pytest.raises(ValueError, match="not a pattern step"):
        _am_run(spark, "cp", pat, skip_to_first("Z"), m)
    with _pytest.raises(ValueError, match="unknown after_match"):
        _am_run(spark, "cp", pat, "bogus_strategy", m)


def test_streaming_rejects_no_skip(spark):
    import pytest as _pytest

    from flink_psl_spark.cep import NO_SKIP, Measure, Step
    from flink_psl_spark.streaming.cep_stream import streaming_match_recognize

    df = _seq(spark, ["a"])
    with _pytest.raises(ValueError, match="NO_SKIP"):
        streaming_match_recognize(
            df, "k", "ts",
            [Step.once("a", "et = 'a'"), Step.once("b", "et = 'b'")],
            [Measure("n", "a", "count")],
            after_match=NO_SKIP,
        )


def test_after_match_strategies_brute_force(spark):
    """Exhaustive check over all 3^5 sequences: NO_SKIP and SKIP_TO_LAST
    vs independent python replicas (overlap semantics, not just counts)."""
    import datetime as dt
    import itertools

    from flink_psl_spark.cep import (
        NO_SKIP,
        Measure,
        Step,
        match_recognize,
        skip_to_last,
    )

    base = dt.datetime(2024, 1, 1)
    cases = list(itertools.product("abx", repeat=5))
    rows = [
        (f"s{ci}", i, t, base + dt.timedelta(minutes=i))
        for ci, types in enumerate(cases)
        for i, t in enumerate(types)
    ]
    df = spark.createDataFrame(rows, "k string, eid long, et string, ts timestamp")
    pat = [Step.one_or_more("A", "et = 'a'"), Step.once("B", "et = 'b'")]
    meas = [Measure("a1", "A", "first", "eid"), Measure("n", "A", "count")]

    def collect(am, pattern=pat):
        out = match_recognize(df, "k", ["ts", "eid"], pattern, meas, after_match=am)
        got: dict[str, set] = {}
        for r in out.collect():
            got.setdefault(r["k"], set()).add((r["a1"], r["n"]))
        return got

    # NO_SKIP on strict A+ B: every contiguous a-block whose next row is b
    got = collect(NO_SKIP)
    for ci, types in enumerate(cases):
        want = {
            (i, j - i + 1)
            for i in range(5)
            for j in range(i, 5)
            if all(t == "a" for t in types[i : j + 1])
            and j + 1 < 5
            and types[j + 1] == "b"
        }
        assert got.get(f"s{ci}", set()) == want, (types, want)

    # NO_SKIP on A followedByAny B: every (a_i, b_j) pair with j > i
    pat2 = [Step.once("A", "et = 'a'"), Step.followed_by_any("B", "et = 'b'")]
    out2 = match_recognize(
        df, "k", ["ts", "eid"], pat2,
        [Measure("ai", "A", "first", "eid"), Measure("bj", "B", "first", "eid")],
        after_match=NO_SKIP,
    )
    got2: dict[str, set] = {}
    for r in out2.collect():
        got2.setdefault(r["k"], set()).add((r["ai"], r["bj"]))
    for ci, types in enumerate(cases):
        want = {
            (i, j)
            for i in range(5)
            for j in range(i + 1, 5)
            if types[i] == "a" and types[j] == "b"
        }
        assert got2.get(f"s{ci}", set()) == want, (types, want)

    # NO_SKIP on A followedBy B (ignore edge = ¬condition): only the
    # NEAREST b after each a
    pat2n = [Step.once("A", "et = 'a'"), Step.followed_by("B", "et = 'b'")]
    out2n = match_recognize(
        df, "k", ["ts", "eid"], pat2n,
        [Measure("ai", "A", "first", "eid"), Measure("bj", "B", "first", "eid")],
        after_match=NO_SKIP,
    )
    got2n: dict[str, set] = {}
    for r in out2n.collect():
        got2n.setdefault(r["k"], set()).add((r["ai"], r["bj"]))
    for ci, types in enumerate(cases):
        want = {
            (i, min(j for j in range(i + 1, 5) if types[j] == "b"))
            for i in range(5)
            if types[i] == "a"
            and any(types[j] == "b" for j in range(i + 1, 5))
        }
        assert got2n.get(f"s{ci}", set()) == want, (types, want)

    # SKIP_TO_LAST(A) on strict A+ B: per maximal a-run followed by b,
    # the full run plus (len >= 2) its last element as a 1-run
    got3 = collect(skip_to_last("A"))
    for ci, types in enumerate(cases):
        want = set()
        i = 0
        while i < 5:
            if types[i] == "a":
                j = i
                while j + 1 < 5 and types[j + 1] == "a":
                    j += 1
                if j + 1 < 5 and types[j + 1] == "b":
                    want.add((i, j - i + 1))
                    if j > i:
                        want.add((j, 1))
                i = j + 1
            else:
                i += 1
        assert got3.get(f"s{ci}", set()) == want, (types, want)


def test_group_patterns(spark):
    """Quantified subpatterns (reference GroupPattern.java): contiguous
    iterations, greedy/reluctant group quantifiers, groups composed with
    following steps, quantifiers inside the group, relaxed groups."""
    from flink_psl_spark.cep import Measure, NO_SKIP, Step

    m = [
        Measure("a1", "A", "first", "eid"),
        Measure("na", "A", "count"),
        Measure("b2", "B", "last", "eid"),
    ]
    g2 = [Step.group("G", [Step.once("A", "et = 'c'"), Step.once("B", "et = 'p'")], 2)]
    # two consecutive click/purchase pairs; iterations must be contiguous
    assert _am_run(spark, "cpcp", g2, "skip_past_last_row", m) == [(0, 2, 3)]
    assert _am_run(spark, "cpxcp", g2, "skip_past_last_row", m) == []
    # greedy {1,2} takes both pairs; reluctant takes one at a time
    g12 = [Step.group("G", [Step.once("A", "et = 'c'"), Step.once("B", "et = 'p'")], 1, 2)]
    g12r = [
        Step.group(
            "G", [Step.once("A", "et = 'c'"), Step.once("B", "et = 'p'")],
            1, 2, greedy=False,
        )
    ]
    assert _am_run(spark, "cpcp", g12, "skip_past_last_row", m) == [(0, 2, 3)]
    assert _am_run(spark, "cpcp", g12r, "skip_past_last_row", m) == [
        (0, 1, 1), (2, 1, 3),
    ]
    # NO_SKIP enumerates the overlapping group solutions
    assert _am_run(spark, "cpcp", g12, NO_SKIP, m) == [
        (0, 1, 1), (0, 2, 3), (2, 1, 3),
    ]
    # group followed by a step; quantified sub-steps inside the group
    gc = [
        Step.group_at_least(
            "G", [Step.once("A", "et = 'c'"), Step.once("B", "et = 'p'")], 1
        ),
        Step.once("C", "et = 'x'"),
    ]
    mc = [Measure("na", "A", "count"), Measure("cx", "C", "first", "eid")]
    assert _am_run(spark, "cpcpx", gc, "skip_past_last_row", mc) == [(2, 4)]
    gq = [
        Step.group(
            "G", [Step.one_or_more("A", "et = 'c'"), Step.once("B", "et = 'p'")], 2
        )
    ]
    assert _am_run(spark, "ccpcp", gq, "skip_past_last_row", m) == [(0, 3, 4)]
    # relaxed group scans forward for its first iteration
    gr = [
        Step.once("S", "et = 's'"),
        Step.group(
            "G", [Step.once("A", "et = 'c'"), Step.once("B", "et = 'p'")],
            2, mode="relaxed",
        ),
    ]
    ms = [Measure("na", "A", "count"), Measure("s1", "S", "first", "eid")]
    assert _am_run(spark, "sxxcpcp", gr, "skip_past_last_row", ms) == [(2, 0)]


def test_until_stop_condition(spark):
    """Pattern.until: block extension halts BEFORE the first stopping row;
    the stopping row stays available to the next step."""
    from flink_psl_spark.cep import Measure, Step

    pat = [
        Step.one_or_more("A", "et <> ''").until("et = 'p'"),
        Step.once("B", "et = 'p'"),
    ]
    m = [Measure("n", "A", "count"), Measure("b", "B", "first", "eid")]
    # any-rows absorb until the purchase; purchase closes the match
    assert _am_run(spark, "xxcp", pat, "skip_past_last_row", m) == [(3, 3)]
    # consecutive purchases: second has no preceding unconsumed row
    assert _am_run(spark, "xpp", pat, "skip_past_last_row", m) == [(1, 1)]
    # without until, greedy A+ would swallow the purchase and the
    # backtracker still finds the match — until changes which rows A binds
    pat_nountil = [
        Step.one_or_more("A", "et <> ''"),
        Step.once("B", "et = 'p'"),
    ]
    assert _am_run(spark, "xpxp", pat_nountil, "skip_past_last_row", m) == [
        (3, 3)
    ]
    assert _am_run(spark, "xpxp", pat, "skip_past_last_row", m) == [
        (1, 1), (1, 3),
    ]
    # validation: until on NOT steps / groups is rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="meaningless"):
        _am_run(
            spark, "xp",
            [
                Step.once("A", "et = 'x'"),
                Step.not_next("N", "et = 'p'").until("et = 'x'"),
            ],
            "skip_past_last_row", [Measure("n", "A", "count")],
        )
    with _pytest.raises(ValueError, match="leaf looping"):
        _am_run(
            spark, "xp",
            [Step.group("G", [Step.once("A", "et = 'x'")], 1).until("et = 'p'")],
            "skip_past_last_row", [Measure("n", "A", "count")],
        )


def test_group_pattern_validation(spark):
    import pytest as _pytest

    from flink_psl_spark.cep import Measure, Step

    m = [Measure("n", "A", "count")]
    with _pytest.raises(ValueError, match="zero rows"):
        _am_run(
            spark, "cp",
            [Step.group("G", [Step.optional("A", "et = 'c'")], 1)],
            "skip_past_last_row", m,
        )
    with _pytest.raises(ValueError, match="NOT steps"):
        _am_run(
            spark, "cp",
            [Step.group("G", [
                Step.once("A", "et = 'c'"),
                Step.not_next("N", "et = 'p'"),
            ], 1)],
            "skip_past_last_row", m,
        )


def test_match_recognize_sql_equals_library(spark, seq):
    """The SQL clause front-end compiles to the same matches as the library
    API (quantifier, measures, defines, default skip)."""
    from flink_psl_spark.cep import Measure, Step, match_recognize
    from flink_psl_spark.match_recognize_sql import match_recognize_sql

    sql_out = match_recognize_sql(
        seq,
        """
        MATCH_RECOGNIZE (
            PARTITION BY u
            ORDER BY ts, eid
            MEASURES COUNT(A.*) AS n, FIRST(B.eid) AS pid,
                     MAX(A.v) AS topv
            PATTERN (A+ B)
            DEFINE A AS A.et = 'c', B AS B.et = 'p'
        )
        """,
    )
    lib_out = match_recognize(
        seq, "u", ["ts", "eid"],
        [Step.one_or_more("A", "et = 'c'"), Step.once("B", "et = 'p'")],
        [
            Measure("n", "A", "count"),
            Measure("pid", "B", "first", "eid"),
            Measure("topv", "A", "max", "v"),
        ],
    )
    key = lambda rows: sorted(  # noqa: E731
        (r["u"], r["n"], r["pid"], r["topv"]) for r in rows
    )
    assert key(sql_out.collect()) == key(lib_out.collect())


def test_match_recognize_sql_quantifiers_within_reluctant(spark):
    from flink_psl_spark.match_recognize_sql import match_recognize_sql

    df = _seq(spark, ["a", "a", "a", "b"])
    out = match_recognize_sql(
        df,
        """
        MATCH_RECOGNIZE (
            PARTITION BY k ORDER BY ts
            MEASURES COUNT(A.*) AS n, FIRST(B.v) AS bv
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A{1,2} B?)
            WITHIN INTERVAL '30' MINUTE
            DEFINE A AS A.et = 'a', B AS B.et = 'b'
        )
        """,
    )
    # greedy {1,2}: matches at 0 (a0 a1), 1 (a1 a2), 2 (a2 + b)
    assert sorted(r["n"] for r in out.collect()) == [1, 2, 2]
    # reluctant +? takes the minimum
    out2 = match_recognize_sql(
        df,
        """
        MATCH_RECOGNIZE (
            PARTITION BY k ORDER BY ts
            MEASURES COUNT(A.*) AS n
            PATTERN (A+?)
            DEFINE A AS A.et = 'a'
        )
        """,
    )
    assert sorted(r["n"] for r in out2.collect()) == [1, 1, 1]


def test_match_recognize_sql_group_pattern(spark):
    """Parenthesized group quantifiers in the SQL clause compile to
    GroupPattern subpatterns."""
    from flink_psl_spark.match_recognize_sql import match_recognize_sql

    df = _seq(spark, ["a", "b", "a", "b", "a"])
    out = match_recognize_sql(
        df,
        """
        MATCH_RECOGNIZE (
            PARTITION BY k ORDER BY ts
            MEASURES COUNT(A.*) AS na, LAST(B.v) AS bl
            PATTERN ((A B){2})
            DEFINE A AS A.et = 'a', B AS B.et = 'b'
        )
        """,
    )
    rows = [(r["na"], r["bl"]) for r in out.collect()]
    assert rows == [(2, 3.0)]


def test_match_recognize_sql_rejections(spark):
    import pytest as _pytest

    from flink_psl_spark.match_recognize_sql import match_recognize_sql

    df = _seq(spark, ["a", "b"])
    base = """
        MATCH_RECOGNIZE (
            PARTITION BY k ORDER BY ts
            MEASURES COUNT(A.*) AS n
            PATTERN {pat}
            DEFINE {define}
        )
    """
    with _pytest.raises(ValueError, match="alternation"):
        match_recognize_sql(
            df, base.format(pat="(A | B)", define="A AS A.et = 'a'")
        )
    # cross-variable references are supported (IterativeCondition) — a
    # bare other-variable ref means its running LAST row
    ok = match_recognize_sql(
        df,
        base.format(pat="(A B)", define="A AS A.et = 'a', B AS A.et = 'a'"),
    )
    assert ok.count() == 1
    # ...but unknown identifiers inside an iterative conjunct are rejected
    with _pytest.raises(ValueError, match="unsupported identifier"):
        match_recognize_sql(
            df,
            base.format(
                pat="(A B)", define="A AS A.et = 'a', B AS LAST(A.et) = nope"
            ),
        )
    with _pytest.raises(ValueError, match="missing PARTITION BY"):
        match_recognize_sql(
            df,
            """MATCH_RECOGNIZE (ORDER BY ts MEASURES COUNT(A.*) AS n
               PATTERN (A) DEFINE A AS A.et = 'a')""",
        )
    with _pytest.raises(ValueError, match="not in PATTERN"):
        match_recognize_sql(
            df,
            base.format(pat="(A)", define="A AS A.et = 'a', Z AS Z.et = 'b'"),
        )


def test_cep_not_before_optional_rejected(spark):
    """notFollowedBy before an optional step is malformed (the negative gap
    requires the next step to bind) — reject at compile time like the
    reference's NFACompiler instead of silently dropping optionality."""
    import pytest as _pytest

    from flink_psl_spark.cep import Measure, Step, match_recognize

    df = _seq(spark, ["a"])
    with _pytest.raises(ValueError, match="optional"):
        match_recognize(
            df, "k", "ts",
            [
                Step.once("a", "et = 'a'"),
                Step.not_followed_by("nb", "et = 'b'"),
                Step.optional("c", "et = 'c'"),
            ],
            [Measure("n", "a", "count")],
        )


def test_allow_combinations_via_group_composition(spark):
    """Pattern.oneOrMore().allowCombinations() (reference Quantifier
    ALLOW_COMBINATIONS) ≡ group_at_least(1) over a followed_by_any
    sub-step: under NO_SKIP every non-contiguous subset of loop elements
    branches into its own match."""
    import itertools

    from flink_psl_spark.cep import NO_SKIP, Measure, Step, match_recognize

    seq = ["a", "a", "x", "a", "b"]
    df = spark.createDataFrame(
        [("k", i, s) for i, s in enumerate(seq)], "k string, i long, et string"
    )
    out = match_recognize(
        df, "k", "i",
        [
            Step.group_at_least(
                "G", [Step.followed_by_any("A", "et = 'a'")], 1
            ),
            Step.followed_by("B", "et = 'b'"),
        ],
        [
            Measure("n", "A", "count"),
            Measure("first_a", "A", "first", "i"),
            Measure("last_a", "A", "last", "i"),
        ],
        after_match=NO_SKIP,
    )
    got = sorted((r["n"], r["first_a"], r["last_a"]) for r in out.collect())
    a_pos = [i for i, s in enumerate(seq) if s == "a"]
    want = sorted(
        (len(c), c[0], c[-1])
        for r in range(1, len(a_pos) + 1)
        for c in itertools.combinations(a_pos, r)
    )
    assert got == want


def test_where_history_library_api(spark):
    """Iterative conditions via the library API (reference
    IterativeCondition.java:61): DOWN extends while strictly below its own
    previous row; UP must exceed DOWN's first row."""
    from flink_psl_spark.cep import Measure, Step, match_recognize

    rows = [
        ("A", 1, 10.0), ("A", 2, 8.0), ("A", 3, 6.0), ("A", 4, 12.0),
        ("A", 5, 3.0),
        ("B", 1, 5.0), ("B", 2, 4.0), ("B", 3, 4.5),  # rebound below peak
    ]
    df = spark.createDataFrame(rows, "k string, seq int, v double")
    down = Step.at_least("DOWN", "true", 2).where_history(
        lambda get, first, last: last("DOWN", "v", 1) is None
        or get("v") < last("DOWN", "v", 1),
        ["v"],
    )
    up = Step.once("UP", "true").where_history(
        lambda get, first, last: (
            first("DOWN", "v") is not None and get("v") > first("DOWN", "v")
        ),
        ["v"],
    )
    out = match_recognize(
        df, "k", "seq",
        [down, up],
        [
            Measure("peak", "DOWN", "first", "v"),
            Measure("bottom", "DOWN", "last", "v"),
            Measure("up_v", "UP", "first", "v"),
        ],
    )
    got = {(r["k"], r["peak"], r["bottom"], r["up_v"]) for r in out.collect()}
    # A: DOWN binds 10 > 8 > 6, UP = 12 > 10 — match; B: rebound 4.5 < 5
    assert got == {("A", 10.0, 6.0, 12.0)}


def test_iterative_define_offsets_and_self_running_last(spark):
    """LAST(V.col) with offset 0 inside DEFINE V is the CURRENT row
    (running semantics); offset 1 is the previous bound row."""
    from flink_psl_spark.match_recognize_sql import match_recognize_sql

    rows = [("k", 1, 5.0), ("k", 2, 5.0), ("k", 3, 7.0)]
    df = spark.createDataFrame(rows, "k string, seq int, v double")
    # B AS LAST(B.v) = LAST(B.v) is trivially true only if evaluable —
    # proves offset-0 self reference resolves to the current row
    out = match_recognize_sql(df, """
        MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES COUNT(B.*) AS n, LAST(B.v) AS lv
          PATTERN (B{2})
          DEFINE B AS LAST(B.v, 1) IS NULL OR LAST(B.v, 0) = LAST(B.v, 1)
        )""")
    got = [(r["n"], r["lv"]) for r in out.collect()]
    assert got == [(2, 5.0)]  # rows 1,2 equal; row 3 breaks the run


def test_iterative_define_cross_variable_arithmetic(spark):
    """Arithmetic + comparison over another variable's binding: B must be
    within 2 of A's value."""
    from flink_psl_spark.match_recognize_sql import match_recognize_sql

    rows = [("k", 1, 10.0), ("k", 2, 11.0), ("x", 1, 10.0), ("x", 2, 20.0)]
    df = spark.createDataFrame(rows, "k string, seq int, v double")
    out = match_recognize_sql(df, """
        MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES FIRST(A.v) AS av, FIRST(B.v) AS bv
          PATTERN (A B)
          DEFINE B AS ABS(B.v - LAST(A.v)) <= 2
        )""")
    got = {(r["k"], r["av"], r["bv"]) for r in out.collect()}
    assert got == {("k", 10.0, 11.0)}


def test_iterative_define_streaming_batch_parity(spark):
    """The price-dip pattern produces identical matches through the batch
    and streaming matchers (iterative conditions ride the state buffer)."""
    import datetime as dt
    import tempfile

    from flink_psl_spark.match_recognize_sql import (
        match_recognize_sql,
        streaming_match_recognize_sql,
    )
    from flink_psl_spark.streaming import run_to_memory_table

    TS = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        ("k", TS(0), 10.0), ("k", TS(1), 8.0), ("k", TS(2), 6.0),
        ("k", TS(3), 12.0), ("k", TS(4), 9.0), ("k", TS(5), 7.0),
        ("k", TS(6), 13.0),
        ("z", TS(0), 4.0), ("z", TS(1), 3.0), ("z", TS(2), 3.5),
        # watermark-advancing sentinels
        ("k", TS(59), 0.0), ("z", TS(59), 0.0),
    ]
    schema = "k string, ts timestamp, v double"
    clause = """
        MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY ts
          MEASURES FIRST(DOWN.v) AS peak, LAST(DOWN.v) AS bottom,
                   LAST(UP.v) AS up_v
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (DOWN{2,} UP)
          DEFINE DOWN AS LAST(DOWN.v, 1) IS NULL OR DOWN.v < LAST(DOWN.v, 1),
                 UP AS UP.v > FIRST(DOWN.v)
        )"""
    batch = match_recognize_sql(spark.createDataFrame(rows, schema), clause)
    want = {
        (r["k"], r["peak"], r["bottom"], r["up_v"]) for r in batch.collect()
    }
    # first match consumes 10>8>6 plus UP=12; scan resumes at 9: 9>7, UP=13
    assert want == {("k", 10.0, 6.0, 12.0), ("k", 9.0, 7.0, 13.0)}

    d = tempfile.mkdtemp(prefix="fps_iterdef_")
    spark.createDataFrame(rows[:5], schema).coalesce(1).write.mode(
        "append"
    ).parquet(f"{d}/src")
    spark.createDataFrame(rows[5:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(f"{d}/src")
    st = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/src")
    )
    out = streaming_match_recognize_sql(st, clause, delay="5 minutes")
    mem = run_to_memory_table(out, output_mode="append")
    got = {
        (r["k"], r["peak"], r["bottom"], r["up_v"]) for r in mem.collect()
    }
    assert got == want


def test_define_running_aggregates(spark):
    """SUM/AVG/COUNT in DEFINE see the partial match including the
    candidate row (reference MatchCodeGenerator aggregates-in-DEFINE)."""
    from flink_psl_spark.match_recognize_sql import match_recognize_sql

    rows = [("k", i, v) for i, v in enumerate([4.0, 4.0, 4.0, 10.0, 1.0])]
    df = spark.createDataFrame(rows, "k string, seq int, v double")
    # budget run: block extends while running sum <= 12 -> binds 4,4,4
    out = match_recognize_sql(df, """
        MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES COUNT(S.*) AS n, SUM(S.v) AS tot
          PATTERN (S{2,})
          DEFINE S AS SUM(S.v) <= 12)""")
    got = sorted((r["n"], r["tot"]) for r in out.collect())
    # first run: 4+4+4=12 ok, +10 busts; resume at 10: 10+1=11 ok (2 rows)
    assert got == [(2, 11.0), (3, 12.0)]

    # AVG + COUNT combined: extend while running avg < 5 and <= 3 rows
    out2 = match_recognize_sql(df, """
        MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES COUNT(S.*) AS n, AVG(S.v) AS mean_v
          PATTERN (S{2,})
          DEFINE S AS AVG(S.v) < 5.0 AND COUNT(S.*) <= 3)""")
    got2 = sorted((r["n"], r["mean_v"]) for r in out2.collect())
    # 4,4,4 (avg 4) stops at count cap; 10 opens (avg 10 >= 5, refused as
    # first row -> no >= 2-row block from 10); 1 alone can't reach 2 rows
    assert got2 == [(3, 4.0)]


def test_match_recognize_degenerate_inputs(spark):
    """Degenerate-input sweep, CEP leg (r12; the ANN sweep's method
    applied here): empty input, empty partitions after filtering,
    all-NULL measure columns, NULL partition keys, and NULL event times
    under WITHIN must never kill a task. Contracts: SQL aggregate NULL
    semantics on all-NULL measures (SUM/MIN/MAX/AVG → NULL, COUNT → n,
    FIRST/LAST → the row's NULL); a NULL partition key forms its own
    group (like groupBy); a NULL time under WITHIN compares UNKNOWN, so
    spans touching it never qualify."""
    pat = [Step("a", "et = 'x'"), Step("b", "et = 'y'")]
    meas = [
        Measure("n", "a", "count", None),
        Measure("s", "a", "sum", "v"),
        Measure("f", "a", "first", "v"),
        Measure("mn", "a", "min", "v"),
        Measure("av", "a", "avg", "v"),
    ]
    schema = "u string, ts timestamp, et string, v double"

    # empty input → empty result, schema intact
    empty = spark.createDataFrame([], schema)
    out = match_recognize(empty, "u", "ts", pat, meas)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "u", "match_seq", "n", "s", "f", "mn", "av"]

    # all-NULL double measure column: SUM must be NULL, not pandas' 0.0
    rows = [("k1", TS(i), et, None) for i, et in enumerate(["x", "y"])]
    got = match_recognize(
        spark.createDataFrame(rows, schema), "u", "ts", pat, meas
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n"] == 1
    assert r["s"] is None and r["f"] is None
    assert r["mn"] is None and r["av"] is None

    # all-NULL string measure column survives min/max/first
    rows = [("k1", TS(i), et, None) for i, et in enumerate(["x", "y"])]
    meas_s = [Measure("f", "a", "first", "sv"), Measure("mx", "b", "max", "sv")]
    got = match_recognize(
        spark.createDataFrame(rows, "u string, ts timestamp, et string, sv string"),
        "u", "ts", pat, meas_s,
    ).collect()
    assert len(got) == 1 and got[0]["f"] is None and got[0]["mx"] is None

    # NULL partition key forms its own group
    rows = [(None, TS(0), "x", 1.0), (None, TS(1), "y", 2.0)]
    got = match_recognize(
        spark.createDataFrame(rows, schema), "u", "ts", pat, meas
    ).collect()
    assert len(got) == 1 and got[0]["u"] is None and got[0]["s"] == 1.0

    # NULL event time under WITHIN: the span is UNKNOWN → no match, no crash
    rows = [("k1", None, "x", 1.0), ("k1", TS(1), "y", 2.0)]
    got = match_recognize(
        spark.createDataFrame(rows, schema), "u", "ts", pat, meas,
        within="10 minutes", time_col="ts",
    ).collect()
    assert got == []
