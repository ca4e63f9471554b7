"""Operator-harness tests (SURVEY §5.3 analogue): drive each custom operator
with small hand-built inputs and assert exact outputs."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

TS = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731


# ---------------------------------------------------------------------------
# as-of join (reference TemporalRowTimeJoinOperator.java:78)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rates(spark):
    return spark.createDataFrame(
        [
            ("EUR", TS("2024-01-01 00:00:00"), 1.10),
            ("EUR", TS("2024-01-01 12:00:00"), 1.20),
            ("EUR", TS("2024-01-02 00:00:00"), 1.30),
            ("GBP", TS("2024-01-01 06:00:00"), 1.50),
        ],
        "ccy string, rt timestamp, rate double",
    )


@pytest.fixture(scope="module")
def txns(spark):
    return spark.createDataFrame(
        [
            (1, "EUR", TS("2024-01-01 00:00:00")),  # exact match → 1.10
            (2, "EUR", TS("2024-01-01 11:59:59")),  # before 12:00 → 1.10
            (3, "EUR", TS("2024-01-03 00:00:00")),  # after all → 1.30
            (4, "GBP", TS("2024-01-01 00:00:00")),  # before any GBP → NULL
            (5, "JPY", TS("2024-01-01 00:00:00")),  # key absent → NULL
        ],
        "txn_id long, ccy string, tt timestamp",
    )


def test_asof_join_backward(spark, rates, txns):
    from flink_psl_spark.operators import asof_join

    out = asof_join(
        txns, rates, on="ccy", left_time="tt", right_time="rt", how="left"
    )
    got = {r["txn_id"]: r["r_rate"] for r in out.collect()}
    assert got == {1: 1.10, 2: 1.10, 3: 1.30, 4: None, 5: None}


def test_asof_join_inner_and_tolerance(spark, rates, txns):
    from flink_psl_spark.operators import asof_join

    inner = asof_join(
        txns, rates, on="ccy", left_time="tt", right_time="rt", how="inner"
    )
    assert {r["txn_id"] for r in inner.collect()} == {1, 2, 3}

    tol = asof_join(
        txns, rates, on="ccy", left_time="tt", right_time="rt",
        how="left", tolerance="12 HOURS",
    )
    got = {r["txn_id"]: r["r_rate"] for r in tol.collect()}
    # txn 3 is 24h after the last rate → outside tolerance
    assert got == {1: 1.10, 2: 1.10, 3: None, 4: None, 5: None}


def test_asof_join_forward(spark, rates, txns):
    from flink_psl_spark.operators import asof_join

    out = asof_join(
        txns, rates, on="ccy", left_time="tt", right_time="rt",
        how="left", direction="forward",
    )
    got = {r["txn_id"]: r["r_rate"] for r in out.collect()}
    # forward: nearest rate at-or-after the txn time
    assert got == {1: 1.10, 2: 1.20, 3: None, 4: 1.50, 5: None}


# ---------------------------------------------------------------------------
# interval join (reference TimeIntervalJoin.java:51)
# ---------------------------------------------------------------------------


def test_interval_join(spark):
    from flink_psl_spark.operators import interval_join

    l = spark.createDataFrame(
        [(1, "k", TS("2024-01-01 00:00:00"))], "lid long, k string, lt timestamp"
    )
    r = spark.createDataFrame(
        [
            (10, "k", TS("2023-12-31 23:59:00")),  # before window
            (11, "k", TS("2024-01-01 00:05:00")),  # inside
            (12, "k", TS("2024-01-01 00:10:00")),  # boundary (inclusive)
            (13, "k", TS("2024-01-01 00:10:01")),  # outside
            (14, "x", TS("2024-01-01 00:05:00")),  # wrong key
        ],
        "rid long, k string, rt timestamp",
    )
    out = interval_join(l, r, "k", "lt", "rt", "'0' SECOND", "'10' MINUTE")
    assert sorted(row["rid"] for row in out.select("__r.rid").collect()) == [11, 12]


# ---------------------------------------------------------------------------
# top-n / dedup (reference StreamExecRank.java:83 / StreamExecDeduplicate.java:85)
# ---------------------------------------------------------------------------


def test_top_n(spark):
    from flink_psl_spark.operators import top_n

    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("a", 2), ("b", 9)], "k string, v int"
    )
    out = top_n(df, "k", [F.col("v").desc()], 2)
    got = sorted((r["k"], r["v"], r["rn"]) for r in out.collect())
    assert got == [("a", 2, 2), ("a", 3, 1), ("b", 9, 1)]


def test_deduplicate_first_last(spark):
    from flink_psl_spark.operators import deduplicate

    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("b", 5, "z")], "k string, seq int, p string"
    )
    first = deduplicate(df, "k", "seq", keep="first")
    last = deduplicate(df, "k", "seq", keep="last")
    assert {(r["k"], r["p"]) for r in first.collect()} == {("a", "x"), ("b", "z")}
    assert {(r["k"], r["p"]) for r in last.collect()} == {("a", "y"), ("b", "z")}


# ---------------------------------------------------------------------------
# window TVFs (reference SqlTumble/Hop/CumulateTableFunction)
# ---------------------------------------------------------------------------


def test_tumble_assignment(spark):
    from flink_psl_spark.operators import tumble

    df = spark.createDataFrame(
        [(TS("2024-01-01 00:25:00"),), (TS("2024-01-01 01:05:00"),)], "ts timestamp"
    )
    out = tumble(df, "ts", "1 hour").select("window_start", "window_end").collect()
    assert {(str(r[0]), str(r[1])) for r in out} == {
        ("2024-01-01 00:00:00", "2024-01-01 01:00:00"),
        ("2024-01-01 01:00:00", "2024-01-01 02:00:00"),
    }


def test_hop_assignment(spark):
    from flink_psl_spark.operators import hop

    df = spark.createDataFrame([(TS("2024-01-01 00:45:00"),)], "ts timestamp")
    out = hop(df, "ts", "30 minutes", "1 hour").select("window_start").collect()
    # a row at 00:45 is in windows starting 00:00 and 00:30
    assert sorted(str(r[0]) for r in out) == [
        "2024-01-01 00:00:00",
        "2024-01-01 00:30:00",
    ]


def test_cumulate_assignment(spark):
    from flink_psl_spark.operators import cumulate

    df = spark.createDataFrame([(TS("2024-01-01 00:40:00"),)], "ts timestamp")
    out = cumulate(df, "ts", "30 minutes", "2 hours")
    rows = out.select("window_start", "window_end").collect()
    # row at 00:40 belongs to growing windows ending 01:00, 01:30, 02:00
    assert {(str(a), str(b)) for a, b in rows} == {
        ("2024-01-01 00:00:00", "2024-01-01 01:00:00"),
        ("2024-01-01 00:00:00", "2024-01-01 01:30:00"),
        ("2024-01-01 00:00:00", "2024-01-01 02:00:00"),
    }


def test_session_tvf(spark):
    from flink_psl_spark.operators import session

    df = spark.createDataFrame(
        [
            ("u", TS("2024-01-01 00:00:00")),
            ("u", TS("2024-01-01 00:05:00")),
            ("u", TS("2024-01-01 01:00:00")),  # new session (gap 55m >= 10m)
        ],
        "k string, ts timestamp",
    )
    out = session(df, "ts", "10 minutes", partition_by="k")
    starts = sorted(str(r["window_start"]) for r in out.collect())
    assert starts == [
        "2024-01-01 00:00:00",
        "2024-01-01 00:00:00",
        "2024-01-01 01:00:00",
    ]


# ---------------------------------------------------------------------------
# changelog (reference StreamExecChangelogNormalize.java:74)
# ---------------------------------------------------------------------------


def test_changelog_normalize(spark):
    from flink_psl_spark.operators import changelog_normalize, to_changelog

    rows = spark.createDataFrame(
        [
            ("k1", 1, 10.0, "I"),
            ("k1", 2, 20.0, "-U"),  # update-before: ignored
            ("k1", 3, 30.0, "U"),
            ("k2", 1, 5.0, "I"),
            ("k2", 2, 0.0, "D"),  # deleted key disappears
        ],
        "k string, seq int, v double, __op string",
    )
    out = changelog_normalize(rows, "k", "seq")
    assert {(r["k"], r["v"]) for r in out.collect()} == {("k1", 30.0)}
    assert "__op" in to_changelog(rows.drop("__op")).columns


# ---------------------------------------------------------------------------
# compat functions (reference SqlFunctionUtils.java)
# ---------------------------------------------------------------------------


def test_compat_functions(spark):
    from flink_psl_spark.functions import (
        is_alpha,
        is_decimal,
        is_digit,
        split_index,
        truncate,
    )

    df = spark.createDataFrame([("a,b,c", "12", "ab", "1.5", -1.259)],
                               "s string, d string, a string, dec string, x double")
    row = df.select(
        split_index("s", ",", 1).alias("si"),
        split_index("s", ",", 9).alias("si_oob"),
        is_digit("d").alias("dig"),
        is_alpha("a").alias("alp"),
        is_decimal("dec").alias("dec_ok"),
        truncate("x", 1).alias("tr"),
    ).first()
    assert row["si"] == "b"
    assert row["si_oob"] is None
    assert row["dig"] and row["alp"] and row["dec_ok"]
    assert row["tr"] == -1.2  # toward zero, not floor


def test_sql_compat_registration(spark):
    from flink_psl_spark.functions import register_sql_compat

    register_sql_compat(spark)
    got = spark.sql(
        "SELECT SPLIT_INDEX('x|y', '|', 0) AS a, TRUNCATE(-2.78, 1) AS b, "
        "IS_DIGIT('123') AS c"
    ).first()
    assert (got["a"], got["b"], got["c"]) == ("x", -2.7, True)


def test_temporal_overlaps_semantics(spark):
    """Reference TemporalOverlapsConverter: inclusive, endpoint-normalized."""
    from flink_psl_spark.functions import register_sql_compat

    register_sql_compat(spark)
    got = spark.sql(
        "SELECT "
        # touching endpoints overlap (inclusive)
        "TEMPORAL_OVERLAPS(TIMESTAMP '2024-01-01 00:00:00', "
        " TIMESTAMP '2024-01-02 00:00:00', TIMESTAMP '2024-01-02 00:00:00', "
        " TIMESTAMP '2024-01-03 00:00:00') AS touching, "
        # disjoint
        "TEMPORAL_OVERLAPS(TIMESTAMP '2024-01-01 00:00:00', "
        " TIMESTAMP '2024-01-02 00:00:00', TIMESTAMP '2024-01-03 00:00:00', "
        " TIMESTAMP '2024-01-04 00:00:00') AS disjoint, "
        # reversed endpoints are normalized before the test
        "TEMPORAL_OVERLAPS(TIMESTAMP '2024-01-05 00:00:00', "
        " TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-02 00:00:00', "
        " TIMESTAMP '2024-01-03 00:00:00') AS reversed"
    ).first()
    assert got["touching"] is True
    assert got["disjoint"] is False
    assert got["reversed"] is True


def test_typeof_values(spark, sf_dir):
    from flink_psl_spark.queries import QUERIES

    rows = QUERIES["typeof_fn"](spark, sf_dir).collect()
    assert len(rows) == 1
    assert (rows[0]["t_key"], rows[0]["t_brand"], rows[0]["t_price"]) == (
        "bigint", "string", "double",
    )


def test_hash_code_java_semantics(spark):
    """HASH_CODE == Java String.hashCode (32-bit wraparound)."""
    from flink_psl_spark.functions.compat import hash_code

    cases = ["abc", "", "hello world", "the quick brown fox", "Ab", "zzzzzzzz"]

    def java_hash(s):
        h = 0
        for ch in s:
            h = (31 * h + ord(ch) + 2**31) % 2**32 - 2**31
        return h

    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {r["s"]: r["hc"] for r in df.select("s", hash_code("s").alias("hc")).collect()}
    assert got == {c: java_hash(c) for c in cases}


def test_sha_family_passthrough(spark):
    """SHA1/SHA2-384/SHA2-512 pass through as Spark built-ins (reference
    FlinkSqlOperatorTable SHA1/SHA384/SHA512) — pinned against known
    digests (DuckDB lacks these, so they are test-verified rather than
    oracled)."""
    import hashlib

    row = spark.sql(
        "SELECT SHA1('abc') AS s1, SHA2('abc', 224) AS s224, "
        "SHA2('abc', 384) AS s384, SHA2('abc', 512) AS s512"
    ).collect()[0]
    assert row["s1"] == "a9993e364706816aba3e25717850c26c9cd0d89d"
    for col, algo in (("s224", "sha224"), ("s384", "sha384"),
                      ("s512", "sha512")):
        assert row[col] == hashlib.new(algo, b"abc").hexdigest()


def test_table_env_pandas_bridge(spark):
    """PyFlink parity: t_env.from_pandas / table.to_pandas round-trip
    (Arrow-batched both ways)."""
    import pandas as pd

    from flink_psl_spark.api import TableEnvironment

    t_env = TableEnvironment(spark)
    pdf = pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})
    tbl = t_env.from_pandas(pdf, "k string, v long")
    out = t_env.to_pandas(tbl.orderBy("k"))
    assert out.to_dict("records") == [
        {"k": "a", "v": 1}, {"k": "b", "v": 2}
    ]


def test_profile_table_nulls_and_subset(spark, t):
    """profile_table: null accounting, distinct counts, string-rendered
    min/max, and column subsetting — including a column that is entirely
    NULL."""
    from pyspark.sql import functions as F

    from flink_psl_spark.operators.misc import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "k int, s string"
    ).withColumn("all_null", F.lit(None).cast("double"))
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"k", "s", "all_null"}
    assert rows["k"]["n_rows"] == 3 and rows["k"]["n_null"] == 0
    assert rows["k"]["min_value"] == "1" and rows["k"]["max_value"] == "3"
    assert rows["s"]["n_null"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["all_null"]["n_null"] == 3
    assert rows["all_null"]["min_value"] is None
    only_k = profile_table(df, ["k"]).collect()
    assert len(only_k) == 1 and only_k[0]["column"] == "k"


def test_profile_table_default_plan_has_no_expand(spark, t):
    """The default (HLL-distinct) profile must partial-aggregate map-side:
    no Expand node, exactly one single-partition exchange after the scan —
    the property that keeps the exchange a sketch row per partition at
    100 TB. The exact mode may Expand (documented trade)."""
    from flink_psl_spark.operators.misc import profile_table

    approx_plan = (
        profile_table(t["orders"], ["o_orderkey", "o_orderstatus"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in approx_plan
    exact_plan = (
        profile_table(
            t["orders"], ["o_orderkey", "o_orderstatus"], exact_distinct=True
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in exact_plan  # the cost the docstring documents


# ---------------------------------------------------------------------------
# validate_table (Deequ-style constraint suite, operators/validation.py)
# ---------------------------------------------------------------------------


def test_validate_table_row_checks_and_volume(spark):
    """Row-level checks fold into one scan; NULLs are completeness
    violations only (range/set/regex exclude them); min_rows reports the
    shortfall."""
    from flink_psl_spark.operators import validation as V

    df = spark.createDataFrame(
        [
            (1, 10.0, "O", "1-URGENT"),
            (2, -5.0, "X", "9-BAD"),
            (3, None, None, None),
            (4, 250.0, "F", "5-LOW"),
        ],
        "k int, price double, status string, prio string",
    )
    rows = {
        (r["check"], r["target"]): r
        for r in V.validate_table(
            df,
            [
                V.not_null("price"),
                V.in_range("price", 0, 100),
                V.in_set("status", ["O", "F"]),
                V.matches("prio", "^[1-5]-"),
                V.non_negative("price"),
                V.satisfies(
                    "cheap_open",
                    (F.col("status") == "O") & (F.col("price") > 5),
                ),
                V.min_rows(10),
            ],
        ).collect()
    }
    assert rows[("not_null", "price")]["violations"] == 1
    # -5 below, 250 above; the NULL price is NOT a range violation
    assert rows[("in_range", "price")]["violations"] == 2
    assert rows[("in_set", "status")]["violations"] == 1  # 'X'; NULL exempt
    assert rows[("matches", "prio")]["violations"] == 1  # '9-BAD'
    assert rows[("non_negative", "price")]["violations"] == 1
    assert rows[("cheap_open", "*")]["violations"] == 1
    assert rows[("min_rows", "*")]["violations"] == 6  # 10 - 4
    assert not rows[("min_rows", "*")]["passed"]
    assert rows[("not_null", "price")]["passed"] is False


def test_validate_table_unique_and_fk(spark):
    """unique counts EXTRA rows per duplicated key; foreign_key counts
    dangling non-NULL references (NULL FKs are not violations)."""
    from flink_psl_spark.operators import validation as V

    df = spark.createDataFrame(
        [(1, 100), (1, 100), (1, 200), (2, 300), (3, None), (4, 999)],
        "k int, ref int",
    )
    ref = spark.createDataFrame([(100,), (200,), (300,)], "id int")
    rows = {
        r["check"]: r
        for r in V.validate_table(
            df,
            [
                V.unique("k"),          # k=1 ×3 → 2 extra rows
                V.foreign_key("ref", ref, "id"),  # 999 dangles; NULL exempt
            ],
        ).collect()
    }
    assert rows["unique"]["violations"] == 2
    assert rows["foreign_key"]["violations"] == 1
    assert rows["foreign_key"]["target"] == "ref->id"


def test_validate_table_single_scan_for_row_checks(spark, t):
    """However many row checks are declared, the row-level branch is ONE
    aggregate over ONE scan (count the scans in the plan)."""
    from flink_psl_spark.operators import validation as V

    report = V.validate_table(
        t["orders"],
        [
            V.not_null("o_custkey"),
            V.in_range("o_totalprice", 0, 100000),
            V.in_set("o_orderstatus", ["O", "F", "P"]),
            V.matches("o_orderpriority", "^[1-5]-"),
            V.min_rows(1),
        ],
    )
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") + plan.count("Scan parquet") <= 2


# ---------------------------------------------------------------------------
# snapshot_diff (operators/changelog.py — snapshot → I/U/D changelog)
# ---------------------------------------------------------------------------


def test_snapshot_diff_classification(spark):
    """I for new keys, D (before-image) for removed keys, U
    (after-image) for changed values; unchanged keys are silent;
    NULL→value and value→NULL transitions are updates (null-safe
    compare)."""
    from flink_psl_spark.operators.changelog import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (4, "D4", None), (5, "e", 50.0)],
        "k int, s string, v double",
    )
    out = {r["k"]: r for r in snapshot_diff(old, new, "k").collect()}
    assert set(out) == {2, 3, 4, 5}
    assert out[5]["__op"] == "I" and out[5]["s"] == "e"
    assert out[3]["__op"] == "D" and out[3]["s"] == "c"  # before-image
    assert out[2]["__op"] == "U" and out[2]["v"] == 20.0  # NULL→20
    assert out[4]["__op"] == "U" and out[4]["v"] is None  # 40→NULL
    # compare_cols subset: restricting to s makes key 2 unchanged
    only_s = {
        r["k"]: r
        for r in snapshot_diff(old, new, "k", compare_cols=["s"]).collect()
    }
    assert set(only_s) == {3, 4, 5}


def test_snapshot_diff_feeds_changelog_normalize(spark):
    """The emitted changelog composes with changelog_normalize: applying
    the diff over the old image reproduces the new image."""
    from flink_psl_spark.operators.changelog import (
        changelog_normalize,
        snapshot_diff,
        to_changelog,
    )

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (4, 44.0)], "k int, v double"
    )
    diff = snapshot_diff(old, new, "k").withColumn("seq", F.lit(1))
    base = to_changelog(old).withColumn("seq", F.lit(0))
    applied = changelog_normalize(
        base.unionByName(diff), "k", ["seq"]
    ).select("k", "v")
    assert sorted(map(tuple, applied.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_validate_stream_rejects_keyed_checks(spark):
    """Streaming validation admits only associative checks; unique/fk
    raise with routing guidance."""
    import pytest as _pytest

    from flink_psl_spark.operators import validation as V

    sdf = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    with _pytest.raises(ValueError, match="streaming validation"):
        V.validate_stream(sdf, [V.unique("value")])
    with _pytest.raises(ValueError, match="streaming validation"):
        V.validate_stream(
            sdf, [V.foreign_key("value", sdf, "value")]
        )


def test_validate_stream_matches_batch(spark, t):
    """Replaying a table through validate_stream yields exactly the
    batch validate_table report for the same row-level checks."""
    from flink_psl_spark.operators import validation as V
    from flink_psl_spark.streaming import (
        run_to_memory_table,
        stream_from_parquet,
    )

    checks = lambda: [  # noqa: E731 — Column exprs are single-use
        V.not_null("o_custkey"),
        V.in_range("o_totalprice", 0, 200000),
        V.min_rows(10**9),
    ]
    import os

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    stream = stream_from_parquet(spark, f"{sf_dir}/orders.parquet")
    got = sorted(
        map(
            tuple,
            run_to_memory_table(
                V.validate_stream(stream, checks()),
                output_mode="complete",
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            V.validate_table(
                spark.read.parquet(f"{sf_dir}/orders.parquet"), checks()
            ).collect(),
        )
    )
    assert got == want


def test_detect_metric_anomalies_semantics(spark):
    """A spike beyond 3 sigma flags; normal drift doesn't; a flat
    history flags ANY deviation; short history is unscored (NULL)."""
    from flink_psl_spark.operators.validation import detect_metric_anomalies

    rows = (
        # series A: stable 10s then a spike
        [("a", i, 10) for i in range(1, 6)] + [("a", 6, 100)]
        # series B: mild noise, no anomaly at the end
        + [("b", 1, 10), ("b", 2, 12), ("b", 3, 8), ("b", 4, 11),
           ("b", 5, 10)]
    )
    df = spark.createDataFrame(rows, "metric string, t int, value int")
    out = {
        (r["metric"], r["t"]): r
        for r in detect_metric_anomalies(
            df, order_col="t", window=5, k2=9, min_history=3
        ).collect()
    }
    # flat history of 10s → the spike AND any deviation flags
    assert out[("a", 6)]["is_anomaly"] is True
    assert out[("a", 5)]["is_anomaly"] is False  # 10 matches the flat mean
    assert out[("b", 5)]["is_anomaly"] is False
    # first two points of each series: fewer than 3 predecessors
    assert out[("a", 1)]["is_anomaly"] is None
    assert out[("a", 2)]["is_anomaly"] is None
    assert out[("a", 1)]["n_hist"] == 0 and out[("a", 4)]["n_hist"] == 3


def test_distribution_drift_psi(spark):
    """PSI: identical snapshots → every contribution 0 (or -1 from the
    floor of a tiny negative); a hard shift concentrates positive mass;
    empty buckets and outliers are clamped + smoothed, never NULL."""
    from flink_psl_spark.operators.validation import distribution_drift

    a = spark.createDataFrame([(float(v),) for v in range(100)], "x double")
    same = distribution_drift(a, a, "x", lo=0, hi=100, n_buckets=10)
    rows = same.collect()
    assert len(rows) == 10
    # identical shares: (p-q)=0 exactly → floor(0)=0
    assert all(r["psi_q"] == 0 for r in rows)
    assert all(r["n_old"] == r["n_new"] == 10 for r in rows)

    # shifted snapshot: values move up 50 → strong positive PSI
    b = spark.createDataFrame(
        [(float(v) + 50,) for v in range(100)], "x double"
    )
    drift = distribution_drift(a, b, "x", lo=0, hi=100, n_buckets=10)
    total = sum(r["psi_q"] for r in drift.collect()) / 1e9
    assert total > 0.25  # the 'shifted' read of the PSI scale

    # outliers clamp into edge buckets (155 → bucket 9), nulls drop
    c = spark.createDataFrame([(155.0,), (None,), (-3.0,)], "x double")
    edge = {
        r["bucket"]: r
        for r in distribution_drift(
            c, c, "x", lo=0, hi=100, n_buckets=10
        ).collect()
    }
    assert edge[9]["n_old"] == 1 and edge[0]["n_old"] == 1
    assert sum(r["n_old"] for r in edge.values()) == 2  # NULL excluded


def test_validate_table_empty_input(spark):
    """An empty table has ZERO violations on row checks (not NULL from
    the empty SUM), fails min_rows with the full shortfall, and passes
    unique/fk trivially."""
    from flink_psl_spark.operators import validation as V

    df = spark.createDataFrame([], "k int, ref int")
    ref = spark.createDataFrame([(1,)], "id int")
    rows = {
        r["check"]: r
        for r in V.validate_table(
            df,
            [
                V.not_null("k"),
                V.in_range("k", 0, 10),
                V.min_rows(5),
                V.unique("k"),
                V.foreign_key("ref", ref, "id"),
            ],
        ).collect()
    }
    assert rows["not_null"]["violations"] == 0
    assert rows["not_null"]["passed"] is True
    assert rows["in_range"]["violations"] == 0
    assert rows["min_rows"]["violations"] == 5
    assert rows["unique"]["violations"] == 0
    assert rows["foreign_key"]["violations"] == 0


def test_fuzzy_join_recall_exact_vs_naive(spark):
    """Length-bucket blocking is SOUND: the blocked join returns
    exactly the naive theta join's pairs (incl. cross-bucket pairs
    whose lengths differ by max_distance), and plans no cartesian."""
    from flink_psl_spark.operators.joins import fuzzy_join

    names = [
        (1, "kitten"), (2, "sitting"), (3, "kitte"),
        (4, "mitten"), (5, "completely-different-string"), (6, "a"),
        (7, "abc"),  # len 3 vs len 1: distance 2 across buckets
    ]
    df = spark.createDataFrame(names, "id int, name string")
    l = df.select(F.col("id").alias("a"), F.col("name").alias("ln"))
    r = df.select(F.col("id").alias("b"), F.col("name").alias("rn"))
    got = {
        (x["a"], x["b"])
        for x in fuzzy_join(l, r, "ln", "rn", max_distance=2)
        .where(F.col("a") < F.col("b")).collect()
    }
    import itertools

    def lev(s, t):
        dp = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            prev, dp[0] = dp[0], i
            for j, ct in enumerate(t, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (cs != ct)
                )
        return dp[len(t)]

    want = {
        (a, b)
        for (a, sa), (b, sb) in itertools.combinations(names, 2)
        if lev(sa, sb) <= 2
    }
    assert got == want and (6, 7) in got
    plan = (
        fuzzy_join(l, r, "ln", "rn", max_distance=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_profile_topk_nulls_and_ties(spark):
    """profile_topk: NULL is a counted category (sorted first on
    ties), values render as strings, k limits per column."""
    from flink_psl_spark.operators.misc import profile_topk

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, None), (2, None), (3, "b")],
        "k int, s string",
    )
    rows = {
        (r["column"], r["rank"]): r for r in profile_topk(df, k=2).collect()
    }
    assert rows[("s", 1)]["value"] is None  # tie with 'a' → NULL first
    assert rows[("s", 1)]["n"] == 2 and rows[("s", 2)]["value"] == "a"
    assert rows[("k", 1)]["value"] in ("1", "2")
    assert len([r for r in rows if r[0] == "k"]) == 2  # k=2 cap


def test_dataset_fingerprint_invariance(spark):
    """The fingerprint is row-order- and partitioning-independent,
    NULL-position-sensitive, and content-sensitive."""
    from flink_psl_spark.operators.misc import dataset_fingerprint

    a = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "b")], "k int, v string"
    )
    b = spark.createDataFrame(
        [(None, "b"), (1, "a"), (2, None)], "k int, v string"
    ).repartition(7)
    fa, fb = (
        dataset_fingerprint(x).collect()[0] for x in (a, b)
    )
    assert fa["fingerprint"] == fb["fingerprint"] and fa["n_rows"] == 3
    # (NULL,'a') vs ('a',NULL): sentinel keeps the positions distinct
    c = spark.createDataFrame([(None, "1")], "k string, v string")
    d = spark.createDataFrame([("1", None)], "k string, v string")
    assert (
        dataset_fingerprint(c).collect()[0]["fingerprint"]
        != dataset_fingerprint(d).collect()[0]["fingerprint"]
    )


def test_cms_join_size_bound(spark, t):
    """The CMS join-size estimate satisfies the paper's contract on the
    fixture: overestimate, within eps*|L|*|R|."""
    from flink_psl_spark.operators.skew import cms_join_size

    ev = t["events"].selectExpr("user_id as k")
    cu = t["customer"].selectExpr("c_custkey as k")
    eps = 0.001
    est = cms_join_size(ev, cu, "k", eps=eps)
    exact = ev.join(cu, "k").count()
    assert exact <= est <= exact + eps * ev.count() * cu.count()


def test_expect_schema_statuses(spark):
    """All four statuses; order-insensitive; metadata-only."""
    from flink_psl_spark.operators.validation import expect_schema

    df = spark.createDataFrame([], "b string, a int, extra double")
    rows = {
        r["column"]: r["status"]
        for r in expect_schema(df, "a INT, b INT, gone STRING").collect()
    }
    assert rows == {
        "a": "ok",          # order differs from DDL — still ok
        "b": "type_mismatch",
        "gone": "missing",
        "extra": "unexpected",
    }


def test_incremental_refresh_equals_full_recompute(spark):
    """Incremental maintenance equals the full recompute, including a row
    that MOVES partitions (both its before and after partitions dirty);
    clean partitions pass through from the old materialization."""
    from pyspark.sql import functions as F

    from flink_psl_spark.operators import incremental_refresh

    old_rows = [(d, k, v) for d, k, v in [
        ("p1", 1, 10.0), ("p1", 2, 5.0), ("p2", 3, 7.0), ("p3", 4, 2.0)]]
    base_old = spark.createDataFrame(old_rows, "part string, id int, v double")

    def agg_fn(df):
        return df.groupBy("part").agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("v"), 2).alias("total"),
        )

    old_agg = agg_fn(base_old)
    # change: id=3 moves p2 -> p1 and changes value; p3 untouched
    base_new = spark.createDataFrame(
        [("p1", 1, 10.0), ("p1", 2, 5.0), ("p1", 3, 9.0), ("p3", 4, 2.0)],
        "part string, id int, v double",
    )
    dirty = spark.createDataFrame([("p2",), ("p1",)], "part string")
    out = incremental_refresh(old_agg, base_new, dirty, ["part"], agg_fn)
    got = {r["part"]: (r["n"], r["total"]) for r in out.collect()}
    expect = {
        r["part"]: (r["n"], r["total"]) for r in agg_fn(base_new).collect()
    }
    assert got == expect
    assert got["p3"] == (1, 2.0)  # clean partition survived untouched
    assert "p2" not in got        # emptied partition disappears


class TestKAnonymize:
    def test_suppression_and_residual(self, spark):
        from flink_psl_spark.operators.validation import k_anonymize

        rows = (
            [("us", "a", 1)] * 5
            + [("us", "b", 2)] * 3
            + [("de", "a", 3)] * 2
            + [("fr", "c", 4)] * 1
        )
        df = spark.createDataFrame(rows, "country string, seg string, v int")
        out = {
            (r["country"], r["seg"]): (r["n"], r["sum_v"])
            for r in k_anonymize(
                df, ["country", "seg"], k=5, sum_cols=["v"]
            ).collect()
        }
        # one kept group, one residual bucket merging the three small ones
        assert out[("us", "a")] == (5, 5)
        assert out[("*", "*")] == (6, 3 * 2 + 2 * 3 + 4)
        assert len(out) == 2

    def test_residual_under_k_dropped(self, spark):
        from flink_psl_spark.operators.validation import k_anonymize

        df = spark.createDataFrame(
            [("x", 1), ("y", 1), ("z", 1)], "g string, v int"
        )
        out = k_anonymize(df, ["g"], k=5).collect()
        assert out == []  # even the residual covers < k rows

    def test_numeric_quasi_published_as_string(self, spark):
        from flink_psl_spark.operators.validation import k_anonymize

        df = spark.createDataFrame([(7,)] * 6, "code int")
        [r] = k_anonymize(df, ["code"], k=5).collect()
        assert r["code"] == "7" and r["n"] == 6


class TestIncrementalJoinRefresh:
    def _split(self, spark):
        a = spark.createDataFrame(
            [(i, i % 4, f"a{i}") for i in range(40)], "id long, k long, pa string"
        )
        b = spark.createDataFrame(
            [(j, f"b{j}") for j in range(4)], "k long, pb string"
        )
        a_old, da = a.where("id < 30"), a.where("id >= 30")
        b_old, db = b.where("k < 3"), b.where("k >= 3")
        return a, b, a_old, da, b_old, db

    def test_equals_full_recompute(self, spark):
        from flink_psl_spark.operators.misc import incremental_join_refresh

        a, b, a_old, da, b_old, db = self._split(spark)
        old = a_old.join(b_old, on=["k"], how="inner")
        refreshed = incremental_join_refresh(
            old, a_old, da, b_old, db, on=["k"]
        )
        want = sorted(map(tuple, a.join(b, on=["k"]).collect()))
        got = sorted(map(tuple, refreshed.collect()))
        assert got == want

    def test_old_result_not_rejoined_and_deltas_broadcast(self, spark):
        from flink_psl_spark.operators.misc import incremental_join_refresh

        _, _, a_old, da, b_old, db = self._split(spark)
        old = a_old.join(b_old, on=["k"], how="inner")
        # pre-materialize the stored view: the refresh plan must not
        # contain the old-side join at all
        stored = spark.createDataFrame(old.collect(), old.schema)
        plan = incremental_join_refresh(
            stored, a_old, da, b_old, db, on=["k"]
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Join") == 2  # only the two delta joins
        assert "BroadcastHashJoin" in plan


class TestPrivacyOps:
    def test_l_diversity_flags_homogeneous_group(self, spark):
        from flink_psl_spark.operators.validation import l_diversity_report

        df = spark.createDataFrame(
            [("a", "x"), ("a", "x"), ("a", "x"), ("b", "x"), ("b", "y")],
            "g string, s string",
        )
        out = {r["g"]: (r["n_sensitive"], r["diverse"])
               for r in l_diversity_report(df, ["g"], "s", l=2).collect()}
        assert out["a"] == (1, False)
        assert out["b"] == (2, True)

    def test_dp_noise_deterministic_and_seed_sensitive(self, spark):
        from flink_psl_spark.operators.validation import dp_noisy_counts

        df = spark.createDataFrame(
            [("a",)] * 10 + [("b",)] * 20, "g string"
        )
        r1 = {r["g"]: r["noisy_n"]
              for r in dp_noisy_counts(df, ["g"], epsilon=1.0).collect()}
        r2 = {r["g"]: r["noisy_n"]
              for r in dp_noisy_counts(df, ["g"], epsilon=1.0).collect()}
        assert r1 == r2  # reproducible release
        r3 = {r["g"]: r["noisy_n"]
              for r in dp_noisy_counts(df, ["g"], epsilon=1.0,
                                       seed="43").collect()}
        assert r1 != r3  # seed actually feeds the noise
        # noise is bounded-ish and centered: counts stay in a sane band
        assert abs(r1["a"] - 10) < 20 and abs(r1["b"] - 20) < 20


class TestGapFill:
    def test_locf_fills_and_marks(self, spark):
        from flink_psl_spark.operators.windows import gap_fill

        df = spark.createDataFrame(
            [
                ("u", "2024-01-01 00:10:00", 1.0, 1),
                ("u", "2024-01-01 00:50:00", 2.0, 2),  # same hour, later
                ("u", "2024-01-01 03:05:00", 9.0, 3),  # 2 empty hours
            ],
            "k string, ts string, v double, eid int",
        ).withColumn("ts", F.to_timestamp("ts"))
        out = {
            str(r["bucket"]): (r["v"], r["filled"])
            for r in gap_fill(
                df, "k", "ts", "v", tiebreak_col="eid"
            ).collect()
        }
        assert out["2024-01-01 00:00:00"] == (2.0, False)  # latest wins
        assert out["2024-01-01 01:00:00"] == (2.0, True)   # carried
        assert out["2024-01-01 02:00:00"] == (2.0, True)
        assert out["2024-01-01 03:00:00"] == (9.0, False)
        assert len(out) == 4  # contiguous grid, nothing beyond the span

    def test_single_observation_key(self, spark):
        from flink_psl_spark.operators.windows import gap_fill

        df = spark.createDataFrame(
            [("u", "2024-01-01 05:30:00", 7.0, 1)],
            "k string, ts string, v double, eid int",
        ).withColumn("ts", F.to_timestamp("ts"))
        [r] = gap_fill(df, "k", "ts", "v", tiebreak_col="eid").collect()
        assert (r["v"], r["filled"]) == (7.0, False)


def test_gap_fill_linear_interpolation(spark):
    from flink_psl_spark.operators.windows import gap_fill

    df = spark.createDataFrame(
        [
            ("u", "2024-01-01 00:00:00", 1.0, 1),
            ("u", "2024-01-01 03:00:00", 7.0, 2),   # gap of 2 hours
            ("u", "2024-01-01 04:00:00", 4.0, 3),
        ],
        "k string, ts string, v double, eid int",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        str(r["bucket"]): r["v"]
        for r in gap_fill(
            df, "k", "ts", "v", tiebreak_col="eid", mode="linear"
        ).collect()
    }
    assert out["2024-01-01 00:00:00"] == 1.0
    assert out["2024-01-01 01:00:00"] == 3.0   # 1 + (7-1)*1/3
    assert out["2024-01-01 02:00:00"] == 5.0   # 1 + (7-1)*2/3
    assert out["2024-01-01 03:00:00"] == 7.0
    assert out["2024-01-01 04:00:00"] == 4.0


def test_histogram_quantiles_bounds_exact_rank(spark):
    from flink_psl_spark.operators.validation import histogram_quantiles

    vals = list(range(1000))  # uniform 0..999
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    out = {
        r["q"]: (r["est_value"], r["cum_n"], r["total_n"])
        for r in histogram_quantiles(
            df, "x", [0.5, 0.99], lo=0.0, hi=1000.0, n_buckets=100
        ).collect()
    }
    # one-bucket-width (10.0) error bound around the true quantile
    est50, cum50, total = out[0.5]
    assert abs(est50 - 500.0) <= 10.0 and total == 1000
    assert cum50 >= 0.5 * total
    est99, cum99, _ = out[0.99]
    assert abs(est99 - 990.0) <= 10.0 and cum99 >= 0.99 * 1000


def test_delete_sweep_purges_and_audits(spark):
    from flink_psl_spark.operators.validation import delete_sweep

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, v string"
    )
    req = spark.createDataFrame([(1,), (9,)], "k long")
    purged, audit = delete_sweep(df, req, ["k"])
    assert sorted(r["k"] for r in purged.collect()) == [2, 3]
    got = {r["k"]: (r["rows_deleted"], r["matched"]) for r in audit.collect()}
    assert got == {1: (2, True), 9: (0, False)}  # silent no-op surfaces


def test_migrate_to_contract_shapes_and_casts(spark):
    from flink_psl_spark.operators.validation import migrate_to_contract

    df = spark.createDataFrame(
        [("1", 2.0, "x"), ("oops", 3.0, "y")],
        "a string, b double, junk string",
    )
    out = migrate_to_contract(
        df, "a int, b double, c string",
        defaults={"c": "dflt"}, strict_casts=False,
    )
    assert [f.name for f in out.schema.fields] == ["a", "b", "c"]
    rows = sorted(out.collect(), key=lambda r: str(r["a"]))
    assert (rows[0]["a"], rows[0]["c"]) == (1, "dflt")
    assert rows[1]["a"] is None  # uncastable -> NULL under try_cast
    assert "junk" not in out.columns


def test_ewma_anomaly_recurrence(spark):
    import datetime as dt

    from flink_psl_spark.operators.windows import ewma_anomaly

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    # key 'a': hourly values 100, 100, 500 (spike), 100
    rows = [
        (1, base, "a", 100.0),
        (2, base + dt.timedelta(hours=1), "a", 100.0),
        (3, base + dt.timedelta(hours=2), "a", 500.0),
        (4, base + dt.timedelta(hours=3), "a", 100.0),
        # two events in one bucket sum before smoothing
        (5, base, "b", 40.0),
        (6, base + dt.timedelta(minutes=30), "b", 60.0),
        (7, base + dt.timedelta(hours=1), "b", 100.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id int, ts timestamp, k string, value double"
    )
    out = ewma_anomaly(
        df, "k", "ts", "value", bucket="hour", alpha=0.25, threshold=300.0
    )
    got = {
        (r["k"], r["bucket_ts"].hour): r
        for r in out.collect()
    }
    # python replay of the same recurrence
    a = 0.25
    s1 = 100.0
    s2 = a * 100.0 + (1 - a) * s1          # 100
    s3 = a * 500.0 + (1 - a) * s2          # 200
    s4 = a * 100.0 + (1 - a) * s3          # 175
    assert got[("a", 0)]["smoothed"] == round(s1, 6)
    assert got[("a", 0)]["residual"] == 0.0
    assert not got[("a", 0)]["anomaly"]
    assert got[("a", 2)]["smoothed"] == round(s3, 6)
    assert got[("a", 2)]["residual"] == round(500.0 - s2, 6)  # 400
    assert got[("a", 2)]["anomaly"]
    assert got[("a", 3)]["residual"] == round(100.0 - s3, 6)  # -100
    assert not got[("a", 3)]["anomaly"]
    assert got[("a", 3)]["smoothed"] == round(s4, 6)
    # bucket pre-aggregation: b hour0 = 40+60 = 100
    assert got[("b", 0)]["x"] == 100.0 and got[("b", 1)]["residual"] == 0.0
