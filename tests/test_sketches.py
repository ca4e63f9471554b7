"""KMV bottom-k sketch: python-model parity, partition invariance, merge."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from flink_psl_spark.llm.sketches import (
    KMV_SPACE,
    kmv_distinct_estimates,
    kmv_merge_batch,
    kmv_overlap,
    kmv_sketch,
)


def _h(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:12], 16)


def _model_sketch(elements, k):
    return sorted({_h(e) for e in elements})[:k]


def _model_estimate(elements, k):
    sk = _model_sketch(elements, k)
    if len(sk) < k:
        return float(len(sk))
    return (k - 1) * float(KMV_SPACE) / sk[-1]


def _two_corpora(spark, n_a=500, n_b=500, shared=200):
    # corpus a: 0..n_a-1; corpus b: shares `shared` elements with a
    rows = [("a", f"e{i}") for i in range(n_a)] + [
        ("b", f"e{i}") for i in range(n_a - shared, n_a - shared + n_b)
    ]
    return spark.createDataFrame(rows, "g string, e string"), rows


def test_sketch_matches_python_model(spark):
    df, rows = _two_corpora(spark)
    got = {
        (r["group"], r["rank"]): r["h"]
        for r in kmv_sketch(df, "e", "g", k=64).collect()
    }
    for g in ("a", "b"):
        model = _model_sketch([e for gg, e in rows if gg == g], 64)
        assert [got[(g, i + 1)] for i in range(len(model))] == model


def test_estimate_exact_under_k(spark):
    df = spark.createDataFrame(
        [("a", f"x{i}") for i in range(10)], "g string, e string"
    )
    sk = kmv_sketch(df, "e", "g", k=64)
    [r] = kmv_distinct_estimates(sk, k=64).collect()
    assert r["est_distinct"] == 10.0 and r["n_sketch"] == 10


def test_estimate_within_relative_error(spark):
    df, rows = _two_corpora(spark, n_a=2000, n_b=0, shared=0)
    sk = kmv_sketch(df.where(F.col("g") == "a"), "e", "g", k=256)
    [r] = kmv_distinct_estimates(sk, k=256).collect()
    assert r["est_distinct"] == pytest.approx(
        _model_estimate([e for _, e in rows], 256)
    )
    # KMV relative error ~ 1/sqrt(k) ≈ 6%; allow 4 sigma
    assert abs(r["est_distinct"] - 2000) / 2000 < 0.25


def test_overlap_matches_model_and_partitioning(spark):
    df, rows = _two_corpora(spark)
    out1 = kmv_overlap(df.repartition(1), "e", "g", "a", "b", k=64).collect()
    out7 = kmv_overlap(
        df.repartition(7, "e"), "e", "g", "a", "b", k=64
    ).collect()
    assert out1 == out7  # partition-layout invariant

    # python model of the same estimator
    a = {_h(e) for g, e in rows if g == "a"}
    b = {_h(e) for g, e in rows if g == "b"}
    union_k = sorted(a | b)[:64]
    matches = sum(1 for h in union_k if h in a and h in b)
    [r] = out1
    assert r["jaccard_est"] == pytest.approx(matches / len(union_k))
    est_union = 63 * float(KMV_SPACE) / union_k[-1]
    assert r["est_distinct_union"] == pytest.approx(est_union)
    assert r["est_intersection"] == pytest.approx(
        matches / len(union_k) * est_union
    )
    # true J = 200/800 = 0.25 with k=64 → sigma ≈ 0.05; sanity band
    assert 0.05 < r["jaccard_est"] < 0.5


def test_merge_batch_equals_bottom_k_of_union():
    s = [_h(i) for i in range(0, 50, 2)]
    batch = [_h(i) for i in range(1, 50, 2)] + s[:5]  # overlap + new
    merged = kmv_merge_batch(sorted(set(s))[:16], batch, k=16)
    assert merged == sorted(set(s) | set(batch))[:16][: len(merged)]
    assert len(merged) == 16


def test_stream_sketch_across_batches_equals_batch(spark, tmp_path):
    from flink_psl_spark.llm.sketches import (
        kmv_hash,
        kmv_sketch,
        stream_kmv_sketch,
    )
    from flink_psl_spark.operators import deduplicate
    from flink_psl_spark.streaming import (
        run_to_memory_table,
        stream_from_parquet,
    )

    rows = [("a", f"e{i}") for i in range(300)] + [
        ("b", f"e{i}") for i in range(150, 450)
    ]
    df = spark.createDataFrame(rows, "g string, e string")
    src = str(tmp_path / "src")
    # two files → two micro-batches with maxFilesPerTrigger=1, so the
    # state-merge (state.exists) path is exercised
    df.where(F.col("e") < "e3").coalesce(1).write.parquet(src)
    df.where(~(F.col("e") < "e3")).coalesce(1).write.mode("append").parquet(
        src
    )
    stream = stream_from_parquet(spark, src, max_files_per_trigger=1)
    hashed = stream.select("g", kmv_hash(F.col("e")).alias("h"))
    updates = stream_kmv_sketch(hashed, "g", "h", k=32)
    mem = run_to_memory_table(updates, output_mode="update")
    got = {
        (r["group"], r["rank"]): r["h"]
        for r in deduplicate(
            mem.withColumn("__seq", F.monotonically_increasing_id()),
            ["group", "rank"], ["__seq"], keep="last",
        ).collect()
    }
    want = {
        (r["group"], r["rank"]): r["h"]
        for r in kmv_sketch(df, "e", "g", k=32).collect()
    }
    assert got == want


def test_space_saving_eviction_guarantees(spark, tmp_path):
    from flink_psl_spark.llm.sketches import stream_space_saving
    from flink_psl_spark.operators import deduplicate
    from flink_psl_spark.streaming import (
        run_to_memory_table,
        stream_from_parquet,
    )

    # zipf-ish: item_i appears (40 - i) times → forces evictions at m=8
    rows = [(f"w{i:02d}",) for i in range(30) for _ in range(40 - i)]
    df = spark.createDataFrame(rows, "item string")
    true = {f"w{i:02d}": 40 - i for i in range(30)}
    src = str(tmp_path / "ss")
    df.coalesce(1).write.parquet(src)
    stream = stream_from_parquet(spark, src)
    updates = stream_space_saving(stream, "item", m=8, n_shards=1)
    mem = run_to_memory_table(updates, output_mode="update")
    roster = {
        r["item"]: (r["cnt"], r["err"])
        for r in deduplicate(
            mem.withColumn("__seq", F.monotonically_increasing_id()),
            ["shard", "rank"], ["__seq"], keep="last",
        ).collect()
    }
    assert len(roster) == 8  # capacity respected
    min_cnt = min(c for c, _ in roster.values())
    for item, (cnt, err) in roster.items():
        assert cnt >= true[item]          # one-sided overestimate
        assert cnt - err <= true[item]    # error bound is honest
    # superset guarantee: anything truly above the final min counter is in
    for item, n in true.items():
        if n > min_cnt:
            assert item in roster


def test_overlap_matrix_matches_pairwise_overlap(spark):
    from flink_psl_spark.llm.sketches import kmv_overlap, overlap_matrix

    rows = (
        [("a", f"e{i}") for i in range(300)]
        + [("b", f"e{i}") for i in range(200, 500)]
        + [("c", f"e{i}") for i in range(450, 700)]
    )
    df = spark.createDataFrame(rows, "g string, e string")
    mat = {
        (r["group_a"], r["group_b"]): (
            r["jaccard_est"], r["est_intersection"]
        )
        for r in overlap_matrix(df, "e", "g", k=64).collect()
    }
    assert set(mat) == {("a", "b"), ("a", "c"), ("b", "c")}
    for ga, gb in mat:
        [want] = kmv_overlap(df, "e", "g", ga, gb, k=64).collect()
        assert mat[(ga, gb)][0] == pytest.approx(want["jaccard_est"])
        assert mat[(ga, gb)][1] == pytest.approx(
            want["est_intersection"]
        )
    # disjoint-ish pair has lower similarity than overlapping ones
    assert mat[("a", "c")][0] <= mat[("a", "b")][0]


def test_sketches_degenerate_inputs(spark, tmp_path):
    """Degenerate-input sweep, sketch leg (r12): empty corpora, NULL
    elements, NULL groups, and missing overlap groups must never kill a
    task. Contracts: a NULL element is not an element (COUNT DISTINCT
    semantics — pre-r12 its NULL md5 hash reached the numpy kernel as
    NaN and to_numpy(int64) crashed the task); a NULL group forms a
    group like GROUP BY; overlap against an absent group is empty, not
    an error."""
    from flink_psl_spark.llm.sketches import stream_kmv_sketch

    # empty input → empty sketch / empty estimates
    empty = spark.createDataFrame([], "g string, e string")
    assert kmv_sketch(empty, "e", "g", k=16).count() == 0
    assert kmv_distinct_estimates(
        kmv_sketch(empty, "e", "g", k=16), k=16
    ).count() == 0

    # NULL elements ignored, NULL group kept as its own group
    rows = [("a", "x"), ("a", None), (None, "x"), (None, None), ("a", "y")]
    df = spark.createDataFrame(rows, "g string, e string")
    sk = kmv_sketch(df, "e", "g", k=16)
    got = {(r["group"], r["rank"]): r["h"] for r in sk.collect()}
    assert [got[("a", i + 1)] for i in range(2)] == _model_sketch(
        ["x", "y"], 16
    )
    assert [got[(None, 1)]] == _model_sketch(["x"], 16)
    assert len(got) == 3

    # singleton sketch estimates exactly
    [r] = kmv_distinct_estimates(
        kmv_sketch(
            spark.createDataFrame([("a", "only")], "g string, e string"),
            "e", "g", k=16,
        ), k=16,
    ).collect()
    assert r["est_distinct"] == 1.0

    # overlap where one / both groups are absent → empty result, no crash
    one = spark.createDataFrame([("a", f"e{i}") for i in range(5)],
                                "g string, e string")
    assert kmv_overlap(one, "e", "g", "a", "missing", k=16).count() == 0
    assert kmv_overlap(one, "e", "g", "nope", "missing", k=16).count() == 0

    # streaming KMV over a batch containing NULL hashes (pre-r12:
    # int(NaN) ValueError inside the state fn)
    from flink_psl_spark.llm.sketches import kmv_hash
    from flink_psl_spark.streaming import (
        run_to_memory_table,
        stream_from_parquet,
    )

    src = str(tmp_path / "null_src")
    spark.createDataFrame(
        [("a", "x"), ("a", None), (None, "z")], "g string, e string"
    ).coalesce(1).write.parquet(src)
    stream = stream_from_parquet(spark, src)
    hashed = stream.select("g", kmv_hash(F.col("e")).alias("h"))
    mem = run_to_memory_table(
        stream_kmv_sketch(hashed, "g", "h", k=8), output_mode="update"
    )
    got = {(r["group"], r["rank"]): r["h"] for r in mem.collect()}
    assert [got[("a", 1)]] == _model_sketch(["x"], 8)
    assert [got[(None, 1)]] == _model_sketch(["z"], 8)
