"""Trained logreg quality classifier: exact parity with a pure-python
replica of the fixed-point GD trace, plus learning sanity."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from flink_psl_spark.llm.classifier import (
    MICRO,
    hashed_feature_indices,
    score_logreg_hashed,
    train_logreg_hashed,
)


def _round_away(x: float) -> int:
    return int(abs(x) + 0.5) * (1 if x >= 0 else -1)


def _idx(text: str, dim: int) -> list[int]:
    s = {
        int(hashlib.md5(w.encode()).hexdigest()[:12], 16) % dim
        for w in text.split()
    }
    return sorted(s | {dim})


def _model_train(rows, dim, iters, lr):
    feats = [(_idx(t, dim), y) for t, y in rows]
    n = len(feats)
    w = [0] * (dim + 1)
    for _ in range(iters):
        grad = defaultdict(int)
        for idx, y in feats:
            z = sum(w[i] for i in idx) / MICRO
            p = 0.5 + (z / 2.0) / (1.0 + abs(z))
            q = _round_away((p - y) * MICRO)
            for i in idx:
                grad[i] += q
        for i, g in grad.items():
            w[i] -= _round_away(lr * g / n)
    return w


ROWS = [
    ("good clean prose with varied words", 1.0),
    ("another well formed sentence here", 1.0),
    ("nice readable text sample indeed", 1.0),
    ("spam spam spam spam", 0.0),
    ("buy buy buy now now", 0.0),
    ("zzz zzz zzz zzz zzz", 0.0),
] * 3


def test_training_trace_matches_python_model(spark):
    df = spark.createDataFrame(ROWS, "text string, y double")
    w_spark = train_logreg_hashed(
        df, "text", "y", dim=32, iters=3, lr=4.0
    )
    w_model = _model_train(ROWS, 32, 3, 4.0)
    assert w_spark == w_model


def test_partition_invariance(spark):
    df = spark.createDataFrame(ROWS, "text string, y double")
    w1 = train_logreg_hashed(
        df.repartition(1), "text", "y", dim=32, iters=2, lr=4.0
    )
    w7 = train_logreg_hashed(
        df.repartition(7), "text", "y", dim=32, iters=2, lr=4.0
    )
    assert w1 == w7


def test_model_learns_separable_labels(spark):
    df = spark.createDataFrame(ROWS, "text string, y double")
    w = train_logreg_hashed(df, "text", "y", dim=64, iters=8, lr=8.0)
    scored = score_logreg_hashed(df, "text", w, dim=64)
    rows = scored.select("y", "prob").collect()
    pos = [r["prob"] for r in rows if r["y"] == 1.0]
    neg = [r["prob"] for r in rows if r["y"] == 0.0]
    assert min(pos) > max(neg)  # separable task → clean margin


def test_bias_index_always_present(spark):
    df = spark.createDataFrame([("",), ("a b",)], "text string")
    out = df.select(
        hashed_feature_indices("text", dim=16).alias("i")
    ).collect()
    assert all(r["i"][-1] == 16 for r in out)
    assert out[0]["i"] == [16]  # empty text → bias only
