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


def test_naive_bayes_langid_known_model(spark):
    import math

    from flink_psl_spark.llm import naive_bayes_langid

    # en: "the cat", "the dog"; fr: "le chat" — plus an ambiguous doc
    # whose shared token must fall to the prior-heavier language
    df = spark.createDataFrame(
        [(0, "en", "the cat"), (1, "en", "the dog"), (2, "fr", "le chat"),
         (3, "fr", "le cat")],
        "doc_id int, lang string, text string",
    )
    rows = {r["doc_id"]: r for r in naive_bayes_langid(df).collect()}
    assert rows[0]["pred"] == "en" and rows[0]["correct"]
    assert rows[2]["pred"] == "fr" and rows[2]["correct"]
    # replay doc 3 ("le cat") by hand: V=6 distinct tokens
    def q(p):
        return round(math.log(p) * 1e6)

    # en: ct=4; c(le)=0, c(cat)=1; prior 2/4
    s_en = q(1 / (4 + 6)) + q(2 / (4 + 6)) + q(2 / 4)
    # fr: ct=4; c(le)=2, c(cat)=1; prior 2/4
    s_fr = q(3 / (4 + 6)) + q(2 / (4 + 6)) + q(2 / 4)
    assert s_fr > s_en and rows[3]["pred"] == "fr"


def test_naive_bayes_langid_separable_corpus(spark):
    from pyspark.sql import functions as F

    from flink_psl_spark.llm import naive_bayes_langid

    # disjoint vocabularies -> self-scored accuracy must be perfect
    # (the fixture corpus's lang labels are independent of its synthetic
    # text, so accuracy there is prior-dominated by construction)
    rows = []
    for i in range(40):
        rows.append((i, "en", f"the quick dog w{i % 7} runs"))
        rows.append((100 + i, "fr", f"le chien rapide m{i % 7} court"))
    df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    out = naive_bayes_langid(df)
    acc = out.agg(F.avg(F.col("correct").cast("double"))).collect()[0][0]
    assert acc == 1.0
