"""Trained quality classifier: distributed logistic regression on hashed
bag-of-words features.

The model-based filtering step of modern corpus curation (CCNet's
fastText LM filter, DCLM's quality classifier) trains a linear model on
labeled documents and scores the whole corpus with it. This module
implements the training loop Spark-first:

* featurization is expression-only (portable 48-bit md5 token hash mod
  ``dim``, distinct indices + a bias index per document) — whole-stage
  codegen, no Python;
* one full-batch gradient-descent iteration = ONE corpus scan: per-doc
  margin z = Σ w[idx] via ``F.aggregate`` over the index array against a
  broadcast weight literal, per-doc residual quantized to integer
  micro-units, then an explode + map-side-combined integer SUM per
  feature index — the exchange carries at most ``dim+1`` rows per
  partition and the driver collects exactly ``dim+1`` totals
  (parameter-sized, like importance_resample's ratio table);
* weights live in INTEGER micro-units (1e-6): every cross-partition sum
  is an integer sum (order-independent), so the entire K-iteration
  training trace is a deterministic function of the dataset — the DuckDB
  oracle replays training bit-for-bit by unrolling the same K updates in
  SQL.

At 100 TB the featurized corpus is persisted once and scanned K times;
nothing data-sized ever reaches the driver.

Reference parity: the reference has no trainer — Flink pipelines call out
to an external model for this step (flink-ml is a separate project); here
the canonical curation classifier is a first-class, oracle-checked
operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_psl_spark.llm.text import tokenize

MICRO = 1_000_000  # fixed-point scale for weights / residuals


def hashed_feature_indices(
    text: Column | str, *, dim: int = 64
) -> Column:
    """Sorted distinct hashed token indices (0..dim-1) plus the bias
    index ``dim`` — array<bigint>, expression-only, engine-portable
    (48-bit md5 prefix mod dim, same value in DuckDB)."""
    c = F.col(text) if isinstance(text, str) else text
    idx = F.transform(
        tokenize(c),
        lambda w: F.conv(F.substring(F.md5(w), 1, 12), 16, 10).cast(
            "long"
        )
        % dim,
    )
    return F.array_sort(
        F.array_union(F.array_distinct(idx), F.array(F.lit(dim).cast("long")))
    )


def _margin(idx_col: Column, w_int: list[int]) -> Column:
    """z in micro-units: integer Σ w_int[idx] over the index array."""
    w_lit = F.lit(w_int).cast("array<bigint>")
    return F.aggregate(
        idx_col,
        F.lit(0).cast("bigint"),
        lambda acc, i: acc + F.element_at(w_lit, (i + 1).cast("int")),
    )


def _prob(z_int: Column, kind: str = "fast") -> Column:
    """Squashing function over the micro-unit margin.

    ``fast`` (default) is the algebraic fast sigmoid
    0.5 + (z/2)/(1+|z|): same shape/monotonicity as the logistic, but
    built from +,*,/,abs only — every op is IEEE-exactly-rounded, so
    Spark and DuckDB produce BIT-IDENTICAL probabilities (libm EXP is
    not correctly-rounded and may differ across engines by an ulp,
    which a fixed-point training trace would amplify). ``logistic``
    gives the classic 1/(1+e^-z) for scoring-only use.
    """
    z = z_int.cast("double") / F.lit(float(MICRO))
    if kind == "logistic":
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return F.lit(0.5) + (z / F.lit(2.0)) / (F.lit(1.0) + F.abs(z))


def train_logreg_hashed(
    df: DataFrame,
    text_col: str,
    label_col: str,
    *,
    dim: int = 64,
    iters: int = 3,
    lr: float = 4.0,
    feats: DataFrame | None = None,
) -> list[int]:
    """Full-batch GD, ``iters`` corpus scans; returns the weight vector
    in integer micro-units (length dim+1, last = bias).

    Update rule (exactly what the SQL oracle unrolls): per doc
    q = ROUND((sigmoid(z) - y) * 1e6); per index G = Σ q (integer);
    w -= ROUND(lr * G / n). ROUND is half-away-from-zero in both
    engines, so the trace is reproducible.

    ``feats``: an already-materialized featurized corpus carrying at
    least ``__idx`` (hashed_feature_indices of ``text_col``, hashed at
    THIS SAME ``dim`` — a table hashed at a different dim trains wrong
    weights or fails inside the gradient loop) and ``__y`` (the double
    label). When ``feats`` is given, ``df``/``text_col``/``label_col``
    are ignored. When the caller also needs to SCORE the corpus,
    featurizing once and sharing the table removes a second full
    tokenize+hash pass over the data (one corpus featurization instead
    of two); the caller owns its lifecycle (persist/checkpoint).
    """
    if feats is None:
        feats = df.select(
            hashed_feature_indices(text_col, dim=dim).alias("__idx"),
            F.col(label_col).cast("double").alias("__y"),
        ).persist()
        owns_feats = True
    else:
        missing = {"__idx", "__y"} - set(feats.columns)
        if missing:
            raise ValueError(
                "train_logreg_hashed: feats= must carry columns __idx "
                f"and __y (missing {sorted(missing)}); build it with "
                f"hashed_feature_indices(text_col, dim={dim})"
            )
        owns_feats = False
    n = feats.count()
    w = [0] * (dim + 1)
    for _ in range(iters):
        q = feats.select(
            "__idx",
            F.round(
                (_prob(_margin(F.col("__idx"), w)) - F.col("__y"))
                * F.lit(float(MICRO)),
                0,
            )
            .cast("bigint")
            .alias("__q"),
        )
        grad = (
            q.select(F.explode("__idx").alias("__i"), "__q")
            .groupBy("__i")
            .agg(F.sum("__q").alias("__g"))
            .collect()  # exactly dim+1 rows — parameter-sized
        )
        for r in grad:
            g = r["__g"]
            # ROUND half away from zero, matching SQL ROUND()
            delta = lr * g / n
            step = int(abs(delta) + 0.5) * (1 if delta >= 0 else -1)
            w[r["__i"]] -= step
    if owns_feats:
        feats.unpersist()
    return w


def score_logreg_hashed(
    df: DataFrame,
    text_col: str,
    w_int: list[int],
    *,
    dim: int = 64,
    prob_col: str = "prob",
) -> DataFrame:
    """Score every document with the trained model — expression-only,
    no join (the model rides along as a broadcast literal)."""
    idx = hashed_feature_indices(text_col, dim=dim)
    return df.withColumn(prob_col, _prob(_margin(idx, w_int)))


def naive_bayes_langid(
    docs: DataFrame,
    *,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial Naive Bayes language identification, trained and
    scored in-engine on the labeled corpus itself — the counting
    classifier whose ENTIRE train+score path is exact relational algebra
    (unlike the gradient-descent logreg above, whose oracle must replay
    the GD trace): priors and add-1-smoothed per-language token
    likelihoods are hash aggregations, scoring is one token->model join,
    prediction is a per-document rank-1 window over the |labels| rows.

    Determinism: per-token log-likelihoods and the log-prior quantize to
    1e-6 integers BEFORE the sum (the bigram-LM discipline), so scores
    are exact integers; argmax ties break to the lexicographically
    smallest label.

    Scale shape: the model is vocabulary x |labels| rows (hash aggs); the
    scoring join shuffles on the token key; the label cross join is a
    broadcast of |labels| rows; the vocabulary size is the one scalar
    driver value (the bigram-LM pattern). No UDFs anywhere.

    Output: (id, pred, actual, correct) — documents with zero tokens are
    not scored.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col),
        F.col(label_col).alias("__actual"),
        F.explode(tokenize(F.col(text_col))).alias("w"),
    )
    langs = docs.groupBy(F.col(label_col).alias("__l")).agg(
        F.count("*").alias("__nd")
    )
    d_total = float(docs.count())
    cw = toks.groupBy(
        F.col("__actual").alias("__l"), "w"
    ).agg(F.count("*").alias("__c"))
    cl = toks.groupBy(F.col("__actual").alias("__l")).agg(
        F.count("*").alias("__ct")
    )
    vocab = float(toks.select("w").distinct().count())

    scored = (
        toks.crossJoin(F.broadcast(langs.select("__l")))
        .join(cw, on=["__l", "w"], how="left")
        .join(F.broadcast(cl), on="__l")
        .select(
            id_col,
            "__l",
            F.round(
                F.log(
                    (F.coalesce("__c", F.lit(0)) + F.lit(1.0))
                    / (F.col("__ct") + F.lit(1.0) * F.lit(vocab))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("__q"),
        )
        .groupBy(id_col, "__l")
        .agg(F.sum("__q").alias("__lik"))
        .join(F.broadcast(langs), on="__l")
        .select(
            id_col,
            "__l",
            (
                F.col("__lik")
                + F.round(
                    F.log(F.col("__nd") * F.lit(1.0) / F.lit(d_total)) * 1e6
                ).cast("bigint")
            ).alias("__score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("__score"), F.asc("__l")
    )
    pred = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, F.col("__l").alias("pred"))
    )
    return pred.join(
        docs.select(id_col, F.col(label_col).alias("actual")), on=id_col
    ).select(
        id_col, "pred", "actual", (F.col("pred") == F.col("actual")).alias("correct")
    )
