"""Byte-pair-encoding tokenizer training and encoding (beyond-reference,
SURVEY §7 M5 family — the tokenizer side of a training-data pipeline).

Classic corpus-level BPE (the published algorithm: start from characters,
repeatedly merge the most frequent adjacent symbol pair): training runs as
a driver-coordinated iteration over the WORD-COUNT table — the one
corpus-sized pass is the initial word count (one hash aggregation); every
merge round then touches only the vocabulary (|distinct words| rows,
orders of magnitude smaller than the corpus at 100 TB), mirroring the
driver-loop shape of the graph algorithms. Encoding is a row-local
Arrow-batched map — embarrassingly parallel at any scale.

Determinism: merge selection orders by (pair count DESC, left ASC,
right ASC), so training reproduces exactly across runs, partitionings,
and engines; ``reference_bpe_merges`` is the direct single-process
transcription of the algorithm used to cross-check the distributed path
in tests and the agreement query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_psl_spark.llm.text import tokenize
from flink_psl_spark.materialize import materialize


def word_counts(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) — the corpus statistic BPE trains on. One explode +
    one hash aggregation; the output is vocabulary-sized."""
    return (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _chars_expr(col: str):
    return F.expr(
        f"transform(sequence(1, length({col})), i -> substring({col}, i, 1))"
    )


def _merge_udf(a: str, b: str):
    """Arrow-batched merge application: replace every non-overlapping
    left-to-right (a, b) adjacency with the merged symbol a+b."""
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    ab = a + b

    def apply(s):
        out = []
        for syms in s:
            res, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    res.append(ab)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return pandas_udf(apply, T.ArrayType(T.StringType()))


def bpe_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 12,
    min_pair_count: int = 2,
    vocab_limit: int | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list [(left, right), ...] — a tokenizer artifact bounded by
    ``n_merges`` (an index parameter, like IVF centroids), NOT data-sized.

    Per round: adjacent-pair explode over the vocabulary table (row-local),
    one weighted hash aggregation, a 1-row argmax collect, then a row-local
    Arrow-batched merge application. Lineage is cut with localCheckpoint
    every few rounds (the graph-loop pattern, operators/graph.py).

    ``vocab_limit``: optionally train on the top-``vocab_limit`` words by
    (count desc, word asc) — a distributed TakeOrdered, deterministic. The
    standard cap for web-scale corpora (rare-word tails don't move merge
    ranks), and what lets a verification replay the same table in bounded
    memory.
    """
    wc = word_counts(docs, text_col=text_col)
    if vocab_limit is not None:
        wc = wc.orderBy(F.desc("cnt"), F.asc("word")).limit(vocab_limit)
    state = wc.select("cnt", _chars_expr("word").alias("syms"))
    state = state.transform(materialize)
    merges: list[tuple[str, str]] = []
    pair_expr = F.expr(
        "transform(sequence(1, greatest(size(syms), 2) - 1), "
        "i -> struct(syms[i-1] as a, syms[i] as b))"
    )
    for round_no in range(n_merges):
        best = (
            state.where(F.size("syms") >= 2)
            .select("cnt", F.explode(pair_expr).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["total"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        state = state.select("cnt", _merge_udf(a, b)("syms").alias("syms"))
        if (round_no + 1) % 4 == 0:
            state = state.transform(materialize)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a learned merge list: per word, start from
    characters and apply every merge in training order (the standard BPE
    encode). One Arrow-batched UDF over the token array — row-local, no
    shuffle. Returns (id, tokens array<string>, n_tokens)."""
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    merge_list = [(a, b, a + b) for a, b in merges]

    def encode(s):
        out = []
        for words in s:
            toks: list[str] = []
            if words is None:
                words = []
            for w in words:
                syms = list(w)
                for a, b, ab in merge_list:
                    res, i, n = [], 0, len(syms)
                    while i < n:
                        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                            res.append(ab)
                            i += 2
                        else:
                            res.append(syms[i])
                            i += 1
                    syms = res
                toks.extend(syms)
            out.append(toks)
        return pd.Series(out)

    enc = pandas_udf(encode, T.ArrayType(T.StringType()))
    return docs.select(
        F.col(id_col),
        enc(tokenize(F.col(text_col))).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens").cast("bigint"))


def reference_bpe_merges(
    counts: dict, n_merges: int, *, min_pair_count: int = 2
) -> list[tuple[str, str]]:
    """Single-process reference transcription of the BPE training loop
    (same (count DESC, left ASC, right ASC) tiebreak) — the ground truth
    the distributed path is checked against in tests and the agreement
    query. ``counts`` maps word -> corpus count."""
    vocab = {w: list(w) for w in counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict = {}
        for w, syms in vocab.items():
            c = counts[w]
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] = (
                    pair_counts.get((syms[i], syms[i + 1]), 0) + c
                )
        if not pair_counts:
            break
        (a, b), total = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if total < min_pair_count:
            break
        merges.append((a, b))
        ab = a + b
        for w, syms in vocab.items():
            res, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    res.append(ab)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            vocab[w] = res
    return merges
