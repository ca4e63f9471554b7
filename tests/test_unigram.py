"""Unigram-LM tokenizer: distributed-vs-reference agreement, encoding
invariants, Viterbi behavior."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_psl_spark.llm.bpe import word_counts
from flink_psl_spark.llm.unigram import (
    _viterbi,
    reference_unigram_train,
    unigram_encode,
    unigram_train,
)


def test_distributed_matches_reference(spark, t):
    docs = t["documents"]
    V = 20
    got = unigram_train(
        docs, vocab_size=24, iters=3, max_piece_len=4, seed_size=60,
        vocab_limit=V,
    )
    wc = {
        r["word"]: r["cnt"]
        for r in word_counts(docs)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(V)
        .collect()
    }
    want = reference_unigram_train(
        wc, vocab_size=24, iters=3, max_piece_len=4, seed_size=60
    )
    assert got == want  # pieces AND logprobs, exactly


def test_viterbi_prefers_longer_piece_on_tie():
    lp = {"ab": math.log(0.25), "a": math.log(0.5), "b": math.log(0.5)}
    # score("ab") == score("a")+score("b") → tie → longer piece wins
    assert _viterbi("ab", lp, 4) == ["ab"]


def test_viterbi_picks_higher_likelihood():
    lp = {"ab": math.log(0.1), "a": math.log(0.6), "b": math.log(0.6)}
    assert _viterbi("ab", lp, 4) == ["a", "b"]


def test_encode_reconstructs_and_compresses(spark, t):
    docs = t["documents"].limit(50)
    vocab = unigram_train(docs, vocab_size=24, iters=2, vocab_limit=20)
    enc = unigram_encode(docs, vocab)
    joined = enc.join(docs, "doc_id").select(
        F.concat_ws("", "pieces").alias("glued"),
        F.regexp_replace(
            F.concat_ws("", F.split(F.trim("text"), r"\s+")), r"\s", ""
        ).alias("want"),
        "n_pieces",
        F.length(F.regexp_replace("text", r"\s", "")).alias("n_chars"),
    )
    bad = joined.where(
        (F.col("glued") != F.col("want"))
        | (F.col("n_pieces") > F.col("n_chars"))
    ).count()
    assert bad == 0


def test_encode_handles_unseen_chars(spark):
    df = spark.createDataFrame([(1, "zzz qqq")], "doc_id long, text string")
    vocab = [("a", math.log(0.5)), ("b", math.log(0.5))]
    [r] = unigram_encode(df, vocab).collect()
    assert "".join(r["pieces"]) == "zzzqqq"  # single-char passthrough


def test_empty_corpus_trains_empty_vocab(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert unigram_train(df, vocab_size=8, iters=2) == []
