"""WordPiece tokenizer: distributed-vs-reference agreement, likelihood
(not count) pair selection, greedy longest-match encoding invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_psl_spark.llm.bpe import word_counts
from flink_psl_spark.llm.wordpiece import (
    reference_wordpiece_train,
    wordpiece_alphabet,
    wordpiece_encode,
    wordpiece_train,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, source string, text string")


def test_score_beats_count(spark):
    # (a,##b)=10 (a,##z)=20 (z... ) pairs: counts favour 'az'/'zb' (20)
    # but the likelihood score favours the rare-symbols pair 'cd':
    # score(cd) = 3e12/(3*3) >> score(az) = 20e12/(30*40)
    rows = (
        [(i, "s", "ab") for i in range(10)]
        + [(100 + i, "s", "az") for i in range(20)]
        + [(200 + i, "s", "zb") for i in range(20)]
        + [(300 + i, "s", "cd") for i in range(3)]
    )
    df = _docs(spark, rows)
    got = wordpiece_train(df, n_merges=1)
    assert got == ["cd"]
    wc = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    assert reference_wordpiece_train(wc, 1) == ["cd"]


def test_distributed_matches_reference(spark, t):
    docs = t["documents"]
    V = 20
    got = wordpiece_train(docs, n_merges=12, vocab_limit=V)
    wc = {
        r["word"]: r["cnt"]
        for r in word_counts(docs)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(V)
        .collect()
    }
    want = reference_wordpiece_train(wc, 12)
    assert got == want
    assert len(got) > 0


def test_encode_greedy_longest_match(spark):
    df = _docs(spark, [(0, "s", "abc ab a qx toolong")])
    vocab = ["a", "##b", "##c", "##bc", "ab", "t", "##o", "##l", "##n", "##g"]
    out = wordpiece_encode(df, vocab, max_word_chars=5).collect()[0]
    # 'abc' -> longest-first: 'ab' wins over 'a', then '##c'
    # 'qx' has no vocab prefix -> whole-word UNK
    # 'toolong' exceeds max_word_chars -> UNK without scanning
    assert out["pieces"] == ["ab", "##c", "ab", "a", "[UNK]", "[UNK]"]
    assert out["n_pieces"] == 6 and out["n_unk"] == 2


def test_encode_roundtrip_with_corpus_alphabet(spark, t):
    docs = t["documents"].where(F.col("doc_id") < 50)
    merges = wordpiece_train(t["documents"], n_merges=8, vocab_limit=20)
    vocab = wordpiece_alphabet(t["documents"]) + merges
    enc = wordpiece_encode(docs, vocab)
    joined = enc.join(docs, "doc_id").select(
        (
            F.expr(
                "concat_ws('', transform(pieces, "
                "p -> CASE WHEN substring(p, 1, 2) = '##' "
                "THEN substring(p, 3) ELSE p END))"
            )
            == F.concat_ws("", F.split(F.trim("text"), r"\s+"))
        ).alias("content_ok"),
        (F.col("n_unk") == 0).alias("no_unk"),
        (
            F.col("n_pieces")
            <= F.length(F.regexp_replace("text", r"\s", ""))
        ).alias("compressed"),
    )
    bad = joined.where(
        ~F.col("content_ok") | ~F.col("no_unk") | ~F.col("compressed")
    ).count()
    assert bad == 0
