"""Repetition filtering, chunking, and sequence packing (llm.repetition /
llm.chunking) — hand-computed expectations on synthetic docs plus
brute-force replicas on the fixture corpus."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


# ---------------------------------------------------------------------------
# repetition signals
# ---------------------------------------------------------------------------


def test_duplicate_token_fraction_known_values(spark):
    from flink_psl_spark.llm.repetition import duplicate_token_fraction

    df = _docs(
        spark,
        [
            (0, "s", "a b c d"),        # no dups -> 0
            (1, "s", "a a a a"),        # 3 of 4 are repeats -> 0.75
            (2, "s", "x y x"),          # 1 of 3 -> 1/3
            (3, "s", "   "),            # blank -> 0
        ],
    )
    got = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id", duplicate_token_fraction("text").alias("f")
        ).collect()
    }
    assert got[0] == 0.0
    assert got[1] == 0.75
    assert abs(got[2] - 1 / 3) < 1e-12
    assert got[3] == 0.0


def test_duplicate_segment_fractions(spark):
    from flink_psl_spark.llm.repetition import (
        duplicate_segment_char_fraction,
        duplicate_segment_fraction,
    )

    # 4 lines, one exact repeat ("hello world"), one blank line dropped
    text = "hello world\nother line\n\nhello world"
    df = _docs(spark, [(0, "s", text)])
    row = df.select(
        duplicate_segment_fraction("text").alias("f"),
        duplicate_segment_char_fraction("text").alias("cf"),
    ).first()
    assert abs(row["f"] - 1 / 3) < 1e-12  # 3 non-empty segments, 1 repeat
    # chars: hello world(11)*2 + other line(10) = 32 total, 11 duplicated
    assert abs(row["cf"] - 11 / 32) < 1e-12


def test_ngram_repetition_stats_known_values(spark):
    from flink_psl_spark.llm.repetition import ngram_repetition_stats

    # doc 0: "a b a b a" -> 2-grams: [a b, b a, a b, b a] -> top cnt 2, len 3
    #   top = 2*3 / (4*3) = 0.5 ; dup = (2*3 + 2*3)/12 = 1.0
    # doc 1: all distinct 2-grams -> top = 3/(3*3)=1/3, dup = 0
    # doc 2: single token -> no 2-grams -> 0/0 -> 0.0
    df = _docs(
        spark, [(0, "s", "a b a b a"), (1, "s", "x y z w"), (2, "s", "q")]
    )
    got = {
        r["doc_id"]: (r["top_ngram_char_frac"], r["dup_ngram_char_frac"])
        for r in ngram_repetition_stats(df, n=2).collect()
    }
    assert got[0] == (0.5, 1.0)
    assert got[1] == (round(1 / 3, 6), 0.0)
    assert got[2] == (0.0, 0.0)


def test_repetition_filter_brute_force(spark, t):
    """repetition_filter vs a pure-python replica on 80 fixture docs."""
    from flink_psl_spark.llm.repetition import repetition_filter

    docs = t["documents"].where(F.col("doc_id") < 80)
    got = {r["doc_id"]: r for r in repetition_filter(docs).collect()}
    rows = docs.select("doc_id", "text").collect()
    assert len(got) == len(rows)

    def stats(words, n):
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        if not grams:
            return 0.0, 0.0
        cnt = {}
        for g in grams:
            cnt[g] = cnt.get(g, 0) + 1
        tot = sum(c * len(g) for g, c in cnt.items())
        top = max(c * len(g) for g, c in cnt.items())
        dup = sum(c * len(g) for g, c in cnt.items() if c >= 2)
        return top / tot, dup / tot

    for r in rows:
        words = r["text"].split()
        top2, _ = stats(words, 2)
        _, dup5 = stats(words, 5)
        g = got[r["doc_id"]]
        assert g["top_2gram_char_frac"] == round(top2, 6)
        assert g["dup_5gram_char_frac"] == round(dup5, 6)
        assert g["keep"] == (top2 <= 0.20 and dup5 <= 0.15)


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def test_chunk_documents_shapes_and_overlap(spark):
    from flink_psl_spark.llm.chunking import chunk_documents

    words = [f"w{i}" for i in range(10)]
    df = _docs(spark, [(0, "s", " ".join(words)), (1, "s", "")])
    out = chunk_documents(df, chunk_tokens=4, stride=3).collect()
    by_id = sorted(
        ((r["chunk_id"], r["start_token"], r["n_tokens"], r["chunk_text"]) for r in out)
    )
    # starts at 1,4,7,10 -> chunks of 4,4,4,1 tokens
    assert by_id == [
        (0, 1, 4, "w0 w1 w2 w3"),
        (1, 4, 4, "w3 w4 w5 w6"),
        (2, 7, 4, "w6 w7 w8 w9"),
        (3, 10, 1, "w9"),
    ]
    assert all(r["doc_id"] == 0 for r in out)  # blank doc 1 emits nothing


def test_chunk_documents_no_overlap_reconstructs(spark, t):
    """stride == chunk_tokens partitions the doc: concatenation round-trips."""
    from flink_psl_spark.llm.chunking import chunk_documents

    docs = t["documents"].where(F.col("doc_id") < 40)
    out = chunk_documents(docs, chunk_tokens=16, stride=16)
    rebuilt = (
        out.groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "chunk_text"))
                ).chunk_text,
                " ",
            ).alias("rebuilt")
        )
    )
    joined = docs.select(
        "doc_id", F.array_join(F.split(F.trim("text"), r"\s+"), " ").alias("norm")
    ).join(rebuilt, "doc_id")
    assert joined.where(F.col("norm") != F.col("rebuilt")).count() == 0


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def test_pack_sequences_brute_force(spark):
    from flink_psl_spark.llm.chunking import pack_sequences

    rows = [
        (i, f"shard{i % 2}", " ".join(["tok"] * n))
        for i, n in enumerate([100, 300, 250, 0, 512, 700, 1, 511])
    ]
    out = {
        r["doc_id"]: r
        for r in pack_sequences(
            _docs(spark, rows), max_len=256, partition_col="source"
        ).collect()
    }
    # replicate: per shard, docs in doc_id order, running token offset
    by_shard: dict[str, int] = {}
    for doc_id, shard, text in rows:
        n = len(text.split())
        cum = by_shard.get(shard, 0)
        first = cum // 256
        last = (cum + n - 1) // 256 if n > 0 else first
        r = out[doc_id]
        assert r["shard"] == shard
        assert r["n_tokens"] == n
        assert r["first_seq"] == first
        assert r["seq_offset"] == cum % 256
        assert r["seqs_spanned"] == last - first + 1
        by_shard[shard] = cum + n


def test_pack_sequences_invariants_on_fixture(spark, t):
    from flink_psl_spark.llm.chunking import pack_sequences

    out = pack_sequences(t["documents"], max_len=512).cache()
    try:
        assert out.where((F.col("seq_offset") < 0) | (F.col("seq_offset") >= 512)).count() == 0
        assert out.where(F.col("seqs_spanned") < 1).count() == 0
        # spanned sequences bounded by ceil((offset + n_tokens)/512)
        bad = out.where(
            F.col("seqs_spanned")
            > F.ceil((F.col("seq_offset") + F.greatest("n_tokens", F.lit(1))) / 512)
        )
        assert bad.count() == 0
        # total sequences per shard ≈ total tokens / 512
        agg = out.groupBy("shard").agg(
            F.sum("n_tokens").alias("tok"), F.max(F.col("first_seq")).alias("mx")
        )
        for r in agg.collect():
            assert r["mx"] <= math.ceil(r["tok"] / 512)
    finally:
        out.unpersist()


def test_degenerate_inputs(spark):
    """Empty frames and NULL text flow through every curation op without
    nulls or errors."""
    from flink_psl_spark.llm.chunking import chunk_documents, pack_sequences
    from flink_psl_spark.llm.repetition import repetition_filter

    empty = spark.createDataFrame([], "doc_id bigint, source string, text string")
    assert chunk_documents(empty).count() == 0
    assert pack_sequences(empty).count() == 0
    assert repetition_filter(empty).count() == 0

    nulls = spark.createDataFrame(
        [(1, "s", None), (2, "s", "a b")],
        "doc_id bigint, source string, text string",
    )
    packed = {r["doc_id"]: r for r in pack_sequences(nulls, max_len=4).collect()}
    assert packed[1]["n_tokens"] == 0 and packed[1]["seqs_spanned"] == 1
    assert packed[2]["n_tokens"] == 2 and packed[2]["seq_offset"] == 0
    assert chunk_documents(nulls).count() > 0  # doc 2 chunks, doc 1 silent
    v = {r["doc_id"]: r["keep"] for r in repetition_filter(nulls).collect()}
    # doc 2 ("a b"): its single 2-gram covers 100% of chars -> correctly dropped
    assert v == {1: True, 2: False}


# ---------------------------------------------------------------------------
# segment-level dedup / deterministic shuffle / temperature mix
# ---------------------------------------------------------------------------


def test_segment_dedup_drops_repeat_segments(spark):
    from flink_psl_spark.llm import segment_dedup

    df = _docs(
        spark,
        [
            (0, "s", "a b c d"),   # first occurrence of both segments
            (1, "s", "a b x y"),   # 'a b' repeats doc 0's segment
            (2, "s", "a b c d"),   # everything repeats -> empty survivor
            (3, "s", "   "),       # blank doc: zero segments
        ],
    )
    out = {
        r["doc_id"]: r
        for r in segment_dedup(df, segment_tokens=2).collect()
    }
    assert (out[0]["n_segments"], out[0]["n_kept"]) == (2, 2)
    assert out[0]["clean_text"] == "a b c d"
    assert (out[1]["n_segments"], out[1]["n_kept"]) == (2, 1)
    assert out[1]["clean_text"] == "x y"
    assert (out[2]["n_segments"], out[2]["n_kept"]) == (2, 0)
    assert out[2]["clean_text"] == ""
    assert (out[3]["n_segments"], out[3]["n_kept"]) == (0, 0)


def test_segment_dedup_keeps_tail_and_order(spark):
    from flink_psl_spark.llm import segment_dedup

    # 5 tokens with segment_tokens=2 -> segments 'a b', 'c d', 'e' (tail)
    df = _docs(spark, [(0, "s", "a b c d e")])
    row = segment_dedup(df, segment_tokens=2).collect()[0]
    assert row["n_segments"] == 3
    assert row["clean_text"] == "a b c d e"  # reassembled in position order


def test_deterministic_shuffle_properties(spark):
    from flink_psl_spark.llm import deterministic_shuffle

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    out = deterministic_shuffle(df, key_cols=["doc_id"], n_shards=4, seed=7)
    rows = out.collect()
    assert len(rows) == 500
    shards = {r["shard"] for r in rows}
    assert shards <= set(range(4)) and len(shards) == 4
    # positions are a 0-based dense sequence within each shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    # deterministic: a rerun yields the identical assignment
    again = deterministic_shuffle(df, key_cols=["doc_id"], n_shards=4, seed=7)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
    # a different seed produces a different order
    other = deterministic_shuffle(df, key_cols=["doc_id"], n_shards=4, seed=8)
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other.collect()))


def test_temperature_mix_alpha_one_is_identity(spark):
    from flink_psl_spark.llm import temperature_mix

    df = _docs(
        spark,
        [(i, "big" if i < 90 else "small", f"t {i}") for i in range(100)],
    )
    out = temperature_mix(df, "source", alpha=1.0, key_cols=["doc_id"])
    assert out.count() == 100  # rate 1.0 everywhere


def test_temperature_mix_flattens_distribution(spark):
    from flink_psl_spark.llm import temperature_mix

    df = _docs(
        spark,
        [(i, "big" if i < 900 else "small", f"t {i}") for i in range(1000)],
    )
    out = temperature_mix(df, "source", alpha=0.5, key_cols=["doc_id"])
    kept = {r["source"]: r["n"] for r in
            out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # the smallest source keeps everything (rate scaled to max 1)
    assert kept["small"] == 100
    # the big source is downsampled toward sqrt-proportionality:
    # expected rate = sqrt(p_small/p_big) = sqrt(1/9) = 1/3
    assert 200 < kept["big"] < 400


def test_bigram_lm_scores_known_model(spark):
    import math

    from flink_psl_spark.llm.text import ngram_lm_scores

    # corpus: "a b" x2, "a c", "z" (no bigram)
    df = _docs(
        spark,
        [(0, "s", "a b"), (1, "s", "a b"), (2, "s", "a c"), (3, "s", "z")],
    )
    rows = {r["doc_id"]: r for r in ngram_lm_scores(df).collect()}
    # model: c(a,b)=2, c(a,c)=1, c(a)=3, V={b,c}=2
    lp_ab = round(round(math.log((2 + 1) / (3 + 2)) * 1e6) / 1e6, 6)
    lp_ac = round(round(math.log((1 + 1) / (3 + 2)) * 1e6) / 1e6, 6)
    assert rows[0]["n_bigrams"] == 1 and rows[0]["avg_logprob"] == lp_ab
    assert rows[1]["avg_logprob"] == lp_ab
    assert rows[2]["avg_logprob"] == lp_ac
    assert rows[3]["n_bigrams"] == 0 and rows[3]["avg_logprob"] is None
    assert rows[0]["ppl_proxy"] == round(math.exp(-lp_ab), 4)
    # unseen bigrams under a separate reference corpus get the floor prob
    ref = _docs(spark, [(10, "s", "x y")])
    got = {r["doc_id"]: r for r in ngram_lm_scores(df, ref=ref).collect()}
    lp_floor = round(round(math.log(1 / (0 + 1)) * 1e6) / 1e6, 6)  # = 0.0
    assert got[0]["avg_logprob"] == lp_floor


def test_kneser_ney_scores_known_model(spark):
    import math

    from flink_psl_spark.llm.text import kneser_ney_scores

    # corpus: "a b" x2, "a c", "b c", "z" (no bigram)
    df = _docs(
        spark,
        [(0, "s", "a b"), (1, "s", "a b"), (2, "s", "a c"),
         (3, "s", "b c"), (4, "s", "z")],
    )
    rows = {r["doc_id"]: r for r in kneser_ney_scores(df).collect()}
    # model: c(a,b)=2 c(a,c)=1 c(b,c)=1; c(a)=3 c(b)=1; N1+(a,*)=2
    # N1+(b,*)=1; N1+(*,b)=1 N1+(*,c)=2; T=3 types
    d = 0.75

    def lp(c12, c1, n1f, n1b, t=3.0):
        p = max(c12 - d, 0.0) / c1 + d * n1f / c1 * (n1b / t)
        return round(round(math.log(p) * 1e6) / 1e6, 6)

    lp_ab = lp(2, 3, 2, 1)   # P(b|a) = 1.25/3 + 0.5/3
    lp_ac = lp(1, 3, 2, 2)   # P(c|a)
    lp_bc = lp(1, 1, 1, 2)   # P(c|b) = 0.25 + 0.5
    assert rows[0]["n_bigrams"] == 1 and rows[0]["avg_logprob"] == lp_ab
    assert rows[2]["avg_logprob"] == lp_ac
    assert rows[3]["avg_logprob"] == lp_bc
    assert rows[4]["n_bigrams"] == 0 and rows[4]["avg_logprob"] is None
    assert rows[3]["ppl_proxy"] == round(math.exp(-lp_bc), 4)
    # KN mass given a seen context sums to 1 when trained on itself
    assert abs(math.exp(lp_ab) + math.exp(lp_ac) - 1.0) < 1e-5
    # unseen context under a separate reference corpus -> continuation floor
    ref = _docs(spark, [(10, "s", "x y")])
    got = {r["doc_id"]: r for r in kneser_ney_scores(df, ref=ref).collect()}
    lp_floor = round(round(math.log(1.0 / (1.0 + 1.0)) * 1e6) / 1e6, 6)
    assert got[0]["avg_logprob"] == lp_floor


def test_sft_loss_mask_spans_index_the_render(spark):
    import datetime as dt

    from flink_psl_spark.llm import sft_loss_mask

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    # one user, two sessions (40-min gap): [hello, hi there] and
    # [question, answer, follow, up2]
    rows = [
        (1, base, 7, "hello"),
        (2, base + dt.timedelta(minutes=1), 7, "hi there"),
        (3, base + dt.timedelta(minutes=41), 7, "question"),
        (4, base + dt.timedelta(minutes=42), 7, "answer"),
        (5, base + dt.timedelta(minutes=43), 7, "follow"),
        (6, base + dt.timedelta(minutes=44), 7, "up2"),
    ]
    df = spark.createDataFrame(
        rows, "event_id int, ts timestamp, user_id int, event_type string"
    )
    out = sft_loss_mask(df, gap_minutes=30).collect()
    by_sess: dict = {}
    for r in out:
        by_sess.setdefault(r["session_n"], []).append(r)
    # rebuild each session's render in python and index it with the spans
    sessions = {1: ["hello", "hi there"],
                2: ["question", "answer", "follow", "up2"]}
    for sn, turns in sessions.items():
        render = "".join(
            ("<u>" if i % 2 == 0 else "<a>") + c for i, c in enumerate(turns)
        )
        spans = sorted(by_sess[sn], key=lambda r: r["turn_idx"])
        assert [r["render_len"] for r in spans] == [len(render)] * len(spans)
        got = [render[r["mask_start"]:r["mask_end"]] for r in spans]
        assert got == turns[1::2]  # assistant contents, in order
        assert [r["turn_idx"] for r in spans] == list(
            range(2, len(turns) + 1, 2)
        )


def test_preference_pairs_semantics(spark):
    from flink_psl_spark.llm import preference_pairs

    # one group: scores 1.0, 0.9, 0.5, 0.1, 0.0 (ids 0..4)
    df = spark.createDataFrame(
        [(0, "s", 1.0), (1, "s", 0.9), (2, "s", 0.5), (3, "s", 0.1),
         (4, "s", 0.0)],
        "doc_id int, source string, q double",
    )
    out = preference_pairs(
        df, group_col="source", score_col="q", k=2, min_margin=0.25
    ).collect()
    got = {(r["pair_rank"], r["chosen_id"], r["rejected_id"]) for r in out}
    # rank1: best 0 (1.0) vs worst 4 (0.0); rank2: 1 (0.9) vs 3 (0.1)
    assert got == {(1, 0, 4), (2, 1, 3)}
    assert all(r["margin"] >= 0.25 for r in out)
    # margin gate: a flat group yields no pairs (self-pair also excluded)
    flat = spark.createDataFrame(
        [(0, "s", 0.5), (1, "s", 0.5), (2, "s", 0.5)],
        "doc_id int, source string, q double",
    )
    assert (
        preference_pairs(
            flat, group_col="source", score_col="q", k=3, min_margin=0.25
        ).count()
        == 0
    )


def test_token_budget_mix_semantics(spark):
    from flink_psl_spark.llm import token_budget_mix

    # 4 docs of 3 tokens each per source; budget 7 -> docs kept while the
    # running sum BEFORE the doc is < 7: cum 3, 6, 9 -> the third doc
    # crosses the line and is included; the fourth is excluded
    df = _docs(
        spark,
        [(i, "a" if i < 4 else "b", "x y z") for i in range(8)],
    )
    out = token_budget_mix(
        df, "source", {"a": 7}, key_cols=["doc_id"]
    )
    by_src = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src["a"] == 3
    assert by_src["b"] == 4  # no budget -> keep all
    # default_budget applies to unlisted sources
    out2 = token_budget_mix(
        df, "source", {"a": 7}, key_cols=["doc_id"], default_budget=3
    )
    by2 = {r["source"]: r["n"] for r in
           out2.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by2["b"] == 1  # first doc crosses a 3-token budget, included


def test_boilerplate_removal_known_values(spark):
    """Segments in > max_docs distinct docs vanish from EVERY doc (no
    keep-first survivor); within-doc repeats of a rare segment survive."""
    from flink_psl_spark.llm import boilerplate_removal

    boiler = "x " * 3 + "x"  # 4 tokens -> one 4-token segment
    rows = [
        (1, boiler),                       # boilerplate only
        (2, boiler + " unique two alpha"), # boilerplate + own tail
        (3, boiler + " other tail beta"),
        (4, "rare seg one two " + "rare seg one two"),  # repeats, 1 doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in boilerplate_removal(
            df, segment_tokens=4, max_docs=2
        ).collect()
    }
    # 'x x x x' occurs in docs 1,2,3 (> 2) -> removed everywhere
    assert out[1]["n_removed"] == 1 and out[1]["clean_text"] == ""
    assert out[2]["n_removed"] == 1 and out[2]["clean_text"] == "unique two alpha"
    assert out[3]["n_removed"] == 1 and out[3]["clean_text"] == "other tail beta"
    # doc 4's segment repeats only within ONE doc -> distinct-doc count 1
    assert out[4]["n_removed"] == 0 and out[4]["n_segments"] == 2


def test_linear_quality_classifier_monotone_features(spark):
    """More stopwords raise the margin, punctuation noise lowers it, and
    the band thresholds split at 0.0 / 0.5."""
    from pyspark.sql import functions as F

    from flink_psl_spark.llm import linear_quality_classifier, quality_band

    rows = [
        (1, "the cat sat on the mat and it was a good day in the sun"),
        (2, ",,,, !!!! ;;;; (((( )))) ???? ,,,, !!!!"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["s"], r["b"])
        for r in df.select(
            "doc_id",
            linear_quality_classifier(F.col("text")).alias("s"),
            quality_band(linear_quality_classifier(F.col("text"))).alias("b"),
        ).collect()
    }
    assert got[1][0] > got[2][0]
    assert got[1][1] in ("high", "medium") and got[2][1] == "low"


def test_bpe_train_known_corpus(spark):
    """Classic BPE on a tiny corpus: most frequent pair merges first,
    ties break lexicographically, merged symbols participate in later
    rounds."""
    from flink_psl_spark.llm import bpe_train, reference_bpe_merges

    rows = [(1, "low low low lower lowest"), (2, "new newer newest")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bpe_train(df, n_merges=5)
    want = reference_bpe_merges(
        {"low": 3, "lower": 1, "lowest": 1, "new": 1, "newer": 1, "newest": 1},
        5,
    )
    assert got == want
    # 'lo' appears 5 times -> it must be the first merge ('l','o')
    assert got[0] == ("l", "o")


def test_bpe_encode_applies_merges_in_order(spark):
    from flink_psl_spark.llm import bpe_encode

    df = spark.createDataFrame([(1, "abab abc")], "doc_id long, text string")
    out = bpe_encode(df, [("a", "b"), ("ab", "ab")]).collect()[0]
    # 'abab' -> [ab, ab] -> [abab]; 'abc' -> [ab, c]
    assert out["tokens"] == ["abab", "ab", "c"]
    assert out["n_tokens"] == 3


def test_distributed_ntile_matches_explicit_formula(spark):
    """Two-pass NTILE equals the explicit ((rank-1)*n)//total + 1 over the
    global order, including with skewed bins and ties broken by id."""
    from flink_psl_spark.llm import distributed_ntile

    rows = [(i, float(v)) for i, v in enumerate([5, 1, 3, 3, 9, 0, 7, 2, 8, 4, 6])]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r["id"]: r["tile"]
        for r in distributed_ntile(df, "v", "id", n_tiles=3).collect()
    }
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    total = len(order)
    want = {
        rid: ((rank * 3) // total) + 1
        for rank, (rid, _) in enumerate(order)
    }
    assert got == want


def test_wav_roundtrip_and_stats(spark):
    """encode_wav/decode_wav are a genuine RIFF/WAVE round-trip, and
    wav_stats decodes real payloads distributively."""
    import numpy as np

    from flink_psl_spark.llm.multimodal import (
        decode_wav,
        encode_wav,
        synthetic_wav_media,
        wav_stats,
    )

    samples = [0, 100, -100, 32767, -32768]
    nch, rate, back = decode_wav(encode_wav(samples, 16000))
    assert (nch, rate) == (1, 16000)
    assert back.tolist() == samples
    # RIFF magic present — these are real WAV bytes, not a fake container
    assert encode_wav(samples, 16000)[:4] == b"RIFF"

    docs = spark.createDataFrame([(7, "x"), (8, "y")], "doc_id long, text string")
    got = {
        r["media_id"]: r
        for r in wav_stats(synthetic_wav_media(spark, docs)).collect()
    }
    n7 = 100 + 7 % 400
    xs = np.array([(7 * 31 + i * 7) % 2048 - 1024 for i in range(n7)])
    assert got[7]["n_samples"] == n7
    assert got[7]["rms"] == round(float(np.sqrt((xs.astype(np.int64) ** 2).sum() / n7)), 6)


def test_round4_ops_degenerate_inputs(spark):
    """Empty/blank/tiny inputs through every round-4 operator — the
    degenerate shapes where driver-side counts and divisions hide bugs."""
    import numpy as np

    from flink_psl_spark.llm import (
        boilerplate_removal,
        bpe_encode,
        bpe_train,
        distributed_ntile,
        semantic_dedup,
    )
    from flink_psl_spark.llm.multimodal import decode_wav, encode_wav

    # boilerplate removal: blank and single-word docs survive untouched
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "word")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in boilerplate_removal(df).collect()}
    assert got[1]["n_segments"] == 0 and got[1]["clean_text"] == ""
    assert got[3]["n_segments"] == 1 and got[3]["clean_text"] == "word"

    # semantic dedup: corpus smaller than n_clusters
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    out = semantic_dedup(emb, n_clusters=16, threshold=0.99).collect()
    assert {r["vec_id"] for r in out} == {1, 2}  # orthogonal -> both kept

    # BPE: no adjacent pairs -> no merges; encode with empty merge list
    df1 = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert bpe_train(df1, n_merges=3) == []
    enc = bpe_encode(df1, []).collect()[0]
    assert enc["tokens"] == ["a", "b", "c"]
    blank = bpe_encode(
        spark.createDataFrame([(9, "")], "doc_id long, text string"), []
    ).collect()[0]
    assert blank["tokens"] == [] and blank["n_tokens"] == 0

    # distributed ntile: one row; more tiles than rows
    one = spark.createDataFrame([(1, 5.0)], "id long, v double")
    r = distributed_ntile(one, "v", "id", n_tiles=4).collect()[0]
    assert r["tile"] == 1

    # WAV: zero-frame clip round-trips
    nch, rate, samples = decode_wav(encode_wav([], 8000))
    assert (nch, rate, len(samples)) == (1, 8000, 0)
    assert isinstance(samples, np.ndarray)


def test_importance_resample_prefers_target_like(spark):
    """Raw docs sharing the target's vocabulary must outrank raw docs
    with disjoint vocabulary (the DSIR objective), and ranking is
    deterministic (score desc, id asc)."""
    from pyspark.sql import functions as F

    from flink_psl_spark.llm import importance_resample

    target = [(i, "apple banana cherry apple banana", True) for i in range(4)]
    like = [(10 + i, "apple banana apple cherry", False) for i in range(3)]
    unlike = [(20 + i, "xylophone quartz zebra vortex", False) for i in range(3)]
    df = spark.createDataFrame(
        target + like + unlike, "doc_id long, text string, is_t boolean"
    )
    out = importance_resample(
        df, F.col("is_t"), n_buckets=64, k=10
    ).collect()
    ranks = {r["doc_id"]: r["rank"] for r in out}
    assert set(ranks) == {10, 11, 12, 20, 21, 22}  # raw docs only
    assert max(ranks[d] for d in (10, 11, 12)) < min(
        ranks[d] for d in (20, 21, 22)
    )
    # identical text -> identical score -> id-ordered ranks
    assert [ranks[10], ranks[11], ranks[12]] == [1, 2, 3]


def test_importance_resample_degenerate_inputs(spark):
    """Empty corpus, all-target corpus, and blank-text docs must not
    crash the count-derived cluster/total math (div-by-zero / log(0))."""
    from pyspark.sql import functions as F

    from flink_psl_spark.llm import importance_resample

    schema = "doc_id long, text string, is_t boolean"
    empty = spark.createDataFrame([], schema)
    assert importance_resample(empty, F.col("is_t"), k=5).count() == 0
    all_t = spark.createDataFrame([(1, "a b", True)], schema)
    assert importance_resample(all_t, F.col("is_t"), k=5).count() == 0
    blanks = spark.createDataFrame(
        [(1, "", False), (2, "  ", False), (3, "x", True)], schema
    )
    assert importance_resample(blanks, F.col("is_t"), k=5).count() == 0


def test_semantic_dedup_degenerate_inputs(spark):
    """Empty and single-row corpora through the derived-cluster-count
    path (count()-based) — the classic place for max/ceil-of-zero bugs."""
    from flink_psl_spark.llm import semantic_dedup

    schema = "vec_id long, embedding array<double>"
    empty = spark.createDataFrame([], schema)
    assert semantic_dedup(empty, target_cluster_size=8).count() == 0
    one = spark.createDataFrame([(7, [1.0, 2.0])], schema)
    got = one.transform(
        lambda d: semantic_dedup(d, target_cluster_size=8)
    ).collect()
    assert [(r["vec_id"], r["cluster_id"]) for r in got] == [(7, 7)]
