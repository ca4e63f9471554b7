"""Unigram-LM tokenizer training and encoding (SentencePiece-style) —
the second of the two standard subword algorithms (bpe.py is the first).

Published algorithm (Kudo 2018, hard-EM variant): seed a candidate piece
inventory from frequent substrings, then alternate (E) Viterbi-best
segmentation of every word under the current piece log-probabilities and
(M) re-estimating piece probabilities from the chosen-piece counts,
pruning the inventory back to ``vocab_size`` each round. Single
characters are never pruned, so every word stays segmentable.

Scale shape (the bpe.py contract): the ONE corpus-sized pass is the
initial word count; seeding, every EM round, and pruning run over the
WORD-TYPE table (vocabulary-sized) with the piece inventory — a
parameter-bounded artifact — broadcast into an Arrow-batched Viterbi
kernel. The driver holds only the inventory (``vocab_size`` rows per
round). Encoding is a row-local Arrow map, no shuffle.

Determinism: substring seeding ranks by (weighted freq DESC, piece ASC);
Viterbi breaks score ties toward the LONGER piece; pruning ranks by
(count DESC, piece ASC). The distributed path and
``reference_unigram_train`` (single-process transcription) follow the
identical rules over identical floats, so training reproduces exactly —
the same proof pattern as reference_bpe_merges.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_psl_spark.llm.bpe import word_counts
from flink_psl_spark.llm.text import tokenize


def _viterbi(word: str, logp: dict, max_len: int):
    """Best segmentation of ``word`` under piece log-probs; ties toward
    the longer piece. Assumes all single chars of the word are in
    ``logp`` (the trainer guarantees it)."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for ln in range(1, min(max_len, i) + 1):
            piece = word[i - ln : i]
            lp = logp.get(piece)
            if lp is None:
                continue
            score = best[i - ln] + lp
            # strict > keeps the longest candidate seen so far on ties
            # because ln ascends: record >= to prefer longer pieces
            if score >= best[i]:
                best[i] = score
                back[i] = ln
    pieces = []
    i = n
    while i > 0:
        pieces.append(word[i - back[i] : i])
        i -= back[i]
    pieces.reverse()
    return pieces


def _em_rounds(
    counts: dict[str, int],
    *,
    vocab_size: int,
    iters: int,
    max_piece_len: int,
    seed_size: int,
) -> list[tuple[str, float]]:
    """Single-process EM over a word->count table (both the reference
    implementation AND the per-round driver logic of the distributed
    trainer — the distributed path only distributes the E-step)."""
    # seed: weighted substring counts, top seed_size + all single chars
    sub: dict[str, int] = {}
    for w, c in counts.items():
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i : i + ln]
                sub[p] = sub.get(p, 0) + c
    chars = {p for p in sub if len(p) == 1}
    ranked = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = {p for p, _ in ranked[:seed_size]} | chars
    total = sum(sub[p] for p in vocab)
    logp = {p: math.log(sub[p] / total) for p in vocab}

    for _ in range(iters):
        # E-step: hard counts from Viterbi segmentation
        piece_counts: dict[str, int] = {}
        for w, c in counts.items():
            for p in _viterbi(w, logp, max_piece_len):
                piece_counts[p] = piece_counts.get(p, 0) + c
        # M-step + prune: drop unused non-char pieces, keep top vocab_size
        for ch in chars:
            piece_counts.setdefault(ch, 1)  # chars stay segmentable
        ranked = sorted(piece_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        keep = {p for p, _ in ranked[:vocab_size]} | chars
        total = sum(piece_counts[p] for p in keep)
        logp = {p: math.log(piece_counts[p] / total) for p in keep}
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def unigram_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    vocab_size: int = 40,
    iters: int = 3,
    max_piece_len: int = 4,
    seed_size: int = 80,
    vocab_limit: int | None = None,
) -> list[tuple[str, float]]:
    """Learn a unigram-LM piece inventory; returns [(piece, logprob), ...]
    ordered by (logprob DESC, piece ASC) — ``vocab_size``-bounded.

    Distributed shape: ONE corpus scan (word counts), then substring
    seeding as a row-local explode + weighted aggregation over word
    TYPES, and per EM round an Arrow-batched Viterbi E-step over the
    word-type table (inventory broadcast as a dict literal) feeding a
    piece-keyed integer aggregation whose result — at most
    ``seed_size + |chars|`` rows — is collected to the driver for the
    M-step. ``vocab_limit`` caps the word-type table exactly like
    bpe_train's.
    """
    wc = word_counts(docs, text_col=text_col)
    if vocab_limit is not None:
        wc = wc.orderBy(F.desc("cnt"), F.asc("word")).limit(vocab_limit)
    wc = wc.persist()
    try:
        # seeding: explode all substrings up to max_piece_len (row-local)
        subs = F.expr(
            "flatten(transform(sequence(1, length(word)), i -> "
            f"transform(sequence(1, least({max_piece_len}, "
            "length(word) - i + 1)), l -> substring(word, i, l))))"
        )
        sub_counts = (
            wc.select(F.explode(subs).alias("piece"), "cnt")
            .groupBy("piece")
            .agg(F.sum("cnt").alias("freq"))
        )
        top = sub_counts.orderBy(F.desc("freq"), F.asc("piece")).limit(
            seed_size
        )
        chars_df = sub_counts.where(F.length("piece") == 1)
        seed = {
            r["piece"]: r["freq"]
            for r in top.unionByName(chars_df).distinct().collect()
        }  # ≤ seed_size + |alphabet| rows — parameter-sized
        chars = {p for p in seed if len(p) == 1}
        total = sum(seed.values())
        logp = {p: math.log(c / total) for p, c in seed.items()}

        for _ in range(iters):
            counts = _estep_counts(wc, logp, max_piece_len)
            for ch in chars:
                counts.setdefault(ch, 1)
            ranked = sorted(
                counts.items(), key=lambda kv: (-kv[1], kv[0])
            )
            keep = {p for p, _ in ranked[:vocab_size]} | chars
            tot = sum(counts[p] for p in keep)
            logp = {p: math.log(counts[p] / tot) for p in keep}
        return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    finally:
        wc.unpersist()


def _estep_counts(
    wc: DataFrame, logp: dict[str, float], max_piece_len: int
) -> dict[str, int]:
    """Distributed E-step: Arrow-batched Viterbi over the word-type
    table, piece-keyed integer count aggregation, inventory-sized
    collect."""
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    model = dict(logp)
    ml = max_piece_len

    def seg(words):
        return pd.Series([_viterbi(w, model, ml) for w in words])

    seg_udf = pandas_udf(seg, T.ArrayType(T.StringType()))
    agg = (
        wc.select(F.explode(seg_udf("word")).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("n"))
        .collect()
    )
    return {r["piece"]: r["n"] for r in agg}


def reference_unigram_train(
    counts: dict[str, int],
    *,
    vocab_size: int = 40,
    iters: int = 3,
    max_piece_len: int = 4,
    seed_size: int = 80,
) -> list[tuple[str, float]]:
    """Single-process reference transcription of the trainer (identical
    seeding/tie-break/prune rules) — the ground truth the distributed
    path is checked against, mirroring reference_bpe_merges."""
    return _em_rounds(
        counts,
        vocab_size=vocab_size,
        iters=iters,
        max_piece_len=max_piece_len,
        seed_size=seed_size,
    )


def unigram_encode(
    docs: DataFrame,
    vocab: list[tuple[str, float]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 4,
) -> DataFrame:
    """Viterbi-encode documents with a learned inventory: row-local
    Arrow-batched map (no shuffle). Characters absent from the inventory
    pass through as single-char pieces (log-prob floor), so encoding
    never drops content. Returns (id, pieces, n_pieces)."""
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    model = dict(vocab)
    floor = min(model.values()) - 10.0 if model else -10.0
    ml = max_piece_len

    def enc(s):
        out = []
        for words in s:
            pieces: list[str] = []
            for w in words if words is not None else []:
                lp = dict(model)
                for ch in set(w) - set(lp):
                    lp[ch] = floor
                pieces.extend(_viterbi(w, lp, ml))
            out.append(pieces)
        return pd.Series(out)

    enc_udf = pandas_udf(enc, T.ArrayType(T.StringType()))
    return docs.select(
        F.col(id_col),
        enc_udf(tokenize(F.col(text_col))).alias("pieces"),
    ).withColumn("n_pieces", F.size("pieces").cast("bigint"))
