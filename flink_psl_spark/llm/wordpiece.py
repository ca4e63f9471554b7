"""WordPiece tokenizer training and encoding (beyond-reference, SURVEY §7
M5 family — completes the tokenizer trio next to BPE and unigram-LM).

Classic WordPiece (the published BERT-family algorithm): like BPE, but a
merge round picks the pair maximizing likelihood gain
``score = count(ab) / (count(a) * count(b))`` instead of raw pair count,
and word-internal symbols carry the ``##`` continuation prefix. Training
runs as a driver-coordinated iteration over the WORD-COUNT table (the
bpe.py shape): the one corpus-sized pass is the initial word count; every
round after touches only vocabulary-sized frames. Encoding is the greedy
longest-match-first algorithm — a row-local Arrow-batched map.

Determinism: the score is compared as a QUANTIZED RATIONAL —
``(count(ab) * 10^12) div (count(a) * count(b))`` in DECIMAL(38,0) — so
selection is exact integer math with a (score DESC, left ASC, right ASC)
tie-break: training reproduces bit-identically across runs, partitionings,
and the single-process reference transcription
(:func:`reference_wordpiece_train`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_psl_spark.llm.bpe import word_counts
from flink_psl_spark.materialize import materialize

# quantization grain for the rational score — 12 digits keeps every
# realistic (c_ab, c_a*c_b) pair distinguishable while staying far inside
# DECIMAL(38,0) for corpus-scale counts
_SCORE_SCALE = 10**12


def _syms_expr(col: str):
    """word -> ['f', '##o', '##o']: first char bare, rest ##-prefixed."""
    return F.expr(
        f"transform(sequence(1, length({col})), "
        f"i -> CASE WHEN i = 1 THEN substring({col}, i, 1) "
        f"ELSE concat('##', substring({col}, i, 1)) END)"
    )


def _join_piece(a: str, b: str) -> str:
    """Merged symbol: continuation prefix of the RIGHT side folds away."""
    return a + (b[2:] if b.startswith("##") else b)


def _merge_udf(a: str, b: str):
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    ab = _join_piece(a, b)

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


def wordpiece_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 12,
    min_pair_count: int = 2,
    vocab_limit: int | None = None,
) -> list[str]:
    """Learn ``n_merges`` WordPiece merges; returns the ordered list of
    merged PIECES (e.g. ``['th', '##ing', 'the']``) — a tokenizer artifact
    bounded by ``n_merges``, not data-sized.

    Per round: one adjacent-pair explode + one symbol explode over the
    vocabulary table (both row-local), two weighted hash aggregations, a
    broadcast-joined score, and a 1-row argmax collect; then a row-local
    Arrow-batched merge application. Lineage is cut with localCheckpoint
    every few rounds (the graph-loop pattern). At 100 TB only the initial
    word count sees the corpus.

    ``vocab_limit``: train on the top-``vocab_limit`` words by
    (count desc, word asc) — deterministic, lets verification replay the
    same table in bounded memory.
    """
    wc = word_counts(docs, text_col=text_col)
    if vocab_limit is not None:
        wc = wc.orderBy(F.desc("cnt"), F.asc("word")).limit(vocab_limit)
    state = wc.select("cnt", _syms_expr("word").alias("syms"))
    state = state.transform(materialize)
    pieces: list[str] = []
    pair_expr = F.expr(
        "transform(sequence(1, greatest(size(syms), 2) - 1), "
        "i -> struct(syms[i-1] as a, syms[i] as b))"
    )
    for round_no in range(n_merges):
        pair_cnt = (
            state.where(F.size("syms") >= 2)
            .select("cnt", F.explode(pair_expr).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("c_ab"))
        )
        sym_cnt = (
            state.select("cnt", F.explode("syms").alias("s"))
            .groupBy("s")
            .agg(F.sum("cnt").alias("c_s"))
        )
        best = (
            pair_cnt.join(
                F.broadcast(sym_cnt.withColumnRenamed("s", "a")
                            .withColumnRenamed("c_s", "ca")),
                on="a",
            )
            .join(
                F.broadcast(sym_cnt.withColumnRenamed("s", "b")
                            .withColumnRenamed("c_s", "cb")),
                on="b",
            )
            .select(
                "a", "b", "c_ab",
                F.expr(
                    f"(CAST(c_ab AS DECIMAL(38,0)) * {_SCORE_SCALE}) "
                    "div (CAST(ca AS DECIMAL(38,0)) "
                    "* CAST(cb AS DECIMAL(38,0)))"
                ).alias("score_q"),
            )
            .orderBy(F.desc("score_q"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["c_ab"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        pieces.append(_join_piece(a, b))
        state = state.select("cnt", _merge_udf(a, b)("syms").alias("syms"))
        if (round_no + 1) % 4 == 0:
            state = state.transform(materialize)
    return pieces


def wordpiece_alphabet(docs: DataFrame, *, text_col: str = "text") -> list[str]:
    """The base vocabulary every char of the corpus maps to: bare
    word-initial chars + ##-prefixed continuation chars. One explode +
    one distinct over characters — alphabet-sized output."""
    from flink_psl_spark.llm.text import tokenize

    chars = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .select(F.explode(_syms_expr("w")).alias("s"))
        .distinct()
    )
    return sorted(r["s"] for r in chars.collect())


def wordpiece_encode(
    docs: DataFrame,
    vocab: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk: str = "[UNK]",
    max_word_chars: int = 100,
) -> DataFrame:
    """Greedy longest-match-first WordPiece encoding (the standard
    algorithm): per word, repeatedly take the longest vocab prefix
    (##-prefixed after the first piece); any word with an uncoverable
    position — or longer than ``max_word_chars`` — becomes one ``unk``
    token, wholesale. One Arrow-batched UDF over the token array —
    row-local, no shuffle. Returns (id, pieces array<string>, n_pieces,
    n_unk)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from flink_psl_spark.llm.text import tokenize

    vset = frozenset(vocab)
    max_len = max((len(v) for v in vset), default=1)

    def encode(s):
        out = []
        for words in s:
            toks: list[str] = []
            if words is None:
                words = []
            for w in words:
                if len(w) > max_word_chars:
                    toks.append(unk)
                    continue
                i, n, ok = 0, len(w), True
                word_toks: list[str] = []
                while i < n:
                    pre = "" if i == 0 else "##"
                    j = min(n, i + max_len)
                    piece = None
                    while j > i:
                        cand = pre + w[i:j]
                        if cand in vset:
                            piece = cand
                            break
                        j -= 1
                    if piece is None:
                        ok = False
                        break
                    word_toks.append(piece)
                    i = j
                toks.extend(word_toks if ok else [unk])
            out.append(toks)
        return pd.Series(out)

    enc = pandas_udf(encode, T.ArrayType(T.StringType()))
    return docs.select(
        F.col(id_col),
        enc(tokenize(F.col(text_col))).alias("pieces"),
    ).select(
        id_col,
        "pieces",
        F.size("pieces").cast("bigint").alias("n_pieces"),
        F.size(F.filter("pieces", lambda p: p == F.lit(unk)))
        .cast("bigint")
        .alias("n_unk"),
    )


def reference_wordpiece_train(
    counts: dict, n_merges: int, *, min_pair_count: int = 2
) -> list[str]:
    """Single-process reference transcription of the training loop (same
    quantized-rational score and (score DESC, left ASC, right ASC)
    tie-break) — the ground truth the distributed path is checked against.
    ``counts`` maps word -> corpus count."""
    vocab = {
        w: [w[0]] + ["##" + ch for ch in w[1:]] for w in counts
    }
    pieces: list[str] = []
    for _ in range(n_merges):
        pair_counts: dict = {}
        sym_counts: dict = {}
        for w, syms in vocab.items():
            c = counts[w]
            for s in syms:
                sym_counts[s] = sym_counts.get(s, 0) + c
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] = (
                    pair_counts.get((syms[i], syms[i + 1]), 0) + c
                )
        if not pair_counts:
            break
        scored = {
            (a, b): (c_ab * _SCORE_SCALE) // (sym_counts[a] * sym_counts[b])
            for (a, b), c_ab in pair_counts.items()
        }
        (a, b) = min(scored, key=lambda k: (-scored[k], k[0], k[1]))
        if pair_counts[(a, b)] < min_pair_count:
            break
        ab = _join_piece(a, b)
        pieces.append(ab)
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
    return pieces
