"""Repetition / self-similarity signals for corpus filtering.

The Gopher rules (Rae et al. 2021, "Scaling Language Models", Table A1):
documents dominated by repeated lines, paragraphs, or word n-grams are
boilerplate/spam and get filtered before training. Two families here:

- **Within-array signals** (duplicate segment/token fractions): pure Column
  expressions over the split text — whole-stage codegen, zero shuffle, the
  per-document cost is the split itself. At 100 TB these run at scan speed.
- **N-gram frequency signals** (top-/duplicate-n-gram char fractions): need
  a per-(doc, ngram) count, expressed as explode → two-level groupBy. Both
  aggregations partial-combine map-side and shuffle only (doc_id) keys, so
  the shuffled volume is ~one row per document per stage, not per n-gram.

No Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_psl_spark.llm.text import tokenize


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def segments(text: Column | str, delim: str = r"\n") -> Column:
    """Split into trimmed, non-empty segments (lines by default)."""
    parts = F.split(_col(text), delim)
    trimmed = F.transform(parts, F.trim)
    return F.filter(trimmed, lambda s: s != "")


def _dup_fraction(arr: Column) -> Column:
    n = F.size(arr)
    nd = F.size(F.array_distinct(arr))
    return F.when(n > 0, (n - nd) / n).otherwise(F.lit(0.0)).cast("double")


def _dup_char_fraction(arr: Column) -> Column:
    total = F.aggregate(arr, F.lit(0).cast("bigint"), lambda a, s: a + F.length(s))
    dtotal = F.aggregate(
        F.array_distinct(arr), F.lit(0).cast("bigint"), lambda a, s: a + F.length(s)
    )
    return (
        F.when(total > 0, (total - dtotal) / total)
        .otherwise(F.lit(0.0))
        .cast("double")
    )


def duplicate_segment_fraction(text: Column | str, delim: str = r"\n") -> Column:
    """Fraction of segments (lines) that are repeats of another segment."""
    return _dup_fraction(segments(text, delim))


def duplicate_segment_char_fraction(
    text: Column | str, delim: str = r"\n"
) -> Column:
    """Fraction of segment characters inside repeated segments (each distinct
    segment's chars counted once; every extra occurrence counts as dup)."""
    return _dup_char_fraction(segments(text, delim))


def duplicate_token_fraction(text: Column | str) -> Column:
    """Fraction of whitespace tokens that are repeats of another token."""
    return _dup_fraction(tokenize(text))


def word_ngrams(text: Column | str, n: int) -> Column:
    """Word n-grams as space-joined strings → array<string> (empty when the
    document has fewer than ``n`` tokens)."""
    toks = tokenize(text)
    m = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), m - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(m >= n, grams).otherwise(F.array().cast("array<string>"))


def ngram_repetition_stats(
    docs: DataFrame,
    *,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram repetition statistics (Gopher's frequency rules).

    Emits one row per document:
      - ``top_ngram_char_frac``: chars covered by the single most frequent
        n-gram (count × n-gram length) / total n-gram chars,
      - ``dup_ngram_char_frac``: chars in n-grams occurring ≥ 2 times /
        total n-gram chars.

    Shuffle shape: explode → groupBy(id, gram) partial-aggregates map-side,
    then groupBy(id) reduces to one row per doc. Ties on the top n-gram
    don't matter — only (count, length) enter the statistic.
    """
    grams = docs.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    per_doc = per_gram.groupBy(id_col).agg(
        F.max(F.col("cnt") * F.length("gram")).alias("top_chars"),
        F.sum(
            F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("gram")).otherwise(0)
        ).alias("dup_chars"),
        F.sum(F.col("cnt") * F.length("gram")).alias("total_chars"),
    )
    # left join keeps short documents (< n tokens): zero grams → zero fractions
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.round(
            F.coalesce(F.col("top_chars") / F.col("total_chars"), F.lit(0.0)), 6
        ).alias("top_ngram_char_frac"),
        F.round(
            F.coalesce(F.col("dup_chars") / F.col("total_chars"), F.lit(0.0)), 6
        ).alias("dup_ngram_char_frac"),
    )


# Gopher Table A1 thresholds for the signals computable on word-bag text.
GOPHER_MAX_DUP_LINE_FRAC = 0.30
GOPHER_MAX_TOP_2GRAM_CHAR_FRAC = 0.20
GOPHER_MAX_DUP_5GRAM_CHAR_FRAC = 0.15


def repetition_filter(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_2gram: float = GOPHER_MAX_TOP_2GRAM_CHAR_FRAC,
    max_dup_5gram: float = GOPHER_MAX_DUP_5GRAM_CHAR_FRAC,
) -> DataFrame:
    """Combined Gopher-style repetition verdict per document.

    Joins the 2-gram and 5-gram frequency statistics (both shuffled on
    ``id_col`` — co-partitioned, no extra exchange) and emits the keep/drop
    flag a curation pipeline filters on.
    """
    g2 = ngram_repetition_stats(docs, n=2, id_col=id_col, text_col=text_col)
    g5 = ngram_repetition_stats(docs, n=5, id_col=id_col, text_col=text_col)
    return (
        g2.select(id_col, "top_ngram_char_frac")
        .join(g5.select(id_col, "dup_ngram_char_frac"), id_col)
        .select(
            F.col(id_col),
            F.col("top_ngram_char_frac").alias("top_2gram_char_frac"),
            F.col("dup_ngram_char_frac").alias("dup_5gram_char_frac"),
            (
                (F.col("top_ngram_char_frac") <= max_top_2gram)
                & (F.col("dup_ngram_char_frac") <= max_dup_5gram)
            ).alias("keep"),
        )
    )
