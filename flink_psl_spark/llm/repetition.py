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
    """Split into trimmed, non-empty segments (lines by default).

    Per-segment trim uses the pinned whitespace set (llm.text.pinned_trim)
    so the DuckDB oracle's LIST_TRANSFORM(s -> TRIM(s, …)) replays exactly —
    bare TRIM disagrees across engines on Unicode spaces."""
    from flink_psl_spark.llm.text import pinned_trim

    parts = F.split(_col(text), delim)
    trimmed = F.transform(parts, pinned_trim)
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
    from flink_psl_spark.llm.text import bind_once

    def grams(tk):
        m = F.size(tk)
        g = F.transform(
            F.sequence(F.lit(1), m - (n - 1)),
            lambda i: F.array_join(F.slice(tk, i, n), " "),
        )
        return F.when(m >= n, g).otherwise(F.array().cast("array<string>"))

    return bind_once(tokenize(text), grams)


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

    Single-pass formulation: both n-gram families come out of ONE text scan
    and ONE Generate — 2-grams and 5-grams are emitted tagged with their
    ``n`` and separated again by conditional aggregation (pivot-style), so
    the corpus text is read once instead of once per statistic. Only a slim
    ``id_col``-only scan is added to keep documents too short for any
    n-gram (their fractions are 0). Shuffle shape is unchanged: partial-agg
    map-side, two reduce stages keyed on the doc id.
    """
    tagged = docs.select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.transform(
                    word_ngrams(F.col(text_col), 2),
                    lambda g: F.struct(F.lit(2).alias("n"), g.alias("gram")),
                ),
                F.transform(
                    word_ngrams(F.col(text_col), 5),
                    lambda g: F.struct(F.lit(5).alias("n"), g.alias("gram")),
                ),
            )
        ).alias("t"),
    ).select(id_col, F.col("t.n").alias("n"), F.col("t.gram").alias("gram"))
    per_gram = tagged.groupBy(id_col, "n", "gram").agg(F.count("*").alias("cnt"))
    chars = F.col("cnt") * F.length("gram")
    per_doc = per_gram.groupBy(id_col).agg(
        F.max(F.when(F.col("n") == 2, chars)).alias("top2"),
        F.sum(F.when(F.col("n") == 2, chars).otherwise(0)).alias("tot2"),
        F.sum(
            F.when((F.col("n") == 5) & (F.col("cnt") >= 2), chars).otherwise(0)
        ).alias("dup5"),
        F.sum(F.when(F.col("n") == 5, chars).otherwise(0)).alias("tot5"),
    )
    top2_frac = F.round(
        F.coalesce(F.col("top2") / F.nullif(F.col("tot2"), F.lit(0)), F.lit(0.0)), 6
    )
    dup5_frac = F.round(
        F.coalesce(F.col("dup5") / F.nullif(F.col("tot5"), F.lit(0)), F.lit(0.0)), 6
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(top2_frac, F.lit(0.0)).alias("top_2gram_char_frac"),
            F.coalesce(dup5_frac, F.lit(0.0)).alias("dup_5gram_char_frac"),
        )
        .withColumn(
            "keep",
            (F.col("top_2gram_char_frac") <= max_top_2gram)
            & (F.col("dup_5gram_char_frac") <= max_dup_5gram),
        )
    )
