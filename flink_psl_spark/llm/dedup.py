"""Document deduplication: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale design
------------
The naive near-dup formulation is an O(n²) pair comparison — a non-starter
at 100 TB. Every operator here follows the banded-LSH shape instead:

1. per-row signature (expression-only or Arrow-batched — embarrassingly
   parallel, no shuffle);
2. explode into (band_id, band_hash) keys — row-local;
3. self-equi-join on the band key (one hash shuffle; AQE skew-join splits
   hot buckets such as boilerplate-heavy bands);
4. exact verification of candidate pairs only (Jaccard / Hamming), so the
   output is exact w.r.t. the threshold given LSH recall.

Hash functions are seeded and engine-deterministic (xxhash64), so results
are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_psl_spark.llm.text import tokenize
from flink_psl_spark.materialize import materialize
from flink_psl_spark.parallelism import ensure_parallelism


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    normalize: bool = True,
) -> DataFrame:
    """Exact dedup: one survivor (min id) per identical text.

    Hash-groupBy on the text (optionally whitespace/case-normalized) — a
    single shuffle whose key is the fingerprint, not the full text, keeping
    exchange payloads small at scale.
    """
    from flink_psl_spark.llm.text import fingerprint

    key = fingerprint(text_col) if normalize else F.md5(_col(text_col))
    return (
        df.withColumn("__fp", key)
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .drop("__fp")
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct array<string>). Documents with
    fewer than ``n`` tokens yield an EMPTY set — guarded explicitly:
    Spark's ``sequence(1, 0)`` counts DOWN and its 0 index would crash
    ``slice``."""
    from flink_psl_spark.llm.text import bind_once

    def grams(tk):
        k = F.size(tk) - (n - 1)
        return F.when(k < 1, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
                lambda i: F.array_join(F.slice(tk, i, n), " "),
            )
        )

    # tokens bound once — see text.bind_once (5-7x on shingle scans)
    return F.array_distinct(bind_once(tokenize(text), grams))


def shingle_hashes(text: Column | str, n: int = 3) -> Column:
    """Hashed word n-gram shingles (array<bigint>) — hashes each token-array
    slice directly (xxhash64 over array<string>), skipping the string
    concatenation ``shingles`` pays. Duplicates are kept: MinHash is
    duplicate-insensitive, so no distinct pass either. Sub-``n``-token
    documents yield an empty array (same guard as ``shingles``)."""
    from flink_psl_spark.llm.text import bind_once

    def hashes(tk):
        k = F.size(tk) - (n - 1)
        return F.when(k < 1, F.array().cast("array<bigint>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
                lambda i: F.xxhash64(F.slice(tk, i, n)),
            )
        )

    return bind_once(tokenize(text), hashes)


def _minhash_udf(num_hashes: int, seed: int = 42):
    """Arrow-batched signature kernel: for each row's shingle-hash array,
    the per-member minimum of a pairwise-independent linear hash family
    g_i(h) = h * A_i + B_i over Z_2^64 (odd A_i), computed as ``num_hashes``
    vectorized multiply-adds + ``np.minimum.reduceat`` per Arrow batch.
    Deterministic (fixed seed). Shingle-less rows get the all-zero
    signature: such docs band-collide with each other only, and exact
    Jaccard verification rejects them (empty-set Jaccard is 0)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    rng = np.random.RandomState(seed)
    mul = rng.randint(1, 2**63, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    add = rng.randint(1, 2**63, size=num_hashes, dtype=np.uint64)

    def mh(sh):  # pd.Series -> pd.Series (hints omitted: the module's
        # postponed annotations can't resolve function-local ``pd``)
        arrs = sh.to_numpy()
        lens = np.fromiter(
            (0 if a is None else len(a) for a in arrs),
            dtype=np.int64,
            count=len(arrs),
        )
        empty_sig = [0] * num_hashes
        if lens.sum() == 0:
            return pd.Series([empty_sig for _ in arrs])
        cat = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in arrs if a is not None and len(a)]
        ).astype(np.uint64)
        offs = np.zeros(len(arrs) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        starts = offs[:-1][lens > 0]
        mins = np.empty((int((lens > 0).sum()), num_hashes), dtype=np.uint64)
        for i in range(num_hashes):
            mins[:, i] = np.minimum.reduceat(cat * mul[i] + add[i], starts)
        rows = mins.view(np.int64).tolist()
        it = iter(rows)
        return pd.Series(
            [next(it) if ln else empty_sig for ln in lens]
        )

    return pandas_udf(mh, T.ArrayType(T.LongType()))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 64,
    shingle_n: int = 3,
    out_col: str = "minhash",
) -> DataFrame:
    """MinHash signatures: one (id, array<bigint> of length num_hashes) row
    per input row.

    Row-local formulation — ZERO shuffles: shingle hashes are computed
    JVM-side (xxhash64 over token-array slices, expression-only), then one
    Arrow-batched numpy kernel takes the ``num_hashes`` family minima per
    document (see ``_minhash_udf``). Earlier formulations paid more at both
    ends: num_hashes expression trees over the shingle array defeat
    Catalyst CSE (60× slower), and explode + num_hashes min-aggregates
    shuffle num_hashes longs/doc AND hand Catalyst a 64-aggregate tree
    whose analysis alone costs ~1 s of driver time per query build. The
    numpy kernel is a handful of vectorized ops per Arrow batch and keeps
    the whole stage embarrassingly parallel — the ideal 100 TB shape.

    MinHash is duplicate-insensitive (min over a multiset == min over its
    set), so no distinct pass is needed before the reduction.
    """
    from flink_psl_spark.parallelism import ensure_parallelism

    # heavy map stage: under-parallel scans serialize it — fan out on the
    # id key so downstream per-id operators can reuse the exchange
    df = ensure_parallelism(df, id_col)
    mh = _minhash_udf(num_hashes)
    # project tokens FIRST: an expression tree referenced inside the
    # shingle transform lambda is re-evaluated per element (see
    # shingle_strings — 7x on the corpus-overlap scan)
    toks = df.select(F.col(id_col), tokenize(F.col(text_col)).alias("__tk"))
    t = F.col("__tk")
    k = F.size(t) - (shingle_n - 1)
    hashes = F.when(k < 1, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.xxhash64(F.slice(t, i, shingle_n)),
        )
    )
    return toks.select(F.col(id_col), mh(hashes).alias(out_col))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    *,
    bands: int = 16,
    num_hashes: int = 64,
) -> DataFrame:
    """Candidate pairs from banded LSH over MinHash signatures.

    Splits each signature into ``bands`` bands of r = len/bands rows, hashes
    each band, and self-joins on (band_id, band_hash). Returns distinct
    (a, b) id pairs with a < b. One shuffle on the band hash.

    ``num_hashes`` must match the signature length (passing it avoids an
    extra job just to probe the array size).
    """
    n = num_hashes
    if n % bands != 0:
        raise ValueError(f"num_hashes {n} not divisible by bands {bands}")
    r = n // bands
    banded = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.array(
                # xxhash64 hashes the band slice (array<bigint>) directly
                *[F.xxhash64(F.slice(sig_col, b * r + 1, r)) for b in range(bands)]
            )
        ).alias("__band", "__bh"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.__band") == F.col("r.__band"))
            & (F.col("l.__bh") == F.col("r.__bh"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("a"), F.col("r.__id").alias("b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Pairs with exact n-gram Jaccard similarity >= threshold.

    With ``candidates`` (e.g. from ``minhash_lsh_pairs``) this verifies only
    the candidate set — the 100 TB path: docs are first semi-joined to the
    candidate ids so the shingle expression runs only on docs that appear
    in some pair, not the whole corpus. Without it, it verifies all pairs
    (testing / small data only).
    """
    base = df
    if candidates is not None:
        ids = (
            candidates.select(F.col("a").alias("__cid"))
            .union(candidates.select(F.col("b").alias("__cid")))
            .distinct()
        )
        base = df.join(ids, df[id_col] == F.col("__cid"), "left_semi")
    # HASHED shingle sets, not strings: xxhash64 over the token slice is
    # injective on whitespace-free tokens barring a ~2^-64 collision, so
    # |A∩B| / |A∪B| is unchanged (the DuckDB ground-truth oracle makes
    # the same move), while the verify join shuffles 8-byte longs
    # instead of ~20-byte shingle strings and compares longs in
    # array_intersect/array_union — narrower exchange, cheaper set ops
    # (guide: shuffle fewer bytes / narrower types). Also skips the
    # per-shingle array_join concat that string shingles pay.
    docs = base.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(shingle_hashes(text_col, shingle_n)).alias("__sh"),
    )
    if candidates is None:
        pairs = (
            docs.alias("l")
            .join(docs.alias("r"), F.col("l.__id") < F.col("r.__id"))
            .select(
                F.col("l.__id").alias("a"),
                F.col("r.__id").alias("b"),
                F.col("l.__sh").alias("sha"),
                F.col("r.__sh").alias("shb"),
            )
        )
    else:
        pairs = (
            candidates.join(docs.alias("l"), candidates["a"] == F.col("l.__id"))
            .join(docs.alias("r"), candidates["b"] == F.col("r.__id"))
            .select("a", "b", F.col("l.__sh").alias("sha"), F.col("r.__sh").alias("shb"))
        )
    inter = F.size(F.array_intersect("sha", "shb"))
    union = F.size(F.array_union("sha", "shb"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup survivors: drop docs Jaccard-similar (>= threshold) to a
    lower-id doc, using MinHash-LSH candidates + exact verification.

    Union-find-free formulation: a doc is dropped iff it appears as the
    greater id in any verified pair — deterministic, one pass, no iteration.
    (Full connected-components clustering is available via repeated
    pair-joins; at pipeline scale the drop-greater rule is the standard
    dedup policy.)
    """
    # materialize signatures BEFORE the LSH self-join (guide §8: compute
    # the fingerprint table once, decide on it). Without this the planner
    # duplicates the whole scan→tokenize→shingle→minhash-kernel subtree
    # onto BOTH sides of the band self-join (Python-UDF canonicalization
    # defeats exchange reuse; small-estimate corpora additionally plan the
    # banded side as a corpus-sized broadcast) — measured two
    # ArrowEvalPython evaluations per run at sf0.1, and the double worker
    # round-trip made run times bimodal (2 s / 9 s). One eval: ~20% faster
    # and stable. At scale this is n_docs × num_hashes longs — the
    # canonical materialized fingerprint pass.
    with_sig = minhash_signatures(
        df, text_col, id_col, num_hashes=num_hashes, shingle_n=shingle_n
    ).transform(materialize)
    cand = minhash_lsh_pairs(
        with_sig, id_col, "minhash", bands=bands, num_hashes=num_hashes
    )
    # materialize the (tiny) candidate set: the verify stage references it
    # from several branches (id union + both pair joins) and would otherwise
    # recompute the whole LSH band join once per branch
    cand = cand.transform(materialize)
    # fan the checkpointed candidates out: the LSH join's output exchange
    # is AQE-coalesced by BYTES (pairs are 16 B rows), but the verify
    # stage that inherits this partitioning does per-pair array set ops —
    # compute-dense, not byte-dense. At sf1 the whole verify ran ~2-4
    # wide; at real scale the candidate set is big enough that this is a
    # no-op (ensure_parallelism only fans out under-parallel frames).
    cand = ensure_parallelism(cand)
    verified = ngram_jaccard_pairs(
        df, text_col, id_col, shingle_n=shingle_n,
        threshold=threshold, candidates=cand,
    )
    dropped = verified.select(F.col("b").alias(id_col)).distinct()
    return df.join(dropped, on=id_col, how="left_anti")


def simhash(text: Column | str, *, bits: int = 64, shingle_n: int = 2) -> Column:
    """SimHash (BIGINT): sign-aggregated per-bit vote over shingle hashes.

    Classic Charikar construction: every shingle votes +1/-1 on each of the
    64 bits of its xxhash64; the fingerprint bit is 1 where the vote sum is
    positive. Expression-only.
    """
    sh = shingles(text, shingle_n)
    hashed = F.transform(sh, lambda s: F.xxhash64(s))

    def vote_for_bit(b: int):
        # 2-arg lambda required (see hash_with_seed note above)
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_exprs = []
    for b in range(bits):
        votes = F.aggregate(hashed, F.lit(0).cast("bigint"), vote_for_bit(b))
        bit_exprs.append(
            F.when(votes > 0, F.lit(1).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
            * F.lit(2 ** b if b < 63 else -(2 ** 63)).cast("bigint")
        )
    return sum(bit_exprs[1:], bit_exprs[0])


def simhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 2,
    out_col: str = "simhash",
) -> DataFrame:
    """SimHash fingerprints: one (id, BIGINT) row per input row.

    Scalable formulation of ``simhash`` (same bits): explode shingles, hash
    each once, then one groupBy computing the 64 per-bit vote sums with
    map-side partial aggregation — the shuffle carries 64 longs per doc.
    """
    from flink_psl_spark.parallelism import ensure_parallelism

    df = ensure_parallelism(df, id_col)
    ex = df.select(
        F.col(id_col),
        F.explode_outer(shingles(text_col, shingle_n)).alias("__s"),
    ).withColumn("__h", F.xxhash64("__s"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"__v{b}")
        for b in range(64)
    ]
    agged = ex.groupBy(id_col).agg(*votes)
    bit_exprs = [
        F.when(F.col(f"__v{b}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        * F.lit(2 ** b if b < 63 else -(2 ** 63)).cast("bigint")
        for b in range(64)
    ]
    return agged.select(id_col, sum(bit_exprs[1:], bit_exprs[0]).alias(out_col))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    shingle_n: int = 2,
) -> DataFrame:
    """Distinct (a, b) pairs with SimHash Hamming distance <= max_hamming.

    Candidate generation uses the standard block-permutation trick: split
    the 64-bit fingerprint into max_hamming+1 blocks — any pair within the
    distance budget must agree exactly on at least one block (pigeonhole;
    blocks need not cover all 64 bits for the guarantee to hold — uncovered
    bits only widen the candidate set). Self-join per block key, verify
    with bit_count. One shuffle.
    """
    blocks = max_hamming + 1
    width = 64 // blocks
    # fingerprints materialized before the block self-join — same
    # double-eval fix as minhash_dedup: the self-join otherwise plans the
    # shingle-explode + 64-vote aggregation subtree on BOTH sides
    # (measured: two Generate(shingles)→HashAggregate chains per run at
    # sf0.1, one of them feeding a corpus-sized broadcast). One eval of
    # the heavy agg; the materialized table is n_docs × (id, 1 long).
    fp = simhash_fingerprints(
        df, text_col, id_col, shingle_n=shingle_n, out_col="__fp"
    ).select(F.col(id_col).alias("__id"), "__fp").transform(materialize)
    banded = fp.select(
        "__id",
        "__fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("__fp"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("__blk", "__bh"),
    )
    return (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.__blk") == F.col("r.__blk"))
            & (F.col("l.__bh") == F.col("r.__bh"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .where(hamming64(F.col("l.__fp"), F.col("r.__fp")) <= max_hamming)
        .select(F.col("l.__id").alias("a"), F.col("r.__id").alias("b"))
        .distinct()
    )


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    shingle_n: int = 2,
    verify_threshold: float | None = None,
    verify_shingle_n: int = 3,
) -> DataFrame:
    """Near-dup survivors under SimHash Hamming distance <= max_hamming.

    With ``verify_threshold``, SimHash only generates candidates (use a
    generous ``max_hamming`` for recall) and each candidate pair is verified
    with exact n-gram Jaccard — the sketch-for-candidates / exact-for-output
    shape ``minhash_dedup`` uses, whose result is exact w.r.t. the Jaccard
    threshold whenever the Hamming budget captures every true pair.
    """
    cand = simhash_candidate_pairs(
        df, text_col, id_col, max_hamming=max_hamming, shingle_n=shingle_n
    )
    if verify_threshold is not None:
        cand = cand.transform(materialize)
        cand = ensure_parallelism(cand)  # see minhash_dedup: the verify
        # stage is compute-dense and must not inherit a byte-coalesced
        # candidate partitioning
        cand = ngram_jaccard_pairs(
            df, text_col, id_col, shingle_n=verify_shingle_n,
            threshold=verify_threshold, candidates=cand,
        )
    dropped = cand.select(F.col("b").alias(id_col)).distinct()
    return df.join(dropped, on=id_col, how="left_anti")


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    segment_tokens: int = 16,
) -> DataFrame:
    """Segment-level corpus-wide exact dedup (the line-level dedup of
    C4/CCNet-style curation, applied to fixed token segments).

    Each document is cut into consecutive ``segment_tokens``-token segments
    (row-local, emitted in the scan stage like ``chunk_documents``); a
    segment is kept only for its first occurrence in the corpus (ordered by
    (id, position) — deterministic under retries), and every document is
    reassembled from its surviving segments.

    Scale shape: segments shuffle once keyed by their md5 (16-byte key, not
    the text) for the keep-first window, then once by document id for
    reassembly — no all-pairs work, no driver involvement. Returns
    (id, n_segments, n_kept, clean_text) for every input document (documents
    whose segments all duplicate earlier ones come back with n_kept = 0 and
    an empty clean_text).
    """
    from pyspark.sql import Window

    toks = tokenize(F.col(text_col))
    seg = df.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(segment_tokens)
            )
        ).alias("_s"),
        toks.alias("_toks"),
    )
    piece = F.slice(F.col("_toks"), F.col("_s"), segment_tokens)
    seg = seg.select(
        F.col(id_col),
        ((F.col("_s") - 1) / segment_tokens).cast("bigint").alias("seg_no"),
        F.array_join(piece, " ").alias("seg"),
    ).where(F.size(piece) > 0)
    w = Window.partitionBy(F.md5("seg")).orderBy(id_col, "seg_no")
    tagged = seg.withColumn("_keep", F.row_number().over(w) == 1)
    # one pass per document: totals + survivors together (collect_list drops
    # the nulls the non-kept segments map to), so the reassembly costs a
    # single doc-keyed shuffle
    kept_struct = F.when(F.col("_keep"), F.struct("seg_no", "seg"))
    rebuilt = tagged.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_segments"),
        F.sum(F.col("_keep").cast("long")).cast("bigint").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda x: x["seg"]
            ),
        ).alias("clean_text"),
    )
    return (
        df.select(id_col)
        .distinct()
        .join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_segments", F.lit(0)).cast("bigint").alias("n_segments"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def boilerplate_removal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    segment_tokens: int = 8,
    max_docs: int = 2,
) -> DataFrame:
    """Corpus-frequency boilerplate removal (the repeated-paragraph filter
    of public web-corpus recipes, e.g. CCNet's per-shard paragraph-hash
    filter): a segment whose text occurs in MORE THAN ``max_docs`` distinct
    documents is boilerplate (headers, footers, navigation, license
    blurbs) and is removed from EVERY document — unlike ``segment_dedup``,
    no copy survives.

    Scale shape — three keyed shuffles, no all-pairs, no driver state:

    1. segment explode is row-local in the scan stage;
    2. distinct (segment-md5, doc) pairs then a count per md5 — the
       hash-aggregate reuses the distinct's partitioning, so exact
       distinct-doc counts cost ONE exchange keyed by the 16-byte hash;
    3. the frequency verdict joins back on the md5 key (equi-join, AQE
       skew-safe: hot boilerplate hashes are exactly the skewed ones);
    4. reassembly is one doc-keyed aggregate, as in ``segment_dedup``.

    Returns (id, n_segments, n_removed, clean_text) for every input
    document.
    """
    toks = tokenize(F.col(text_col))
    seg = df.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(segment_tokens)
            )
        ).alias("_s"),
        toks.alias("_toks"),
    )
    piece = F.slice(F.col("_toks"), F.col("_s"), segment_tokens)
    seg = seg.select(
        F.col(id_col),
        ((F.col("_s") - 1) / segment_tokens).cast("bigint").alias("seg_no"),
        F.array_join(piece, " ").alias("seg"),
    ).where(F.size(piece) > 0)
    seg = seg.withColumn("_h", F.md5("seg"))
    freq = (
        seg.select("_h", id_col)
        .distinct()
        .groupBy("_h")
        .agg(F.count("*").alias("_ndocs"))
    )
    # MERGE hint: both sides of the verdict join are data-sized (segments
    # and distinct-segment frequencies), but the segment side's file-based
    # estimate sits under the broadcast threshold at small SF, so the
    # planner BROADCAST the corpus-sized segment table (18 MiB build,
    # 1.8 s collect = ~38% of the stage at sf0.1) — a shape that breaks
    # outright at scale. Sort-merge is the scale-correct strategy and
    # measured ~40% faster locally (4.3 -> 2.6 s for the stage).
    tagged = seg.join(freq.hint("merge"), on="_h").withColumn(
        "_keep", F.col("_ndocs") <= max_docs
    )
    kept_struct = F.when(F.col("_keep"), F.struct("seg_no", "seg"))
    rebuilt = tagged.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_segments"),
        F.sum((~F.col("_keep")).cast("long")).cast("bigint").alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda x: x["seg"]
            ),
        ).alias("clean_text"),
    )
    return (
        df.select(id_col)
        .distinct()
        .join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_segments", F.lit(0)).cast("bigint").alias("n_segments"),
            F.coalesce("n_removed", F.lit(0)).cast("bigint").alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def duplicate_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_span_df: int = 8,
    min_shared: int = 1,
    hashed: bool = True,
) -> DataFrame:
    """Cross-document verbatim-span detection — the ExactSubstr signal
    of the published dedup recipes (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): find document pairs that share
    long exact token spans, the duplication MinHash's bag-of-shingles
    view underweights (one long quoted passage barely moves whole-doc
    Jaccard but is exactly what substring dedup removes).

    Mechanics: every ``k``-token shingle of every document (distinct per
    doc), spans kept only when their document frequency is in
    [2, ``max_span_df``] — the df cap bounds the self-join fan-out to
    C(max_span_df, 2) pairs per span (boilerplate that appears
    everywhere is the boilerplate_removal operator's job, not a dup
    signal), the same discipline as the video-clip candidate join. The
    surviving spans equi-join to pairs and aggregate to
    ``(a, b, n_shared)`` with ``a < b``.

    ``hashed=True`` (default, the scale path) shuffles 64-bit xxhash64
    span keys instead of k-token strings — identical output barring a
    ~2^-64 collision; ``hashed=False`` keeps string keys for
    cross-engine replay (the oracle path).

    Scale shape: explode (row-local) → distinct + df filter (one shuffle
    keyed by span), bounded-fan-out self-join on the span key, one pair
    aggregation. No all-pairs stage anywhere.
    """
    from flink_psl_spark.llm.text import ngrams

    span = F.explode(ngrams(F.col(text_col), k)).alias("span")
    spans = docs.select(F.col(id_col).alias("__id"), span).distinct()
    if hashed:
        spans = spans.select("__id", F.xxhash64("span").alias("span"))
    kept = (
        spans.groupBy("span")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where((F.col("__df") >= 2) & (F.col("__df") <= max_span_df))
        .select("span")
    )
    candidates = spans.join(kept, on="span")
    pairs = (
        candidates.alias("l")
        .join(
            candidates.alias("r"),
            (F.col("l.span") == F.col("r.span"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .groupBy(
            F.col("l.__id").alias("a"), F.col("r.__id").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return pairs


def remove_duplicate_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_span_df: int = 8,
) -> DataFrame:
    """Substring-level dedup as a TRANSFORMATION — the action
    counterpart of :func:`duplicate_spans` (Lee et al.'s ExactSubstr
    recipe): every duplicated ``k``-token span is kept only in its
    OWNER document (the lowest id containing it) and its token
    positions are cut from every other document, which is then
    reassembled from its surviving tokens (single-space joined —
    whitespace is already normalized by tokenization).

    Policy notes: the owner keeps ALL its occurrences of the span;
    spans above ``max_span_df`` distinct documents are left alone —
    corpus-wide boilerplate is :func:`boilerplate_removal`'s job, and
    the cap bounds the coverage fan-out per span key. Documents shorter
    than ``k`` tokens pass through untouched; a document whose every
    token is covered comes back as the empty string (callers typically
    filter those).

    Scale shape: positional shingles explode row-locally; ownership is
    one aggregation keyed by span; coverage is a bounded explode (k
    positions per dropped span occurrence) then a per-doc anti join;
    reassembly is one aggregation keyed by doc. No pair join at all —
    unlike detection, removal never materializes document pairs.
    """
    from flink_psl_spark.llm.text import bind_once, tokenize

    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokenize(F.col(text_col))).alias("__pos", "__tok"),
    )

    def _positional(w):
        # w is a BOUND lambda variable (bind_once): referencing the raw
        # tokenize() tree here would re-tokenize the document once per
        # span position (the measured 5-7x n-gram-scan trap ngrams()
        # already guards against). The span travels as its xxhash64 —
        # ownership/coverage only need span IDENTITY, so the group/join
        # key is 8 bytes instead of a k-token string (the r12 hashed-
        # shingle move; collisions between distinct spans are ~2^-64).
        count = F.size(w) - (k - 1)
        return F.when(
            count < 1, F.array().cast("array<struct<start:int,span:bigint>>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), count - 1),
                lambda i: F.struct(
                    i.cast("int").alias("start"),
                    F.xxhash64(
                        F.concat_ws(" ", F.slice(w, i + 1, k))
                    ).alias("span"),
                ),
            )
        )

    positional = bind_once(tokenize(F.col(text_col)), _positional)
    # the span table has TWO consumers (the ownership aggregate and the
    # coverage join) — materialize the narrow (id, start, hash) frame
    # once so the tokenize + span explode runs ONCE, not per consumer
    # (the executed plan carried two full Generate subtrees before)
    spans = docs.select(
        F.col(id_col).alias("__id"), F.explode(positional).alias("__s")
    ).select(
        "__id", F.col("__s.start").alias("__start"), F.col("__s.span").alias("__span")
    ).transform(materialize)
    owners = (
        spans.groupBy("__span")
        .agg(
            F.min("__id").alias("__owner"),
            F.count_distinct("__id").alias("__df"),
        )
        .where((F.col("__df") >= 2) & (F.col("__df") <= max_span_df))
        .select("__span", "__owner")
    )
    covered = (
        spans.join(owners, on="__span")
        .where(F.col("__id") != F.col("__owner"))
        .select(
            "__id",
            F.explode(
                F.sequence(F.col("__start"), F.col("__start") + (k - 1))
            ).alias("__pos"),
        )
        .distinct()
    )
    kept = toks.join(covered, on=["__id", "__pos"], how="left_anti")
    rebuilt = kept.groupBy("__id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__tok"))
                ),
                lambda s: s["__tok"],
            ),
        ).alias("__text")
    )
    return (
        docs.select(F.col(id_col))
        .join(rebuilt, docs[id_col] == rebuilt["__id"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__text"), F.lit("")).alias(text_col),
        )
    )


def online_band_candidate_pairs(
    banded: DataFrame, *, max_bucket: int = 64
) -> DataFrame:
    """Keyed bucket-roster state over ANY banded stream
    ``(__id bigint, __band, __bh)`` → append stream of candidate id
    pairs (a < b), emitted the moment the later member lands in a
    shared bucket. The state core shared by the streaming MinHash-LSH
    text path and the streaming dHash image path — the pair set equals
    the batch band join under any arrival order or batch split (roster
    = order-insensitive set union, capped at ``max_bucket`` lowest
    ids; see online_lsh_candidate_pairs for the cap contract)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, batches, state: GroupState):
        roster = sorted(state.get[0]) if state.exists else []
        new_ids = sorted(
            {
                int(i)
                for b in batches
                for i in b["__id"].tolist()
                if i not in roster
            }
            - set(roster)
        )
        out_a, out_b = [], []
        seen = set(roster)
        for nid in new_ids:
            for old in roster:
                if old != nid:
                    lo, hi = (old, nid) if old < nid else (nid, old)
                    out_a.append(lo)
                    out_b.append(hi)
            # pairs among same-batch arrivals: earlier new ids are in
            # `seen` by the time the later one is processed
            for other in new_ids:
                if other >= nid:
                    break
                out_a.append(other)
                out_b.append(nid)
            seen.add(nid)
        roster = sorted(seen)[:max_bucket]
        state.update((roster,))
        yield pd.DataFrame({"a": out_a, "b": out_b}, dtype="int64")

    return banded.groupBy("__band", "__bh").applyInPandasWithState(
        fn,
        outputStructType="a bigint, b bigint",
        stateStructType="ids array<bigint>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def online_lsh_candidate_pairs(
    stream_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int = 64,
) -> DataFrame:
    """STREAMING MinHash-LSH candidate generation: near-dup candidate
    pairs emitted continuously as documents arrive — the ingest-time half
    of online near-dup dedup (reference counterpart: the keyed-state
    dedup operators of StreamExecDeduplicate.java, generalized from exact
    keys to LSH buckets).

    Each micro-batch computes signatures batch-locally (the same
    expression + Arrow kernel as the batch path — no extra state), bands
    them, and routes (band, band_hash) groups through keyed state holding
    the bucket's doc-id roster. A pair (a, b), a < b, is emitted the
    moment the LATER of the two lands in a shared bucket — so the emitted
    pair set equals the batch LSH candidate set regardless of arrival
    order or micro-batch boundaries (the roster is an order-insensitive
    set union; emission de-dups per bucket, a global distinct after drain
    de-dups across buckets).

    Scale guard: rosters cap at ``max_bucket`` ids, keeping the LOWEST
    (deterministic under any arrival order once the bucket has drained
    past the cap). A bucket past the cap means near-identical boilerplate
    flooding one LSH cell; pairs against the lowest ids still mark every
    later member a duplicate, which is exactly the dedup outcome — what
    is lost is only duplicate-CLUSTER completeness, same contract as the
    batch path's sub-bucket cap in semantic_dedup.
    """
    if num_hashes % bands != 0:
        raise ValueError(f"num_hashes {num_hashes} not divisible by {bands}")
    r = num_hashes // bands
    sig = minhash_signatures(
        stream_docs, text_col, id_col,
        num_hashes=num_hashes, shingle_n=shingle_n,
    )
    banded = sig.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.slice("minhash", b * r + 1, r))
                    for b in range(bands)
                ]
            )
        ).alias("__band", "__bh"),
    )

    return online_band_candidate_pairs(banded, max_bucket=max_bucket)


def minhash_dedup_keep_best(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup survivors with QUALITY-AWARE representative selection:
    duplicate groups come from MinHash-LSH candidates + exact-Jaccard
    verification + connected components, and each group keeps its
    highest-``quality_col`` member (ties → lowest id) instead of
    ``minhash_dedup``'s keep-lowest-id policy — the curation rule a real
    training pipeline wants ("of these near-identical pages, keep the
    longest / highest-scored one").

    Scale shape on top of minhash_dedup's: the verified pair set is
    sparse (near-dup groups), connected components iterate over it
    (pair-sized, never corpus-sized), and representative election is one
    rank-1 window per cluster (WindowGroupLimit). Docs in no pair pass
    through untouched — the corpus-sized path is ONE scan with one
    broadcast left join against the pair-sized verdict marker (an
    anti ∪ semi union of two joins on df would scan the corpus twice:
    union branches plan as independent subtrees).
    """
    from pyspark.sql import Window

    from flink_psl_spark.llm.clustering import dedup_clusters

    # signatures materialized before the self-join — same double-eval
    # fix as minhash_dedup (the band self-join otherwise plans the
    # signature subtree twice)
    with_sig = minhash_signatures(
        df, text_col, id_col, num_hashes=num_hashes, shingle_n=shingle_n
    ).transform(materialize)
    cand = minhash_lsh_pairs(
        with_sig, id_col, "minhash", bands=bands, num_hashes=num_hashes
    ).transform(materialize)
    cand = ensure_parallelism(cand)  # see minhash_dedup
    verified = ngram_jaccard_pairs(
        df, text_col, id_col, shingle_n=shingle_n,
        threshold=threshold, candidates=cand,
    )
    clusters = dedup_clusters(verified)  # (doc_id, cluster_id), pair-sized
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    reps = (
        clusters.join(df.select(id_col, quality_col), on=id_col)
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(id_col)
    )
    # per-clustered-id verdict (pair-sized): keep only representatives;
    # ids absent from the marker were never in a duplicate group
    marker = (
        clusters.select(id_col)
        .join(reps.withColumn("__keep", F.lit(True)), on=id_col, how="left")
        .select(
            id_col, F.coalesce("__keep", F.lit(False)).alias("__keep")
        )
    )
    return (
        df.join(F.broadcast(marker), on=id_col, how="left")
        .where(F.col("__keep").isNull() | F.col("__keep"))
        .select(*df.columns)
    )


def cross_corpus_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Dedup a NEW crawl against an EXISTING corpus only — no intra-crawl
    or intra-corpus pairing: a new doc is dropped iff it is near-dup
    (exact Jaccard >= threshold, MinHash-LSH candidates) of some corpus
    doc. The incremental-ingest policy of every production pipeline: the
    existing corpus is immutable, the crawl is filtered against it.

    Scale shape: signatures are row-local on both sides; the band join is
    a shuffle equi-join on (band, band_hash) between the two sides (never
    a self-join — intra-side pairs are structurally impossible, which
    also makes the candidate set far smaller than a pooled self-join's);
    verification touches only candidate ids. At 100 TB the corpus side's
    banded table is a precomputable index — recompute is this function's
    contract, persistence is a one-line `.write` on `banded_r`.
    """
    if num_hashes % bands != 0:
        raise ValueError(f"num_hashes {num_hashes} not divisible by {bands}")
    r = num_hashes // bands

    def banded(df: DataFrame, out_id: str) -> DataFrame:
        sig = minhash_signatures(
            df, text_col, id_col, num_hashes=num_hashes, shingle_n=shingle_n
        )
        return sig.select(
            F.col(id_col).alias(out_id),
            F.posexplode(
                F.array(
                    *[
                        F.xxhash64(F.slice("minhash", b * r + 1, r))
                        for b in range(bands)
                    ]
                )
            ).alias("__band", "__bh"),
        )

    banded_l = banded(new_docs, "a")
    banded_r = banded(corpus, "b")
    cand = (
        banded_l.join(banded_r, on=["__band", "__bh"])
        .select("a", "b")
        .distinct()
        .transform(materialize)
    )
    pool = new_docs.select(id_col, text_col).unionByName(
        corpus.select(id_col, text_col)
    )
    verified = ngram_jaccard_pairs(
        pool, text_col, id_col, shingle_n=shingle_n,
        threshold=threshold, candidates=cand,
    )
    dropped = verified.select(F.col("a").alias(id_col)).distinct()
    return new_docs.join(dropped, on=id_col, how="left_anti")


def shingle_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 4,
    threshold: float = 0.5,
    df_range: tuple[int, int] = (2, 8),
) -> DataFrame:
    """ASYMMETRIC near-dup detection: pairs where the SMALLER document's
    shingle set is >= ``threshold`` CONTAINED in the larger one's
    (|A∩B| / |A|, |A| <= |B|) — catches quote-inclusion / page-subset
    duplication that symmetric Jaccard misses (a doc fully quoted inside
    a 10× longer page has Jaccard ~0.1 but containment 1.0).

    Candidates come from shared *discriminative* shingles (document
    frequency in ``df_range`` — ubiquitous shingles are dropped BEFORE
    the pair join, the same df-cap as duplicate-span mining), so the
    join is bounded by rare-shingle co-occurrence, never all-pairs.
    Containment is then verified exactly on the candidate ids only.
    """
    lo, hi = df_range
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(shingle_hashes(text_col, shingle_n)).alias("__s"),
    ).where(F.size("__s") > 0)
    e = sh.select("__id", F.explode("__s").alias("__h"))
    rare = (
        e.groupBy("__h")
        .agg(F.count("*").alias("__df"))
        .where((F.col("__df") >= lo) & (F.col("__df") <= hi))
        .select("__h")
    )
    co = e.join(rare, on="__h")
    cand = (
        co.alias("l")
        .join(
            co.alias("r"),
            (F.col("l.__h") == F.col("r.__h"))
            & (F.col("l.__id") != F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("a"), F.col("r.__id").alias("b"))
        .distinct()
        .transform(materialize)
    )
    pairs = (
        cand.join(
            sh.select(F.col("__id").alias("a"), F.col("__s").alias("__sa")),
            on="a",
        )
        .join(
            sh.select(F.col("__id").alias("b"), F.col("__s").alias("__sb")),
            on="b",
        )
        # orient: a = the smaller shingle set (containment's denominator)
        .where(F.size("__sa") <= F.size("__sb"))
        .withColumn(
            "containment",
            F.round(
                F.size(F.array_intersect("__sa", "__sb"))
                / F.size("__sa"),
                6,
            ),
        )
        .where(F.col("containment") >= threshold)
    )
    return pairs.select("a", "b", "containment")


def shingle_strings(tokens_col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle strings from an ALREADY-PROJECTED token-array
    column. Project the tokens first (``.select(tokenize(text).alias(
    "tk"))``) and shingle the bound column: an expression tree (like the
    tokenizer's split) referenced inside a ``transform`` lambda is
    re-evaluated PER ELEMENT by codegen — measured 7x on the
    corpus-overlap scan. Duplicates are kept; set-semantics consumers
    (KMV, global DISTINCT) dedup globally anyway — the per-doc
    ``array_distinct`` pass is ``shingles``'s contract, not this one's.
    """
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    k = F.size(t) - (n - 1)
    return F.when(k < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        )
    )
