"""Dataset sampling & mixing for training-data curation (beyond-reference,
SURVEY §7 M5 family).

All sampling here is DETERMINISTIC (hash-threshold, not rand()): re-running
the pipeline — or retrying a failed task — selects the same rows, which is
what makes sampled training mixes reproducible at 100 TB. Each helper is a
single narrow transformation (a filter on a hash) — no shuffle, no driver
involvement, fully pushdown-friendly.

The bucket hash is MD5-derived (first 6 hex digits of
``md5(concat_ws('|', keys..., seed))``) rather than xxhash64: md5 is
available in every engine, so the *exact row selection* reproduces in
DuckDB/Trino/Snowflake — auditable sampled corpora, not just stable ones.
md5 on a short key string costs nanoseconds per row; selection stays a
narrow pushdown-friendly filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from flink_psl_spark.materialize import materialize

_HASH_BUCKETS = 16**6  # bucket = first 6 hex digits of md5 → [0, 16^6)


def _bucket(cols: list[str], seed: int) -> Column:
    """Uniform bucket in [0, 16^6): parse the first 6 hex chars of
    md5('key1|key2|...|seed'). Cross-engine SQL equivalent (DuckDB):
    ``CAST('0x' || SUBSTR(MD5(CONCAT_WS('|', keys..., 'seed')), 1, 6) AS BIGINT)``.
    """
    s = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in cols], F.lit(str(seed))
    )
    return F.conv(F.substring(F.md5(s), 1, 6), 16, 10).cast("bigint")


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    *,
    key_cols: list[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by hash threshold.

    ``key_cols`` defaults to all columns; passing a stable id column makes
    the sample invariant to column additions.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    keys = key_cols or list(df.columns)
    return df.where(_bucket(keys, seed) < int(fraction * _HASH_BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    *,
    key_cols: list[str] | None = None,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (≈ df.sampleBy, but reproducible
    under retries): e.g. ``{"en": 1.0, "fr": 0.5}`` keeps all English docs
    and half the French ones."""
    keys = key_cols or [c for c in df.columns if c != strata_col]
    frac = F.lit(default_fraction)
    for value, f in fractions.items():
        frac = F.when(F.col(strata_col) == value, F.lit(float(f))).otherwise(frac)
    return df.where(_bucket(keys, seed) < (frac * _HASH_BUCKETS).cast("long"))


def mix_datasets(
    parts: list[tuple[DataFrame, float]],
    *,
    key_cols: list[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Weighted training mix: downsample each source to its weight and
    union, tagging provenance in ``__mix_source``.

    Weights are per-source keep-fractions (1.0 = take everything), the
    standard way corpus mixes are specified; relative proportions then
    follow from the sources' sizes.
    """
    out = None
    for i, (df, w) in enumerate(parts):
        sampled = deterministic_sample(
            df, w, key_cols=key_cols, seed=seed + i
        ).withColumn("__mix_source", F.lit(i))
        out = sampled if out is None else out.unionByName(sampled)
    return out


def deterministic_shuffle(
    df: DataFrame,
    *,
    key_cols: list[str],
    n_shards: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic training-order shuffle: assign every row a (shard,
    pos) coordinate that is pseudorandom but fully reproducible.

    Shard = hash bucket mod ``n_shards`` (one narrow projection); position =
    rank within the shard under an independent hash ordering (per-shard
    window — the sort never exceeds one shard, so there is no global sort to
    serialize at 100 TB; shards are the parallel unit a training job reads).
    Two independent md5 derivations (seed, seed+1) decorrelate shard
    assignment from intra-shard order.
    """
    from pyspark.sql import Window

    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    order_key = F.md5(
        F.concat_ws(
            "|", *[F.col(c).cast("string") for c in key_cols], F.lit(str(seed + 1))
        )
    )
    w = Window.partitionBy("shard").orderBy("_ord", *key_cols)
    return (
        df.withColumn("shard", (_bucket(key_cols, seed) % n_shards).cast("bigint"))
        .withColumn("_ord", order_key)
        .withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
        .drop("_ord")
    )


def temperature_mix(
    df: DataFrame,
    source_col: str,
    *,
    alpha: float = 0.5,
    key_cols: list[str],
    seed: int = 42,
) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual sampling scheme
    of public multilingual-LM recipes): sampled size per source ∝ p_i^alpha,
    where p_i is the source's corpus share.

    Keep-rate r_i ∝ p_i^(alpha-1), scaled so max r_i = 1 — with alpha < 1
    the distribution flattens (small sources keep everything, large sources
    are downsampled); alpha = 1 is a no-op. Selection is the deterministic
    md5-threshold filter, so the mix reproduces exactly across engines and
    retries. Per-source rates come from a #sources-row aggregate (tiny,
    broadcast back into the filter) — the scan-side work stays a narrow
    filter. Output rows carry ``__mix_rate`` (the applied keep-rate).
    """
    from pyspark.sql import Window

    everything = Window.partitionBy()
    rates = (
        df.groupBy(source_col)
        .agg(F.count("*").alias("__n"))
        .withColumn("__p", F.col("__n") / F.sum("__n").over(everything))
        .withColumn("__rr", F.pow("__p", F.lit(alpha - 1.0)))
        .withColumn("__mix_rate", F.col("__rr") / F.max("__rr").over(everything))
        .select(source_col, "__mix_rate")
    )
    joined = df.join(F.broadcast(rates), on=source_col)
    thresh = (F.col("__mix_rate") * _HASH_BUCKETS).cast("bigint")
    return joined.where(_bucket(key_cols, seed) < thresh)


def token_budget_mix(
    df: DataFrame,
    source_col: str,
    budgets: dict,
    *,
    token_count_col: str | None = None,
    text_col: str = "text",
    key_cols: list[str],
    seed: int = 42,
    default_budget: int | None = None,
    order_buckets: int = 256,
) -> DataFrame:
    """Cap each source at a token budget (the per-domain token caps of
    public corpus recipes): documents are taken in deterministic
    pseudorandom order (md5 of the keys) until the source's budget is
    reached; the document that crosses the budget line is INCLUDED (caps
    are approximate in corpus building; truncating mid-document is a
    chunking concern, not a sampling one).

    Scale design — two-pass distributed prefix sum. A naive
    ``Window.partitionBy(source)`` running sum puts an ENTIRE source in
    one partition: with a handful of sources at 100 TB that is a
    serialized multi-TB sort. Instead the md5 order key is range-split
    into ``order_buckets`` ordered buckets (its leading hex digits, so
    bucket order == sort order and md5 uniformity balances them):

    1. per-(source, bucket) token totals — a tiny hash aggregate
       (#sources x order_buckets rows);
    2. exclusive prefix sum of bucket totals per source — a window over
       that tiny frame only;
    3. broadcast the bucket offsets back and run the fine running-sum
       window INSIDE each (source, bucket) partition, adding the offset.

    The widest sort is one bucket (~1/order_buckets of a source), the
    parallel unit is sources x buckets, and the output is byte-identical
    to the single-partition formulation (same order key, same tie-break).
    Sources without a budget keep everything unless ``default_budget`` is
    set. Output rows carry ``__cum_tokens`` (the running sum inclusive of
    the row) for auditability.
    """
    from pyspark.sql import Window

    from flink_psl_spark.llm.text import token_count

    if order_buckets <= 0:
        raise ValueError("order_buckets must be positive")
    toks = (
        F.col(token_count_col)
        if token_count_col
        else token_count(F.col(text_col))
    )
    order = F.md5(
        F.concat_ws(
            "|", *[F.col(c).cast("string") for c in key_cols], F.lit(str(seed))
        )
    )
    budget = F.lit(None).cast("bigint")
    for src, b in budgets.items():
        budget = F.when(F.col(source_col) == src, F.lit(int(b))).otherwise(budget)
    if default_budget is not None:
        budget = F.coalesce(budget, F.lit(int(default_budget)))

    # range bucket: leading 3 hex digits of the md5 order key, scaled to
    # order_buckets contiguous ranges — all rows of bucket i sort strictly
    # before bucket i+1 (equal __ord values share a bucket, so the
    # key_cols tie-break stays within one partition)
    bucket = (
        (F.conv(F.substring("__ord", 1, 3), 16, 10).cast("bigint")
         * order_buckets) / 4096
    ).cast("bigint")
    rows = (
        df.withColumn("__ord", order)
        .withColumn("__n_tokens", toks.cast("bigint"))
        .withColumn("__bkt", bucket)
    )
    # pass 1: per-(source, bucket) totals, then exclusive prefix offsets
    # over the tiny aggregate (window frame = #buckets rows per source)
    off_w = (
        Window.partitionBy(source_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        rows.groupBy(source_col, "__bkt")
        .agg(F.sum("__n_tokens").alias("__bkt_tokens"))
        .withColumn(
            "__offset",
            F.coalesce(F.sum("__bkt_tokens").over(off_w), F.lit(0)),
        )
        .select(source_col, "__bkt", "__offset")
    )
    # pass 2: fine running sum inside each (source, bucket) partition
    fine_w = (
        Window.partitionBy(source_col, "__bkt")
        .orderBy("__ord", *key_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        rows.join(F.broadcast(offsets), on=[source_col, "__bkt"])
        .withColumn(
            "__cum_tokens",
            F.col("__offset") + F.sum("__n_tokens").over(fine_w),
        )
        .withColumn("__budget", budget)
        .where(
            F.col("__budget").isNull()
            | (F.col("__cum_tokens") - F.col("__n_tokens") < F.col("__budget"))
        )
        .drop("__ord", "__budget", "__bkt", "__offset")
    )


def distributed_ntile(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    *,
    n_tiles: int = 4,
    out_col: str = "tile",
    bin_col: Column | None = None,
) -> DataFrame:
    """Scale-safe NTILE over a global (value, tiebreak) order — WITHOUT the
    single-partition window a naive ``Window.orderBy(...)`` would plan.

    Same two-pass prefix-sum shape as ``token_budget_mix``: rows map to
    coarse ORDERED bins (default ``floor(value)`` — any monotone binning
    works; pass ``bin_col`` to override), per-bin counts are prefix-summed
    into exclusive rank offsets (a tiny #bins-row window), and the fine
    rank window runs only INSIDE each bin. The global rank is
    offset + within-bin rank; tile = ((rank-1)*n_tiles) // total + 1 —
    explicit integer arithmetic, reproducible in any engine (unlike SQL
    NTILE's engine-specific remainder distribution... which this formula
    intentionally does NOT mimic; document the formula, not the keyword).
    """
    from pyspark.sql import Window

    if n_tiles <= 0:
        raise ValueError("n_tiles must be positive")
    b = bin_col if bin_col is not None else F.floor(F.col(value_col))
    # three consumers (bin counts, total, fine pass) — materialize the
    # input once; callers pass the narrow projection they need, and an
    # unmaterialized triple reference re-plans the (often expensive)
    # upstream score/aggregate subtree per consumer, compounding when
    # ntile passes are chained (RFM chains three).
    rows = df.withColumn("__bin", b.cast("bigint")).transform(materialize)
    off_w = (
        Window.partitionBy(F.lit(1))
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        rows.groupBy("__bin")
        .agg(F.count("*").alias("__bn"))
        .withColumn(
            "__off", F.coalesce(F.sum("__bn").over(off_w), F.lit(0))
        )
        .select("__bin", "__off")
    )
    total = rows.count()  # bounded driver scalar (like IVF's corpus count)
    fine_w = Window.partitionBy("__bin").orderBy(value_col, tiebreak_col)
    return (
        rows.join(F.broadcast(offsets), on="__bin")
        .withColumn("__rank", F.col("__off") + F.row_number().over(fine_w))
        .withColumn(
            out_col,
            (
                F.floor(((F.col("__rank") - 1) * n_tiles) / F.lit(total)) + 1
            ).cast("int"),
        )
        .drop("__bin", "__off", "__rank")
    )


def importance_resample(
    docs: DataFrame,
    target_pred: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    k: int = 100,
) -> DataFrame:
    """DSIR-style importance resampling (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every RAW
    document by how target-like its hashed n-gram features are, and keep
    the top ``k``.

    Recipe (the published one, re-expressed as two corpus scans):
    hashed uni+bigram features into ``n_buckets`` buckets; bucket
    distributions p (docs where ``target_pred``) and q (the rest), add-1
    smoothed; per-raw-doc importance weight = sum over its feature
    occurrences of log p[b] - log q[b]; selection = global top-k by
    weight. (The paper adds Gumbel noise to sample rather than argmax;
    with a deterministic engine the noiseless top-k is the replayable
    variant — seeded hash noise drops in via an extra ``_bucket`` term if
    sampling-without-argmax is wanted.)

    Cross-engine exactness: per-bucket log-ratios are quantized to 1e-6
    integers BEFORE the per-doc sum (the llm_bigram_lm_score pattern), so
    the aggregate is an addition-order-proof integer sum.

    Scale shape: feature explode is map-side; the bucket tables are
    ``n_buckets``-bounded aggregates (broadcastable by construction); the
    per-doc score is one hash aggregation with map-side partial sums; the
    top-k is a distributed TakeOrdered, never a global sort. No step
    depends on corpus size beyond the two scans.
    """
    import math

    from pyspark.sql import Window

    from flink_psl_spark.llm.text import ngrams, tokenize

    grams = F.concat(
        tokenize(F.col(text_col)), ngrams(F.col(text_col), 2)
    )
    feats = docs.select(
        F.col(id_col).alias("__id"),
        target_pred.alias("__t"),
        F.explode(grams).alias("__g"),
    ).select(
        "__id",
        "__t",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("__g")), 1, 6), 16, 10).cast(
                "bigint"
            ),
            F.lit(n_buckets),
        ).alias("__b"),
    )
    # featurize ONCE: the hashed-feature explode (tokenize + per-gram
    # md5, the query's dominant CPU) feeds both the bucket-distribution
    # aggregate and the scoring pass — without materialization each
    # reference re-ran it (measured 3.2 -> 2.1 s at sf0.1 with the
    # checkpoint; results identical). The stored rows are narrow
    # (id, bool, bucket) — the DSIR featurize-once design.
    feats = feats.transform(materialize)
    # ONE aggregation yields both bucket distributions; collecting the
    # n_buckets-bounded table (a parameter, not data-sized) gives the
    # totals for free — the corpus is scanned exactly twice (this agg +
    # the scoring pass), not once per distribution/total
    cnt_rows = (
        feats.groupBy("__b")
        .agg(
            F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("__tc"),
            F.sum(F.when(~F.col("__t"), 1).otherwise(0)).alias("__rc"),
        )
        .collect()
    )
    t_tot = sum(r["__tc"] for r in cnt_rows)
    r_tot = sum(r["__rc"] for r in cnt_rows)
    ratio = docs.sparkSession.createDataFrame(
        [(r["__b"], r["__tc"], r["__rc"]) for r in cnt_rows],
        "__b bigint, __tc bigint, __rc bigint",
    ).select(
        "__b",
        F.round(
            (
                F.log(F.col("__tc") + 1.0)
                - F.lit(float(math.log(t_tot + n_buckets)))
                - F.log(F.col("__rc") + 1.0)
                + F.lit(float(math.log(r_tot + n_buckets)))
            )
            * 1000000.0
        )
        .cast("bigint")
        .alias("__lr"),
    )
    scored = (
        feats.where(~F.col("__t"))
        .join(F.broadcast(ratio), on="__b")
        .groupBy("__id")
        .agg(
            F.sum("__lr").alias("__score"),
            F.count("*").alias("n_feats"),
        )
    )
    topk = scored.orderBy(F.desc("__score"), F.asc("__id")).limit(k)
    w = Window.orderBy(F.desc("__score"), F.asc("__id"))
    return (
        topk.withColumn("rank", F.row_number().over(w))  # k-row frame only
        .select(
            F.col("__id").alias(id_col),
            F.round(F.col("__score") / 1000000.0, 6).alias("logweight"),
            F.col("n_feats"),
            "rank",
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    *,
    by: str | None = None,
    key_cols: list[str] | None = None,
    seed: int = 42,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis 2006,
    "Weighted random sampling with a reservoir"): each row draws a
    deterministic uniform u from its key hash and competes with the
    exponential key ln(u) / w; the top-``k`` rows by that key (globally,
    or per-``by`` group) are an exact weighted sample without
    replacement — a row's inclusion probability is proportional to its
    weight, and the selection is replayable across runs and engines.

    Cross-engine exactness: u = (_bucket + 1) / 2^24 is an
    exactly-representable double (power-of-two denominator), so both
    engines take LN of the identical input; the ordering key is quantized
    to 1e-9 integers (the importance_resample discipline) and ties break
    on the key columns, so the selected set is engine-independent.

    Scale shape: global mode compiles to TakeOrderedAndProject
    (per-partition top-k, k-row driver merge — never a global sort);
    grouped mode is one shuffle on ``by`` with a rank window, k-bounded
    per group. Rows with NULL or non-positive weight are excluded by
    contract (zero weight must never be sampled; ln(u)/w is undefined
    there). Exactly one corpus scan either way.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keys = key_cols or [c for c in df.columns if c != weight_col]
    w = F.col(weight_col).cast("double")
    u = (_bucket(keys, seed) + F.lit(1)).cast("double") / F.lit(
        float(_HASH_BUCKETS)
    )
    skey = F.round(F.log(u) / w * F.lit(1e9)).cast("bigint")
    base = df.where(w.isNotNull() & (w > 0)).withColumn("__wskey", skey)
    order = [F.desc("__wskey"), *[F.asc(c) for c in keys]]
    if by is None:
        # k-row frame: the window ranks only the TakeOrdered survivors
        top = base.orderBy(*order).limit(k)
        wspec = Window.orderBy(*order)
    else:
        top = base
        wspec = Window.partitionBy(by).orderBy(*order)
    ranked = top.withColumn(rank_col, F.row_number().over(wspec))
    if by is not None:
        ranked = ranked.where(F.col(rank_col) <= k)
    return ranked.withColumn(
        "logkey", F.round(F.col("__wskey") / F.lit(1e9), 6)
    ).drop("__wskey")


def hash_split(
    df: DataFrame,
    weights: dict,
    *,
    key_cols: list[str] | None = None,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test splitting by hash ranges: each row's
    md5 bucket lands in one of the cumulative-weight intervals, so the
    assignment is (a) reproducible across runs/engines, (b) stable under
    corpus growth (an existing row never changes split when new rows
    arrive — the property randomSplit lacks), and (c) disjoint and
    exhaustive by construction. Expression-only; the standard
    train/val/test discipline for pretraining corpora.

    ``weights``: {'train': 0.9, 'val': 0.05, 'test': 0.05} — any names,
    must sum to ~1. Returns the input plus ``split_col``.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"weights must sum to 1, got {total}")
    keys = key_cols or list(df.columns)
    b = _bucket(keys, seed)
    expr = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w
        bound = int(cum * _HASH_BUCKETS)
        cond = b < F.lit(bound)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(items[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def diversity_sample(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = None,
    target_cluster_size: int = 512,
    per_cluster: int = 1,
) -> DataFrame:
    """Cluster-balanced (coreset-style) sampling over an embedding
    column: cover the embedding space instead of the ingestion
    distribution. Uniform hash sampling keeps duplicated modes
    duplicated; routing every vector to its nearest centroid and taking
    a fixed quota per cluster caps each semantic mode's contribution —
    the cluster-balanced selection step of the published data-pruning
    recipes (SemDeDup's cluster sweep; "Beyond neural scaling laws"
    prototypicality pruning), restated as a deterministic Spark plan.

    Mechanics (deliberately identical to ``semantic_dedup``'s routing so
    the two compose into one curation pass): centroids are the first
    ``n_clusters`` rows in md5-hash order (engine-replayable, ingestion-
    order-free); each vector max-cosine-routes to a centroid via a
    map-side ``min_by (-sim, cid)`` partial aggregation (ties to the
    lower centroid id; the exchange carries N rows, not N×K); within a
    cluster the quota keeps the first ``per_cluster`` rows in
    (md5-hash, id) order — an unbiased deterministic within-cluster
    subsample.

    Scale shape: one count job (scalar, only when ``n_clusters`` is
    derived), one centroid broadcast (n_clusters × dim doubles), one
    scan + partial agg for routing, one rank-then-filter keyed by
    cluster (compiles to WindowGroupLimit — only ``per_cluster`` rows
    per cluster survive the exchange). Returns the sampled rows with
    every corpus column plus ``cluster_id``.
    """
    import math

    from pyspark.sql import Window

    from flink_psl_spark.llm.similarity import (
        cosine_with_norms,
        l2_norm,
    )

    c = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        F.md5(F.col(id_col).cast("string")).alias("__h"),
    )
    if n_clusters is None:
        n_rows = c.count()  # one scalar agg job — control-plane only
        n_clusters = max(1, math.ceil(n_rows / target_cluster_size))
    cents = (
        c.orderBy("__h", "__id")
        .limit(n_clusters)
        .select(F.col("__id").alias("__cid"), F.col("__v").alias("__cv"))
    )
    scored = (
        c.withColumn("__n", l2_norm("__v"))
        .join(F.broadcast(cents.withColumn("__ctn", l2_norm("__cv"))))
        .select(
            "__id", "__h", "__cid",
            cosine_with_norms("__v", "__cv", "__n", "__ctn").alias("__sim"),
        )
    )
    routed = scored.groupBy("__id").agg(
        F.min_by(
            F.col("__cid"),
            # type-agnostic argmax: min over (-sim, cid) = max sim,
            # ties to the LOWER centroid id for ANY orderable id type
            F.struct((-F.col("__sim")).alias("__negsim"), F.col("__cid")),
        ).alias("cluster_id"),
        F.first("__h").alias("__h"),
    )
    w = Window.partitionBy("cluster_id").orderBy("__h", "__id")
    picked = (
        routed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= per_cluster)
        .select(F.col("__id").alias(id_col), "cluster_id")
    )
    return corpus.join(picked, on=id_col)


def cluster_report(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = None,
    target_cluster_size: int = 512,
) -> DataFrame:
    """Embedding-space cluster quality report: per cluster (same
    hash-seeded centroids and max-cosine routing as ``semantic_dedup``
    / ``diversity_sample``) the member count and the cohesion profile —
    how tightly members sit around their centroid. The diagnostic a
    curation pipeline reads before trusting cluster-bounded dedup or
    cluster-balanced sampling: giant low-cohesion clusters mean the
    centroid count is too small for the corpus.

    Cross-engine determinism: each member's centroid similarity is
    quantized to an integer (``floor(sim·1e6)``) BEFORE aggregation, so
    the mean is a ratio of exact integers — float summation order
    (engine partials vs sequential) cannot change the report.

    Scale shape: identical to the samplers up to routing (broadcast
    centroids, map-side min_by partial agg), then ONE aggregation keyed
    by cluster — output is n_clusters rows.
    """
    import math

    from flink_psl_spark.llm.similarity import (
        cosine_with_norms,
        l2_norm,
    )

    c = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        F.md5(F.col(id_col).cast("string")).alias("__h"),
    )
    if n_clusters is None:
        n_rows = c.count()  # one scalar agg job — control-plane only
        n_clusters = max(1, math.ceil(n_rows / target_cluster_size))
    cents = (
        c.orderBy("__h", "__id")
        .limit(n_clusters)
        .select(F.col("__id").alias("__cid"), F.col("__v").alias("__cv"))
    )
    scored = (
        c.withColumn("__n", l2_norm("__v"))
        .join(F.broadcast(cents.withColumn("__ctn", l2_norm("__cv"))))
        .select(
            "__id", "__cid",
            cosine_with_norms("__v", "__cv", "__n", "__ctn").alias("__sim"),
        )
    )
    routed = scored.groupBy("__id").agg(
        F.min_by(
            F.struct(
                F.col("__cid").alias("cluster_id"),
                F.col("__sim").alias("__sim"),
            ),
            F.struct((-F.col("__sim")).alias("__negsim"), F.col("__cid")),
        ).alias("__best"),
    )
    q = F.floor(F.col("__best.__sim") * F.lit(1000000.0)).cast("bigint")
    return (
        routed.select(
            F.col("__best.cluster_id").alias("cluster_id"),
            q.alias("__sq"),
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(
                F.sum("__sq") * F.lit(1.0)
                / (F.count(F.lit(1)) * F.lit(1000000.0)),
                6,
            ).alias("mean_sim"),
            F.round(F.min("__sq") / F.lit(1000000.0), 6).alias("min_sim"),
        )
    )


def curriculum_schedule(
    df: DataFrame,
    score_col: str,
    *,
    id_col: str,
    n_phases: int = 4,
    ascending: bool = True,
    seed: int = 42,
    phase_col: str = "phase",
    order_col: str = "order_key",
    bin_col: Column | None = None,
) -> DataFrame:
    """Curriculum ordering for training consumption (Bengio et al. 2009):
    assign every row a difficulty ``phase`` (quantile of ``score_col`` —
    phase 1 is the lowest scores when ``ascending``, flipped otherwise)
    and a deterministic intra-phase shuffle key, so the corpus streams
    easy→hard with epoch-stable within-phase shuffling.

    Consumption order is ``ORDER BY (phase, order_key, id)`` — materialize
    it with ``repartitionByRange(phase_col, order_col).
    sortWithinPartitions(...)`` at write time (a distributed range sort,
    the only scale-honest way to lay out a global order). Phase
    assignment reuses ``distributed_ntile`` (two-pass prefix-sum — no
    single-partition global window), and the shuffle key is the seeded
    md5 bucket, so the whole schedule replays identically across engines
    and epochs.
    """
    b = bin_col if bin_col is not None else F.floor(
        F.col(score_col) * F.lit(64)
    )
    out = distributed_ntile(
        df, score_col, id_col, n_tiles=n_phases, out_col=phase_col,
        bin_col=b,
    )
    if not ascending:
        out = out.withColumn(
            phase_col, (F.lit(n_phases + 1) - F.col(phase_col)).cast("int")
        )
    return out.withColumn(order_col, _bucket([id_col], seed))


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    weights: dict,
    *,
    id_col: str = "doc_id",
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Group-aware train/val/test splitting: near-duplicate clusters
    (connected components of the given duplicate-pair frame) split as
    UNITS — every member hashes on its cluster REPRESENTATIVE, so no
    near-duplicate of a training document can leak into validation or
    test. Plain id-hash splitting (``hash_split``) scatters the members
    of a duplicate cluster across splits and silently inflates eval
    scores; this is the eval-hygiene-correct discipline that pairs with
    the near-dup detectors (minhash_lsh_pairs / ngram_jaccard_pairs).

    Inherits every hash_split guarantee (reproducible, growth-stable,
    disjoint/exhaustive) at the cluster level. Cost: the component
    propagation over the PAIR graph (pair-bounded, not corpus-bounded)
    + one left join of the cluster map onto the corpus.
    """
    from flink_psl_spark.llm.clustering import dedup_clusters

    clusters = dedup_clusters(pairs).withColumnRenamed("doc_id", id_col)
    rep = docs.join(clusters, on=[id_col], how="left").withColumn(
        "__rep",
        F.coalesce(F.col("cluster_id"), F.col(id_col)).cast("string"),
    )
    out = hash_split(
        rep, weights, key_cols=["__rep"], seed=seed, split_col=split_col
    )
    return out.drop("__rep")


def preference_pairs(
    docs,
    *,
    group_col: str = "source",
    score_col,
    id_col: str = "doc_id",
    k: int = 10,
    min_margin: float = 0.25,
):
    """Assemble (chosen, rejected) preference pairs for reward-model /
    DPO-style training: within each ``group_col`` bucket, the i-th BEST
    document by ``score_col`` is paired with the i-th WORST (i <= k),
    keeping only pairs whose score margin reaches ``min_margin`` — the
    standard quality-contrast recipe when no human preference labels
    exist.

    Determinism: both rankings tie-break on ``id_col`` ascending, so the
    pairing is a pure function of (scores, ids) on any engine or
    partitioning.

    Scale shape: two rank windows partitioned by the group key (one
    shuffle each, k-bounded output per group after the rank filter) and
    one k-row-per-group self-join on (group, rank) — at 100 TB the join
    input is already cut to 2k rows per group by the WindowGroupLimit
    pushdown, so the exchange carries pairs, not the corpus.

    Output: (group, pair_rank, chosen_id, rejected_id, chosen_score,
    rejected_score, margin).
    """
    from pyspark.sql import Window

    score = F.col(score_col) if isinstance(score_col, str) else score_col
    base = docs.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("__id"),
        score.alias("__s"),
    )
    w_best = Window.partitionBy("__g").orderBy(
        F.desc("__s"), F.asc("__id")
    )
    w_worst = Window.partitionBy("__g").orderBy(
        F.asc("__s"), F.asc("__id")
    )
    best = (
        base.withColumn("__r", F.row_number().over(w_best))
        .where(F.col("__r") <= k)
        .select("__g", "__r", F.col("__id").alias("chosen_id"),
                F.col("__s").alias("chosen_score"))
    )
    worst = (
        base.withColumn("__r", F.row_number().over(w_worst))
        .where(F.col("__r") <= k)
        .select("__g", "__r", F.col("__id").alias("rejected_id"),
                F.col("__s").alias("rejected_score"))
    )
    return (
        best.join(worst, on=["__g", "__r"])
        .where(
            (F.col("chosen_id") != F.col("rejected_id"))
            & (F.col("chosen_score") - F.col("rejected_score")
               >= F.lit(float(min_margin)))
        )
        .select(
            F.col("__g").alias(group_col),
            F.col("__r").cast("int").alias("pair_rank"),
            "chosen_id",
            "rejected_id",
            "chosen_score",
            "rejected_score",
            (F.col("chosen_score") - F.col("rejected_score"))
            .alias("margin"),
        )
    )
