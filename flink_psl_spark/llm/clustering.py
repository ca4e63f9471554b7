"""Graph clustering for dedup groups (SURVEY §1.1 Graph row — the Gelly
surface we support — and the duplicate-cluster step of near-dup dedup).

Reference: flink-libraries/flink-gelly (Graph.java:85) ships
ConnectedComponents as a vertex-centric iteration
(library/ConnectedComponents.java). Spark has no streaming iteration
(SURVEY §2.9 'Iterations' gap); the idiomatic batch form is a driver-side
loop of DataFrame joins — each round is one shuffle, converging in
O(log n) rounds for typical dedup graphs (small, near-cliques).

``connected_components`` implements min-label propagation with
checkpointed lineage (localCheckpoint per round) so plans stay flat at
scale; ``dedup_clusters`` applies it to a verified similar-pairs table to
produce canonical duplicate groups — the standard last step of a
MinHash/SimHash pipeline (pick min doc_id per component as survivor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from flink_psl_spark.materialize import materialize


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of an undirected graph → (node, component),
    component = min node id of the component.

    Min-label propagation: every round each node adopts the smallest label
    among itself and its neighbors; stops when no label changes (or
    max_iter). Each round: one join + one agg — two shuffles on node id,
    AQE-coalesced. Every dedup-shaped graph (diameter ~2-3) converges in
    2-4 rounds.
    """
    # symmetrize in ONE pass (row-local explode of the (s,d)/(d,s)
    # pair) — a union of two selects would plan the edge source twice
    both = F.explode(
        F.array(
            F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
            F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
        )
    )
    und = edges.select(both.alias("__e")).select("__e.*").distinct()
    und = und.transform(materialize)
    labels = (
        und.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .transform(materialize)
    )
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und["d"] == labels["node"])
            .groupBy(und["s"].alias("node2"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
                (F.col("nmin") < F.col("label")).alias("__changed"),
            )
        )
        new_labels = new_labels.transform(materialize)
        changed = new_labels.where(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def dedup_clusters(
    pairs: DataFrame,
    a: str = "a",
    b: str = "b",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate groups from verified similar pairs → (doc_id, cluster_id),
    cluster_id = min doc_id of the group. Only nodes that appear in at
    least one pair are returned (singletons are their own implicit group).
    """
    cc = connected_components(pairs, a, b, max_iter=max_iter)
    return cc.select(F.col("node").alias("doc_id"), F.col("component").alias("cluster_id"))


def pca_fit(
    vecs: DataFrame,
    n_components: int,
    *,
    vec_col: str = "embedding",
) -> dict:
    """Fit a PCA basis over an embedding column, distributed.

    The full corpus is reduced to its second-order moments — count, sum
    vector, and d×d Gram matrix — accumulated per Arrow batch with one
    numpy matmul, exploded to (index, value) partials, and summed by one
    d²-key hash aggregation (map-side combined; the shuffle carries
    O(batches × d²) tiny rows and the result is parameter-sized, never
    corpus-sized). The driver then eigendecomposes the d×d sample
    covariance (numpy eigh — d is an embedding dimension, so this is
    O(d³) on 64-4096-dim inputs, microseconds) and returns the model.

    Exactly ONE corpus scan; nothing data-sized ever reaches the driver.
    Eigenvector sign is fixed deterministically (largest-|component|
    coordinate made positive, the svd_flip convention) so downstream
    projections are reproducible.

    Returns {"mean": [d], "components": [k][d] (rows = principal axes,
    descending eigenvalue), "eigenvalues": [k], "explained_ratio": [k],
    "n": int, "dim": int}.
    """
    import numpy as np
    import pandas as pd

    # dim from the first NON-NULL vector (the embedding_dedup idiom); an
    # empty / all-NULL corpus fails fast with a clear error instead of
    # the pre-r12 'NoneType is not subscriptable' task-side crash
    first = (
        vecs.where(F.col(vec_col).isNotNull())
        .select(F.size(vec_col).alias("d"))
        .first()
    )
    if first is None:
        raise ValueError("pca_fit: no non-NULL vectors to fit")
    d = first["d"]
    if not 1 <= n_components <= d:
        raise ValueError(f"n_components must be in [1, {d}]")

    def part(batches):
        for pdf in batches:
            rows = [
                v for v in pdf[vec_col] if v is not None and len(v) == d
            ]
            if not rows:
                continue
            X = np.array(rows, dtype=np.float64)
            # null elements arrive as nan; NaN/inf vectors would poison
            # the moment sums — skip them like the wrong-length rows
            X = X[np.isfinite(X).all(axis=1)]
            if not len(X):
                continue
            g = X.T @ X  # d×d batch Gram
            vals = np.concatenate(
                ([float(len(X))], X.sum(axis=0), g.ravel())
            )
            yield pd.DataFrame(
                {"idx": np.arange(vals.size, dtype=np.int64), "val": vals}
            )

    moments = (
        vecs.select(vec_col)
        .mapInPandas(part, "idx bigint, val double")
        .groupBy("idx")
        .agg(F.sum("val").alias("val"))
        .collect()  # d²+d+1 rows — parameter-sized by construction
    )
    flat = np.zeros(d * d + d + 1)
    for r in moments:
        flat[r["idx"]] = r["val"]
    n = int(flat[0])
    if n < 2:
        raise ValueError(f"need >= 2 vectors to fit PCA, got {n}")
    s, g = flat[1 : d + 1], flat[d + 1 :].reshape(d, d)
    mean = s / n
    cov = (g - np.outer(s, mean)) / (n - 1)  # sample covariance
    eigval, eigvec = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigval)[::-1][:n_components]
    lam = np.maximum(eigval[order], 0.0)
    W = eigvec[:, order].T  # (k, d)
    # svd_flip: make each axis's largest-|coordinate| positive
    flip = np.sign(W[np.arange(len(W)), np.abs(W).argmax(axis=1)])
    flip[flip == 0] = 1.0
    W = W * flip[:, None]
    total = float(np.trace(cov))
    return {
        "mean": mean.tolist(),
        "components": W.tolist(),
        "eigenvalues": lam.tolist(),
        "explained_ratio": (lam / total).tolist() if total > 0 else
        [0.0] * len(lam),
        "n": n,
        "dim": d,
    }


def pca_project(
    vecs: DataFrame,
    model: dict,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "proj",
    whiten: bool = False,
) -> DataFrame:
    """Project embeddings onto a fitted PCA basis: (x − mean) @ Wᵀ via one
    vectorized numpy matmul per Arrow batch (model broadcast in the UDF
    closure — k×d doubles, parameter-sized). Rows with NULL / wrong-dim
    vectors are dropped (they carry no coordinates in the basis).

    ``whiten=True`` rescales each axis by 1/√eigenvalue so every output
    component has unit sample variance (PCA whitening — the usual
    preprocessing before cosine-based embedding curation when axes carry
    very different energies). Axes with eigenvalue 0 are left unscaled
    (their coordinates are exactly 0 anyway)."""
    import numpy as np
    import pandas as pd

    W = np.array(model["components"], dtype=np.float64)
    if whiten:
        lam = np.array(model["eigenvalues"], dtype=np.float64)
        scale = np.where(
            lam > 0, 1.0 / np.sqrt(np.where(lam > 0, lam, 1.0)), 1.0
        )
        W = W * scale[:, None]
    mean = np.array(model["mean"], dtype=np.float64)
    d = int(model["dim"])
    id_dt = dict(vecs.dtypes)[id_col]

    def part(batches):
        for pdf in batches:
            ok = pdf[vec_col].map(
                lambda v: v is not None and len(v) == d
            )
            if not ok.any():
                continue
            sub = pdf[ok]
            X = np.array(list(sub[vec_col]), dtype=np.float64)
            P = (X - mean) @ W.T
            yield pd.DataFrame(
                {id_col: sub[id_col], out_col: list(P)}
            )

    return vecs.select(id_col, vec_col).mapInPandas(
        part, f"{id_col} {id_dt}, {out_col} array<double>"
    )


def embedding_outliers(
    vecs: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_components: int = 8,
    model: dict | None = None,
) -> DataFrame:
    """Embedding-space outlier scoring: squared Mahalanobis distance in
    the top-``n_components`` PCA subspace (= squared L2 norm of the
    whitened projection). The standard embedding-curation step for
    flagging mis-embedded / out-of-distribution rows before they skew
    clustering or ANN structures.

    One extra corpus scan beyond the PCA fit (reusable via ``model``);
    scoring is a per-batch matmul, the output one double per row. The
    score obeys an exact algebraic identity — Σ score over the corpus =
    k·(n−1) for sample-covariance whitening — which the registry query
    uses as its oracle-able self-check.
    """
    fit = model or pca_fit(vecs, n_components, vec_col=vec_col)
    proj = pca_project(
        vecs, fit, id_col=id_col, vec_col=vec_col, whiten=True
    )
    k = len(fit["eigenvalues"])
    score = F.aggregate(
        F.slice("proj", 1, k),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    return proj.select(id_col, score.alias("maha_sq"))


def _kmeans_assign_kernel(cents_q, micro):
    """Vectorized nearest-centroid assignment over quantized centroids:
    float64 squared-L2 against the broadcast K x d matrix, ties to the
    lower centroid index. Identical arithmetic in the distributed path
    and the single-process reference, so assignments agree exactly."""
    import numpy as np

    C = np.asarray(cents_q, dtype=np.float64) / micro  # K x d

    def assign(M):  # n x d float64 -> n int32
        d2 = (
            (M * M).sum(axis=1, keepdims=True)
            - 2.0 * (M @ C.T)
            + (C * C).sum(axis=1)
        )
        return d2.argmin(axis=1)  # argmin takes the FIRST minimum — the
        # lower centroid index — on exact ties

    return assign


def kmeans_fit(
    vecs: DataFrame,
    k: int,
    *,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    micro: int = 1_000_000,
) -> list[list[int]]:
    """Distributed Lloyd's K-means with a BYTE-REPRODUCIBLE trace —
    the clustering trainer behind curation steps (SemDeDup routing,
    diversity sampling, IVF coarse quantizers), here as a first-class
    iterative operator like bpe_train / train_logreg_hashed.

    Determinism recipe (the classifier's fixed-point contract):
    centroids live in integer micro-units; the E-step is one vectorized
    float64 argmin per Arrow batch against the broadcast K x d matrix
    (ties to the lower index); the M-step sums QUANTIZED coordinates —
    integer sums are order/partition independent — and re-quantizes
    round-half-away(sum/count). Init = the K md5-smallest ids' vectors
    (engine-replayable hash sampling, the semantic-dedup precedent).

    Per iteration: one corpus scan; the exchange and the driver collect
    carry K x d integer rows (parameter-sized). Empty clusters keep
    their previous centroid.

    Returns the K x d integer-micro-unit centroid matrix.
    """
    import numpy as np

    from pyspark.sql import functions as F

    # Degenerate-input contract (r12): NULL / null-element / non-finite
    # vectors are not trainable points — exclude them BEFORE seeding and
    # assignment (pre-r12 they crashed the seed loop or np.stack). The
    # model dimension is the vector length of the md5-smallest valid id
    # (the same deterministic ordering seeding uses), and ragged rows of
    # any other length are excluded too; reference_kmeans applies the
    # identical rule, keeping the parity tests exact.
    valid = vecs.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).where(
        F.col("__v").isNotNull()
        & (F.size("__v") > 0)
        & ~F.expr(
            "exists(__v, x -> x is null or isnan(x)"
            " or abs(x) = double('Infinity'))"
        )
    )
    # ONE bottom-k pass derives the dimension AND (usually) the seeds:
    # the md5-smallest valid row defines d, and when all k probe rows
    # share that length they are exactly the bottom-k of the same-dim
    # subset (any same-dim row outside the probe hashes larger). The
    # dedicated dim pass (a second full scan + md5 of the corpus for one
    # scalar) only runs as a FALLBACK on ragged corpora where another
    # length intrudes into the probe. Same deterministic rule either way.
    probe_rows = (
        valid.withColumn("__h", F.md5(F.col("__id").cast("string")))
        .orderBy("__h", "__id")
        .limit(k)
        .collect()
    )  # ≤ K rows — parameter-sized
    if not probe_rows:
        raise ValueError("kmeans_fit: no valid (non-NULL, finite) vectors")
    d = len(probe_rows[0]["__v"])
    src = valid.where(F.size("__v") == d).persist()
    try:
        seed_rows = [r for r in probe_rows if len(r["__v"]) == d]
        if len(seed_rows) < k:
            seed_rows = (
                src.withColumn(
                    "__h", F.md5(F.col("__id").cast("string"))
                )
                .orderBy("__h", "__id")
                .limit(k)
                .collect()
            )  # ragged corpus: re-take bottom-k over same-dim rows only
        if len(seed_rows) < k:
            raise ValueError(
                f"kmeans_fit: k={k} exceeds the {len(seed_rows)} valid "
                f"{d}-dim vectors available"
            )
        cents = [
            [int(round(float(x) * micro)) for x in r["__v"]]
            for r in sorted(seed_rows, key=lambda r: r["__id"])
        ]

        import pandas as pd

        for _ in range(iters):
            assign = _kmeans_assign_kernel(cents, micro)

            def estep(batches, _assign=assign):
                for pdf in batches:
                    M = np.stack(
                        pdf["__v"].apply(
                            lambda a: np.asarray(a, dtype=np.float64)
                        )
                    )
                    cid = _assign(M)
                    Q = np.rint(M * micro).astype(np.int64)  # n x d
                    out = []
                    for c in np.unique(cid):
                        sub = Q[cid == c]
                        s = sub.sum(axis=0)
                        for dim, val in enumerate(s):
                            out.append((int(c), dim, int(val), len(sub)))
                    yield pd.DataFrame(
                        out, columns=["cid", "dim", "qsum", "n"]
                    )

            parts = src.mapInPandas(
                estep, "cid int, dim int, qsum long, n long"
            )
            agg = (
                parts.groupBy("cid", "dim")
                .agg(
                    F.sum("qsum").alias("qsum"),
                    # n repeats per dim within a partition's partial row
                    # set; summing it per dim double-counts across dims,
                    # so divide by the dim fan-out implicitly: take the
                    # per-dim sum of n only where dim == 0
                    F.sum(F.when(F.col("dim") == 0, F.col("n"))).alias(
                        "n0"
                    ),
                )
                .collect()
            )  # K x d rows — parameter-sized
            counts = {
                r["cid"]: r["n0"] for r in agg if r["n0"] is not None
            }
            sums: dict[tuple[int, int], int] = {
                (r["cid"], r["dim"]): r["qsum"] for r in agg
            }
            new = []
            for c in range(k):
                n = counts.get(c, 0)
                if n:
                    row = []
                    for dim in range(len(cents[0])):
                        s = sums[(c, dim)]
                        q = s / n
                        row.append(
                            int(abs(q) + 0.5) * (1 if q >= 0 else -1)
                        )
                    new.append(row)
                else:
                    new.append(cents[c])  # empty cluster: keep
            cents = new
        return cents
    finally:
        src.unpersist()


def reference_kmeans(
    rows: list[tuple[int, list[float]]],
    k: int,
    *,
    iters: int = 4,
    micro: int = 1_000_000,
) -> list[list[int]]:
    """Single-process reference transcription of ``kmeans_fit`` (same
    init, assignment arithmetic, quantized M-step) — the ground truth
    the distributed path is checked against, mirroring
    reference_bpe_merges / the classifier's python model."""
    import hashlib

    import numpy as np

    def _finite(v) -> bool:
        if v is None or not len(v):
            return False
        a = np.asarray(
            [float("nan") if x is None else x for x in v], dtype=np.float64
        )
        return bool(np.isfinite(a).all())

    # identical degenerate-input rule to kmeans_fit (r12): only finite
    # vectors of the md5-smallest valid row's dimension participate
    valid = sorted(
        (r for r in rows if _finite(r[1])),
        key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
    )
    if not valid:
        raise ValueError("reference_kmeans: no valid vectors")
    d = len(valid[0][1])
    valid = [r for r in valid if len(r[1]) == d]
    if len(valid) < k:
        raise ValueError(
            f"reference_kmeans: k={k} exceeds {len(valid)} valid vectors"
        )
    rows = valid
    seeds = rows[:k]  # already md5-ordered
    cents = [
        [int(round(float(x) * micro)) for x in v]
        for _, v in sorted(seeds, key=lambda r: r[0])
    ]
    M = np.stack([np.asarray(v, dtype=np.float64) for _, v in rows])
    Q = np.rint(M * micro).astype(np.int64)
    for _ in range(iters):
        assign = _kmeans_assign_kernel(cents, micro)
        cid = assign(M)
        new = []
        for c in range(k):
            sub = Q[cid == c]
            if len(sub):
                row = []
                for s in sub.sum(axis=0):
                    q = s / len(sub)
                    row.append(int(abs(q) + 0.5) * (1 if q >= 0 else -1))
                new.append(row)
            else:
                new.append(cents[c])
        cents = new
    return cents
