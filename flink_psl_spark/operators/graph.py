"""Graph algorithms on DataFrames (SURVEY §1.1 Graph row — Gelly parity).

Reference: flink-libraries/flink-gelly (Graph.java:85) ships vertex-centric
iterations with library algorithms (library/PageRank.java,
library/ConnectedComponents.java, library/TriangleEnumerator.java). Spark has
no streaming/native iteration (SURVEY §2.9 'Iterations' gap); the idiomatic
batch form is a driver-side loop of declarative DataFrame rounds — each round
is a join + agg pair (two key-partitioned shuffles, AQE-coalesced), with
``localCheckpoint`` truncating lineage so plans stay flat at any iteration
count. Connected components lives in ``flink_psl_spark.llm.clustering``.

Scale notes: at 100 TB the edge table is the fact side — every round shuffles
edges by src then dst only (ranks/degrees are node-sized, orders of magnitude
smaller, and Catalyst broadcast-joins them when they fit). Convergence state
stays distributed; nothing but the loop condition touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from flink_psl_spark.materialize import materialize


def undirect(edges: DataFrame, src: str = "s", dst: str = "d") -> DataFrame:
    """Symmetrize + dedup an edge list → columns (s, d).

    Both directions come from ONE pass — a row-local explode of the
    (s,d)/(d,s) pair — rather than a union of two selects, which would
    plan the edge source twice (union branches are independent
    subtrees; at 16 consuming algorithms the duplicated scan compounds).
    """
    both = F.explode(
        F.array(
            F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
            F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
        )
    )
    return (
        edges.select(both.alias("__e"))
        .select("__e.*")
        .where(F.col("s") != F.col("d"))
        .distinct()
    )


def degrees(edges: DataFrame, src: str = "s", dst: str = "d") -> DataFrame:
    """Vertex degree of the undirected graph → (node, degree).

    Gelly: Graph.getDegrees() (flink-gelly Graph.java).
    """
    und = undirect(edges, src, dst)
    return und.groupBy(F.col("s").alias("node")).agg(
        F.count("*").alias("degree")
    )


def pagerank(
    edges: DataFrame,
    src: str = "s",
    dst: str = "d",
    *,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank on the symmetrized graph → (node, rank).

    Gelly: library/PageRank.java (vertex-centric scatter-gather). Each
    iteration: contributions = rank/degree scattered along edges, gathered by
    destination; rank' = (1-d)/N + d * sum(contribs). Fixed ``iters`` keeps
    the result deterministic (and SQL-oracle-able by unrolling).

    Degree-zero isolates can't occur (nodes exist only via edges); dangling
    nodes can't occur either (symmetrized graph ⇒ outdeg = deg ≥ 1), so no
    dangling-mass redistribution term is needed.

    The scatter weight ``1/deg(s)`` is loop-invariant, so it is joined into
    the checkpointed edge list ONCE (per-edge contribution is then
    ``rank * w`` — the oracle mirrors this exact op order), and the
    node-sized node set is materialized once instead of re-running its
    distinct inside every iteration's plan. Each iteration therefore
    shuffles edges once (the gather by destination) — the node-sized
    rank/contrib joins broadcast when they fit, and both sides arrive
    hash-partitioned on the key when they don't.
    """
    und = undirect(edges, src, dst)
    deg = und.groupBy(F.col("s").alias("dnode")).agg(
        (1.0 / F.count("*")).alias("w")
    )
    und_w = (
        und.join(deg, und["s"] == F.col("dnode"))
        .select("s", "d", "w")
        .transform(materialize)
    )
    nodes = (
        und_w.select(F.col("s").alias("node"))
        .distinct()
        .transform(materialize)
    )
    n = nodes.count()
    if n == 0:  # empty graph: no nodes, no ranks (avoid 1/0 below)
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iters):
        contribs = (
            und_w.join(ranks, und_w["s"] == ranks["node"])
            .groupBy(und_w["d"].alias("cnode"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        ranks = nodes.join(
            contribs, nodes["node"] == F.col("cnode"), "left"
        ).select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("rank"),
        )
        # ranks feeds the next iteration exactly ONCE (the contribs join),
        # so lineage is linear — no per-iteration materialization needed.
        # The old eager checkpoint per round turned each iteration into
        # its own job + AQE re-plan (~31 driver round trips at iters=3,
        # over half the query's wall time); one lazy plan executes all
        # rounds in a single DAG. Checkpoint every 8 rounds only to keep
        # the plan bounded for large ``iters``.
        if (i + 1) % 8 == 0 and (i + 1) < iters:
            ranks = ranks.transform(materialize)
    return ranks


def triangle_count(edges: DataFrame, src: str = "s", dst: str = "d") -> DataFrame:
    """Global triangle count of the undirected simple graph → (n_triangles).

    Gelly: library/TriangleEnumerator.java. Canonical a<b<c orientation: each
    triangle is counted exactly once; the two joins shuffle the oriented edge
    list by vertex (degree-ordered orientation would further bound skew at
    scale — the fixture graphs are near-uniform so plain id order is used).
    """
    e = (
        undirect(edges, src, dst)
        .where(F.col("s") < F.col("d"))
        .transform(materialize)  # referenced by all three join legs
    )
    e1 = e.select(F.col("s").alias("a"), F.col("d").alias("b"))
    e2 = e.select(F.col("s").alias("b2"), F.col("d").alias("c"))
    e3 = e.select(F.col("s").alias("a3"), F.col("d").alias("c3"))
    wedges = e1.join(e2, e1["b"] == e2["b2"])
    tris = wedges.join(
        e3, (wedges["a"] == e3["a3"]) & (wedges["c"] == e3["c3"])
    )
    return tris.agg(F.count("*").alias("n_triangles"))


def sssp(
    edges: DataFrame,
    src_node=None,
    *,
    iters: int = 4,
    src: str = "s",
    dst: str = "d",
) -> DataFrame:
    """Unit-weight single-source shortest paths, bounded at ``iters`` hops
    → (node, dist). Gelly: library/SingleSourceShortestPaths.java
    (scatter-gather min-distance relaxation).

    Driver loop of Bellman-Ford rounds: each round relaxes every edge once
    (join on the frontier's node set) and folds with min — after k rounds
    every node within k hops holds its exact distance. Same shuffle shape
    as pagerank (edges by src per round; distance table is node-sized).
    ``src_node=None`` starts from the smallest node id (one bounded driver
    scalar, like the strata-key collect in sampling).
    """
    und = undirect(edges, src, dst)
    und.persist()
    try:
        if src_node is None:
            src_node = und.agg(F.min("s")).first()[0]
        dist = (
            und.select(F.col("s").alias("node"))
            .where(F.col("s") == src_node)
            .distinct()
            .withColumn("dist", F.lit(0).cast("bigint"))
            .transform(materialize)
        )
        for _ in range(iters):
            relaxed = (
                dist.join(und, dist["node"] == und["s"])
                .select(und["d"].alias("node"), (dist["dist"] + 1).alias("dist"))
            )
            dist = (
                dist.unionByName(relaxed)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
                .transform(materialize)
            )
        return dist
    finally:
        und.unpersist()


def label_propagation(
    edges: DataFrame, *, iters: int = 2, src: str = "s", dst: str = "d"
) -> DataFrame:
    """Community detection by synchronous label propagation → (node, label).
    Gelly: library/LabelPropagation.java (most-frequent neighbor label,
    ties broken toward the smaller label — deterministic, so SQL-oracle-able
    by unrolling the fixed iteration count).

    Each round: one shuffle of the (node-sized) label table onto edges, one
    count aggregation, one argmax per node via ``max_by`` over the
    (count, -label) struct.
    """
    # localCheckpoint, not persist: the returned labels now execute
    # LAZILY (see the loop note), i.e. after this function returns —
    # a persist/unpersist pair would already be released by then, while
    # checkpoint blocks live until the RDD is GC'd
    und = undirect(edges, src, dst).transform(materialize)
    labels = (
        und.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .transform(materialize)
    )
    for i in range(iters):
        counts = (
            und.join(labels, und["d"] == labels["node"])
            .select(und["s"].alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count("*").alias("c"))
        )
        labels = counts.groupBy("node").agg(
            F.max_by(
                "label", F.struct(F.col("c"), (-F.col("label")).alias("nl"))
            ).alias("label")
        )
        # labels feeds the next round exactly once — linear lineage,
        # same single-DAG argument as pagerank; bound the plan for
        # large ``iters`` only
        if (i + 1) % 8 == 0 and (i + 1) < iters:
            labels = labels.transform(materialize)
    return labels


def local_clustering_coefficient(
    edges: DataFrame, src: str = "s", dst: str = "d"
) -> DataFrame:
    """Local clustering coefficient per node → (node, degree, lcc).

    Gelly: library/clustering/undirected/LocalClusteringCoefficient.java.
    lcc = 2·triangles(node) / (deg·(deg−1)); 0 for degree < 2. One wedge
    self-join (edges by shared endpoint) + one closing-edge semi-join —
    the standard triangle-local shape, everything partial-aggregated.
    """
    # four consumers (degree, both wedge legs, closing edge): symmetrize
    # and dedup ONCE — re-deriving und is a full edge shuffle per subtree
    und = undirect(edges, src, dst).transform(materialize)
    deg = und.groupBy(F.col("s").alias("node")).agg(F.count("*").alias("degree"))
    # wedges centered at u: neighbor pair (v, w), v < w
    e1 = und.select(F.col("s").alias("u"), F.col("d").alias("v"))
    e2 = und.select(F.col("s").alias("u2"), F.col("d").alias("w"))
    wedges = e1.join(
        e2, (F.col("u") == F.col("u2")) & (F.col("v") < F.col("w"))
    ).select("u", "v", "w")
    closing = und.select(F.col("s").alias("v"), F.col("d").alias("w"))
    tri = (
        wedges.join(closing, ["v", "w"], "left_semi")
        .groupBy(F.col("u").alias("node"))
        .agg(F.count("*").alias("tri"))
    )
    return deg.join(tri, "node", "left").select(
        "node",
        "degree",
        F.round(
            F.when(
                F.col("degree") >= 2,
                2.0 * F.coalesce(F.col("tri"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("lcc"),
    )


def jaccard_index(edges: DataFrame, src: str = "s", dst: str = "d") -> DataFrame:
    """Neighbor-set Jaccard similarity for node pairs with ≥1 common
    neighbor → (a, b, jaccard). Gelly: library/similarity/JaccardIndex.java.

    Wedge-generated candidate pairs (only pairs with a common neighbor ever
    materialize — never the O(n²) pair space), counts folded per pair, then
    a node-sized degree join.
    """
    und = undirect(edges, src, dst).transform(materialize)
    deg = und.groupBy(F.col("s").alias("node")).agg(F.count("*").alias("degree"))
    e1 = und.select(F.col("d").alias("a"), F.col("s").alias("w"))
    e2 = und.select(F.col("d").alias("b"), F.col("s").alias("w2"))
    common = (
        e1.join(e2, (F.col("w") == F.col("w2")) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("db"))
    return (
        common.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("common")
                / (F.col("da") + F.col("db") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )


def adamic_adar(edges: DataFrame, src: str = "s", dst: str = "d") -> DataFrame:
    """Adamic-Adar link-prediction score per candidate pair → (a, b, score):
    Σ over common neighbors w of 1/ln(degree(w)).
    Gelly: library/similarity/AdamicAdar.java.

    Same wedge shape as ``jaccard_index`` but weighted at the shared
    neighbor: each wedge contributes 1/ln(deg(center)). A common neighbor
    always has degree ≥ 2, so ln() never hits zero.
    """
    und = undirect(edges, src, dst).transform(materialize)
    deg = und.groupBy(F.col("s").alias("w")).agg(F.count("*").alias("degree"))
    weighted = deg.select("w", (1.0 / F.log(F.col("degree"))).alias("inv_log"))
    e1 = und.select(F.col("d").alias("a"), F.col("s").alias("w"))
    e2 = und.select(F.col("d").alias("b"), F.col("s").alias("w"))
    return (
        e1.join(e2, "w")
        .where(F.col("a") < F.col("b"))
        .join(weighted, "w")
        .groupBy("a", "b")
        .agg(F.round(F.sum("inv_log"), 6).alias("score"))
    )


def summarize(
    edges: DataFrame,
    vertex_values: DataFrame,
    *,
    src: str = "s",
    dst: str = "d",
    node_col: str = "node",
    value_col: str = "value",
) -> DataFrame:
    """Graph summarization: collapse vertices by value; edges become
    group-to-group with multiplicity → (src_value, dst_value, edge_count).
    Gelly: library/Summarization.java (vertex groups + edge group counts).

    Two broadcast-or-shuffle joins of the (node-sized) value table onto the
    edge list, one aggregation — fully declarative.
    """
    sv = vertex_values.select(
        F.col(node_col).alias("__sn"), F.col(value_col).alias("src_value")
    )
    dv = vertex_values.select(
        F.col(node_col).alias("__dn"), F.col(value_col).alias("dst_value")
    )
    return (
        edges.join(sv, edges[src] == F.col("__sn"))
        .join(dv, edges[dst] == F.col("__dn"))
        .groupBy("src_value", "dst_value")
        .agg(F.count("*").alias("edge_count"))
    )


def triadic_census(edges: DataFrame, src: str = "s", dst: str = "d") -> DataFrame:
    """Undirected triadic census → one row (empty, one_edge, wedge, triangle):
    how many node triples form each isomorphism class.
    Gelly: library/clustering/undirected/TriadicCensus.java.

    Pure aggregate arithmetic — no triple enumeration: from n (nodes),
    m (edges), w (wedges = Σ deg·(deg−1)/2) and t (triangles),
      triangle = t, wedge = w − 3t, one_edge = m·(n−2) − 2(w − 3t) − 3t·? …
    derived exactly as in the reference's formula-based census.
    """
    und = undirect(edges, src, dst).transform(materialize)
    deg = und.groupBy("s").agg(F.count("*").alias("deg"))
    stats = deg.agg(
        F.count("*").alias("n"),
        (F.sum("deg") / 2).cast("bigint").alias("m"),
        F.sum(F.expr("deg * (deg - 1) div 2")).alias("w"),
    )
    # triangles: canonical-order wedge + closing edge (same shape as
    # local_clustering_coefficient, counted once per triangle)
    e1 = und.select(F.col("s").alias("u"), F.col("d").alias("v"))
    e2 = und.select(F.col("s").alias("u2"), F.col("d").alias("w2"))
    tri = (
        e1.join(e2, (F.col("u") == F.col("u2")) & (F.col("v") < F.col("w2")))
        .join(
            und.select(F.col("s").alias("v"), F.col("d").alias("w2")),
            ["v", "w2"],
            "left_semi",
        )
        .where(F.col("u") < F.col("v"))
        .agg(F.count("*").alias("t"))
    )
    return stats.crossJoin(tri).select(
        (
            F.expr("n * (n - 1) * (n - 2) div 6")
            - (
                F.col("m") * (F.col("n") - 2)
                - 2 * (F.col("w") - 3 * F.col("t"))
                - 3 * F.col("t")
            )
            - (F.col("w") - 3 * F.col("t"))
            - F.col("t")
        ).alias("empty"),
        (
            F.col("m") * (F.col("n") - 2)
            - 2 * (F.col("w") - 3 * F.col("t"))
            - 3 * F.col("t")
        ).alias("one_edge"),
        (F.col("w") - 3 * F.col("t")).alias("wedge"),
        F.col("t").alias("triangle"),
    )


def hits(
    edges: DataFrame, *, iters: int = 2, src: str = "s", dst: str = "d"
) -> DataFrame:
    """HITS hubs & authorities on the DIRECTED edge list, fixed iterations
    with a single final max-normalization → (node, hub, authority).
    Gelly: library/linkanalysis/HITS.java.

    Unnormalized updates keep every intermediate value an exact integer
    (path counts), so the fixed unroll is SQL-oracle-able; one final
    division by the max yields the conventional [0, 1] scores. Per round:
    two shuffles (edges by dst for authority, by src for hub) over a
    node-sized score table.
    """
    # the directed edge list is joined twice per round and the node set
    # three times — materialize both once (same discipline as pagerank)
    edges = edges.select(src, dst).transform(materialize)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .transform(materialize)
    )
    scores = nodes.select(
        "node",
        F.lit(1).cast("bigint").alias("hub"),
        F.lit(1).cast("bigint").alias("auth"),
    )
    for _ in range(iters):
        # authority(v) = Σ hub(u) over edges u→v
        auth = (
            edges.join(scores, edges[src] == scores["node"])
            .groupBy(edges[dst].alias("node"))
            .agg(F.sum("hub").alias("auth"))
        )
        # auth_full has TWO consumers per round (the hub join and the
        # round's score table), so IT is the round's materialization
        # point — the old per-round checkpoint sat on ``scores`` instead,
        # leaving auth_full lazily duplicated: the edges⋈scores shuffle +
        # aggregation executed twice per round (pagerank lesson applied;
        # ``scores`` itself feeds the next round exactly once and stays
        # lazy).
        auth_full = (
            nodes.join(auth, "node", "left")
            .select("node", F.coalesce("auth", F.lit(0)).alias("auth"))
            .transform(materialize)
        )
        # hub(u) = Σ authority(v) over edges u→v (fresh authorities)
        hub = (
            edges.join(auth_full, edges[dst] == auth_full["node"])
            .groupBy(edges[src].alias("node"))
            .agg(F.sum("auth").alias("hub"))
        )
        scores = (
            nodes.join(hub, "node", "left")
            .join(auth_full, "node", "left")
            .select(
                "node",
                F.coalesce("hub", F.lit(0)).alias("hub"),
                F.coalesce("auth", F.lit(0)).alias("auth"),
            )
        )
    # the final score table is read twice (max-normalization + the
    # result projection) — one materialization instead of re-running
    # the last round's hub join per reference
    scores = scores.transform(materialize)
    mx = scores.agg(
        F.max("hub").alias("mh"), F.max("auth").alias("ma")
    )
    return scores.crossJoin(mx).select(
        "node",
        F.round(F.col("hub") / F.greatest("mh", F.lit(1)), 6).alias("hub"),
        F.round(F.col("auth") / F.greatest("ma", F.lit(1)), 6).alias("authority"),
    )


def community_detection(
    edges: DataFrame,
    *,
    iters: int = 2,
    delta: float = 0.5,
    src: str = "s",
    dst: str = "d",
) -> DataFrame:
    """Community detection with hop-attenuated label scores → (node, label,
    score). Gelly: library/CommunityDetection.java (Leung et al.,
    arXiv:0808.2633): each round a vertex receives (label, score) from every
    neighbor, adopts the label with the highest summed score (ties → the
    smaller label), takes that label's highest single received score, and
    pays a delta/superstep penalty when switching.

    Same shuffle shape as ``label_propagation`` with a score column along
    for the ride. With the default delta=0.5, every score is an exact
    binary fraction, so fixed unrolls are float-safe to oracle.
    """
    und = undirect(edges, src, dst)
    und.persist()
    try:
        state = (
            und.select(F.col("s").alias("node"))
            .distinct()
            .select(
                "node",
                F.col("node").alias("label"),
                F.lit(1.0).alias("score"),
            )
            .transform(materialize)
        )
        for step in range(1, iters + 1):
            msgs = und.join(state, und["d"] == state["node"]).select(
                und["s"].alias("node"), "label", "score"
            )
            agg = msgs.groupBy("node", "label").agg(
                F.sum("score").alias("ssum"), F.max("score").alias("smax")
            )
            pick = agg.groupBy("node").agg(
                F.max_by(
                    F.struct("label", "smax"),
                    F.struct(F.col("ssum"), (-F.col("label")).alias("nl")),
                ).alias("p")
            )
            prev = state.select("node", F.col("label").alias("__old"))
            state = (
                pick.join(prev, "node")
                .select(
                    "node",
                    F.col("p.label").alias("label"),
                    (
                        F.col("p.smax")
                        - F.when(
                            F.col("p.label") != F.col("__old"), delta / step
                        ).otherwise(0.0)
                    ).alias("score"),
                )
                .transform(materialize)
            )
        return state.select("node", "label", F.round("score", 6).alias("score"))
    finally:
        und.unpersist()
