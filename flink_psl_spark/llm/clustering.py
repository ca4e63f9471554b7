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
    und = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
    )
    und = und.localCheckpoint(eager=True)
    labels = (
        und.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
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
        new_labels = new_labels.localCheckpoint(eager=True)
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
