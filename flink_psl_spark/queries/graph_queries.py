"""Graph query inventory (SURVEY §1.1 Graph row — the Gelly surface).

Reference: flink-libraries/flink-gelly Graph.java:85 + library algorithms
(PageRank.java, ConnectedComponents.java, TriangleEnumerator.java). Connected
components is exercised by ``llm_dedup_clusters`` (llm_queries.py); here the
remaining Gelly library surface runs on a derived co-supply graph: suppliers
are linked when they both ship the same part in low-quantity lines (a
deterministic, sparse, multi-component graph at every scale factor).

PageRank is iterative (no single-SQL form), so its oracle unrolls the exact
fixed iteration count as chained CTEs — exact math, no recursion needed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_psl_spark.queries.registry import query, sql_query, tables

# Shared edge derivation (SQL text used verbatim inside each oracle).
_EDGES_SQL = """
    SELECT DISTINCT l1.l_suppkey AS s, l2.l_suppkey AS d
    FROM lineitem l1
    JOIN lineitem l2
      ON l1.l_partkey = l2.l_partkey AND l1.l_suppkey < l2.l_suppkey
    WHERE l1.l_quantity < 3 AND l2.l_quantity < 3
"""


def _edges(spark, sf_dir):
    t = tables(spark, sf_dir)
    l1 = t["lineitem"].where(F.col("l_quantity") < 3).alias("l1")
    l2 = t["lineitem"].where(F.col("l_quantity") < 3).alias("l2")
    return (
        l1.join(
            l2,
            (F.col("l1.l_partkey") == F.col("l2.l_partkey"))
            & (F.col("l1.l_suppkey") < F.col("l2.l_suppkey")),
        )
        .select(
            F.col("l1.l_suppkey").alias("s"), F.col("l2.l_suppkey").alias("d")
        )
        .distinct()
    )


@query(
    "graph_degree",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (SELECT s, d FROM edges UNION SELECT d AS s, s AS d FROM edges)
    SELECT s AS node, COUNT(*) AS degree FROM und GROUP BY s
    """,
)
def graph_degree(spark, sf_dir):
    """Vertex degrees of the co-supply graph (Gelly Graph.getDegrees)."""
    from flink_psl_spark.operators.graph import degrees

    return degrees(_edges(spark, sf_dir))


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL})
    SELECT COUNT(*) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e1.d = e2.s
    JOIN edges e3 ON e3.s = e1.s AND e3.d = e2.d
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Triangle count (Gelly TriangleEnumerator): canonical a<b<c joins."""
    from flink_psl_spark.operators.graph import triangle_count

    return triangle_count(_edges(spark, sf_dir))


_PR_ITER = """
    r{k} AS (
      SELECT n.node,
             0.15 / (SELECT c FROM nn)
               + 0.85 * COALESCE(SUM(r.rank * g.w), 0.0) AS rank
      FROM nodes n
      LEFT JOIN und e ON e.d = n.node
      LEFT JOIN r{p} r ON r.node = e.s
      LEFT JOIN deg g ON g.node = e.s
      GROUP BY n.node)
"""


@query(
    "graph_pagerank",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (SELECT s, d FROM edges UNION SELECT d AS s, s AS d FROM edges),
    deg AS (SELECT s AS node, 1.0 / COUNT(*) AS w FROM und GROUP BY s),
    nodes AS (SELECT DISTINCT s AS node FROM und),
    nn AS (SELECT COUNT(*) AS c FROM nodes),
    r0 AS (SELECT node, 1.0 / (SELECT c FROM nn) AS rank FROM nodes),
    {_PR_ITER.format(k=1, p=0)},
    {_PR_ITER.format(k=2, p=1)},
    {_PR_ITER.format(k=3, p=2)}
    SELECT node, CAST(ROUND(rank, 8) AS DOUBLE) AS rank FROM r3
    """,
)
def graph_pagerank(spark, sf_dir):
    """3-iteration PageRank (Gelly library/PageRank.java scatter-gather);
    oracle = the same three iterations unrolled as CTEs. Ranks rounded to
    8 dp (double association noise ~1e-16, far below the grain)."""
    from flink_psl_spark.operators.graph import pagerank

    pr = pagerank(_edges(spark, sf_dir), iters=3)
    return pr.select("node", F.round("rank", 8).alias("rank"))


@query(
    "graph_connected_components",
    oracle=f"""
    WITH RECURSIVE
    edges AS ({_EDGES_SQL}),
    und AS (SELECT s, d FROM edges UNION SELECT d AS s, s AS d FROM edges),
    walk(node, label) AS (
      SELECT s, s FROM und
      UNION
      SELECT u.d, w.label FROM walk w JOIN und u ON u.s = w.node)
    SELECT node, MIN(label) AS component
    FROM walk GROUP BY node
    """,
)
def graph_connected_components(spark, sf_dir):
    """Connected components of the co-supply graph (Gelly
    library/ConnectedComponents.java): min-label propagation rounds;
    oracle = recursive-CTE transitive closure."""
    from flink_psl_spark.llm.clustering import connected_components

    return connected_components(_edges(spark, sf_dir), "s", "d")


@query(
    "graph_sssp",
    oracle=f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    und AS (SELECT s, d FROM edges UNION SELECT d, s FROM edges),
    walk(node, dist) AS (
      SELECT (SELECT MIN(s) FROM und), 0
      UNION
      SELECT u.d, w.dist + 1
      FROM walk w JOIN und u ON u.s = w.node
      WHERE w.dist < 4)
    SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
    FROM walk GROUP BY node
    """,
)
def graph_sssp(spark, sf_dir):
    """Single-source shortest paths (unit weights, 4-hop bound) from the
    smallest supplier node (Gelly library/SingleSourceShortestPaths.java)."""
    from flink_psl_spark.operators.graph import sssp

    return sssp(_edges(spark, sf_dir), iters=4)


@query(
    "graph_label_propagation",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (SELECT s, d FROM edges UNION SELECT d, s FROM edges),
    l0 AS (SELECT DISTINCT s AS node, s AS label FROM und),
    n1 AS (SELECT u.s AS node, l.label, COUNT(*) AS c
           FROM und u JOIN l0 l ON u.d = l.node GROUP BY 1, 2),
    l1 AS (SELECT node, (LIST(label ORDER BY c DESC, label ASC))[1] AS label
           FROM n1 GROUP BY node),
    n2 AS (SELECT u.s AS node, l.label, COUNT(*) AS c
           FROM und u JOIN l1 l ON u.d = l.node GROUP BY 1, 2),
    l2 AS (SELECT node, (LIST(label ORDER BY c DESC, label ASC))[1] AS label
           FROM n2 GROUP BY node)
    SELECT node, label FROM l2
    """,
)
def graph_label_propagation(spark, sf_dir):
    """Two-round synchronous label propagation, min-label tie-break (Gelly
    library/LabelPropagation.java); oracle unrolls both rounds exactly."""
    from flink_psl_spark.operators.graph import label_propagation

    return label_propagation(_edges(spark, sf_dir), iters=2)


@query(
    "graph_clustering_coefficient",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (SELECT s, d FROM edges UNION SELECT d, s FROM edges),
    deg AS (SELECT s AS node, COUNT(*) AS degree FROM und GROUP BY s),
    tri AS (
      SELECT e1.s AS node, COUNT(*) AS t
      FROM und e1 JOIN und e2 ON e1.s = e2.s AND e1.d < e2.d
      WHERE EXISTS (SELECT 1 FROM und c WHERE c.s = e1.d AND c.d = e2.d)
      GROUP BY e1.s)
    SELECT deg.node, deg.degree,
           ROUND(CASE WHEN deg.degree >= 2
                 THEN 2.0 * COALESCE(tri.t, 0) / (deg.degree * (deg.degree - 1))
                 ELSE 0.0 END, 6) AS lcc
    FROM deg LEFT JOIN tri ON deg.node = tri.node
    """,
)
def graph_clustering_coefficient(spark, sf_dir):
    """Local clustering coefficient per node (Gelly
    library/clustering/undirected/LocalClusteringCoefficient.java)."""
    from flink_psl_spark.operators.graph import local_clustering_coefficient

    return local_clustering_coefficient(_edges(spark, sf_dir))


@query(
    "graph_jaccard_index",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (SELECT s, d FROM edges UNION SELECT d, s FROM edges),
    deg AS (SELECT s AS node, COUNT(*) AS degree FROM und GROUP BY s),
    common AS (
      SELECT e1.d AS a, e2.d AS b, COUNT(*) AS c
      FROM und e1 JOIN und e2 ON e1.s = e2.s AND e1.d < e2.d
      GROUP BY 1, 2)
    SELECT a, b, ROUND(c * 1.0 / (da.degree + db.degree - c), 6) AS jaccard
    FROM common
    JOIN deg da ON da.node = a
    JOIN deg db ON db.node = b
    """,
)
def graph_jaccard_index(spark, sf_dir):
    """Neighbor-set Jaccard similarity over wedge-generated pairs (Gelly
    library/similarity/JaccardIndex.java)."""
    from flink_psl_spark.operators.graph import jaccard_index

    return jaccard_index(_edges(spark, sf_dir))


@query(
    "graph_adamic_adar",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (SELECT s, d FROM edges UNION SELECT d, s FROM edges),
    deg AS (SELECT s AS w, COUNT(*) AS degree FROM und GROUP BY s)
    SELECT e1.d AS a, e2.d AS b,
           ROUND(SUM(1.0 / LN(deg.degree)), 6) AS score
    FROM und e1
    JOIN und e2 ON e1.s = e2.s AND e1.d < e2.d
    JOIN deg ON deg.w = e1.s
    GROUP BY 1, 2
    """,
)
def graph_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction over wedge-generated pairs (Gelly
    library/similarity/AdamicAdar.java)."""
    from flink_psl_spark.operators.graph import adamic_adar

    return adamic_adar(_edges(spark, sf_dir))


@query(
    "graph_summarization",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    vv AS (SELECT s_suppkey AS node, s_nationkey AS value FROM supplier)
    SELECT sv.value AS src_value, dv.value AS dst_value, COUNT(*) AS edge_count
    FROM edges e
    JOIN vv sv ON e.s = sv.node
    JOIN vv dv ON e.d = dv.node
    GROUP BY 1, 2
    """,
)
def graph_summarization(spark, sf_dir):
    """Graph summarization by supplier nation: vertices collapse to their
    nation, edges to nation-pair multiplicities (Gelly
    library/Summarization.java)."""
    from flink_psl_spark.operators.graph import summarize

    t = tables(spark, sf_dir)
    vv = t["supplier"].select(
        F.col("s_suppkey").alias("node"), F.col("s_nationkey").alias("value")
    )
    return summarize(_edges(spark, sf_dir), vv)


@query(
    "graph_triadic_census",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (SELECT s, d FROM edges UNION SELECT d, s FROM edges),
    deg AS (SELECT s, COUNT(*) AS deg FROM und GROUP BY s),
    stats AS (SELECT COUNT(*) AS n, CAST(SUM(deg) // 2 AS BIGINT) AS m,
                     CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS w
              FROM deg),
    tri AS (
      SELECT COUNT(*) AS t
      FROM und e1 JOIN und e2 ON e1.s = e2.s AND e1.d < e2.d
      WHERE e1.s < e1.d
        AND EXISTS (SELECT 1 FROM und c WHERE c.s = e1.d AND c.d = e2.d))
    SELECT CAST(n * (n-1) * (n-2) // 6
                - (m * (n-2) - 2 * (w - 3*t) - 3*t)
                - (w - 3*t) - t AS BIGINT) AS empty,
           CAST(m * (n-2) - 2 * (w - 3*t) - 3*t AS BIGINT) AS one_edge,
           CAST(w - 3*t AS BIGINT) AS wedge,
           CAST(t AS BIGINT) AS triangle
    FROM stats, tri
    """,
)
def graph_triadic_census(spark, sf_dir):
    """Undirected triadic census via exact aggregate arithmetic — no triple
    enumeration (Gelly library/clustering/undirected/TriadicCensus.java)."""
    from flink_psl_spark.operators.graph import triadic_census

    return triadic_census(_edges(spark, sf_dir))


@query(
    "graph_hits",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    nodes AS (SELECT s AS node FROM edges UNION SELECT d FROM edges),
    a1 AS (SELECT d AS node, COUNT(*) AS auth FROM edges GROUP BY d),
    a1f AS (SELECT n.node, COALESCE(a1.auth, 0) AS auth
            FROM nodes n LEFT JOIN a1 ON a1.node = n.node),
    h1 AS (SELECT e.s AS node, SUM(a1f.auth) AS hub
           FROM edges e JOIN a1f ON a1f.node = e.d GROUP BY e.s),
    h1f AS (SELECT n.node, COALESCE(h1.hub, 0) AS hub
            FROM nodes n LEFT JOIN h1 ON h1.node = n.node),
    a2 AS (SELECT e.d AS node, SUM(h1f.hub) AS auth
           FROM edges e JOIN h1f ON h1f.node = e.s GROUP BY e.d),
    a2f AS (SELECT n.node, COALESCE(a2.auth, 0) AS auth
            FROM nodes n LEFT JOIN a2 ON a2.node = n.node),
    h2 AS (SELECT e.s AS node, SUM(a2f.auth) AS hub
           FROM edges e JOIN a2f ON a2f.node = e.d GROUP BY e.s),
    h2f AS (SELECT n.node, COALESCE(h2.hub, 0) AS hub
            FROM nodes n LEFT JOIN h2 ON h2.node = n.node),
    mx AS (SELECT GREATEST(MAX(hub), 1) AS mh FROM h2f),
    ma AS (SELECT GREATEST(MAX(auth), 1) AS maxa FROM a2f)
    SELECT h2f.node,
           ROUND(h2f.hub * 1.0 / mx.mh, 6) AS hub,
           ROUND(a2f.auth * 1.0 / ma.maxa, 6) AS authority
    FROM h2f JOIN a2f ON a2f.node = h2f.node, mx, ma
    """,
)
def graph_hits(spark, sf_dir):
    """HITS hubs/authorities, 2 exact integer iterations + single final
    max-normalization (Gelly library/linkanalysis/HITS.java); oracle
    unrolls both rounds."""
    from flink_psl_spark.operators.graph import hits

    return hits(_edges(spark, sf_dir), iters=2)


@query(
    "graph_global_clustering",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (SELECT s, d FROM edges UNION SELECT d, s FROM edges),
    deg AS (SELECT s AS node, COUNT(*) AS degree FROM und GROUP BY s),
    w AS (SELECT CAST(SUM(degree * (degree - 1) // 2) AS BIGINT) AS wedges FROM deg),
    tri AS (
      SELECT COUNT(*) AS t
      FROM und e1 JOIN und e2 ON e1.s = e2.s AND e1.d < e2.d
      WHERE e1.s < e1.d
        AND EXISTS (SELECT 1 FROM und c WHERE c.s = e1.d AND c.d = e2.d)),
    lcc AS (
      SELECT deg.node, deg.degree,
             ROUND(CASE WHEN deg.degree >= 2
                   THEN 2.0 * COALESCE(nt.t, 0) / (deg.degree * (deg.degree - 1))
                   ELSE 0.0 END, 6) AS lcc
      FROM deg LEFT JOIN (
        SELECT e1.s AS node, COUNT(*) AS t
        FROM und e1 JOIN und e2 ON e1.s = e2.s AND e1.d < e2.d
        WHERE EXISTS (SELECT 1 FROM und c WHERE c.s = e1.d AND c.d = e2.d)
        GROUP BY e1.s) nt ON nt.node = deg.node)
    SELECT ROUND(3.0 * tri.t / w.wedges, 6) AS global_cc,
           (SELECT ROUND(AVG(lcc), 6) FROM lcc) AS average_cc,
           w.wedges, CAST(tri.t AS BIGINT) AS triangles
    FROM w, tri
    """,
)
def graph_global_clustering(spark, sf_dir):
    """Global + average clustering coefficient in one row (Gelly
    library/clustering/undirected/{Global,Average}ClusteringCoefficient.java):
    global = 3·triangles / wedges; average = mean of per-node lcc."""
    from flink_psl_spark.operators.graph import (
        local_clustering_coefficient,
        triadic_census,
        undirect,
    )

    edges = _edges(spark, sf_dir)
    census = triadic_census(edges)  # carries exact wedge/triangle counts
    lcc_avg = local_clustering_coefficient(edges).agg(
        F.round(F.avg("lcc"), 6).alias("average_cc")
    )
    return census.crossJoin(lcc_avg).select(
        F.round(
            3.0 * F.col("triangle") / (F.col("wedge") + 3 * F.col("triangle")), 6
        ).alias("global_cc"),
        "average_cc",
        (F.col("wedge") + 3 * F.col("triangle")).alias("wedges"),
        F.col("triangle").alias("triangles"),
    )


@query(
    "graph_community_detection",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (SELECT s, d FROM edges UNION SELECT d, s FROM edges),
    l0 AS (SELECT DISTINCT s AS node, s AS label, 1.0 AS score FROM und),
    m1 AS (SELECT u.s AS node, l.label, l.score
           FROM und u JOIN l0 l ON l.node = u.d),
    a1 AS (SELECT node, label, SUM(score) AS ssum, MAX(score) AS smax
           FROM m1 GROUP BY 1, 2),
    p1 AS (SELECT node,
                  (LIST(label ORDER BY ssum DESC, label ASC))[1] AS label,
                  (LIST(smax ORDER BY ssum DESC, label ASC))[1] AS smax
           FROM a1 GROUP BY node),
    l1 AS (SELECT p1.node, p1.label,
                  p1.smax - CASE WHEN p1.label <> l0.label THEN 0.5 ELSE 0 END AS score
           FROM p1 JOIN l0 ON l0.node = p1.node),
    m2 AS (SELECT u.s AS node, l.label, l.score
           FROM und u JOIN l1 l ON l.node = u.d),
    a2 AS (SELECT node, label, SUM(score) AS ssum, MAX(score) AS smax
           FROM m2 GROUP BY 1, 2),
    p2 AS (SELECT node,
                  (LIST(label ORDER BY ssum DESC, label ASC))[1] AS label,
                  (LIST(smax ORDER BY ssum DESC, label ASC))[1] AS smax
           FROM a2 GROUP BY node),
    l2 AS (SELECT p2.node, p2.label,
                  p2.smax - CASE WHEN p2.label <> l1.label THEN 0.25 ELSE 0 END AS score
           FROM p2 JOIN l1 ON l1.node = p2.node)
    SELECT node, label, CAST(ROUND(score, 6) AS DOUBLE) AS score FROM l2
    """,
)
def graph_community_detection(spark, sf_dir):
    """Hop-attenuated community detection, 2 rounds, delta=0.5 (Gelly
    library/CommunityDetection.java — Leung et al. real-time community
    detection); oracle unrolls both rounds exactly (dyadic-exact scores)."""
    from flink_psl_spark.operators.graph import community_detection

    return community_detection(_edges(spark, sf_dir), iters=2, delta=0.5)


@query(
    "graph_vertex_metrics",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (SELECT s, d FROM edges UNION SELECT d, s FROM edges),
    deg AS (SELECT s AS node, COUNT(*) AS degree FROM und GROUP BY s)
    SELECT COUNT(*) AS vertex_count,
           CAST(SUM(degree) // 2 AS BIGINT) AS edge_count,
           ROUND(AVG(degree), 6) AS average_degree,
           CAST(MAX(degree) AS BIGINT) AS maximum_degree,
           CAST(SUM(degree * (degree - 1) // 2) AS BIGINT) AS triplet_count
    FROM deg
    """,
)
def graph_vertex_metrics(spark, sf_dir):
    """Undirected vertex metrics: vertex/edge counts, average + maximum
    degree, triplet count (Gelly library/metric/undirected/VertexMetrics.java)
    — one degree aggregation."""
    from flink_psl_spark.operators.graph import undirect

    und = undirect(_edges(spark, sf_dir))
    deg = und.groupBy("s").agg(F.count("*").alias("degree"))
    return deg.agg(
        F.count("*").alias("vertex_count"),
        F.expr("sum(degree) div 2").alias("edge_count"),
        F.round(F.avg("degree"), 6).alias("average_degree"),
        F.max("degree").cast("bigint").alias("maximum_degree"),
        F.sum(F.expr("degree * (degree - 1) div 2")).alias("triplet_count"),
    )
