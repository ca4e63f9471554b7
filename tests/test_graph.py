"""Graph algorithms (Gelly parity — SURVEY §1.1): hand-built graphs with
known answers, plus numpy power-iteration cross-check for PageRank."""

from __future__ import annotations

import pytest


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "s long, d long")


def test_degrees(spark):
    from flink_psl_spark.operators.graph import degrees

    # path 1-2-3 plus isolated edge 4-5
    e = _edges(spark, [(1, 2), (2, 3), (4, 5)])
    got = {r["node"]: r["degree"] for r in degrees(e).collect()}
    assert got == {1: 1, 2: 2, 3: 1, 4: 1, 5: 1}


def test_triangle_count(spark):
    from flink_psl_spark.operators.graph import triangle_count

    # K4 has 4 triangles; plus a dangling edge and a duplicate/reversed edge
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    e = _edges(spark, k4 + [(4, 9), (2, 1), (3, 2)])
    assert triangle_count(e).collect()[0]["n_triangles"] == 4


def test_triangle_count_none(spark):
    from flink_psl_spark.operators.graph import triangle_count

    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])  # path: no triangles
    assert triangle_count(e).collect()[0]["n_triangles"] == 0


def test_pagerank_vs_power_iteration(spark):
    np = pytest.importorskip("numpy")
    from flink_psl_spark.operators.graph import pagerank

    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (1, 5), (6, 7)]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, pairs), iters=4).collect()
    }

    # reference: dense power iteration on the symmetrized graph
    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for a, b in pairs:
        adj[idx[a]][idx[b]] = adj[idx[b]][idx[a]] = 1.0
    out = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(4):
        r = 0.15 / n + 0.85 * (adj.T @ (r / out))
    for v in nodes:
        assert got[v] == pytest.approx(r[idx[v]], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_symmetric_graph_uniform(spark):
    from flink_psl_spark.operators.graph import pagerank

    # ring: every node identical by symmetry → uniform ranks
    ring = [(i, (i + 1) % 6) for i in range(6)]
    ranks = [r["rank"] for r in pagerank(_edges(spark, ring), iters=3).collect()]
    assert all(r == pytest.approx(1.0 / 6, abs=1e-12) for r in ranks)


def test_sssp_hand_graph(spark):
    from flink_psl_spark.operators.graph import sssp

    # path 1-2-3-4 plus shortcut 1-4' (5): distances from 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 5), (5, 4)], "s bigint, d bigint"
    )
    got = {r["node"]: r["dist"] for r in sssp(edges, iters=4).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 5: 1, 4: 2}

    # hop bound: iters=1 only reaches direct neighbors
    got1 = {r["node"]: r["dist"] for r in sssp(edges, iters=1).collect()}
    assert got1 == {1: 0, 2: 1, 5: 1}

    # explicit source
    got3 = {r["node"]: r["dist"] for r in sssp(edges, src_node=3, iters=4).collect()}
    assert got3[3] == 0 and got3[1] == 2 and got3[4] == 1


def test_label_propagation_two_cliques(spark):
    from flink_psl_spark.operators.graph import label_propagation

    # two triangles joined by one bridge edge; labels converge to the min
    # node of each triangle (bridge can't outvote the clique)
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(tri1 + tri2 + [(3, 10)], "s bigint, d bigint")
    got = {r["node"]: r["label"] for r in label_propagation(edges, iters=4).collect()}
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11] == got[12]
    assert got[1] != got[10]


def test_clustering_coefficient_hand_graph(spark):
    from flink_psl_spark.operators.graph import local_clustering_coefficient

    # triangle 1-2-3 plus pendant 3-4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "s bigint, d bigint"
    )
    got = {r["node"]: (r["degree"], r["lcc"]) for r in
           local_clustering_coefficient(edges).collect()}
    assert got[1] == (2, 1.0) and got[2] == (2, 1.0)
    assert got[3] == (3, round(1 / 3, 6))  # one closed pair of three
    assert got[4] == (1, 0.0)


def test_jaccard_and_adamic_adar_hand_graph(spark):
    import math

    from flink_psl_spark.operators.graph import adamic_adar, jaccard_index

    # N(1)={2,3}, N(4)={2,3}: jac(1,4) = 2/(2+2-2) = 1.0
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 2), (4, 3)], "s bigint, d bigint"
    )
    jac = {(r["a"], r["b"]): r["jaccard"] for r in jaccard_index(edges).collect()}
    assert jac[(1, 4)] == 1.0
    assert jac[(2, 3)] == 1.0  # symmetric structure

    aa = {(r["a"], r["b"]): r["score"] for r in adamic_adar(edges).collect()}
    # common neighbors of (1,4): 2 and 3, each degree 2 -> 2/ln(2)
    assert aa[(1, 4)] == round(2 / math.log(2), 6)


def test_triadic_census_hand_graph(spark):
    from flink_psl_spark.operators.graph import triadic_census

    # triangle 1-2-3 + pendant 3-4: triples {123}=tri, {124}=one edge,
    # {134},{234}=wedges, none empty
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "s bigint, d bigint"
    )
    row = triadic_census(edges).first()
    assert (row["empty"], row["one_edge"], row["wedge"], row["triangle"]) == (
        0, 1, 2, 1,
    )


def test_hits_star_graph(spark):
    from flink_psl_spark.operators.graph import hits

    # star: 1->2, 1->3, 1->4 — node 1 is the only hub, leaves are equal
    # authorities
    edges = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "s bigint, d bigint")
    got = {r["node"]: (r["hub"], r["authority"]) for r in hits(edges, iters=2).collect()}
    assert got[1] == (1.0, 0.0)
    assert got[2] == got[3] == got[4] == (0.0, 1.0)


def test_summarize_hand_graph(spark):
    from flink_psl_spark.operators.graph import summarize

    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3), (3, 4)], "s bigint, d bigint")
    vv = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "node bigint, value string"
    )
    got = sorted(map(tuple, summarize(edges, vv).collect()))
    assert got == [("a", "a", 1), ("a", "b", 2), ("b", "b", 1)]


def test_community_detection_two_cliques(spark):
    from flink_psl_spark.operators.graph import community_detection

    # disconnected triangles: communities must converge and stay distinct
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(tri1 + tri2, "s bigint, d bigint")
    got = {r["node"]: r for r in community_detection(edges, iters=3).collect()}
    assert got[1]["label"] == got[2]["label"] == got[3]["label"]
    assert got[10]["label"] == got[11]["label"] == got[12]["label"]
    assert got[1]["label"] != got[10]["label"]
    assert all(r["score"] <= 3.0 for r in got.values())

    # bridged cliques: labels still converge within each clique (the min
    # label may legitimately flood across the bridge)
    bridged = spark.createDataFrame(tri1 + tri2 + [(3, 10)], "s bigint, d bigint")
    got_b = {r["node"]: r["label"] for r in community_detection(bridged, iters=3).collect()}
    assert got_b[1] == got_b[2] == got_b[3]
    assert got_b[11] == got_b[12]


def test_graph_ops_degenerate_graphs(spark):
    """Degenerate-input sweep, graph leg (r12): every graph operator
    must be total on the empty graph, a pure-self-loop graph, and a
    single-edge graph (probed exhaustively this round — all clean; this
    test keeps it that way). Self-loops are excluded from neighborhood
    metrics by the undirect() s<d contract, so the self-loop graph
    behaves as edgeless for degrees/triangles/coefficients."""
    import flink_psl_spark.operators.graph as G

    empty = spark.createDataFrame([], "s long, d long")
    selfloop = spark.createDataFrame([(1, 1), (2, 2)], "s long, d long")
    single = spark.createDataFrame([(1, 2)], "s long, d long")

    fns = {
        "degrees": lambda e: G.degrees(e),
        "pagerank": lambda e: G.pagerank(e, iters=2),
        "triangle_count": lambda e: G.triangle_count(e),
        "sssp": lambda e: G.sssp(e, 1),
        "label_propagation": lambda e: G.label_propagation(e, iters=2),
        "clustering_coeff": lambda e: G.local_clustering_coefficient(e),
        "jaccard_index": lambda e: G.jaccard_index(e),
        "adamic_adar": lambda e: G.adamic_adar(e),
        "triadic_census": lambda e: G.triadic_census(e),
        "hits": lambda e: G.hits(e, iters=2),
        "community_detection": lambda e: G.community_detection(e, iters=2),
    }
    for gname, g in (("empty", empty), ("selfloop", selfloop),
                     ("single", single)):
        for fname, fn in fns.items():
            out = fn(g)
            assert out.count() >= 0, (gname, fname)
    # spot semantics: a single edge is a 2-vertex graph with one
    # degree-1 endpoint each and no triangles
    degs = {r["node"]: r["degree"] for r in G.degrees(single).collect()}
    assert degs == {1: 1, 2: 1}
