"""Betweenness (known closed forms), subgraph filter, triangle listing,
filtered node similarity, IVF ANN, embedding near-dup, modularity
optimization, RWR sampling."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.betweenness import betweenness
from graph_data_science_spark.algorithms.louvain import modularity_optimization
from graph_data_science_spark.algorithms.similarity import filtered_node_similarity
from graph_data_science_spark.algorithms.triangles import triangle_listing
from graph_data_science_spark.datapipe.ann import cosine_topk, embedding_near_dup_pairs, ivf_topk
from graph_data_science_spark.graph.build import from_edge_list
from graph_data_science_spark.graph.subgraph import rwr_sample, subgraph_filter


def bc_map(g, **kw):
    return {r["node_id"]: r["score"] for r in betweenness(g, **kw).collect()}


def test_betweenness_path_undirected(spark):
    # Path 0-1-2-3-4: bc = [0, 3, 4, 3, 0].
    g = from_edge_list(spark, [(i, i + 1) for i in range(4)], node_count=5, orientation="undirected")
    bc = bc_map(g, undirected=True)
    assert bc == {0: 0.0, 1: 3.0, 2: 4.0, 3: 3.0, 4: 0.0}


def test_betweenness_directed_cycle_and_diamond(spark):
    cyc = from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], node_count=3)
    assert bc_map(cyc) == {0: 1.0, 1: 1.0, 2: 1.0}
    dia = from_edge_list(spark, [(0, 1), (0, 2), (1, 3), (2, 3)], node_count=4)
    bc = bc_map(dia)
    assert bc[1] == pytest.approx(0.5) and bc[2] == pytest.approx(0.5)
    assert bc[0] == 0.0 and bc[3] == 0.0


def test_betweenness_sampled_sources(spark):
    # Only source 0 on the diamond: same dependencies as the s=0 term.
    dia = from_edge_list(spark, [(0, 1), (0, 2), (1, 3), (2, 3)], node_count=4)
    srcs = spark.createDataFrame([(0,)], "source long")
    bc = bc_map(dia, sources=srcs)
    assert bc[1] == pytest.approx(0.5) and bc[2] == pytest.approx(0.5)


def test_subgraph_filter_and_redensify(spark):
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 0)], node_count=4)
    sub = subgraph_filter(g, node_filter="node_id != 2")
    assert sub.relationship_count() == 2  # edges touching 2 dropped
    assert sub.with_node_count() == 4  # id space unchanged without redensify
    dense = subgraph_filter(g, node_filter="node_id != 2", redensify=True)
    assert dense.with_node_count() == 3
    ids = {r["node_id"] for r in dense.vertices.collect()}
    assert ids == {0, 1, 2}
    orig = {r["original_id"] for r in dense.vertices.collect()}
    assert orig == {0, 1, 3}
    # relationship filter alone
    wsub = subgraph_filter(g, relationship_filter="src < 2")
    assert wsub.relationship_count() == 2


def test_triangle_listing(spark):
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0)], node_count=4)
    tris = {(r["a"], r["b"], r["c"]) for r in triangle_listing(g).collect()}
    assert tris == {(0, 1, 2), (0, 2, 3)}


def test_filtered_node_similarity(spark):
    g = from_edge_list(spark, [(0, 10), (0, 11), (1, 10), (1, 11), (2, 10), (2, 11)], node_count=12)
    srcs = spark.createDataFrame([(0,)], "n long")
    tgts = spark.createDataFrame([(1,)], "n long")
    rows = filtered_node_similarity(g, source_nodes=srcs, target_nodes=tgts, top_k=5).collect()
    assert {(r["node1"], r["node2"]) for r in rows} == {(0, 1)}
    assert rows[0]["similarity"] == 1.0


def test_ivf_topk_recall(spark):
    import math

    pts = [(i, [math.cos(i * 0.5), math.sin(i * 0.5)]) for i in range(60)]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 10)
    approx = {(r["query_id"], r["neighbor_id"]) for r in ivf_topk(emb, q, k=3, n_clusters=6, n_probe=3).collect()}
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, q, k=3).collect()}
    assert len(approx & exact) / len(exact) >= 0.8


def test_embedding_near_dup(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.001, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    pairs = {(r["a"], r["b"]) for r in embedding_near_dup_pairs(emb, threshold=0.99).collect()}
    assert (0, 1) in pairs
    assert all(p == (0, 1) for p in pairs)


def test_modularity_optimization_single_level(spark):
    k4a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    k4b = [(i + 4, j + 4) for i in range(4) for j in range(i + 1, 4)]
    g = from_edge_list(spark, k4a + k4b, node_count=8)
    res = modularity_optimization(g)
    byc = {}
    for r in res.communities.collect():
        byc.setdefault(r["community"], set()).add(r["node_id"])
    assert {frozenset(v) for v in byc.values()} == {frozenset(range(4)), frozenset(range(4, 8))}
    assert res.ran_levels == 1


def test_rwr_sample(spark):
    ring = [(i, (i + 1) % 20) for i in range(20)]
    g = from_edge_list(spark, ring, node_count=20)
    starts = spark.createDataFrame([(0,)], "node_id long")
    sub = rwr_sample(g, starts, sample_fraction=0.3, restart_probability=0.2, random_seed=4)
    n = sub.vertices.count()
    assert 6 <= n <= 20
    # induced edges connect sampled nodes only
    sampled = {r["node_id"] for r in sub.vertices.collect()}
    for r in sub.edges.collect():
        assert r["src"] in sampled and r["dst"] in sampled
    # deterministic
    sub2 = rwr_sample(g, starts, sample_fraction=0.3, restart_probability=0.2, random_seed=4)
    assert sampled == {r["node_id"] for r in sub2.vertices.collect()}


def test_leiden_connectivity_guarantee(spark):
    from graph_data_science_spark.algorithms.louvain import leiden

    # Two K4s + a bridge: optimal partition = the cliques, all connected.
    k4a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    k4b = [(i + 4, j + 4) for i in range(4) for j in range(i + 1, 4)]
    g = from_edge_list(spark, k4a + k4b + [(0, 4)], node_count=8)
    res = leiden(g)
    byc = {}
    for r in res.communities.collect():
        byc.setdefault(r["community"], set()).add(r["node_id"])
    groups = {frozenset(v) for v in byc.values()}
    assert groups == {frozenset(range(4)), frozenset(range(4, 8))}
    # every community is connected over the input edges — the guarantee
    edges = {(s, d) for s, d in k4a + k4b + [(0, 4)]}
    for members in groups:
        seen = {min(members)}
        frontier = {min(members)}
        while frontier:
            nxt = set()
            for a, b in edges:
                if a in frontier and b in members and b not in seen:
                    nxt.add(b)
                if b in frontier and a in members and a not in seen:
                    nxt.add(a)
            seen |= nxt
            frontier = nxt
        assert seen == members


def test_leiden_gamma_resolution(spark):
    from graph_data_science_spark.algorithms.louvain import leiden

    # A single K6: gamma=1 merges it; a large gamma forbids any merge
    # (gain k_ic − γ·k_i·Σtot/2m goes negative) → all singletons.
    k6 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    g = from_edge_list(spark, k6, node_count=6)
    low = leiden(g, gamma=1.0)
    n_low = low.communities.select("community").distinct().count()
    high = leiden(g, gamma=10.0)
    n_high = high.communities.select("community").distinct().count()
    assert n_low == 1
    assert n_high == 6


def test_indirect_exposure_reference_fixture(spark):
    from graph_data_science_spark.algorithms.exposure import indirect_exposure

    # IndirectExposureTest.java GDL graph: e00..e42 = 0..10; UNDIRECTED.
    edges = [
        (0, 1, 10.0), (0, 2, 20.0), (0, 3, 30.0), (1, 4, 40.0), (2, 5, 50.0),
        (2, 6, 60.0), (3, 6, 70.0), (3, 7, 80.0), (5, 8, 90.0), (8, 9, 100.0),
    ]
    g = from_edge_list(spark, edges, node_count=11)
    sanc = spark.createDataFrame([(0,)], "node_id long")
    rows = {r["node_id"]: r for r in indirect_exposure(g, sanc).collect()}
    expected = {  # node: (exposure, hop, parent, root)
        0: (1.0, 0, 0, 0), 1: (0.200, 1, 0, 0), 2: (0.154, 1, 0, 0),
        3: (0.167, 1, 0, 0), 4: (0.200, 2, 1, 0), 5: (0.055, 2, 2, 0),
        6: (0.090, 2, 3, 0), 7: (0.167, 2, 3, 0), 8: (0.026, 3, 5, 0),
        9: (0.026, 4, 8, 0),
    }
    for nid, (exp, hop, par, root) in expected.items():
        r = rows[nid]
        assert r["exposure"] == pytest.approx(exp, abs=1e-3), f"node {nid}"
        assert r["hop"] == hop and r["parent"] == par and r["root"] == root, f"node {nid}"
    r42 = rows[10]  # disconnected: defaults
    assert r42["exposure"] == 0.0 and r42["hop"] is None and r42["parent"] is None
