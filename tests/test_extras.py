"""Closeness/harmonic (vs hand-computed MSBFS on reference-style small
graphs), KMeans, KNN (recall vs exact), CollapsePath, random walks, SLLPA."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.centrality_extra import (
    closeness,
    harmonic_centrality,
    msbfs_distances,
)
from graph_data_science_spark.algorithms.kmeans import kmeans
from graph_data_science_spark.algorithms.knn import knn
from graph_data_science_spark.algorithms.sllpa import speaker_listener_lpa
from graph_data_science_spark.algorithms.walks import collapse_path, random_walks
from graph_data_science_spark.graph.build import from_edge_list, to_undirected


def test_closeness_path_graph(spark):
    # Undirected path 0-1-2-3-4 (ClosenessCentralityTest-style): farness of
    # 0 = 1+2+3+4=10, comp=4 → 0.4; node 2 = 1+1+2+2=6 → 4/6.
    edges = [(i, i + 1) for i in range(4)]
    g = from_edge_list(spark, edges, node_count=5, orientation="undirected")
    sc = {r["node_id"]: r["score"] for r in closeness(g).collect()}
    assert sc[0] == pytest.approx(0.4)
    assert sc[2] == pytest.approx(4 / 6)
    # Wasserman-Faust on a connected graph: × comp/(n-1) = ×1 → identical.
    wf = {r["node_id"]: r["score"] for r in closeness(g, wasserman_faust=True).collect()}
    assert wf[0] == pytest.approx(0.4)


def test_closeness_disconnected_wf(spark):
    # Components {0,1} and {2,3,4} — WF scales by comp/(n-1).
    g = from_edge_list(spark, [(0, 1), (2, 3), (3, 4)], node_count=5, orientation="undirected")
    d = {r["node_id"]: r["score"] for r in closeness(g).collect()}
    assert d[0] == pytest.approx(1.0)  # 1 neighbor at dist 1
    assert d[3] == pytest.approx(1.0)  # comp 2 / farness 2
    wf = {r["node_id"]: r["score"] for r in closeness(g, wasserman_faust=True).collect()}
    assert wf[0] == pytest.approx(1.0 * (1 / 4))
    assert wf[3] == pytest.approx(1.0 * (2 / 4))


def test_harmonic_path_graph(spark):
    # Path 0-1-2: harmonic(1) = (1+1)/2 = 1; harmonic(0) = (1+0.5)/2.
    g = from_edge_list(spark, [(0, 1), (1, 2)], node_count=3, orientation="undirected")
    h = {r["node_id"]: r["score"] for r in harmonic_centrality(g).collect()}
    assert h[1] == pytest.approx(1.0)
    assert h[0] == pytest.approx(0.75)


def test_msbfs_directed(spark):
    g = from_edge_list(spark, [(0, 1), (1, 2)], node_count=3)
    d = {(r["source"], r["node_id"]): r["depth"] for r in msbfs_distances(g).collect()}
    assert d == {(0, 1): 1, (0, 2): 2, (1, 2): 1}


def test_kmeans_two_blobs(spark):
    pts = [(i, [0.0 + i * 0.01, 0.0]) for i in range(5)] + [
        (10 + i, [10.0 + i * 0.01, 10.0]) for i in range(5)
    ]
    df = spark.createDataFrame(pts, "node_id long, embedding array<double>")
    res = kmeans(df, k=2, max_iterations=10, random_seed=1)
    assign = {r["node_id"]: r["community"] for r in res.assignments.collect()}
    left = {assign[i] for i in range(5)}
    right = {assign[10 + i] for i in range(5)}
    assert len(left) == 1 and len(right) == 1 and left != right
    assert res.did_converge
    # determinism
    res2 = kmeans(df, k=2, max_iterations=10, random_seed=1)
    assert assign == {r["node_id"]: r["community"] for r in res2.assignments.collect()}


def test_kmeans_kernel_path_matches_expr(spark, monkeypatch):
    # Large-k·d assignment runs the mapInPandas GEMM kernel; force it on a
    # small-k problem and require identical assignments/centroids to the
    # unrolled expression path (distances to 1e-9 — the GEMM form may
    # differ by ~ulp).
    import importlib

    import pytest as _pt

    mod = importlib.import_module("graph_data_science_spark.algorithms.kmeans")
    pts = [(i, [(i * 37 % 11) / 3.0, (i * 17 % 7) * 1.5, float(i % 5)]) for i in range(60)]
    df = spark.createDataFrame(pts, "node_id long, embedding array<double>")
    a = kmeans(df, k=4, max_iterations=6, random_seed=2)
    monkeypatch.setattr(mod, "KMEANS_EXPR_MAX_TERMS", 0)
    b = kmeans(df, k=4, max_iterations=6, random_seed=2)
    am = {r["node_id"]: (r["community"], r["distance"]) for r in a.assignments.collect()}
    bm = {r["node_id"]: (r["community"], r["distance"]) for r in b.assignments.collect()}
    assert set(am) == set(bm)
    for nid in am:
        assert am[nid][0] == bm[nid][0]
        assert am[nid][1] == _pt.approx(bm[nid][1], abs=1e-9)
    for ca, cb in zip(a.centroids, b.centroids):
        assert ca == _pt.approx(cb, abs=1e-9)
    assert a.ran_iterations == b.ran_iterations and a.did_converge == b.did_converge


def test_kmeans_seeded_centroids(spark):
    pts = [(0, [0.0]), (1, [1.0]), (2, [10.0]), (3, [11.0])]
    df = spark.createDataFrame(pts, "node_id long, embedding array<double>")
    res = kmeans(df, k=2, seed_centroids=[[0.0], [10.0]], max_iterations=5)
    assign = {r["node_id"]: r["community"] for r in res.assignments.collect()}
    assert assign[0] == assign[1] == 0 and assign[2] == assign[3] == 1
    assert res.centroids[0] == [0.5] and res.centroids[1] == [10.5]


def test_knn_recall_vs_exact(spark):
    import math

    pts = [(i, [math.cos(i * 0.37), math.sin(i * 0.37), (i % 7) / 7.0]) for i in range(40)]
    df = spark.createDataFrame(pts, "node_id long, embedding array<double>")
    res = knn(df, k=3, max_iterations=8, random_seed=3)
    got = {(r["node1"], r["node2"]) for r in res.neighbors.collect()}
    # exact top-3 via brute force
    from graph_data_science_spark.datapipe.ann import cosine_topk

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(df, df, k=3, id_col="node_id", vec_col="embedding").collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.85, f"NN-descent recall {recall}"
    assert all(r["rank"] <= 3 for r in res.neighbors.collect())


def test_collapse_path(spark):
    # orders→customers, customers→nations: collapse to orders→nations.
    oc = spark.createDataFrame([(100, 1), (101, 1), (102, 2)], "src long, dst long")
    cn = spark.createDataFrame([(1, 7), (2, 8)], "src long, dst long")
    out = {(r["src"], r["dst"]) for r in collapse_path([oc, cn]).collect()}
    assert out == {(100, 7), (101, 7), (102, 8)}
    loops = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    assert collapse_path([loops, loops]).count() == 0  # self-loops dropped
    assert collapse_path([loops, loops], allow_self_loops=True).count() == 2


def test_random_walks_shape_and_determinism(spark):
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 0), (1, 3)], node_count=4)
    w1 = random_walks(g, walks_per_node=2, walk_length=4, random_seed=5)
    rows = w1.collect()
    # walks from every node × 2 replicas, step 0 = the start itself
    starts = {(r["walk_id"], r["node_id"]) for r in rows if r["step"] == 0}
    assert len(starts) == 8
    # node 3 has no out-edges: its walks stop at step 0
    assert not [r for r in rows if r["step"] > 0 and r["walk_id"] // 2 == 3]
    # every step follows a real edge
    edges = {(0, 1), (1, 2), (2, 0), (1, 3)}
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["node_id"]
    for wk, steps in by_walk.items():
        for s in range(1, max(steps) + 1):
            if s in steps:
                assert (steps[s - 1], steps[s]) in edges
    w2 = random_walks(g, walks_per_node=2, walk_length=4, random_seed=5)
    assert {tuple(r) for r in w1.collect()} == {tuple(r) for r in w2.collect()}


def test_sllpa_two_cliques(spark):
    k4a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    k4b = [(i + 4, j + 4) for i in range(4) for j in range(i + 1, 4)]
    g = from_edge_list(spark, k4a + k4b + [(0, 4)], node_count=8, orientation="undirected")
    res = speaker_listener_lpa(g, max_iterations=12, random_seed=7)
    comm = {r["node_id"]: set(r["community_ids"]) for r in res.communities.collect()}
    # every node belongs to ≥1 community; clique-mates share one
    assert all(len(v) >= 1 for v in comm.values())
    shared_a = set.intersection(*[comm[i] for i in range(4)])
    shared_b = set.intersection(*[comm[i + 4] for i in range(4)])
    assert shared_a and shared_b
    # determinism under the fixed seed
    res2 = speaker_listener_lpa(g, max_iterations=12, random_seed=7)
    assert comm == {r["node_id"]: set(r["community_ids"]) for r in res2.communities.collect()}
