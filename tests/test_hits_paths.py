"""HITS (reference HitsTest.java fixture graph, verified against its own
PseudoCodeHits oracle re-run in numpy) + shortest-paths/BFS + WCC seeding."""

import numpy as np
import pytest

from graph_data_science_spark.algorithms.hits import hits
from graph_data_science_spark.algorithms.paths import bfs_levels, shortest_paths
from graph_data_science_spark.algorithms.wcc import wcc
from graph_data_science_spark.graph.build import from_edge_list

# HitsTest.java GDL graph: a..h = 0..7.
HITS_EDGES = [
    (0, 3), (1, 2), (1, 4), (2, 0), (3, 2), (4, 3), (4, 1), (4, 5), (4, 2),
    (5, 2), (5, 7), (6, 0), (6, 2), (7, 0),
]


def pseudo_code_hits(n, edges, k):
    """The reference's own test oracle (HitsTest.java PseudoCodeHits)."""
    auths = np.ones(n)
    hubs = np.ones(n)
    for _ in range(k):
        new_auths = np.zeros(n)
        for s, t in edges:
            new_auths[t] += hubs[s]
        auths = new_auths / np.linalg.norm(new_auths)
        new_hubs = np.zeros(n)
        for s, t in edges:
            new_hubs[s] += auths[t]
        hubs = new_hubs / np.linalg.norm(new_hubs)
    return auths, hubs


def test_hits_matches_reference_pseudocode(spark):
    g = from_edge_list(spark, HITS_EDGES, node_count=8)
    res = hits(g, hits_iterations=30)
    exp_auth, exp_hub = pseudo_code_hits(8, HITS_EDGES, 30)
    rows = {r["node_id"]: (r["auth"], r["hub"]) for r in res.scores.collect()}
    for i in range(8):
        assert rows[i][0] == pytest.approx(exp_auth[i], abs=1e-6), f"auth {i}"
        assert rows[i][1] == pytest.approx(exp_hub[i], abs=1e-6), f"hub {i}"


def test_hits_dangling_and_sourceless_nodes(spark):
    # Node 2 has no edges at all; 0→1 only.
    g = from_edge_list(spark, [(0, 1)], node_count=3)
    res = hits(g, hits_iterations=5)
    rows = {r["node_id"]: (r["auth"], r["hub"]) for r in res.scores.collect()}
    assert rows[1][0] == pytest.approx(1.0)  # sole authority
    assert rows[0][1] == pytest.approx(1.0)  # sole hub
    assert rows[2] == (0.0, 0.0)


# Weighted DAG-ish graph with a shortcut: 0→1 (1), 1→2 (2), 0→2 (10), 2→3 (1).
SSSP_EDGES = [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 10.0), (2, 3, 1.0)]


def test_shortest_paths_weighted(spark):
    g = from_edge_list(spark, SSSP_EDGES, node_count=5)
    res = shortest_paths(g, source=0)
    assert res.did_converge and not res.negative_cycle
    d = {r["node_id"]: r["distance"] for r in res.distances.collect()}
    assert d == {0: 0.0, 1: 1.0, 2: 3.0, 3: 4.0}  # node 4 unreachable → absent


def test_shortest_paths_directed_only(spark):
    # Distances follow edge direction: source 2 reaches only 3.
    g = from_edge_list(spark, SSSP_EDGES, node_count=5)
    d = {r["node_id"]: r["distance"] for r in shortest_paths(g, source=2).distances.collect()}
    assert d == {2: 0.0, 3: 1.0}


def test_shortest_paths_negative_weights_and_cycle(spark):
    # Negative edge, no cycle: Bellman-Ford handles it.
    g = from_edge_list(spark, [(0, 1, 5.0), (1, 2, -3.0)], node_count=3)
    res = shortest_paths(g, source=0)
    assert res.did_converge
    d = {r["node_id"]: r["distance"] for r in res.distances.collect()}
    assert d == {0: 0.0, 1: 5.0, 2: 2.0}
    # Negative cycle reachable from the source: flagged.
    cyc = from_edge_list(spark, [(0, 1, 1.0), (1, 2, -2.0), (2, 1, 0.5)], node_count=3)
    res2 = shortest_paths(cyc, source=0)
    assert not res2.did_converge and res2.negative_cycle


def test_bfs_levels(spark):
    g = from_edge_list(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)], node_count=6)
    lv = {r["node_id"]: r["level"] for r in bfs_levels(g, source=0).collect()}
    assert lv == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}  # 5 unreachable → absent


def test_wcc_seeds(spark):
    # Components {0,1} and {2,3}; node 4 isolated. Seeds: 0→100, 3→200.
    g = from_edge_list(spark, [(0, 1), (2, 3)], node_count=5)
    seeds = spark.createDataFrame([(0, 100), (3, 200)], "node_id long, seed long")
    comp = {r["node_id"]: r["component"] for r in wcc(g, seeds=seeds).components.collect()}
    assert comp[0] == comp[1] == 100
    assert comp[2] == comp[3] == 200
    assert comp[4] == 201 + 4  # unseeded: max_seed + 1 + node_id
    # Two seeds in one component → min seed wins.
    seeds2 = spark.createDataFrame([(0, 100), (1, 50)], "node_id long, seed long")
    comp2 = {r["node_id"]: r["component"] for r in wcc(g, seeds=seeds2).components.collect()}
    assert comp2[0] == comp2[1] == 50
    # Unseeded run unchanged by the new code path.
    plain = {r["node_id"]: r["component"] for r in wcc(g).components.collect()}
    assert plain == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4}
