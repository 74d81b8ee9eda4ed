"""WCC fixture tests (FIXTURES.md F3, from the reference's WccTest.java)."""

from graph_data_science_spark.algorithms.wcc import wcc
from graph_data_science_spark.graph.build import from_edge_list

F3_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),   # component {0,1,2,3}
    (4, 5), (5, 6), (6, 4),           # component {4,5,6}
    (8, 7), (7, 8),                   # component {7,8}
]                                      # node 9 isolated
F3_EXPECTED = [0, 0, 0, 0, 4, 4, 4, 7, 7, 9]


def comp_list(res, n):
    rows = {r["node_id"]: r["component"] for r in res.components.collect()}
    return [rows[i] for i in range(n)]


def test_wcc_natural(spark):
    g = from_edge_list(spark, F3_EDGES, node_count=10)
    assert comp_list(wcc(g), 10) == F3_EXPECTED


def test_wcc_reverse_orientation_identical(spark):
    g = from_edge_list(spark, F3_EDGES, node_count=10, orientation="reverse")
    assert comp_list(wcc(g), 10) == F3_EXPECTED


def test_wcc_undirected_orientation_identical(spark):
    g = from_edge_list(spark, F3_EDGES, node_count=10, orientation="undirected")
    assert comp_list(wcc(g), 10) == F3_EXPECTED


def test_wcc_block_invariant(spark):
    # WccTest.java:69-121 shape: 16 blocks × 10 nodes, chain edges inside a
    # block only ⇒ component(v) = (v // 10) * 10 (min member id).
    edges = []
    for b in range(16):
        base = b * 10
        edges += [(base + i, base + i + 1) for i in range(9)]
    g = from_edge_list(spark, edges, node_count=160)
    comps = comp_list(wcc(g), 160)
    assert comps == [(v // 10) * 10 for v in range(160)]


def test_wcc_threshold(spark):
    # WccBaseConfig.java:32-39: union only edges with weight > threshold.
    edges = [(0, 1, 5.0), (1, 2, 0.5), (3, 4, 2.0)]
    g = from_edge_list(spark, edges, node_count=5)
    comps = comp_list(wcc(g, threshold=1.0), 5)
    assert comps == [0, 0, 2, 3, 3]


def test_wcc_pointer_doubling_long_chain(spark):
    # A 200-node path must converge in O(log n) rounds, not O(n).
    edges = [(i, i + 1) for i in range(199)]
    g = from_edge_list(spark, edges, node_count=200)
    res = wcc(g)
    assert comp_list(res, 200) == [0] * 200
    assert res.ran_iterations <= 12
