"""Approximate Max-k-Cut (reference ApproxMaxKCut.java:47): local-optimum
invariants on closed-form fixtures."""

import pytest

from graph_data_science_spark.algorithms.maxkcut import approx_max_k_cut
from graph_data_science_spark.graph.build import LinkGraph


def _graph(spark, edges, n=None):
    df = spark.createDataFrame(
        [(int(s), int(d), float(w)) for s, d, w in edges], "src long, dst long, weight double"
    )
    return LinkGraph(edges=df, node_count=n)


def test_matching_fully_cut(spark):
    # Perfect matching with opposite-parity endpoints: the parity-batched
    # local search must cut every edge (optimum).
    edges = [(2 * i, 2 * i + 101, 1.0) for i in range(8)]
    res = approx_max_k_cut(_graph(spark, edges), k=2, iterations=1)
    assert res.cut_cost == 8.0
    comm = {r["node_id"]: r["community"] for r in res.assignments.collect()}
    for s, d, _ in edges:
        assert comm[s] != comm[d]


def test_triangle_k3_all_cut(spark):
    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)]
    res = approx_max_k_cut(_graph(spark, edges), k=3, iterations=2)
    assert res.cut_cost == 3.0
    comm = {r["node_id"]: r["community"] for r in res.assignments.collect()}
    assert len({comm[0], comm[1], comm[2]}) == 3


def test_min_cut_keeps_clique_together(spark):
    # Two triangles joined by one light bridge: min-2-cut = cut the bridge.
    tri1 = [(0, 1, 5.0), (1, 2, 5.0), (0, 2, 5.0)]
    tri2 = [(10, 11, 5.0), (11, 12, 5.0), (10, 12, 5.0)]
    bridge = [(2, 10, 1.0)]
    res = approx_max_k_cut(_graph(spark, tri1 + tri2 + bridge), k=2, iterations=4, minimize=True)
    comm = {r["node_id"]: r["community"] for r in res.assignments.collect()}
    assert comm[0] == comm[1] == comm[2]
    assert comm[10] == comm[11] == comm[12]
    # a 2-partition with both triangles intact cuts at most the bridge
    assert res.cut_cost <= 1.0


def test_weighted_cut_counts_directed_edges_once(spark):
    edges = [(0, 1, 2.5)]
    res = approx_max_k_cut(_graph(spark, edges), k=2, iterations=1)
    assert res.cut_cost == 2.5


def test_unsupported_knobs_raise(spark):
    g = _graph(spark, [(0, 1, 1.0)])
    with pytest.raises(NotImplementedError):
        approx_max_k_cut(g, vns_max_neighborhood_order=2)
    with pytest.raises(NotImplementedError):
        approx_max_k_cut(g, min_community_sizes=[1, 1])
