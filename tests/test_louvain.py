"""Louvain: partition correctness on graphs with unambiguous optima
(mirrors the reference's LouvainTest.java strategy of asserting community
structure, not label values)."""

from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.louvain import louvain
from graph_data_science_spark.algorithms.misc import modularity
from graph_data_science_spark.graph.build import from_edge_list


def groups_of(result):
    rows = result.communities.collect()
    byc = {}
    for r in rows:
        byc.setdefault(r["community"], set()).add(r["node_id"])
    return {frozenset(v) for v in byc.values()}


def test_louvain_two_cliques_with_bridge(spark):
    k4a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    k4b = [(i + 4, j + 4) for i in range(4) for j in range(i + 1, 4)]
    g = from_edge_list(spark, k4a + k4b + [(0, 4)], node_count=8)
    res = louvain(g)
    assert groups_of(res) == {frozenset(range(4)), frozenset(range(4, 8))}
    assert res.modularities[-1] > 0.3


def test_louvain_disconnected_cliques(spark):
    # Optimal partition of disconnected cliques is exactly the cliques.
    cliques = []
    for c in range(4):
        base = c * 5
        cliques += [(base + i, base + j) for i in range(5) for j in range(i + 1, 5)]
    g = from_edge_list(spark, cliques, node_count=20)
    res = louvain(g)
    assert groups_of(res) == {frozenset(range(c * 5, c * 5 + 5)) for c in range(4)}


def test_louvain_weighted_pull(spark):
    # 0-1 heavy, 1-2 light: 0,1 together; 2,3 together (2-3 heavy).
    g = from_edge_list(
        spark, [(0, 1, 10.0), (1, 2, 1.0), (2, 3, 10.0)], node_count=4
    )
    res = louvain(g)
    assert groups_of(res) == {frozenset({0, 1}), frozenset({2, 3})}


def test_louvain_isolated_nodes_stay_singleton(spark):
    g = from_edge_list(spark, [(0, 1)], node_count=4)
    res = louvain(g)
    assert groups_of(res) == {frozenset({0, 1}), frozenset({2}), frozenset({3})}


def test_louvain_modularity_agrees_with_metric(spark):
    k4a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    k4b = [(i + 4, j + 4) for i in range(4) for j in range(i + 1, 4)]
    g = from_edge_list(spark, k4a + k4b + [(0, 4)], node_count=8)
    res = louvain(g)
    q_metric = modularity(g, res.communities.select("node_id", "community"))
    assert abs(res.modularities[-1] - q_metric) < 1e-9
