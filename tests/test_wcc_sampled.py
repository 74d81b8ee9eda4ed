"""Afforest sampled WCC (reference wcc/SampledStrategy.java) parity tests."""

from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.wcc import wcc, wcc_sampled
from graph_data_science_spark.graph.build import LinkGraph


def _graph(spark, edges, n):
    df = spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    return LinkGraph(edges=df, node_count=n)


def _comps(res):
    return sorted((r.node_id, r.component) for r in res.components.collect())


def test_sampled_matches_unsampled_chain_plus_giant(spark):
    # giant component 0..19 (chain) + separate triangle + isolated node
    edges = [(i, i + 1) for i in range(19)]
    edges += [(30, 31), (31, 32), (32, 30)]
    g = _graph(spark, edges, 40)
    assert _comps(wcc_sampled(g)) == _comps(wcc(g))


def test_sampled_matches_on_hub_graph(spark):
    # high-degree hub: node 0 connected to 1..15; sampling keeps only the 2
    # smallest neighbors per node, the rest must merge via contraction
    edges = [(0, i) for i in range(1, 16)] + [(20, 21)]
    g = _graph(spark, edges, 25)
    assert _comps(wcc_sampled(g)) == _comps(wcc(g))


def test_sampled_crosslinked_rings(spark):
    # two rings joined by one late (high dst) edge — the joining edge is
    # beyond every node's 2-neighbor sample on one side, forcing phase 3
    edges = [(i, (i + 1) % 8) for i in range(8)]
    edges += [(10 + i, 10 + (i + 1) % 8) for i in range(8)]
    edges += [(7, 17)]
    g = _graph(spark, edges, 20)
    res = wcc_sampled(g)
    got = _comps(res)
    assert got == _comps(wcc(g))
    # both rings + the cross link collapse to one component rooted at 0
    # (nodes 8, 9, 18, 19 are isolated singletons in the 0..19 universe)
    linked = {n for n, _ in got} - {8, 9, 18, 19}
    assert {c for n, c in got if n in linked} == {0}


def test_sampled_threshold(spark):
    df = spark.createDataFrame(
        [(0, 1, 5.0), (1, 2, 0.5)], "src long, dst long, weight double"
    )
    g = LinkGraph(edges=df, node_count=3)
    got = _comps(wcc_sampled(g, threshold=1.0))
    assert got == [(0, 0), (1, 0), (2, 2)]
