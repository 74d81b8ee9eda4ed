"""wcc_star (alternating large-star/small-star contraction) parity vs the
min-label-propagation path.

Both must reach GDS's union-by-min fixpoint (component id = min member id,
reference core/.../dss/HugeAtomicDisjointSetStruct.java:163-191), so on any
graph their (node_id, component) outputs are identical.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from graph_data_science_spark.algorithms import wcc, wcc_star
from graph_data_science_spark.graph.build import LinkGraph


def _graph(spark, edges, n):
    df = spark.createDataFrame(
        [(int(s), int(d), 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    return LinkGraph(edges=df, node_count=n)


def _comps(res):
    return sorted((r["node_id"], r["component"]) for r in res.components.collect())


def test_star_matches_labelprop_on_random_graph(spark):
    rng = random.Random(7)
    n = 400
    edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(500)}
    edges = [(s, d) for s, d in edges if s != d]
    g = _graph(spark, edges, n)
    assert _comps(wcc_star(g)) == _comps(wcc(g))


def test_star_on_long_chain_converges_logarithmically(spark):
    # Path graph: worst case for plain min-propagation (diameter rounds);
    # star contraction must converge in O(log n) pair-rounds and still
    # label every node with the chain minimum.
    n = 1024
    g = _graph(spark, [(i, i + 1) for i in range(n - 1)], n)
    res = wcc_star(g)
    comps = _comps(res)
    assert comps == [(i, 0) for i in range(n)]
    assert res.ran_iterations <= 14  # ~log2(1024) + slack, far below diameter


def test_star_disjoint_cliques_and_isolated_nodes(spark):
    edges = []
    for base in (0, 10, 20):
        members = range(base, base + 5)
        edges += [(a, b) for a in members for b in members if a < b]
    g = _graph(spark, edges, 30)  # nodes 25..29 isolated
    comps = dict(_comps(wcc_star(g)))
    for base in (0, 10, 20):
        for v in range(base, base + 5):
            assert comps[v] == base
    for v in range(25, 30):
        assert comps[v] == v


def test_star_threshold_filters_edges(spark):
    df = spark.createDataFrame(
        [(0, 1, 5.0), (1, 2, 0.5)], "src long, dst long, weight double"
    )
    g = LinkGraph(edges=df, node_count=3)
    comps = dict(_comps(wcc_star(g, threshold=1.0)))
    assert comps == {0: 0, 1: 0, 2: 2}
    assert dict(_comps(wcc(g, threshold=1.0))) == comps
