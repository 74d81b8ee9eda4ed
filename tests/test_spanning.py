"""Spanning tree family: Borůvka MSF == Prim's tree (reference
``spanningtree/Prim.java:43`` fixtures), k-spanning-tree pruning,
Steiner path-union."""

import math

from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.spanning import (
    k_spanning_tree,
    minimum_spanning_forest,
    spanning_tree,
    steiner_tree_approx,
)
from graph_data_science_spark.graph.build import LinkGraph


def _graph(spark, edges, n=None):
    df = spark.createDataFrame(
        [(int(s), int(d), float(w)) for s, d, w in edges], "src long, dst long, weight double"
    )
    return LinkGraph(edges=df, node_count=n)


# The reference PrimTest graph (SpanningTreeTest fixtures use the same
# shape): a-b-c triangle weights 1,2,3 plus pendant edges — MST keeps the
# two lightest triangle edges.
PRIM_EDGES = [
    (0, 1, 1.0),  # a-b
    (1, 2, 2.0),  # b-c
    (0, 2, 3.0),  # a-c (heaviest in cycle — excluded)
    (2, 3, 4.0),  # c-d pendant
    (3, 4, 5.0),  # d-e pendant
]


def test_mst_matches_prim(spark):
    res = spanning_tree(_graph(spark, PRIM_EDGES), start_node=0)
    rows = {r["node_id"]: (r["parent"], r["cost_to_parent"]) for r in res.tree.collect()}
    assert rows[0] == (-1, 0.0)
    assert rows[1] == (0, 1.0)
    assert rows[2] == (1, 2.0)
    assert rows[3] == (2, 4.0)
    assert rows[4] == (3, 5.0)
    assert res.total_weight == 12.0
    assert res.effective_node_count == 5


def test_maximum_spanning_tree(spark):
    res = spanning_tree(_graph(spark, PRIM_EDGES), start_node=0, objective="max")
    rows = {r["node_id"]: (r["parent"], r["cost_to_parent"]) for r in res.tree.collect()}
    # Max tree drops a-b (1.0), keeps a-c (3) and b-c (2).
    assert rows[2] == (0, 3.0)
    assert rows[1] == (2, 2.0)
    assert res.total_weight == 14.0


def test_msf_spans_disconnected_components(spark):
    edges = PRIM_EDGES + [(10, 11, 1.0), (11, 12, 9.0), (10, 12, 2.0)]
    forest, comp, _ = minimum_spanning_forest(_graph(spark, edges))
    pairs = {(r["lo"], r["hi"]) for r in forest.collect()}
    assert (10, 11) in pairs and (10, 12) in pairs and (11, 12) not in pairs
    # Components of the forest == WCC of the graph.
    comps = {r["node"]: r["comp"] for r in comp.collect()}
    assert len({comps[i] for i in (0, 1, 2, 3, 4)}) == 1
    assert len({comps[i] for i in (10, 11, 12)}) == 1
    assert comps[0] != comps[10]


def test_spanning_tree_only_start_component(spark):
    edges = PRIM_EDGES + [(10, 11, 1.0)]
    res = spanning_tree(_graph(spark, edges), start_node=10)
    ids = {r["node_id"] for r in res.tree.collect()}
    assert ids == {10, 11}
    assert res.total_weight == 1.0


def test_parallel_and_self_edges_ignored(spark):
    edges = [(0, 1, 5.0), (0, 1, 1.0), (1, 0, 7.0), (1, 1, 0.1), (1, 2, 2.0)]
    res = spanning_tree(_graph(spark, edges), start_node=0)
    assert res.total_weight == 3.0  # min parallel weight 1.0 + 2.0


def test_deterministic_tie_break(spark):
    # Square with all-equal weights: ties resolved by (w, lo, hi) struct
    # order — run twice, identical trees.
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0)]
    t1 = sorted(map(tuple, spanning_tree(_graph(spark, edges), 0).tree.collect()))
    t2 = sorted(map(tuple, spanning_tree(_graph(spark, edges), 0).tree.collect()))
    assert t1 == t2


def test_k_spanning_tree_star(spark):
    # Star: hub 0, leaves 1..6 with weight = leaf id. k=4 keeps the 3
    # cheapest leaves (KSpanningTree.java:18 — k NODES, worst leaves crop).
    edges = [(0, i, float(i)) for i in range(1, 7)]
    res = k_spanning_tree(_graph(spark, edges), start_node=0, k=4)
    ids = {r["node_id"] for r in res.tree.collect()}
    assert ids == {0, 1, 2, 3}
    assert res.effective_node_count == 4
    assert res.total_weight == 6.0


def test_k_spanning_tree_batch_prunes_exposed_leaves(spark):
    # Chain 0-1-2-3-4 (costs 1..4): pruning to k=2 must peel from the far
    # end even though only one leaf exists per round besides the start.
    edges = [(i, i + 1, float(i + 1)) for i in range(4)]
    res = k_spanning_tree(_graph(spark, edges), start_node=0, k=2, prune_batch=8)
    ids = {r["node_id"] for r in res.tree.collect()}
    assert ids == {0, 1}


def test_steiner_path_union(spark):
    # Weighted tree: 0-1 (1), 1-2 (2), 1-3 (4), 0-4 (7). Terminals 2 and 4:
    # Steiner tree = paths 0-1-2 and 0-4; node 3 excluded.
    edges = [(0, 1, 1.0), (1, 2, 2.0), (1, 3, 4.0), (0, 4, 7.0)]
    res = steiner_tree_approx(_graph(spark, edges), source=0, terminals=[2, 4])
    rows = {r["node_id"]: (r["parent"], r["cost_to_parent"]) for r in res.tree.collect()}
    assert set(rows) == {0, 1, 2, 4}
    assert rows[2] == (1, 2.0)
    assert rows[4] == (0, 7.0)
    assert res.total_weight == 10.0
    assert res.terminals_reached == 2


def test_steiner_skips_unreachable_terminal(spark):
    edges = [(0, 1, 1.0), (5, 6, 1.0)]
    res = steiner_tree_approx(_graph(spark, edges), source=0, terminals=[1, 6])
    assert res.terminals_reached == 1
    assert {r["node_id"] for r in res.tree.collect()} == {0, 1}


def test_mst_weight_equals_networkx_free_check(spark):
    # Pure-python Kruskal cross-check on a deterministic random-ish graph.
    import itertools

    rngw = lambda a, b: float(((a * 73856093) ^ (b * 19349663)) % 97 + 1)  # noqa: E731
    nodes = list(range(12))
    edges = [(a, b, rngw(a, b)) for a, b in itertools.combinations(nodes, 2) if (a + b) % 3]
    # driver-side Kruskal
    parent = list(range(12))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total = 0.0
    for a, b, w in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            total += w
    res = spanning_tree(_graph(spark, edges), start_node=0)
    assert math.isclose(res.total_weight, total)
    # parent edges all exist in the input edge set with matching weight
    tree = res.tree.filter(F.col("parent") >= 0).collect()
    eset = {(min(a, b), max(a, b)): w for a, b, w in edges}
    for r in tree:
        key = (min(r["node_id"], r["parent"]), max(r["node_id"], r["parent"]))
        assert math.isclose(eset[key], r["cost_to_parent"])
