"""prize_steiner_tree: distributed StrongPruning over an MST substrate.

Reference semantics (algo/.../pricesteiner/StrongPruning.java:87-113):
leaf-peel DP, keep the parent edge iff cost < dp(leaf) (strict — ties
prune), fold dp(leaf) - cost into the parent; a cut edge prunes the whole
subtree below it. Sentinels from PrizeSteinerTreeResult.java: parent -1 =
root, -2 = pruned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_data_science_spark.algorithms import prize_steiner_tree
from graph_data_science_spark.graph.build import LinkGraph


def _graph(spark, edges, n):
    df = spark.createDataFrame(
        [(int(s), int(d), float(w)) for s, d, w in edges],
        "src long, dst long, weight double",
    )
    return LinkGraph(edges=df, node_count=n)


def _prizes(spark, mapping):
    return spark.createDataFrame(
        [(int(k), float(v)) for k, v in mapping.items()], "node_id long, prize double"
    )


def _rows(res):
    return {r["node_id"]: (r["parent"], r["cost_to_parent"]) for r in res.tree.collect()}


def test_star_keeps_only_profitable_leaves(spark):
    # Star around 0; leaf i costs i, prize 2.5 → keep 1,2 (cost < 2.5),
    # prune 3,4. Tie behavior is covered separately.
    edges = [(0, i, i) for i in (1, 2, 3, 4)]
    g = _graph(spark, edges, 5)
    res = prize_steiner_tree(g, _prizes(spark, {i: 2.5 for i in (1, 2, 3, 4)}), root=0)
    rows = _rows(res)
    assert rows[0] == (-1, 0.0)
    assert rows[1] == (0, 1.0) and rows[2] == (0, 2.0)
    assert rows[3][0] == -2 and rows[4][0] == -2
    assert res.effective_node_count == 3
    assert res.total_weight == 3.0
    assert res.sum_of_prizes == 5.0


def test_tie_prunes_like_reference(spark):
    # dp == cost → strict '<' in StrongPruning.java:112 prunes.
    g = _graph(spark, [(0, 1, 2.0)], 2)
    res = prize_steiner_tree(g, _prizes(spark, {1: 2.0}), root=0)
    assert _rows(res)[1][0] == -2


def test_deep_chain_folds_descendant_gains(spark):
    # 0 -1- 1 -1- 2 with prizes {1: 0.5, 2: 3}: leaf 2 alone justifies
    # edge (1,2) (3 > 1 → dp(1) = 0.5 + 2 = 2.5) and then edge (0,1)
    # (2.5 > 1) — node 1 is kept by its DESCENDANT's prize.
    g = _graph(spark, [(0, 1, 1.0), (1, 2, 1.0)], 3)
    res = prize_steiner_tree(g, _prizes(spark, {1: 0.5, 2: 3.0}), root=0)
    rows = _rows(res)
    assert rows[1] == (0, 1.0) and rows[2] == (1, 1.0)
    assert res.total_weight == 2.0 and res.sum_of_prizes == 3.5


def test_cut_edge_prunes_whole_subtree(spark):
    # 0 -5- 1 -1- 2: subtree {1,2} nets dp(1) = 1 + (4-1) = 4 < 5 → the
    # top edge is cut and node 2 is pruned even though its own edge was
    # profitable (StrongPruning subtree semantics).
    g = _graph(spark, [(0, 1, 5.0), (1, 2, 1.0)], 3)
    res = prize_steiner_tree(g, _prizes(spark, {1: 1.0, 2: 4.0}), root=0)
    rows = _rows(res)
    assert rows[1][0] == -2 and rows[2][0] == -2
    assert res.effective_node_count == 1
    assert res.total_weight == 0.0


def test_missing_prizes_read_as_zero_and_branching(spark):
    # Root 0 with two branches: (0-1-2) where only 2 has a prize, and
    # (0-3) worthless. Node 1 has NO prize row at all.
    g = _graph(spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 3, 1.0)], 4)
    res = prize_steiner_tree(g, _prizes(spark, {2: 10.0}), root=0)
    rows = _rows(res)
    assert rows[1] == (0, 1.0) and rows[2] == (1, 1.0)
    assert rows[3][0] == -2
    assert res.sum_of_prizes == 10.0
