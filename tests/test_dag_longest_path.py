"""DAG longest path (reference ``dag/longestPath/DagLongestPath.java:58``):
max-relaxation fixpoint + parent backtracking, cycle rejection."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.dag import dag_longest_path
from graph_data_science_spark.graph.build import LinkGraph


def _graph(spark, edges, n=None):
    df = spark.createDataFrame(
        [(int(s), int(d), float(w)) for s, d, w in edges], "src long, dst long, weight double"
    )
    return LinkGraph(edges=df, node_count=n)


def test_diamond_longest(spark):
    # 0->1 (1), 0->2 (5), 1->3 (1), 2->3 (1): longest to 3 is 0-2-3 = 6
    res = dag_longest_path(_graph(spark, [(0, 1, 1), (0, 2, 5), (1, 3, 1), (2, 3, 1)]))
    rows = {r["target_node"]: r for r in res.paths.collect()}
    assert rows[3]["total_cost"] == 6.0
    assert rows[3]["node_ids"] == [0, 2, 3]
    assert rows[3]["costs"] == [0.0, 5.0, 6.0]
    assert rows[3]["source_node"] == 0
    assert rows[0]["total_cost"] == 0.0 and rows[0]["node_ids"] == [0]
    assert rows[2]["node_ids"] == [0, 2]


def test_every_node_gets_a_path(spark):
    # chain + isolated node 3
    res = dag_longest_path(_graph(spark, [(0, 1, 2), (1, 2, 3)], n=4))
    rows = {r["target_node"]: r for r in res.paths.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[2]["total_cost"] == 5.0
    assert rows[3]["total_cost"] == 0.0
    dist = {r["node_id"]: r["distance"] for r in res.distances.collect()}
    assert dist == {0: 0.0, 1: 2.0, 2: 5.0, 3: 0.0}


def test_unweighted_counts_hops(spark):
    res = dag_longest_path(_graph(spark, [(0, 1, 9), (1, 2, 9)]), weighted=False)
    rows = {r["target_node"]: r["total_cost"] for r in res.paths.collect()}
    assert rows == {0: 0.0, 1: 1.0, 2: 2.0}


def test_targets_filter(spark):
    res = dag_longest_path(_graph(spark, [(0, 1, 1), (1, 2, 1)]), targets=[2])
    assert res.paths.count() == 1


def test_tie_break_deterministic(spark):
    # two equal-cost longest paths into 2: via 0 or via 1 — max src wins
    res = dag_longest_path(_graph(spark, [(0, 2, 4), (1, 2, 4)]))
    rows = {r["target_node"]: r for r in res.paths.collect()}
    assert rows[2]["node_ids"] == [1, 2]


def test_cycle_raises(spark):
    with pytest.raises(ValueError, match="cycle"):
        dag_longest_path(_graph(spark, [(0, 1, 1), (1, 0, 1)]))
