"""SCC (vs known component structures, mirroring SccTest.java's graphs) and
K-1 coloring (validity + determinism)."""

from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.coloring import k1coloring
from graph_data_science_spark.algorithms.scc import scc
from graph_data_science_spark.graph.build import from_edge_list


def comp_sets(res):
    byc = {}
    for r in res.components.collect():
        byc.setdefault(r["component"], set()).add(r["node_id"])
    return {frozenset(v) for v in byc.values()}


def test_scc_two_cycles_and_bridge(spark):
    # Cycle {0,1,2} → cycle {3,4} → sink 5; plus isolated 6.
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3), (4, 5)]
    g = from_edge_list(spark, edges, node_count=7)
    res = scc(g)
    assert comp_sets(res) == {
        frozenset({0, 1, 2}), frozenset({3, 4}), frozenset({5}), frozenset({6}),
    }


def test_scc_dag_is_all_singletons(spark):
    g = from_edge_list(spark, [(0, 1), (0, 2), (1, 3), (2, 3)], node_count=4)
    res = scc(g)
    assert comp_sets(res) == {frozenset({i}) for i in range(4)}


def test_scc_one_big_cycle(spark):
    n = 10
    g = from_edge_list(spark, [(i, (i + 1) % n) for i in range(n)], node_count=n)
    res = scc(g)
    assert comp_sets(res) == {frozenset(range(n))}
    # component id = max member id
    assert {r["component"] for r in res.components.collect()} == {n - 1}


def test_scc_nested_structure(spark):
    # Two SCCs where the larger-id component feeds the smaller-id one:
    # exercises the multi-round capture (root of round 1 color isn't all).
    edges = [(5, 6), (6, 5), (5, 0), (0, 1), (1, 0)]
    g = from_edge_list(spark, edges, node_count=7)
    res = scc(g)
    assert comp_sets(res) >= {frozenset({5, 6}), frozenset({0, 1})}


def test_k1coloring_proper_and_deterministic(spark):
    # Odd cycle + chords — needs ≥3 colors; verify properness, not count.
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 2)]
    g = from_edge_list(spark, edges, node_count=5)
    res = k1coloring(g)
    assert res.did_converge
    colors = {r["node_id"]: r["color"] for r in res.colors.collect()}
    for s, d in edges:
        assert colors[s] != colors[d], f"edge {s}-{d} monochromatic"
    res2 = k1coloring(g)
    assert colors == {r["node_id"]: r["color"] for r in res2.colors.collect()}


def test_k1coloring_star_uses_two_colors(spark):
    g = from_edge_list(spark, [(0, i) for i in range(1, 8)], node_count=8)
    res = k1coloring(g)
    colors = {r["node_id"]: r["color"] for r in res.colors.collect()}
    assert len(set(colors.values())) == 2
    for i in range(1, 8):
        assert colors[i] != colors[0]
