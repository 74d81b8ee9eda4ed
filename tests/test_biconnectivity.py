"""Bridges + articulation points (reference ``bridges/Bridges.java:33``,
``articulationpoints/ArticulationPoints.java:29``) via the Tarjan–Vishkin
spanning-forest reduction — verified against a brute-force removal oracle
on every fixture."""

import itertools

from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.biconnectivity import biconnectivity
from graph_data_science_spark.graph.build import LinkGraph


def _graph(spark, edges, n):
    df = spark.createDataFrame(
        [(int(s), int(d), 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    return LinkGraph(edges=df, node_count=n)


def _components(nodes, edges):
    adj = {v: set() for v in nodes}
    for u, v in edges:
        if u in adj and v in adj and u != v:
            adj[u].add(v)
            adj[v].add(u)
    seen, comps = set(), 0
    for s in nodes:
        if s in seen:
            continue
        comps += 1
        stack = [s]
        seen.add(s)
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
    return comps


def _brute(nodes, edges):
    """(bridges, articulation points) by removal + component recount."""
    base = _components(nodes, edges)
    br = set()
    for i, (u, v) in enumerate(edges):
        if u == v:
            continue
        rest = [e for j, e in enumerate(edges) if j != i]
        # a parallel copy keeps them connected
        if _components(nodes, rest) > base:
            br.add((min(u, v), max(u, v)))
    arts = set()
    for x in nodes:
        rest_nodes = [v for v in nodes if v != x]
        rest_edges = [(u, v) for u, v in edges if u != x and v != x]
        # removing x turns its component into k parts: total = base - 1 + k,
        # so x is a cut vertex iff the count strictly exceeds base
        # (an isolated x gives base - 1, never a cut vertex).
        if _components(rest_nodes, rest_edges) > base:
            arts.add(x)
    return br, arts


def _check(spark, edges, n):
    res = biconnectivity(_graph(spark, edges, n))
    got_br = {(min(r["from"], r["to"]), max(r["from"], r["to"])) for r in res.bridges.collect()}
    got_art = {r["node_id"] for r in res.articulation_points.collect()}
    exp_br, exp_art = _brute(list(range(n)), edges)
    assert got_br == exp_br, f"bridges {got_br} != {exp_br}"
    assert got_art == exp_art, f"arts {got_art} != {exp_art}"


def test_path_graph(spark):
    # every edge a bridge, every interior node an articulation point
    _check(spark, [(0, 1), (1, 2), (2, 3)], 4)


def test_triangle_no_bridges(spark):
    _check(spark, [(0, 1), (1, 2), (0, 2)], 3)


def test_bowtie(spark):
    # two triangles sharing node 2 — classic cut vertex
    _check(spark, [(0, 1), (0, 2), (1, 2), (2, 3), (2, 4), (3, 4)], 5)


def test_cycle_with_tail(spark):
    # 4-cycle + pendant chain: bridge chain, arts at attach points
    _check(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (4, 5)], 6)


def test_parallel_edge_not_bridge(spark):
    # doubled edge (1,2) is 2-edge-connected; (0,1) single stays a bridge
    _check(spark, [(0, 1), (1, 2), (1, 2)], 3)


def test_self_loop_ignored(spark):
    _check(spark, [(0, 1), (1, 1), (1, 2)], 3)


def test_two_components_and_isolated(spark):
    # component {0,1,2} triangle, component {3,4} single edge, node 5 isolated
    _check(spark, [(0, 1), (1, 2), (0, 2), (3, 4)], 6)


def test_triangles_chained_by_links(spark):
    # K3 blocks at 0-2, 10-12, 20-22 chained by link edges 2-10, 12-20
    edges = []
    for base in (0, 10, 20):
        edges += [(base, base + 1), (base + 1, base + 2), (base, base + 2)]
    edges += [(2, 10), (12, 20)]
    # compact ids for brute force
    ids = sorted({v for e in edges for v in e})
    remap = {v: i for i, v in enumerate(ids)}
    edges = [(remap[u], remap[v]) for u, v in edges]
    _check(spark, edges, len(ids))


def test_random_graphs_vs_brute(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 9
        all_pairs = list(itertools.combinations(range(n), 2))
        edges = rng.sample(all_pairs, 11)
        _check(spark, edges, n)


def test_directed_input_treated_undirected(spark):
    # direction must not matter: both orientations of a path
    _check(spark, [(1, 0), (1, 2), (3, 2)], 4)
