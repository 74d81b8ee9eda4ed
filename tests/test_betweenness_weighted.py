"""Weighted betweenness vs a pure-Python Brandes-Dijkstra model.

The model mirrors the reference's WeightedForwardTraverser exactly:
lazy-deletion Dijkstra, predecessor lists appended once per relationship
(parallel edges each count), equal-cost compared with exact float
equality, backward sweep in decreasing-distance order
(``algo/.../betweenness/WeightedForwardTraverser.java:79-116``,
``BetweennessCentrality.java:45-150``).
"""

from __future__ import annotations

import heapq
import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.betweenness import (
    betweenness,
    betweenness_weighted,
)
from graph_data_science_spark.graph.build import LinkGraph


def brandes_weighted_model(nodes, edge_rows, undirected=False):
    adj = defaultdict(list)
    for u, v, w in edge_rows:
        if u == v:
            continue
        adj[u].append((v, float(w)))
        if undirected:
            adj[v].append((u, float(w)))
    bc = {n: 0.0 for n in nodes}
    for s in nodes:
        settled = []
        dist: dict = {}
        seen = {s: 0.0}
        sigma = defaultdict(float)
        sigma[s] = 1.0
        preds = defaultdict(list)
        heap = [(0.0, s)]
        while heap:
            d, v = heapq.heappop(heap)
            if v in dist:
                continue
            dist[v] = d
            settled.append(v)
            for w_, wt in adj[v]:
                if w_ in dist:
                    continue
                nd = d + wt
                if w_ not in seen or nd < seen[w_]:
                    seen[w_] = nd
                    heapq.heappush(heap, (nd, w_))
                    sigma[w_] = sigma[v]
                    preds[w_] = [v]
                elif nd == seen[w_]:
                    sigma[w_] += sigma[v]
                    preds[w_].append(v)
        delta = defaultdict(float)
        for w_ in reversed(settled):
            for v in preds[w_]:
                delta[v] += sigma[v] / sigma[w_] * (1.0 + delta[w_])
            if w_ != s:
                bc[w_] += delta[w_]
    if undirected:
        bc = {n: x / 2.0 for n, x in bc.items()}
    return bc


def _graph(spark, nodes, edge_rows):
    edges = spark.createDataFrame(
        [(int(u), int(v), float(w)) for u, v, w in edge_rows],
        "src long, dst long, weight double",
    )
    vertices = spark.createDataFrame([(int(n),) for n in nodes], "node_id long")
    return LinkGraph(edges=edges, vertices=vertices, node_count=max(nodes) + 1)


def _assert_matches(got_df, expected, tol=1e-9):
    got = {r["node_id"]: r["score"] for r in got_df.collect()}
    assert set(got) == set(expected)
    for n in expected:
        assert got[n] == pytest.approx(expected[n], abs=tol), n


def test_weighted_matches_model_random_digraph(spark):
    rng = random.Random(7)
    nodes = list(range(12))
    edge_rows = []
    for _ in range(34):
        u, v = rng.sample(nodes, 2)
        edge_rows.append((u, v, rng.randint(1, 5)))
    g = _graph(spark, nodes, edge_rows)
    _assert_matches(betweenness_weighted(g), brandes_weighted_model(nodes, edge_rows))


def test_equal_cost_paths_split_sigma(spark):
    # Two equal-cost s→t routes through a and b: each carries δ = 1/2 from
    # the (s, t) pair; c sits on the unique continuation and gets the pair.
    nodes = [0, 1, 2, 3, 4]
    edge_rows = [(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0), (3, 4, 2.0)]
    g = _graph(spark, nodes, edge_rows)
    expected = brandes_weighted_model(nodes, edge_rows)
    assert expected[1] == pytest.approx(1.0)  # 0→3 half + 0→4 half
    assert expected[3] == pytest.approx(3.0)  # on all of 0→4, 1→4, 2→4
    _assert_matches(betweenness_weighted(g), expected)


def test_parallel_relationships_each_count(spark):
    # Reference appends a predecessor per relationship: the doubled (0,1)
    # edge makes two shortest 0→1 paths, splitting dependency with the
    # 0→2→1 alternative 2:1.
    nodes = [0, 1, 2, 3]
    edge_rows = [(0, 1, 2.0), (0, 1, 2.0), (0, 2, 1.0), (2, 1, 1.0), (1, 3, 1.0)]
    g = _graph(spark, nodes, edge_rows)
    expected = brandes_weighted_model(nodes, edge_rows)
    assert expected[2] == pytest.approx(1.0 / 3.0 + 1.0 / 3.0)  # σ-share of 0→1 and 0→3
    _assert_matches(betweenness_weighted(g), expected)


def test_unit_weights_equal_unweighted(spark):
    rng = random.Random(11)
    nodes = list(range(10))
    edge_rows = list({(u, v) for u, v in (tuple(rng.sample(nodes, 2)) for _ in range(30))})
    g = _graph(spark, nodes, [(u, v, 1.0) for u, v in edge_rows])
    unweighted = {r["node_id"]: r["score"] for r in betweenness(g).collect()}
    weighted = {r["node_id"]: r["score"] for r in betweenness_weighted(g).collect()}
    for n in nodes:
        assert weighted[n] == pytest.approx(unweighted[n], abs=1e-9), n


def test_undirected_divisor(spark):
    nodes = [0, 1, 2, 3]
    base = [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (0, 3, 5.0)]
    sym = base + [(v, u, w) for u, v, w in base]
    g = _graph(spark, nodes, sym)
    expected = brandes_weighted_model(nodes, base, undirected=True)
    _assert_matches(betweenness_weighted(g, undirected=True), expected)
