"""A* (haversine pruning == Dijkstra result), Yen's K shortest paths
(textbook fixture, reference YensTest shape), DFS visit order
(reference DFS.java push/pop conventions)."""

import math

import pytest

from graph_data_science_spark.algorithms.paths import EARTH_RADIUS_NM, astar, dijkstra
from graph_data_science_spark.algorithms.traverse import dfs
from graph_data_science_spark.algorithms.yens import yens
from graph_data_science_spark.graph.build import LinkGraph


def _graph(spark, edges, n=None):
    df = spark.createDataFrame(
        [(int(s), int(d), float(w)) for s, d, w in edges], "src long, dst long, weight double"
    )
    return LinkGraph(edges=df, node_count=n)


def _hav(lat1, lon1, lat2, lon2):
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = math.sin(dlat / 2) ** 2 + math.cos(math.radians(lat1)) * math.cos(
        math.radians(lat2)
    ) * math.sin(dlon / 2) ** 2
    return 2 * EARTH_RADIUS_NM * math.asin(math.sqrt(a))


def test_astar_equals_dijkstra_path(spark):
    # Nodes along a coastline: chain 0-1-2-3 with true haversine weights +
    # a decoy long detour 0-4-3. A* must return the chain.
    coords = {0: (0.0, 0.0), 1: (0.0, 1.0), 2: (0.0, 2.0), 3: (0.0, 3.0), 4: (5.0, 1.5)}
    def w(a, b):
        return _hav(*coords[a], *coords[b])
    edges = [(0, 1, w(0, 1)), (1, 2, w(1, 2)), (2, 3, w(2, 3)), (0, 4, w(0, 4)), (4, 3, w(4, 3))]
    g = _graph(spark, edges)
    cdf = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in coords.items()],
        "node_id long, latitude double, longitude double",
    )
    res = astar(g, source=0, target=3, coords=cdf)
    rows = res.paths.collect()
    assert len(rows) == 1
    assert list(rows[0]["node_ids"]) == [0, 1, 2, 3]
    dij = dijkstra(g, 0, targets=[3]).paths.collect()[0]
    assert list(dij["node_ids"]) == [0, 1, 2, 3]
    assert rows[0]["total_cost"] == pytest.approx(dij["total_cost"])


def test_astar_requires_single_target_for_heuristic(spark):
    g = _graph(spark, [(0, 1, 1.0)])
    h = g.edges.sparkSession.createDataFrame([(0, 0.0), (1, 0.0)], "node_id long, h double")
    with pytest.raises(ValueError):
        dijkstra(g, 0, targets=None, heuristic=h)


def test_yens_wikipedia_example(spark):
    # C=0 D=1 E=2 F=3 G=4 H=5 (Yen's classic example).
    edges = [
        (0, 1, 3.0), (0, 2, 2.0), (1, 3, 4.0), (2, 1, 1.0), (2, 3, 2.0),
        (2, 4, 3.0), (3, 4, 2.0), (3, 5, 1.0), (4, 5, 2.0),
    ]
    res = yens(_graph(spark, edges), source=0, target=5, k=3)
    rows = sorted(res.paths.collect(), key=lambda r: r["index"])
    assert res.found == 3
    assert list(rows[0]["node_ids"]) == [0, 2, 3, 5] and rows[0]["total_cost"] == 5.0
    assert list(rows[1]["node_ids"]) == [0, 2, 4, 5] and rows[1]["total_cost"] == 7.0
    assert list(rows[2]["node_ids"]) == [0, 1, 3, 5] and rows[2]["total_cost"] == 8.0
    # Cumulative costs array matches hop sums.
    assert list(rows[2]["costs"]) == [0.0, 3.0, 7.0, 8.0]


def test_yens_fewer_paths_than_k(spark):
    res = yens(_graph(spark, [(0, 1, 1.0), (1, 2, 1.0)]), source=0, target=2, k=5)
    assert res.found == 1


def test_yens_unreachable(spark):
    res = yens(_graph(spark, [(0, 1, 1.0)]), source=0, target=9, k=2)
    assert res.found == 0
    assert res.paths.count() == 0


def test_dfs_visit_order(spark):
    # Reference conventions: neighbors pushed ascending, popped LIFO ⇒
    # highest-id unvisited neighbor visited first; visited set on push.
    edges = [(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 4, 1.0)]
    rows = dfs(_graph(spark, edges), source=0).collect()
    order = [r["node_id"] for r in sorted(rows, key=lambda r: r["visit_order"])]
    assert order == [0, 2, 4, 1, 3]


def test_dfs_max_depth(spark):
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)]
    rows = dfs(_graph(spark, edges), source=0, max_depth=1).collect()
    order = [r["node_id"] for r in sorted(rows, key=lambda r: r["visit_order"])]
    assert order == [0, 1]


def test_dfs_scale_guard_driver_only(spark):
    # The collect guard applies only to the general-graph driver kernel;
    # tree-reachable graphs run the distributed preorder with no cap.
    g = _graph(spark, [(0, 1, 1.0), (1, 2, 1.0)])
    with pytest.raises(ValueError, match="max_edges"):
        dfs(g, source=0, max_edges=1, mode="driver")
    rows = dfs(g, source=0, max_edges=1).collect()  # auto → tree path, no guard
    assert len(rows) == 3
    # non-tree graph in auto mode falls back to the guarded kernel
    g2 = _graph(spark, [(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0)])
    with pytest.raises(ValueError, match="max_edges"):
        dfs(g2, source=0, max_edges=1)


def test_dfs_tree_path_is_distributed(spark, monkeypatch):
    # dfs on a tree must not touch the driver kernel (no adjacency collect).
    import graph_data_science_spark.algorithms.traverse as mod

    def boom(*a, **kw):
        raise AssertionError("driver kernel used on a tree graph")

    monkeypatch.setattr(mod, "_dfs_driver", boom)
    edges = [(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 4, 1.0), (2, 5, 1.0)]
    rows = mod.dfs(_graph(spark, edges), source=0).collect()
    order = [r["node_id"] for r in sorted(rows, key=lambda r: r["visit_order"])]
    assert order == [0, 2, 5, 4, 1, 3]


def test_dfs_tree_vs_driver_differential(spark):
    # Random trees: the distributed preorder equals the reference stack
    # kernel bit-for-bit, with and without max_depth.
    import random

    from graph_data_science_spark.algorithms.traverse import _dfs_driver

    rng = random.Random(7)
    for md in (None, 2):
        n = 24
        perm = list(range(n))
        rng.shuffle(perm)
        edges = []
        for i in range(1, n):
            edges.append((perm[rng.randint(0, i - 1)], perm[i], 1.0))
        g = _graph(spark, edges)
        a = {r["node_id"]: r["visit_order"] for r in dfs(g, perm[0], max_depth=md).collect()}
        b = {
            r["node_id"]: r["visit_order"]
            for r in _dfs_driver(g, perm[0], md, 10**9).collect()
        }
        assert a == b


def test_dfs_mode_tree_raises_on_nontree(spark):
    g = _graph(spark, [(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0)])
    with pytest.raises(ValueError, match="in-degree-1"):
        dfs(g, source=0, mode="tree")
