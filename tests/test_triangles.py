"""Triangle Count fixture tests (FIXTURES.md F5, from the reference's
IntersectingTriangleCountTest.java)."""

from graph_data_science_spark.algorithms.triangles import local_clustering_coefficient, triangle_count
from graph_data_science_spark.graph.build import from_edge_list


def counts(res, n):
    rows = {r["node_id"]: r["triangles"] for r in res.per_node.collect()}
    return [rows.get(i, 0) for i in range(n)]


def und(spark, pairs, n, **kw):
    return from_edge_list(spark, pairs, node_count=n, orientation="undirected", **kw)


def test_path_has_no_triangles(spark):
    res = triangle_count(und(spark, [(0, 1), (1, 2)], 3))
    assert res.global_count == 0
    assert counts(res, 3) == [0, 0, 0]


def test_k5(spark):
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    res = triangle_count(und(spark, pairs, 5))
    assert res.global_count == 10
    assert counts(res, 5) == [6, 6, 6, 6, 6]


def test_two_triangles_sharing_a_node(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0)]
    res = triangle_count(und(spark, pairs, 5))
    assert res.global_count == 2
    assert counts(res, 5) == [2, 1, 1, 1, 1]


def test_self_loops_ignored(spark):
    res = triangle_count(und(spark, [(0, 0), (0, 0), (0, 0)], 1))
    assert res.global_count == 0
    assert counts(res, 1) == [0]


def test_parallel_edges_deduped(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (0, 1)]  # triangle + parallel edge
    res = triangle_count(und(spark, pairs, 3))
    assert res.global_count == 1
    res2 = triangle_count(und(spark, pairs + pairs, 3))  # fully duplicated
    assert res2.global_count == 1


def test_kite(spark):
    res = triangle_count(und(spark, [(0, 1), (1, 2), (0, 3), (1, 3)], 4))
    assert res.global_count == 1
    assert counts(res, 4) == [1, 1, 0, 1]


def test_max_degree_exclusion(spark):
    # Node 0 has degree 4 (> 3) → excluded with local count -1
    # (IntersectingTriangleCount.java:57,145-149); triangle 1-2-3 survives.
    pairs = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (1, 3)]
    res = triangle_count(und(spark, pairs, 5), max_degree=3)
    assert res.global_count == 1
    assert counts(res, 5) == [-1, 1, 1, 1, 0]


def test_ring_star(spark):
    # LargeIntersectingTriangleCountTest.java shape: ring 0..n-2 + center n-1.
    n = 12
    ring = [(i, (i + 1) % (n - 1)) for i in range(n - 1)]
    star = [(i, n - 1) for i in range(n - 1)]
    res = triangle_count(und(spark, ring + star, n))
    assert res.global_count == n - 1
    got = counts(res, n)
    assert got[n - 1] == n - 1
    assert all(c == 2 for c in got[: n - 1])


def test_lcc_triangle_with_tail(spark):
    # Triangle 0-1-2 plus tail 2-3: lcc = [1, 1, 1/3, 0].
    g = und(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], 4)
    rows = {r["node_id"]: r["lcc"] for r in local_clustering_coefficient(g).collect()}
    assert rows[0] == 1.0 and rows[1] == 1.0
    assert abs(rows[2] - 1.0 / 3.0) < 1e-12
    assert rows[3] == 0.0


def test_lcc_max_degree_excluded_is_nan(spark):
    # maxDegree-excluded nodes get NaN, not 0 (LocalClusteringCoefficient
    # .java:132-134) — excluded ≠ genuinely-zero clustering.
    import math

    g = und(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], 4)
    rows = {
        r["node_id"]: r["lcc"]
        for r in local_clustering_coefficient(g, max_degree=2).collect()
    }
    assert math.isnan(rows[2])  # degree 3 → excluded
    assert rows[3] == 0.0


def test_triangle_salted_hub_join_identical(spark, monkeypatch):
    """The hot-key salted wedge join (mega-hub adj_v attach) must produce
    identical triangles to the unsalted plan — forced on a fixture by
    dropping the hot threshold to 1 so EVERY key salts."""
    import importlib

    mod = importlib.import_module("graph_data_science_spark.algorithms.triangles")
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4), (2, 4), (0, 4), (4, 5)]
    g = from_edge_list(spark, edges, node_count=6, orientation="undirected")
    base = mod.triangle_count(g)
    base_per = {r["node_id"]: r["triangles"] for r in base.per_node.collect()}
    monkeypatch.setattr(mod, "TRIANGLE_HOT_IN_DEGREE", 1)
    salted = mod.triangle_count(g)
    assert salted.global_count == base.global_count
    assert {r["node_id"]: r["triangles"] for r in salted.per_node.collect()} == base_per
