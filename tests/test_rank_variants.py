"""ArticleRank / Eigenvector golden-fixture tests, from the reference's own
``PageRankTest.java`` nested ArticleRank (:385-489) and Eigenvector
(:491-600) classes. Node letters map a..j = 0..9 (a..g = 0..6 for the paper
graph); SCORE_PRECISION = 1e-5 (:62)."""

import pytest

from graph_data_science_spark.algorithms.pagerank import article_rank, eigenvector
from graph_data_science_spark.graph.build import from_edge_list

# ArticleRank DB_CYPHER graph: a..j = 0..9.
AR_EDGES = [
    (1, 2), (2, 1), (3, 0), (3, 1), (4, 1), (4, 3), (4, 5), (5, 1), (5, 4),
]
AR_EXPECTED = [
    0.20720, 0.47091, 0.36067, 0.19515, 0.20720, 0.19515,
    0.15, 0.15, 0.15, 0.15,
]

# ArticleRank DB_PAPERS graph: a..g = 0..6.
AR_PAPER_EDGES = [
    (1, 0), (2, 0), (2, 1), (3, 0), (3, 1), (3, 2), (4, 0), (4, 1), (4, 2),
    (4, 3), (5, 1), (5, 4), (6, 1), (6, 4),
]
AR_PAPER_EXPECTED = [0.34627, 0.31950, 0.21092, 0.18028, 0.21375, 0.15000, 0.15000]

# Eigenvector DB_CYPHER graph: a..j = 0..9, weighted edges.
EV_EDGES = [
    (1, 2, 1.0), (2, 1, 3.0), (3, 0, 5.0), (3, 1, 5.0), (4, 1, 4.0),
    (4, 3, 4.0), (4, 5, 4.0), (5, 1, 10.0), (5, 4, 10.0),
]
EV_EXPECTED = [
    0.01262, 0.71623, 0.69740, 0.01262, 0.01262, 0.01262, 0.0, 0.0, 0.0, 0.0,
]
EV_WEIGHTED_EXPECTED = [
    0.00210, 0.70774, 0.70645, 0.00172, 0.00210, 0.00172, 0.0, 0.0, 0.0, 0.0,
]
EV_PERSONALIZED_EXPECTED = [  # source node d = 3, maxIterations 10, tol 0.1
    0.00997, 0.70735, 0.70678, 0.00056, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
]


def scores_list(result, n):
    rows = {r["node_id"]: r["score"] for r in result.scores.collect()}
    return [rows[i] for i in range(n)]


def test_article_rank_golden(spark):
    g = from_edge_list(spark, AR_EDGES, node_count=10)
    res = article_rank(g, damping=0.85, tolerance=0.0, max_iterations=40)
    got = scores_list(res, 10)
    for i, (a, e) in enumerate(zip(got, AR_EXPECTED)):
        assert a == pytest.approx(e, abs=1e-5), f"node {i}: {a} != {e}"


def test_article_rank_paper_graph_golden(spark):
    g = from_edge_list(spark, AR_PAPER_EDGES, node_count=7)
    res = article_rank(g, damping=0.85, tolerance=0.0, max_iterations=20)
    got = scores_list(res, 7)
    for i, (a, e) in enumerate(zip(got, AR_PAPER_EXPECTED)):
        assert a == pytest.approx(e, abs=1e-5), f"node {i}: {a} != {e}"


def test_eigenvector_unweighted_golden(spark):
    g = from_edge_list(spark, [(s, d) for s, d, _ in EV_EDGES], node_count=10)
    res = eigenvector(g, tolerance=0.0, max_iterations=40)
    got = scores_list(res, 10)
    for i, (a, e) in enumerate(zip(got, EV_EXPECTED)):
        assert a == pytest.approx(e, abs=1e-5), f"node {i}: {a} != {e}"


def test_eigenvector_weighted_golden(spark):
    g = from_edge_list(spark, EV_EDGES, node_count=10)
    res = eigenvector(g, tolerance=0.0, max_iterations=10, weighted=True)
    got = scores_list(res, 10)
    for i, (a, e) in enumerate(zip(got, EV_WEIGHTED_EXPECTED)):
        assert a == pytest.approx(e, abs=1e-5), f"node {i}: {a} != {e}"


def test_eigenvector_source_nodes_golden(spark):
    g = from_edge_list(spark, [(s, d) for s, d, _ in EV_EDGES], node_count=10)
    res = eigenvector(g, tolerance=0.1, max_iterations=10, source_nodes=[3])
    got = scores_list(res, 10)
    for i, (a, e) in enumerate(zip(got, EV_PERSONALIZED_EXPECTED)):
        assert a == pytest.approx(e, abs=1e-5), f"node {i}: {a} != {e}"
