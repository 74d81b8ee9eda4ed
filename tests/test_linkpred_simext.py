"""Cosine/weighted NodeSimilarity, link-prediction topology functions,
one-hot encoding, CNARW sampling — hand-computed fixtures.

References: ``CosineSimilarityComputer.java``, ``JaccardSimilarityComputer.
computeWeightedSimilarity``, ``OverlapSimilarity.computeWeightedSimilarity``,
``LinkPredictionFunc.java``, ``OneHotEncodingFunc.java``,
``CommonNeighbourAwareNextNodeStrategy.java``.
"""

import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.linkpred import link_prediction
from graph_data_science_spark.algorithms.similarity import (
    node_similarity,
    node_similarity_weighted,
)
from graph_data_science_spark.graph.build import LinkGraph, from_edge_list
from graph_data_science_spark.graph.subgraph import cnarw_sample
from graph_data_science_spark.ml.encoding import one_hot_encoding


def _wgraph(spark, triples):
    edges = spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in triples], "src long, dst long, weight double"
    )
    return LinkGraph(edges=edges, node_count=100)


def test_node_similarity_cosine_unweighted(spark):
    # N(0)={10,11}, N(1)={10,11,12}: cosine = 2/(√2·√3); jaccard = 2/3.
    g = from_edge_list(spark, [(0, 10), (0, 11), (1, 10), (1, 11), (1, 12)])
    got = {
        (r["node1"], r["node2"]): r["similarity"]
        for r in node_similarity(g, metric="cosine", top_k=5).collect()
    }
    assert got[(0, 1)] == pytest.approx(2 / (math.sqrt(2) * math.sqrt(3)))
    assert got[(1, 0)] == got[(0, 1)]


def test_node_similarity_weighted_metrics(spark):
    # A=0: {x:3, y:1}; B=1: {x:1, y:2, z:4}
    # smin = min(3,1)+min(1,2) = 2; wsumA=4, wsumB=7
    #   jaccard = 2/(4+7-2) = 2/9
    #   overlap = 2/min(4,7) = 0.5
    # sprod = 3·1 + 1·2 = 5; w2A = 9+1=10, w2B = 1+4+16=21
    #   cosine = 5/(√10·√21)
    g = _wgraph(spark, [(0, 10, 3), (0, 11, 1), (1, 10, 1), (1, 11, 2), (1, 12, 4)])
    for metric, want in [
        ("jaccard", 2 / 9),
        ("overlap", 0.5),
        ("cosine", 5 / (math.sqrt(10) * math.sqrt(21))),
    ]:
        got = {
            (r["node1"], r["node2"]): r["similarity"]
            for r in node_similarity_weighted(g, metric=metric, top_k=5).collect()
        }
        assert got[(0, 1)] == pytest.approx(want), metric


def test_node_similarity_weighted_parallel_edges_aggregate(spark):
    # Parallel edges SUM-aggregate before the metric (GDS loader default):
    # A: {x: 2+1=3}; B: {x: 3} → jaccard = 3/(3+3-3) = 1.0.
    g = _wgraph(spark, [(0, 10, 2), (0, 10, 1), (1, 10, 3)])
    got = {
        (r["node1"], r["node2"]): r["similarity"]
        for r in node_similarity_weighted(g, metric="jaccard").collect()
    }
    assert got[(0, 1)] == pytest.approx(1.0)


def test_link_prediction_both_direction(spark):
    # Undirected square + diagonal: 0-1, 1-2, 2-3, 3-0, 0-2.
    # N(0)={1,2,3} N(1)={0,2} N(2)={0,1,3} N(3)={0,2}
    # pair (1,3): common = {0,2}, deg0=3, deg2=3
    #   adamic = 2/ln3; ra = 2/3; pref = 2·2 = 4; total = 2+2-2 = 2.
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)])
    pairs = spark.createDataFrame([(1, 3), (0, 0)], "node1 long, node2 long")
    rows = {
        (r["node1"], r["node2"]): r for r in link_prediction(g, pairs, direction="both").collect()
    }
    r13 = rows[(1, 3)]
    assert r13["common_neighbors"] == 2.0
    assert r13["adamic_adar"] == pytest.approx(2 / math.log(3))
    assert r13["resource_allocation"] == pytest.approx(2 / 3)
    assert r13["preferential_attachment"] == 4.0
    assert r13["total_neighbors"] == 2.0
    # Equal pair: empty common set (reference guard), total = |N(0)| = 3.
    r00 = rows[(0, 0)]
    assert r00["common_neighbors"] == 0.0
    assert r00["adamic_adar"] == 0.0
    assert r00["preferential_attachment"] == 9.0
    assert r00["total_neighbors"] == 3.0


def test_link_prediction_outgoing_and_community(spark):
    # Directed: 0→2, 1→2, 2→0. out(0)={2}, out(1)={2}, common_out(0,1)={2},
    # deg_out(2)=1 → ra = 1/1 = 1, adamic = 1/ln(1) = inf (reference Java
    # 1/log(1) = Infinity as well).
    g = from_edge_list(spark, [(0, 2), (1, 2), (2, 0)])
    pairs = spark.createDataFrame([(0, 1)], "node1 long, node2 long")
    comm = spark.createDataFrame([(0, 7), (1, 7), (2, 9)], "node_id long, community long")
    r = link_prediction(g, pairs, direction="outgoing", community=comm).collect()[0]
    assert r["common_neighbors"] == 1.0
    assert r["resource_allocation"] == pytest.approx(1.0)
    assert math.isinf(r["adamic_adar"])
    assert r["same_community"] == 1.0


def test_one_hot_encoding_nulls(spark):
    df = spark.createDataFrame(
        [
            (0, ["a", "b", "c"], ["b"]),
            (1, ["a", "b", "c"], ["c", "a"]),
            (2, None, ["a"]),
            (3, ["a", "b"], None),
            (4, ["a"], []),
        ],
        "id long, avail array<string>, sel array<string>",
    )
    got = {
        r["id"]: r["enc"]
        for r in df.select("id", one_hot_encoding(F.col("avail"), F.col("sel")).alias("enc")).collect()
    }
    assert got[0] == [0, 1, 0]
    assert got[1] == [1, 0, 1]
    assert got[2] == []  # null available → empty list (reference :40-42)
    assert got[3] == [0, 0]  # null selected → zeros (reference :44-46)
    assert got[4] == [0]


def _two_cliques(spark):
    # Two 5-cliques bridged by one edge — CNARW should cross the bridge.
    edges = []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    edges.append((4, 5))
    return from_edge_list(spark, edges, node_count=10, orientation="undirected")


def test_cnarw_sample_deterministic_and_connected(spark):
    g = _two_cliques(spark)
    starts = spark.createDataFrame([(0,)], "node_id long")
    s1 = cnarw_sample(g, starts, sample_fraction=0.7, random_seed=7, max_rounds=40)
    s2 = cnarw_sample(g, starts, sample_fraction=0.7, random_seed=7, max_rounds=40)
    n1 = sorted(r["node_id"] for r in s1.vertices.collect())
    n2 = sorted(r["node_id"] for r in s2.vertices.collect())
    assert n1 == n2  # deterministic in the seed
    assert len(n1) >= 7  # reached the target fraction
    assert 0 in n1  # start node always sampled
    # Induced edges stay within the sample.
    nodes = set(n1)
    for r in s1.edges.select("src", "dst").collect():
        assert r["src"] in nodes and r["dst"] in nodes


def test_cnarw_prefers_low_overlap_vs_rwr(spark):
    # From inside clique A, in-clique candidates have overlap ~ 3/4 (shared
    # clique neighbors) while the bridge 4→5 has overlap 0 — acceptance is
    # 4× likelier, so the walk escapes to clique B quickly.
    g = _two_cliques(spark)
    starts = spark.createDataFrame([(0,)], "node_id long")
    s = cnarw_sample(g, starts, sample_fraction=0.9, random_seed=11, max_rounds=60)
    nodes = {r["node_id"] for r in s.vertices.collect()}
    assert any(n >= 5 for n in nodes)  # crossed into the second clique
