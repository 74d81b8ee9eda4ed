"""Procedure-name parity guard against the reference's public surface.

The name list below is the de-duplicated family list of every
``@Procedure("gds.…")`` registration in the reference's ``proc/`` and
``alpha/`` trees (Neo4j GDS 2.13 OpenGDS — e.g.
``proc/path-finding/src/main/java/org/neo4j/gds/paths/dijkstra/ShortestPathDijkstraStreamProc.java``,
``proc/catalog/src/main/java/org/neo4j/gds/catalog/GraphListProc.java``),
with the ``stream/stats/mutate/write/train/estimate`` mode suffixes
collapsed. Families that are Neo4j-process internals with no analytics
semantics (``gds.features.*`` adjacency-compression toggles,
``gds.test.*``, ``gds.debug.sysInfo``, ``gds.internal.*``,
``gds.license.state``) are excluded by design — documented in SURVEY §2.

Comparison is by normalized name (tier prefixes ``beta``/``alpha``
dropped, separators removed, case-folded) so spelling tiers and
snake_case/camelCase differences don't mask real coverage gaps. Families
whose analog uses a genuinely different name carry an explicit mapping in
ANALOGS and the test asserts the analog name exists instead.
"""

from __future__ import annotations

import re

import pytest

from graph_data_science_spark.api import Procedures
from graph_data_science_spark.graph.catalog import GraphCatalog

# Reference families that must appear (normalized) in list_procedures().
REQUIRED = [
    "gds.allShortestPaths",
    "gds.allShortestPaths.delta",
    "gds.allShortestPaths.dijkstra",
    "gds.alpha.closeness.harmonic",
    "gds.alpha.hits",
    "gds.alpha.knn.filtered",
    "gds.alpha.nodeSimilarity.filtered",
    "gds.alpha.sllpa",
    "gds.alpha.triangles",
    "gds.bellmanFord",
    "gds.beta.collapsePath",
    "gds.beta.graph.export.csv",
    "gds.beta.graphSage",
    "gds.beta.k1coloring",
    "gds.beta.leiden",
    "gds.beta.model.drop",
    "gds.beta.model.exists",
    "gds.beta.model.list",
    "gds.beta.modularityOptimization",
    "gds.beta.pipeline.drop",
    "gds.beta.pipeline.exists",
    "gds.beta.pipeline.list",
    "gds.beta.pipeline.linkPrediction.addFeature",
    "gds.beta.pipeline.linkPrediction.addLogisticRegression",
    "gds.beta.pipeline.linkPrediction.addNodeProperty",
    "gds.beta.pipeline.linkPrediction.addRandomForest",
    "gds.beta.pipeline.linkPrediction.configureSplit",
    "gds.beta.pipeline.linkPrediction.create",
    "gds.beta.pipeline.linkPrediction.predict",
    "gds.beta.pipeline.linkPrediction.train",
    "gds.alpha.pipeline.linkPrediction.addMLP",
    "gds.alpha.pipeline.linkPrediction.addRandomForest",
    "gds.alpha.pipeline.linkPrediction.configureAutoTuning",
    "gds.beta.pipeline.nodeClassification.addLogisticRegression",
    "gds.beta.pipeline.nodeClassification.addNodeProperty",
    "gds.beta.pipeline.nodeClassification.addRandomForest",
    "gds.beta.pipeline.nodeClassification.configureSplit",
    "gds.beta.pipeline.nodeClassification.create",
    "gds.beta.pipeline.nodeClassification.predict",
    "gds.beta.pipeline.nodeClassification.selectFeatures",
    "gds.beta.pipeline.nodeClassification.train",
    "gds.alpha.pipeline.nodeClassification.addMLP",
    "gds.alpha.pipeline.nodeClassification.configureAutoTuning",
    "gds.alpha.pipeline.nodeRegression.addLinearRegression",
    "gds.alpha.pipeline.nodeRegression.addNodeProperty",
    "gds.alpha.pipeline.nodeRegression.addRandomForest",
    "gds.alpha.pipeline.nodeRegression.configureAutoTuning",
    "gds.alpha.pipeline.nodeRegression.configureSplit",
    "gds.alpha.pipeline.nodeRegression.create",
    "gds.alpha.pipeline.nodeRegression.predict",
    "gds.alpha.pipeline.nodeRegression.selectFeatures",
    "gds.bfs",
    "gds.closeness.harmonic",
    "gds.collapsePath",
    "gds.dfs",
    "gds.graph.drop",
    "gds.graph.exists",
    "gds.graph.filter",
    "gds.graph.list",
    "gds.graph.project",
    "gds.hits",
    "gds.influenceMaximization.celf",
    "gds.k1coloring",
    "gds.knn",
    "gds.knn.filtered",
    "gds.leiden",
    "gds.list",
    "gds.listProgress",
    "gds.localClusteringCoefficient",
    "gds.memory.list",
    "gds.memory.summary",
    "gds.ml.kge.predict",
    "gds.model.drop",
    "gds.model.exists",
    "gds.model.list",
    "gds.modularityOptimization",
    "gds.nodeSimilarity",
    "gds.nodeSimilarity.filtered",
    "gds.pipeline.drop",
    "gds.pipeline.exists",
    "gds.pipeline.list",
    "gds.randomWalk",
    "gds.scaleProperties",
    "gds.shortestPath.astar",
    "gds.shortestPath.dijkstra",
    "gds.shortestPath.yens",
    "gds.sllpa",
    "gds.triangleCount",
    "gds.triangles",
    "gds.userLog",
]

# Renamed analogs: reference family → the name our surface uses (each is a
# deliberate, documented rename; the test asserts the analog exists).
ANALOGS = {
    # property/relationship plumbing: singular proc variants ride the
    # plural catalog methods
    "gds.graph.streamNodeProperties": "gds.graph.stream_node_properties",
    "gds.graph.streamNodeProperty": "gds.graph.stream_node_properties",
    "gds.graph.nodeProperties": "gds.graph.stream_node_properties",
    "gds.graph.nodeProperty": "gds.graph.stream_node_properties",
    "gds.graph.writeNodeProperties": "gds.graph.write_node_properties",
    "gds.graph.removeNodeProperties": "gds.graph.drop_node_properties",
    "gds.graph.nodeProperties.drop": "gds.graph.drop_node_properties",
    "gds.graph.streamRelationshipProperties": "gds.graph.stream_relationships",
    "gds.graph.streamRelationshipProperty": "gds.graph.stream_relationships",
    "gds.graph.relationshipProperties": "gds.graph.stream_relationships",
    "gds.graph.relationshipProperty": "gds.graph.stream_relationships",
    "gds.graph.relationships": "gds.graph.stream_relationships",
    "gds.graph.relationship": "gds.graph.stream_relationships",
    "gds.graph.writeRelationship": "gds.graph.write_relationships",
    "gds.graph.relationships.drop": "gds.graph.drop_relationships",
    "gds.graph.deleteRelationships": "gds.graph.drop_relationships",
    "gds.graph.graphProperty": "gds.graph.stream_graph_property",
    "gds.graph.graphProperty.drop": "gds.graph.drop_graph_property",
    "gds.alpha.graph.graphProperty.drop": "gds.graph.drop_graph_property",
    "gds.graph.nodeLabel": "gds.graph.mutate_node_label",
    "gds.alpha.graph.nodeLabel": "gds.graph.write_node_label",
    # sampling: one `sample` proc with a kind switch (rwr | cnarw)
    "gds.graph.sample.rwr": "gds.graph.sample",
    "gds.graph.sample.cnarw": "gds.graph.sample",
    "gds.alpha.graph.sample.rwr": "gds.graph.sample",
    # projection / export / generation
    "gds.graph.project.cypher": "gds.graph.project_sql",
    "gds.beta.graph.project.subgraph": "gds.graph.filter",
    "gds.graph.export": "gds.graph.export_csv",
    "gds.graph.generate": "gds.graph.generate",
    "gds.beta.graph.generate": "gds.graph.generate",
    # split + path spellings
    "gds.alpha.ml.splitRelationships": "gds.graph.relationships.split",
    "gds.alpha.allShortestPaths": "gds.allShortestPaths",
    "gds.beta.graph.relationships": "gds.graph.stream_relationships",
}


def _norm(name: str) -> str:
    name = re.sub(r"^gds\.", "", name)
    name = re.sub(r"^(beta|alpha)\.", "", name)
    return re.sub(r"[._]", "", name).lower()


@pytest.fixture(scope="module")
def proc_names(spark):
    p = Procedures(GraphCatalog(spark, "/tmp/spark_graft_parity_cat"))
    return {r["name"] for r in p.list_procedures()}


def test_reference_families_covered(proc_names):
    normed = {_norm(n) for n in proc_names}
    # algorithm rows carry mode suffixes; cover family X if any row starts
    # with the normalized family
    missing = [
        fam
        for fam in REQUIRED
        if not any(n.startswith(_norm(fam)) for n in normed)
    ]
    assert not missing, f"reference procedure families missing: {missing}"


def test_renamed_analogs_exist(proc_names):
    normed = {_norm(n) for n in proc_names}
    missing = {
        ref: ours
        for ref, ours in ANALOGS.items()
        if not any(n.startswith(_norm(ours)) for n in normed)
    }
    assert not missing, f"analog names missing from the surface: {missing}"


def test_reference_spelled_aliases_run(spark):
    """The new reference-spelled path aliases dispatch to the same
    callables (gds.shortestPath.dijkstra ≡ dijkstra, etc.)."""
    from graph_data_science_spark.api import ALGORITHMS

    assert ALGORITHMS["shortestPath.dijkstra"] is ALGORITHMS["dijkstra"]
    assert ALGORITHMS["shortestPath.astar"] is ALGORITHMS["astar"]
    assert ALGORITHMS["shortestPath.yens"] is ALGORITHMS["yens"]
    assert ALGORITHMS["allShortestPaths.delta"] is ALGORITHMS["deltaStepping"]
    assert ALGORITHMS["allShortestPaths.dijkstra"] is ALGORITHMS["singleSourceDijkstra"]
    assert ALGORITHMS["closeness.harmonic"] is ALGORITHMS["harmonic"]


def test_graph_generate_projects_into_catalog(spark, tmp_path):
    cat = GraphCatalog(spark, str(tmp_path / "cat"))
    res = cat.generate("gen_g", node_count=50, average_degree=3, seed=7)
    assert res["nodes"] == 50 and res["relationships"] == 150
    g = cat.get("gen_g")
    assert g.edges.count() == 150
    # deterministic: same seed regenerates the identical edge set
    cat.generate("gen_g2", node_count=50, average_degree=3, seed=7)
    a = {(r["src"], r["dst"]) for r in cat.get("gen_g").edges.collect()}
    b = {(r["src"], r["dst"]) for r in cat.get("gen_g2").edges.collect()}
    assert a == b


def test_estimate_mode(spark, tmp_path):
    """gds.<algo>.<mode>.estimate analog: manifest-driven prediction, no
    data scan, embedding-dim and pair-frontier scaling."""
    from graph_data_science_spark.graph.build import LinkGraph
    from pyspark.sql import functions as F

    cat = GraphCatalog(spark, str(tmp_path / "cat"))
    edges = spark.range(100).select(
        F.col("id").alias("src"),
        ((F.col("id") + 1) % 100).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    cat.project("g", LinkGraph(edges=edges, node_count=100))
    p = Procedures(cat)

    est = p.estimate("pageRank", "g")
    assert est["nodeCount"] == 100 and est["relationshipCount"] == 100
    assert est["bytesMin"] == 100 * 24 and est["bytesMax"] == 100 * 24 + 100 * 16
    assert "MB" in est["requiredMemory"]

    # embedding algos scale with the dimension
    small = p.estimate("fastRP", "g", embedding_dim=8)
    big = p.estimate("fastRP", "g", embedding_dim=256)
    assert big["bytesMax"] > small["bytesMax"]

    # pair-frontier algos scale with the source count and carry the note
    few = p.estimate("betweenness", "g", sources=[1, 2, 3])
    allsrc = p.estimate("betweenness", "g")
    assert few["sources"] == 3 and allsrc["sources"] == 100
    assert allsrc["bytesMax"] > few["bytesMax"]
    assert "exact_source_limit" in allsrc["note"]

    with pytest.raises(KeyError):
        p.estimate("noSuchAlgo", "g")

    # the listing exposes the estimate mode rows
    names = {r["name"] for r in p.list_procedures(like="pageRank")}
    assert "gds.pageRank.stream.estimate" in names


def test_configure_auto_tuning_caps_candidates():
    from graph_data_science_spark.ml.pipeline_catalog import NodeClassificationPipeline

    p = NodeClassificationPipeline("t")
    for lr in (0.1, 0.5, 1.0):
        p.add_logistic_regression(learning_rate=lr)
    p.configure_auto_tuning(max_trials=2)
    # r4 reference-faithful RandomSearch semantics: CONCRETE configs all
    # trial (maxTrials caps only random-search trials over ranged
    # configs — RandomSearch.java totalNumberOfTrials = maxTrials +
    # |concrete|), so all three concrete configs survive...
    assert [c["learning_rate"] for c in p._candidates()] == [0.1, 0.5, 1.0]
    # ...and maxTrials binds once a tunable config exists.
    p.add_logistic_regression(learning_rate={"range": [0.01, 1.0]})
    assert len(p._candidates()) == 3 + 2
    with pytest.raises(ValueError):
        p.configure_auto_tuning(max_trials=0)
