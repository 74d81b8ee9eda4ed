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
