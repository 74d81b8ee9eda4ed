"""Catalog procedures beyond project/list/exists/drop (graph/catalog.py):
filter, sample, export_csv, node-property stream/drop/write, relationship
stream — the analogs of the reference's proc/catalog/.../catalog/*.java
surface.
"""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.graph.build import LinkGraph  # noqa: E402
from graph_data_science_spark.graph.catalog import GraphCatalog  # noqa: E402


def _catalog(spark, tmp_path) -> GraphCatalog:
    cat = GraphCatalog(spark, str(tmp_path / "catalog"))
    edges = spark.createDataFrame(
        [(i, (i + 1) % 10, 1.0) for i in range(10)] + [(0, 5, 1.0)],
        "src long, dst long, weight double",
    )
    vertices = spark.createDataFrame(
        [(i, float(i * 10), float(i % 3)) for i in range(10)],
        "node_id long, acct double, grp double",
    )
    cat.project("g", LinkGraph(edges=edges, vertices=vertices, node_count=10))
    return cat


def test_filter_creates_named_subgraph(spark, tmp_path):
    cat = _catalog(spark, tmp_path)
    res = cat.filter("g", "g_small", node_filter="acct < 50", relationship_filter="true")
    assert res["graphName"] == "g_small" and cat.exists("g_small")
    g2 = cat.get("g_small")
    # nodes 0..4 survive; redensified ids are dense [0, n)
    assert res["nodeCount"] == 5
    ids = sorted(r[0] for r in g2.vertices.select("node_id").collect())
    assert ids == list(range(5))
    # every surviving edge has both endpoints in range
    assert g2.edges.filter((F.col("src") >= 5) | (F.col("dst") >= 5)).count() == 0


def test_sample_rwr_registers_subgraph(spark, tmp_path):
    cat = _catalog(spark, tmp_path)
    res = cat.sample("g", "g_sample", method="rwr", sampling_ratio=0.5, seed=7)
    assert cat.exists("g_sample")
    assert 0 < res["nodeCount"] <= 10
    bad = cat.get("g_sample")
    assert bad.edges.count() == res["relationshipCount"]


def test_export_csv_roundtrip(spark, tmp_path):
    from graph_data_science_spark.io_csv import import_graph_csv

    cat = _catalog(spark, tmp_path)
    out = str(tmp_path / "csv_out")
    res = cat.export_csv("g", out)
    assert res.get("relationshipCount", res.get("relationships", 11)) is not None
    g2 = import_graph_csv(spark, out)
    assert g2.edges.count() == 11


def test_node_property_stream_drop_write(spark, tmp_path):
    cat = _catalog(spark, tmp_path)
    rows = cat.stream_node_properties("g", ["acct", "grp"]).collect()
    assert len(rows) == 20
    byprop = {}
    for r in rows:
        byprop.setdefault(r["property"], []).append((r["node_id"], r["value"]))
    assert sorted(byprop) == ["acct", "grp"]
    assert dict(byprop["acct"])[3] == 30.0

    pw = cat.write_node_properties("g", ["acct"], str(tmp_path / "props"))
    assert pw["propertiesWritten"] == 10

    cat.drop_node_properties("g", ["grp"])
    assert "grp" not in cat.get("g").vertices.columns
    assert "acct" in cat.get("g").vertices.columns

    try:
        cat.stream_node_properties("g", ["grp"])
        raise AssertionError("expected KeyError for dropped property")
    except KeyError:
        pass


def test_stream_relationships(spark, tmp_path):
    cat = _catalog(spark, tmp_path)
    rel = cat.stream_relationships("g")
    assert rel.columns == ["sourceNodeId", "targetNodeId"]
    assert rel.count() == 11


def test_memory_usage(spark, tmp_path):
    cat = _catalog(spark, tmp_path)
    mu = cat.memory_usage("g")
    assert mu["nodeCount"] == 10 and mu["relationshipCount"] == 11
    assert mu["edgesParquetBytes"] > 0 and mu["verticesParquetBytes"] > 0
    assert mu["predictedStateMb"] >= 0 and mu["predictedShuffleMb"] >= 0
