"""CSV export/import round-trip (reference io/csv GraphStoreToCsvExporter)."""

import tempfile

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.io_csv import export_graph_csv, import_graph_csv


def test_csv_round_trip(spark):
    edges = spark.createDataFrame(
        [(0, 1, 2.5), (1, 2, 1.0)], "src long, dst long, weight double"
    )
    verts = spark.createDataFrame([(0,), (1,), (2,)], "node_id long")
    g = LinkGraph(edges=edges, vertices=verts)
    with tempfile.TemporaryDirectory() as d:
        stats = export_graph_csv(g, d)
        assert stats["relationshipsWritten"] == 2
        assert stats["nodesWritten"] == 3
        g2 = import_graph_csv(spark, d)
        assert sorted(map(tuple, g2.edges.collect())) == [(0, 1, 2.5), (1, 2, 1.0)]
        assert sorted(r["node_id"] for r in g2.vertices.collect()) == [0, 1, 2]


def test_csv_export_edges_only(spark):
    edges = spark.createDataFrame([(5, 6, 1.0)], "src long, dst long, weight double")
    g = LinkGraph(edges=edges)
    with tempfile.TemporaryDirectory() as d:
        stats = export_graph_csv(g, d)
        assert stats["nodesWritten"] is None
        g2 = import_graph_csv(spark, d)
        assert g2.vertices is None
        assert g2.edges.count() == 1
