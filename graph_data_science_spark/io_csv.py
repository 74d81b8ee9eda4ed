"""CSV graph store export / import.

Reference: ``io/csv/src/main/java/org/neo4j/gds/core/io/file/csv/
GraphStoreToCsvExporter.java`` (nodes_*.csv + relationships_*.csv with
header files) and ``CsvToGraphStoreImporter.java`` (the reverse).

Spark shape: ``df.write.csv`` with embedded headers — each Spark task
writes one part file in parallel, the exact distributed analog of the
reference's per-thread ``visitor`` files; schema travels in the header
(the reference writes sidecar header files because its CSV writer is
header-less — Spark's is not, so one file kind suffices). Parquet stays
the performance path (``api.ProcedureFacade.write``); CSV is the
interop/export path, matching the reference's positioning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph


def export_graph_csv(graph: LinkGraph, path: str) -> dict:
    """Write ``<path>/relationships`` (src, dst, weight) and
    ``<path>/nodes`` (node_id, …props) as headered CSV part files."""
    rel_path = os.path.join(path, "relationships")
    graph.edges.write.mode("overwrite").option("header", True).csv(rel_path)
    n_nodes = None
    if graph.vertices is not None:
        node_path = os.path.join(path, "nodes")
        graph.vertices.write.mode("overwrite").option("header", True).csv(node_path)
        n_nodes = graph.vertices.count()
    return {
        "path": path,
        "relationshipsWritten": graph.relationship_count(),
        "nodesWritten": n_nodes,
    }


def import_graph_csv(spark: SparkSession, path: str) -> LinkGraph:
    """Read a graph store previously written by :func:`export_graph_csv`."""
    rel_path = os.path.join(path, "relationships")
    edges = (
        spark.read.option("header", True).csv(rel_path)
        .select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("weight").cast("double"),
        )
    )
    node_path = os.path.join(path, "nodes")
    vertices = None
    if os.path.isdir(node_path):
        raw = spark.read.option("header", True).csv(node_path)
        vertices = raw.select(
            F.col("node_id").cast("long"),
            *[F.col(c) for c in raw.columns if c != "node_id"],
        )
    return LinkGraph(edges=edges, vertices=vertices)
