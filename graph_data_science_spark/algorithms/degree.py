"""Degree centrality (reference ``algo/.../degree/DegreeCentrality.java:43``).

Orientation NATURAL counts out-edges, REVERSE in-edges, UNDIRECTED both.
Weighted degree sums only strictly-positive weights
(``DegreeCentrality.java:131-136``). Nodes without matching edges score 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph, degrees


def degree_centrality(
    graph: LinkGraph,
    orientation: str = "natural",
    weighted: bool = False,
) -> DataFrame:
    """Returns (node_id long, score double) for every node in the graph."""
    deg = degrees(graph.edges, orientation=orientation, weighted=weighted)
    nodes = graph.node_ids()
    return (
        nodes.join(deg, "node_id", "left")
        .select("node_id", F.coalesce(F.col("degree"), F.lit(0.0)).cast("double").alias("score"))
    )
