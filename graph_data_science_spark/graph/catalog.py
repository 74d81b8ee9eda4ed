"""Named graph catalog: the GDS ``GraphStoreCatalog`` analog
(reference ``core/src/main/java/org/neo4j/gds/core/loading/GraphStoreCatalog.java:50``
— process-global map (user, database, graphName) → GraphStore with
get/set/exists/remove/list, ``:84,187,221,127``).

Here a catalog is a directory of named graphs, each a pair of parquet
tables (``edges/``, optional ``vertices/``) plus a tiny JSON manifest —
the storage maps 1:1 to two Iceberg tables + a manifest row on a cluster.
Project/list/exists/drop mirror gds.graph.project / .list / .exists / .drop
(reference ``proc/catalog/.../GraphProjectProc.java`` et al.).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import SparkSession

from graph_data_science_spark.graph.build import LinkGraph


class GraphCatalog:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def project(self, name: str, graph: LinkGraph, overwrite: bool = False) -> None:
        """gds.graph.project analog: persist the graph under a name."""
        if self.exists(name) and not overwrite:
            raise ValueError(f"graph {name!r} already exists in catalog")
        d = self._dir(name)
        graph.edges.write.mode("overwrite").parquet(os.path.join(d, "edges"))
        manifest = {
            "name": name,
            "node_count": graph.with_node_count(),
            "relationship_count": graph.relationship_count(),
            "has_vertices": graph.vertices is not None,
            "created_at": time.time(),
        }
        if graph.vertices is not None:
            graph.vertices.write.mode("overwrite").parquet(os.path.join(d, "vertices"))
        with open(os.path.join(d, "manifest.json"), "w") as fh:
            json.dump(manifest, fh)

    def get(self, name: str) -> LinkGraph:
        d = self._dir(name)
        if not self.exists(name):
            raise KeyError(f"graph {name!r} not found in catalog")
        manifest = json.load(open(os.path.join(d, "manifest.json")))
        edges = self.spark.read.parquet(os.path.join(d, "edges"))
        vertices = (
            self.spark.read.parquet(os.path.join(d, "vertices"))
            if manifest.get("has_vertices")
            else None
        )
        return LinkGraph(edges=edges, vertices=vertices, node_count=manifest["node_count"])

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._dir(name), "manifest.json"))

    def list(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.root)):
            mpath = os.path.join(self.root, name, "manifest.json")
            if os.path.exists(mpath):
                out.append(json.load(open(mpath)))
        return out

    def drop(self, name: str) -> bool:
        if not self.exists(name):
            return False
        shutil.rmtree(self._dir(name))
        return True
