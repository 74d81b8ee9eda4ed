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

    # ---- catalog procedures beyond project/list/exists/drop -------------
    # Each mirrors a reference proc in proc/catalog/.../catalog/ and
    # composes existing engine pieces; the catalog stays a thin naming
    # layer over parquet/Iceberg tables.

    def filter(
        self,
        from_name: str,
        to_name: str,
        node_filter: str = "true",
        relationship_filter: str = "true",
        overwrite: bool = False,
    ) -> dict:
        """gds.graph.filter analog (reference ``GraphFilterProc.java``;
        expression language ``subgraph-filtering/.../Expression.java`` —
        here the filter strings are Spark SQL boolean expressions, a
        strict superset of the reference's AST)."""
        from graph_data_science_spark.graph.subgraph import subgraph_filter

        g = subgraph_filter(
            self.get(from_name),
            node_filter=node_filter,
            relationship_filter=relationship_filter,
            redensify=True,
        )
        self.project(to_name, g, overwrite=overwrite)
        return {
            "fromGraphName": from_name,
            "graphName": to_name,
            "nodeCount": g.with_node_count(),
            "relationshipCount": g.relationship_count(),
        }

    def sample(
        self,
        from_name: str,
        to_name: str,
        method: str = "rwr",
        sampling_ratio: float = 0.15,
        seed: int = 42,
        overwrite: bool = False,
        **kwargs,
    ) -> dict:
        """gds.graph.sample.{rwr,cnarw} analog (reference
        ``GraphSampleProc.java``; samplers ``graph-sampling/.../rwr/
        RandomWalkWithRestarts.java``, ``cnarw/CommonNeighbourAware
        RandomWalk.java``)."""
        from pyspark.sql import functions as F

        from graph_data_science_spark.graph.subgraph import cnarw_sample, rwr_sample

        sampler = {"rwr": rwr_sample, "cnarw": cnarw_sample}.get(method)
        if sampler is None:
            raise ValueError(f"unknown sampling method {method!r}; use 'rwr' or 'cnarw'")
        src = self.get(from_name)
        start_nodes = kwargs.pop("start_nodes", None)
        if start_nodes is None:
            # Reference default: a uniformly-drawn start node; deterministic
            # here (min id) so catalog samples are reproducible.
            start_nodes = src.node_ids().agg(F.min("node_id").alias("node_id"))
        g = sampler(
            src,
            start_nodes,
            sample_fraction=sampling_ratio,
            random_seed=seed,
            **kwargs,
        )
        self.project(to_name, g, overwrite=overwrite)
        return {
            "fromGraphName": from_name,
            "graphName": to_name,
            "nodeCount": g.with_node_count(),
            "relationshipCount": g.relationship_count(),
        }

    def export_csv(self, name: str, path: str) -> dict:
        """gds.graph.export.csv analog (reference
        ``GraphStoreExportProc.java`` → ``io/csv/.../GraphStoreToCsv
        Exporter.java``): write the named graph in the header+data CSV
        layout ``io_csv.py`` round-trips."""
        from graph_data_science_spark.io_csv import export_graph_csv

        return export_graph_csv(self.get(name), path)

    def stream_node_properties(self, name: str, properties: list[str]):
        """gds.graph.nodeProperties.stream analog (reference
        ``GraphStreamNodePropertiesProc.java``): long-format
        (node_id, property, value) rows for the requested vertex columns."""
        from pyspark.sql import functions as F

        g = self.get(name)
        if g.vertices is None:
            raise ValueError(f"graph {name!r} has no node properties")
        missing = [p for p in properties if p not in g.vertices.columns]
        if missing:
            raise KeyError(f"node properties not found: {missing}")
        stack = ", ".join(f"'{p}', CAST(`{p}` AS DOUBLE)" for p in properties)
        return g.vertices.select(
            "node_id",
            F.expr(f"stack({len(properties)}, {stack}) AS (property, value)"),
        ).select("node_id", "property", "value")

    def drop_node_properties(self, name: str, properties: list[str]) -> dict:
        """gds.graph.nodeProperties.drop analog (reference
        ``GraphDropNodePropertiesProc.java``): re-project the graph
        without the named vertex columns."""
        g = self.get(name)
        if g.vertices is None:
            raise ValueError(f"graph {name!r} has no node properties")
        missing = [p for p in properties if p not in g.vertices.columns]
        if missing:
            raise KeyError(f"node properties not found: {missing}")
        kept = [c for c in g.vertices.columns if c not in properties]
        # localCheckpoint: the overwrite below targets the same parquet
        # files the lazy vertex plan reads.
        vertices = g.vertices.select(*kept).localCheckpoint(eager=True)
        edges = g.edges.localCheckpoint(eager=True)
        self.project(
            name,
            LinkGraph(edges=edges, vertices=vertices, node_count=g.node_count),
            overwrite=True,
        )
        return {"graphName": name, "propertiesRemoved": len(properties)}

    def write_node_properties(self, name: str, properties: list[str], path: str) -> dict:
        """gds.graph.nodeProperties.write analog (reference
        ``GraphWriteNodePropertiesProc.java``): persist the requested
        vertex columns (parquet here ≡ an Iceberg append on a cluster)."""
        g = self.get(name)
        if g.vertices is None:
            raise ValueError(f"graph {name!r} has no node properties")
        out = g.vertices.select("node_id", *properties)
        out.write.mode("overwrite").parquet(path)
        n = self.spark.read.parquet(path).count()
        return {"graphName": name, "propertiesWritten": n * len(properties), "path": path}

    def stream_relationships(self, name: str):
        """gds.graph.relationships.stream analog (reference
        ``GraphStreamRelationshipsProc.java``)."""
        from pyspark.sql import functions as F

        return self.get(name).edges.select(
            F.col("src").alias("sourceNodeId"),
            F.col("dst").alias("targetNodeId"),
        )

    def memory_usage(self, name: str) -> dict:
        """gds.graph.memoryUsage analog (reference
        ``GraphMemoryUsageProc.java``): on-disk footprint of the named
        graph's parquet tables plus the superstep-loop memory prediction
        (``SuperstepLoop.predict`` row-width model) for |V| and |E| —
        the numbers a capacity plan needs before running an algorithm."""
        if not self.exists(name):
            raise KeyError(f"graph {name!r} not found in catalog")
        manifest = json.load(open(os.path.join(self._dir(name), "manifest.json")))

        def _du(sub: str) -> int:
            p = os.path.join(self._dir(name), sub)
            if not os.path.isdir(p):
                return 0
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, files in os.walk(p)
                for f in files
            )

        v, e = manifest["node_count"], manifest["relationship_count"]
        return {
            "graphName": name,
            "nodeCount": v,
            "relationshipCount": e,
            "edgesParquetBytes": _du("edges"),
            "verticesParquetBytes": _du("vertices"),
            # SuperstepLoop.predict row-width model (32 B/state row,
            # 24 B/message row): the pre-run upper bound every iterative
            # algorithm logs into its metrics rows.
            "predictedStateMb": round(v * 32 / 1e6, 2),
            "predictedShuffleMb": round(e * 24 / 1e6, 2),
        }
