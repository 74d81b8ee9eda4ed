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
from pyspark.sql import functions as F

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

    def generate(
        self,
        name: str,
        node_count: int,
        average_degree: int,
        distribution: str = "uniform",
        seed: int | str = 42,
        allow_self_loops: bool = False,
        overwrite: bool = False,
    ) -> dict:
        """gds.beta.graph.generate analog (reference
        ``proc/misc/.../GraphGenerateProc.java`` →
        ``core/.../beta/generator/RandomGraphGenerator.java``): generate a
        random graph with the reference's degree/target semantics and
        project it into the catalog under ``name``."""
        from graph_data_science_spark.graph.generate import random_graph

        g = random_graph(
            self.spark,
            node_count=node_count,
            average_degree=average_degree,
            distribution=distribution,
            seed=seed,
            allow_self_loops=allow_self_loops,
        )
        self.project(name, g, overwrite=overwrite)
        m = self._manifest(name)
        return {
            "name": name,
            "nodes": m["node_count"],
            "relationships": m["relationship_count"],
            "relationshipDistribution": distribution,
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

    def project_sql(
        self,
        name: str,
        node_query: str | None,
        relationship_query: str,
        overwrite: bool = False,
    ) -> dict:
        """gds.graph.project.cypher analog (reference
        ``GraphProjectCypherProc.java``; the Snowflake ingestion contract
        `snowgraph/tpch-example.sql:100-117` is the same two-query shape):
        project a named graph from two Spark SQL queries. The node query
        must return ``node_id`` (+ any property columns, or be None to
        infer nodes from edge endpoints); the relationship query must
        return ``src, dst`` (+ optional ``weight``, default 1.0)."""
        edges = self.spark.sql(relationship_query)
        if "src" not in edges.columns or "dst" not in edges.columns:
            raise ValueError("relationship query must return src and dst columns")
        if "weight" not in edges.columns:
            edges = edges.withColumn("weight", F.lit(1.0))
        edges = edges.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("weight").cast("double"),
        )
        vertices = None
        if node_query is not None:
            vertices = self.spark.sql(node_query)
            if "node_id" not in vertices.columns:
                raise ValueError("node query must return a node_id column")
            vertices = vertices.withColumn("node_id", F.col("node_id").cast("long"))
        g = LinkGraph(edges=edges, vertices=vertices)
        self.project(name, g, overwrite=overwrite)
        return {
            "graphName": name,
            "nodeCount": g.with_node_count(),
            "relationshipCount": g.relationship_count(),
        }

    # ---- node labels (gds.graph.nodeLabel.{mutate,write}) ---------------
    def mutate_node_label(self, name: str, node_label: str, node_filter: str) -> dict:
        """gds.graph.nodeLabel.mutate analog (reference
        ``GraphNodeLabelMutateProc`` / ``NodeLabelMutator.java``): add
        ``node_label`` to every node satisfying ``node_filter`` (a Spark
        SQL boolean expression over the vertex columns — superset of the
        reference's filter language). Labels live in a ``labels``
        array<string> vertex column, the IdMap label-membership analog
        (`core-api/.../IdMap.java:109-131`)."""
        g = self.get(name)
        vertices = g.vertices if g.vertices is not None else g.node_ids()
        if "labels" not in vertices.columns:
            vertices = vertices.withColumn(
                "labels", F.array().cast("array<string>")
            )
        hit = F.expr(node_filter) & ~F.array_contains(
            F.col("labels"), F.lit(node_label)
        )
        new_vertices = vertices.withColumn(
            "labels",
            F.when(
                hit, F.concat(F.col("labels"), F.array(F.lit(node_label)))
            ).otherwise(F.col("labels")),
        )
        n = new_vertices.filter(
            F.array_contains(F.col("labels"), F.lit(node_label))
        ).count()
        # localCheckpoint: the overwrite targets the parquet the plan reads.
        new_vertices = new_vertices.localCheckpoint(eager=True)
        edges = g.edges.localCheckpoint(eager=True)
        self.project(
            name,
            LinkGraph(edges=edges, vertices=new_vertices, node_count=g.node_count),
            overwrite=True,
        )
        return {"graphName": name, "nodeLabel": node_label, "nodeCount": n}

    def write_node_label(self, name: str, node_label: str, path: str) -> dict:
        """gds.graph.nodeLabel.write analog: persist the (node_id) rows
        carrying the label (parquet ≡ Iceberg append on a cluster)."""
        g = self.get(name)
        if g.vertices is None or "labels" not in g.vertices.columns:
            raise ValueError(f"graph {name!r} has no node labels")
        out = g.vertices.filter(
            F.array_contains(F.col("labels"), F.lit(node_label))
        ).select("node_id")
        out.write.mode("overwrite").parquet(path)
        n = self.spark.read.parquet(path).count()
        return {"graphName": name, "nodeLabel": node_label, "nodeCount": n, "path": path}

    # ---- graph properties (gds.graph.graphProperty.{stream,drop}) -------
    def _manifest(self, name: str) -> dict:
        if not self.exists(name):
            raise KeyError(f"graph {name!r} not found in catalog")
        return json.load(open(os.path.join(self._dir(name), "manifest.json")))

    def _write_manifest(self, name: str, manifest: dict) -> None:
        with open(os.path.join(self._dir(name), "manifest.json"), "w") as fh:
            json.dump(manifest, fh)

    def set_graph_property(self, name: str, key: str, value) -> None:
        """Graph-level named value (reference ``GraphStore.addGraphProperty``;
        proc surface gds.graph.graphProperty.*). Scalars or small lists —
        stored in the manifest, snapshot-consistent with the graph."""
        manifest = self._manifest(name)
        manifest.setdefault("graph_properties", {})[key] = value
        self._write_manifest(name, manifest)

    def stream_graph_property(self, name: str, key: str):
        """gds.graph.graphProperty.stream analog: the value(s) as rows."""
        props = self._manifest(name).get("graph_properties", {})
        if key not in props:
            raise KeyError(f"graph property {key!r} not found on graph {name!r}")
        v = props[key]
        rows = [(x,) for x in v] if isinstance(v, list) else [(v,)]
        return self.spark.createDataFrame(rows, ["propertyValue"])

    def drop_graph_property(self, name: str, key: str) -> dict:
        """gds.graph.graphProperty.drop analog."""
        manifest = self._manifest(name)
        props = manifest.get("graph_properties", {})
        if key not in props:
            raise KeyError(f"graph property {key!r} not found on graph {name!r}")
        del props[key]
        self._write_manifest(name, manifest)
        return {"graphName": name, "graphProperty": key}

    # ---- relationship ops beyond stream ---------------------------------
    def drop_relationships(self, name: str, relationship_filter: str) -> dict:
        """gds.graph.relationships.drop analog (reference
        ``GraphDropRelationshipProc.java`` drops a relationship *type*;
        with a single typed edge table the selector is a Spark SQL boolean
        expression over (src, dst, weight, …), e.g. ``rel_type = 'TOOL'``
        when a type column exists)."""
        g = self.get(name)
        keep = g.edges.filter(~F.expr(relationship_filter))
        dropped = g.relationship_count() - keep.count()
        keep = keep.localCheckpoint(eager=True)
        vertices = (
            g.vertices.localCheckpoint(eager=True) if g.vertices is not None else None
        )
        self.project(
            name,
            LinkGraph(edges=keep, vertices=vertices, node_count=g.node_count),
            overwrite=True,
        )
        return {"graphName": name, "deletedRelationships": dropped}

    def write_relationships(self, name: str, path: str) -> dict:
        """gds.graph.relationship.write analog (reference
        ``GraphWriteRelationshipProc.java``; the Snowflake contract's
        ``gds.write_relationships`` `snowgraph/tpch-example.sql:195-200`):
        persist the edge table back to storage."""
        g = self.get(name)
        g.edges.write.mode("overwrite").parquet(path)
        n = self.spark.read.parquet(path).count()
        return {"graphName": name, "relationshipsWritten": n, "path": path}
