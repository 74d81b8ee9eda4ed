"""Procedure-mode facade: stream / stats / mutate / write.

GDS exposes every algorithm through four procedure modes
(reference ``applications/.../AlgorithmProcessingTemplate.java:33-57``;
``proc/.../PageRankStreamProc.java`` et al.):

- **stream**: per-node results as rows;
- **stats**: summary statistics only (no per-node materialization);
- **mutate**: write the result as a node property back into the
  *in-catalog* graph (visible to later algorithms in the session);
- **write**: persist results to the backing store.

The Spark analog: stream returns the result DataFrame; stats aggregates
it; mutate re-projects the catalog graph with the result joined into its
vertex table; write saves parquet (≡ an Iceberg table append on a
cluster). Algorithms are looked up by name so the facade stays a thin
dispatcher — the algorithm modules remain the single source of semantics.
"""

from __future__ import annotations

import time
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.graph.catalog import GraphCatalog


def _pagerank(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.pagerank import pagerank

    return pagerank(graph, **cfg).scores


def _article_rank(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.pagerank import article_rank

    return article_rank(graph, **cfg).scores


def _eigenvector(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.pagerank import eigenvector

    return eigenvector(graph, **cfg).scores


def _wcc(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.wcc import wcc

    return wcc(graph, **cfg).components.withColumnRenamed("component", "score")


def _labelprop(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.labelprop import label_propagation

    return label_propagation(graph, **cfg).labels.withColumnRenamed("label", "score")


def _degree(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.degree import degree_centrality

    return degree_centrality(graph, **cfg)


def _triangle_count(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.triangles import triangle_count

    return triangle_count(graph, **cfg).per_node.withColumnRenamed("triangles", "score")


def _louvain(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.louvain import louvain

    return louvain(graph, **cfg).communities.withColumnRenamed("community", "score")


def _betweenness(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.betweenness import betweenness

    return betweenness(graph, **cfg)


def _closeness(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.centrality_extra import closeness

    return closeness(graph, **cfg)


def _harmonic(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.centrality_extra import harmonic_centrality

    return harmonic_centrality(graph, **cfg)


def _hits(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.hits import hits

    # two result columns; 'score' = authority for the generic modes
    return hits(graph, **cfg).scores.select(
        "node_id", F.col("auth").alias("score"), "hub"
    )




def _leiden(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.louvain import leiden

    return leiden(graph, **cfg).communities.select(
        "node_id", F.col("community").alias("score")
    )


def _modularity_optimization(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.louvain import modularity_optimization

    return modularity_optimization(graph, **cfg).communities.select(
        "node_id", F.col("community").alias("score")
    )


def _scc(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.scc import scc

    return scc(graph, **cfg).components.select("node_id", F.col("component").alias("score"))


def _k1coloring(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.coloring import k1coloring

    return k1coloring(graph, **cfg).colors.select("node_id", F.col("color").alias("score"))


def _kcore(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.misc import k_core

    return k_core(graph, **cfg).cores.select("node_id", F.col("core").alias("score"))


def _sllpa(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.sllpa import speaker_listener_lpa

    # overlapping memberships: score = primary community, plus the full set
    res = speaker_listener_lpa(graph, **cfg).communities
    return res.select(
        "node_id", F.col("community_ids")[0].alias("score"), "community_ids"
    )


def _lcc(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.triangles import local_clustering_coefficient

    out = local_clustering_coefficient(graph, **cfg)
    # second column is the coefficient, whatever its alias
    return out.select("node_id", F.col(out.columns[1]).alias("score"))


def _fastrp(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.fastrp import fastrp

    return fastrp(graph, **cfg).embeddings.select(
        "node_id", F.col("embedding").alias("score")
    )


def _bfs(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.paths import bfs_levels

    return bfs_levels(graph, **cfg).select("node_id", F.col("level").cast("double").alias("score"))


def _sssp(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.paths import shortest_paths

    return shortest_paths(graph, **cfg).distances.select(
        "node_id", F.col("distance").alias("score")
    )


def _indirect_exposure(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.exposure import indirect_exposure

    # `sanctioned`: list/iterable of seed node ids (procedure-config form)
    seeds = cfg.pop("sanctioned")
    if not isinstance(seeds, DataFrame):
        seeds = graph.edges.sparkSession.createDataFrame(
            [(int(v),) for v in seeds], "node_id long"
        )
    return indirect_exposure(graph, seeds, **cfg).select(
        "node_id", F.col("exposure").alias("score")
    )


def _random_walk_counts(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.walks import random_walk_visit_counts

    return random_walk_visit_counts(graph, **cfg).select(
        "node_id", F.col("visits").cast("double").alias("score")
    )


ALGORITHMS: dict[str, Callable[..., DataFrame]] = {
    "pageRank": _pagerank,
    "articleRank": _article_rank,
    "eigenvector": _eigenvector,
    "wcc": _wcc,
    "labelPropagation": _labelprop,
    "degree": _degree,
    "triangleCount": _triangle_count,
    "louvain": _louvain,
    "betweenness": _betweenness,
    "closeness": _closeness,
    "harmonic": _harmonic,
    "hits": _hits,
    "leiden": _leiden,
    "modularityOptimization": _modularity_optimization,
    "scc": _scc,
    "k1coloring": _k1coloring,
    "kcore": _kcore,
    "sllpa": _sllpa,
    "localClusteringCoefficient": _lcc,
    "fastRP": _fastrp,
    "bfs": _bfs,
    "bellmanFord": _sssp,
    "indirectExposure": _indirect_exposure,
    "randomWalk.stats": _random_walk_counts,
}


class Procedures:
    """``gds.<algo>.<mode>`` dispatcher over a :class:`GraphCatalog`."""

    def __init__(self, catalog: GraphCatalog) -> None:
        self.catalog = catalog

    def _run(self, algo: str, graph_name: str, **config) -> tuple[DataFrame, float]:
        if algo not in ALGORITHMS:
            raise KeyError(f"unknown algorithm {algo!r}; known: {sorted(ALGORITHMS)}")
        graph = self.catalog.get(graph_name)
        t0 = time.monotonic()
        result = ALGORITHMS[algo](graph, **config)
        return result, time.monotonic() - t0

    def stream(self, algo: str, graph_name: str, **config) -> DataFrame:
        """Per-node results as a DataFrame (gds.<algo>.stream)."""
        result, _ = self._run(algo, graph_name, **config)
        return result

    def stats(self, algo: str, graph_name: str, **config) -> dict[str, Any]:
        """Summary statistics without materializing per-node rows to the
        caller (gds.<algo>.stats)."""
        result, wall = self._run(algo, graph_name, **config)
        row = result.agg(
            F.count("*").alias("nodeCount"),
            F.min("score").alias("min"),
            F.max("score").alias("max"),
            F.avg("score").alias("mean"),
            F.countDistinct("score").alias("distinct"),
        ).collect()[0]
        return {
            "nodeCount": row["nodeCount"],
            "min": row["min"],
            "max": row["max"],
            "mean": row["mean"],
            "distinctValues": row["distinct"],
            "computeSeconds": wall,
        }

    def mutate(self, algo: str, graph_name: str, mutate_property: str, **config) -> dict[str, Any]:
        """Attach the result as a vertex property of the catalog graph
        (gds.<algo>.mutate): later reads of the graph see the property."""
        result, wall = self._run(algo, graph_name, **config)
        graph = self.catalog.get(graph_name)
        vertices = graph.vertices if graph.vertices is not None else graph.node_ids()
        # localCheckpoint every frame that will outlive the re-project: the
        # overwrite targets the same parquet files their lazy plans read.
        prop = result.select("node_id", F.col("score").alias(mutate_property)).localCheckpoint(
            eager=True
        )
        new_vertices = vertices.join(prop, "node_id", "left").localCheckpoint(eager=True)
        edges = graph.edges.localCheckpoint(eager=True)
        mutated = LinkGraph(edges=edges, vertices=new_vertices, node_count=graph.node_count)
        self.catalog.project(graph_name, mutated, overwrite=True)
        return {"nodePropertiesWritten": prop.count(), "mutateProperty": mutate_property,
                "computeSeconds": wall}

    def write(self, algo: str, graph_name: str, path: str, **config) -> dict[str, Any]:
        """Persist per-node results to the backing store (gds.<algo>.write;
        parquet here ≡ an Iceberg append on a cluster)."""
        result, wall = self._run(algo, graph_name, **config)
        result.write.mode("overwrite").parquet(path)
        n = result.sparkSession.read.parquet(path).count()
        return {"nodePropertiesWritten": n, "path": path, "computeSeconds": wall}
