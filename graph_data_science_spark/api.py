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

import logging
import os
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
    from graph_data_science_spark.algorithms.wcc import wcc, wcc_star

    # Star contraction is the default path (r4 A/B on the bench graph:
    # 6 contraction rounds vs 17 label-prop rounds, faster wall — see
    # BASELINE.md); min-label propagation handles the options star
    # contraction can't express (seeds, hot-source salting).
    if set(cfg) <= {"threshold", "max_iterations", "checkpoint_dir"}:
        return wcc_star(graph, **cfg).components.withColumnRenamed("component", "score")
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

    res = louvain(graph, **cfg)
    out = res.communities.withColumnRenamed("community", "score")
    if res.intermediate is not None:
        # the reference's includeIntermediateCommunities stream column
        out = out.join(res.intermediate, "node_id")
    return out


def _betweenness(graph: LinkGraph, **cfg) -> DataFrame:
    # relationshipWeightProperty analog: weighted=True selects the
    # Dijkstra-semantics traverser (WeightedForwardTraverser.java).
    from graph_data_science_spark.algorithms.betweenness import (
        betweenness,
        betweenness_weighted,
    )

    if cfg.pop("weighted", False):
        cfg.pop("max_depth", None)
        return betweenness_weighted(graph, **cfg)
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

    res = leiden(graph, **cfg)
    out = res.communities.select("node_id", F.col("community").alias("score"))
    if res.intermediate is not None:
        out = out.join(res.intermediate, "node_id")
    return out


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


def _random_walk(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.walks import random_walks

    return random_walks(graph, **cfg)


def _dijkstra(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.paths import dijkstra

    return dijkstra(graph, **cfg).paths


def _delta_stepping(graph: LinkGraph, **cfg) -> DataFrame:
    # Real bucketed delta-stepping (r4; previously an alias to the generic
    # frontier relaxation — results were already identical, now the bin
    # discipline of DeltaStepping.java:52 is implemented too).
    from graph_data_science_spark.algorithms.paths import delta_stepping

    return delta_stepping(graph, **cfg).distances.select(
        "node_id", F.col("distance").alias("score")
    )


def _astar(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.paths import astar

    return astar(graph, **cfg).paths


def _yens(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.yens import yens

    return yens(graph, **cfg).paths


def _all_shortest_paths(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.paths import all_shortest_paths

    return all_shortest_paths(graph, **cfg).distances


def _dfs(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.traverse import dfs

    return dfs(graph, **cfg).select(
        "node_id", F.col("visit_order").cast("double").alias("score")
    )


def _spanning_tree(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.spanning import spanning_tree

    return spanning_tree(graph, **cfg).tree


def _k_spanning_tree(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.spanning import k_spanning_tree

    return k_spanning_tree(graph, **cfg).tree


def _steiner_tree(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.spanning import steiner_tree_approx

    return steiner_tree_approx(graph, **cfg).tree


def _prize_steiner_tree(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.spanning import prize_steiner_tree

    return prize_steiner_tree(graph, **cfg).tree


def _topological_sort(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.misc import topological_sort

    return topological_sort(graph, **cfg).order.select(
        "node_id", F.col("level").cast("double").alias("score")
    )


def _longest_path(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.dag import dag_longest_path

    return dag_longest_path(graph, **cfg).paths


def _bridges(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.biconnectivity import bridges

    return bridges(graph, **cfg)


def _articulation_points(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.biconnectivity import articulation_points

    return articulation_points(graph, **cfg)


def _celf(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.celf import celf

    return celf(graph, **cfg).seeds.select(
        "node_id", F.col("spread").alias("score")
    )


def _max_k_cut(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.maxkcut import approx_max_k_cut

    return approx_max_k_cut(graph, **cfg).assignments.select(
        "node_id", F.col("community").cast("double").alias("score")
    )


def _conductance(graph: LinkGraph, assignment: DataFrame, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.misc import conductance

    return conductance(graph, assignment, **cfg)


def _modularity(graph: LinkGraph, assignment: DataFrame, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.misc import modularity

    score = modularity(graph, assignment, **cfg)
    return graph.edges.sparkSession.createDataFrame(
        [(float(score),)], "modularity double"
    )


def _node_similarity(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.similarity import node_similarity

    return node_similarity(graph, **cfg)


def _node_similarity_weighted(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.similarity import node_similarity_weighted

    return node_similarity_weighted(graph, **cfg)


def _filtered_node_similarity(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.similarity import filtered_node_similarity

    return filtered_node_similarity(graph, **cfg)


def _vertex_frame(graph: LinkGraph) -> DataFrame:
    if graph.vertices is None:
        raise ValueError(
            "this algorithm reads node properties; project the graph with a "
            "vertices frame (gds.graph.project nodeProperties analog)"
        )
    return graph.vertices


def _knn(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.knn import knn

    return knn(_vertex_frame(graph), **cfg).neighbors


def _filtered_knn(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.knn import filtered_knn

    return filtered_knn(_vertex_frame(graph), **cfg).neighbors


def _kmeans(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.kmeans import kmeans

    return kmeans(_vertex_frame(graph), **cfg).assignments.select(
        "node_id", F.col("community").cast("double").alias("score")
    )


def _kge(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.kge import kge_predict

    return kge_predict(_vertex_frame(graph), **cfg).predictions


def _scale_properties(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.scaling import scale_properties

    return scale_properties(_vertex_frame(graph), **cfg)


def _node2vec(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.node2vec import node2vec

    return node2vec(graph, **cfg).embeddings.select(
        "node_id", F.col("embedding").alias("score")
    )


def _graphsage(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.graphsage import graphsage

    if "features" not in cfg:
        cfg["features"] = _vertex_frame(graph)
    return graphsage(graph, **cfg).embeddings.select(
        "node_id", F.col("embedding").alias("score")
    )


def _graphsage_train(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.graphsage import graphsage_train

    if "features" not in cfg:
        cfg["features"] = _vertex_frame(graph)
    return graphsage_train(graph, **cfg).embeddings.select(
        "node_id", F.col("embedding").alias("score")
    )


def _hashgnn(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.hashgnn import hashgnn

    return hashgnn(graph, **cfg).embeddings.select(
        "node_id", F.col("features").alias("score")
    )


def _to_undirected(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.graph.build import to_undirected

    return to_undirected(graph.edges, **cfg)


def _index_inverse(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.graph.build import reverse_edges

    return reverse_edges(graph.edges, **cfg)


def _collapse_path(graph: LinkGraph, path_length: int = 2, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.walks import collapse_path

    return collapse_path([graph.edges] * int(path_length), **cfg)


def _triangles(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.algorithms.triangles import triangle_listing

    return triangle_listing(graph, **cfg)


def _split_relationships(graph: LinkGraph, **cfg) -> DataFrame:
    from graph_data_science_spark.ml.splitting import split_relationships

    return split_relationships(graph, **cfg).selected


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
    "randomWalk": _random_walk,
    "dijkstra": _dijkstra,
    "singleSourceDijkstra": _dijkstra,
    "deltaStepping": _delta_stepping,
    "astar": _astar,
    "yens": _yens,
    "allShortestPaths": _all_shortest_paths,
    "dfs": _dfs,
    "spanningTree": _spanning_tree,
    "kSpanningTree": _k_spanning_tree,
    "steinerTree": _steiner_tree,
    "prizeCollectingSteinerTree": _prize_steiner_tree,
    "topologicalSort": _topological_sort,
    "longestPath": _longest_path,
    "bridges": _bridges,
    "articulationPoints": _articulation_points,
    "influenceMaximization.celf": _celf,
    "alpha.maxkcut": _max_k_cut,
    "conductance": _conductance,
    "modularity.metric": _modularity,
    "nodeSimilarity": _node_similarity,
    "nodeSimilarity.weighted": _node_similarity_weighted,
    "nodeSimilarity.filtered": _filtered_node_similarity,
    "knn": _knn,
    "knn.filtered": _filtered_knn,
    "kmeans": _kmeans,
    "ml.kge.predict": _kge,
    "scaleProperties": _scale_properties,
    "node2vec": _node2vec,
    "beta.graphSage": _graphsage,
    "beta.graphSage.train": _graphsage_train,
    "hashgnn": _hashgnn,
    "graph.relationships.toUndirected": _to_undirected,
    "graph.relationships.indexInverse": _index_inverse,
    "collapsePath": _collapse_path,
    "triangles": _triangles,
    "graph.relationships.split": _split_relationships,
}

# Reference procedure-name aliases (same callables, the spellings GDS
# users type): gds.shortestPath.{dijkstra,astar,yens} are the
# source-target procs (`proc/path-finding/.../ShortestPathDijkstraStreamProc.java`),
# gds.allShortestPaths.{dijkstra,delta} the single-source ones
# (`AllShortestPathsDijkstraStreamProc.java`, delta = delta-stepping),
# gds.closeness.harmonic the harmonic proc spelling
# (`alpha/.../HarmonicCentralityProc.java`).
ALGORITHMS.update(
    {
        "shortestPath.dijkstra": _dijkstra,
        "shortestPath.astar": _astar,
        "shortestPath.yens": _yens,
        "allShortestPaths.dijkstra": _dijkstra,
        "allShortestPaths.delta": _delta_stepping,
        "closeness.harmonic": _harmonic,
    }
)


# Community-shaped results: ``score`` is a community/component id, so the
# reference's stats mode summarizes the distribution of *community sizes*
# (HistogramUtils.communitySummary) next to a count of communities, instead
# of (not very meaningful) percentiles of the raw ids. WCC/SCC name the
# pair component{Count,Distribution} (reference WccStatsProc / SccStatsProc
# result classes); the rest use community{Count,Distribution}.
_COMPONENT_STATS_ALGOS = {"wcc", "scc"}
_COMMUNITY_STATS_ALGOS = {
    "labelPropagation",
    "louvain",
    "leiden",
    "modularityOptimization",
    "k1coloring",
    "sllpa",
    "kmeans",
}

# HdrHistogram percentile grids from the reference
# (algo-common/.../result/HistogramUtils.java:70-83 centralitySummary,
# :51-68 communitySummary). percentile_approx is the Spark-idiomatic
# analog: a mergeable sketch aggregated in one pass, map-side partials,
# nothing per-node ever reaches the driver.
# Community-shaped algorithms additionally accept the reference's two
# result-shaping options (CommunityCompanion.java:100-111, wired through
# every community stream/write config): ``min_community_size`` and
# ``consecutive_ids``, applied by the facade AFTER the algorithm exactly
# like the reference's procedure layer. SLLPA is excluded: its result is
# an overlapping-membership set, which the reference does not densify.
_COMMUNITY_POST_ALGOS = (_COMPONENT_STATS_ALGOS | _COMMUNITY_STATS_ALGOS) - {"sllpa"}

_CENTRALITY_PCTS = [50.0, 75.0, 90.0, 95.0, 99.0, 99.9]
_COMMUNITY_PCTS = [1.0, 5.0, 10.0, 25.0, 50.0, 75.0, 90.0, 95.0, 99.0, 99.9]
_PCT_ACCURACY = 10000


def _distribution(df: DataFrame, col: str, pcts: list[float]) -> dict[str, Any]:
    """min/mean/max + percentile grid of ``col`` in ONE aggregate job."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
        F.avg(col).alias("mean"),
        F.percentile_approx(col, [p / 100.0 for p in pcts], _PCT_ACCURACY).alias("pcts"),
    ).collect()[0]
    out: dict[str, Any] = {"min": row["min"], "mean": row["mean"], "max": row["max"]}
    for p, v in zip(pcts, row["pcts"] or []):
        out[f"p{p:g}".replace("99.9", "999").replace(".", "_")] = v
    out["_count"] = row["n"]
    return out


class _UserLogHandler(logging.Handler):
    """Captures WARNING+ records from the engine's loggers into every live
    dispatcher's user log, attributed to the task running at emit time —
    the ``gds.userLog`` analog (reference ``UserLogProc.java`` backed by
    per-task ``UserLogRegistry`` warnings).

    ONE module-level instance fans out to a ``WeakSet`` of dispatchers:
    dead dispatchers simply drop out of the set. (The previous design — a
    self-detaching handler per ``Procedures`` — mutated
    ``logger.handlers`` from inside ``callHandlers``'s iteration when a
    dead handler removed itself, which silently skips the next handler in
    the list: a live dispatcher could miss the very record that triggered
    the cleanup.)"""

    def __init__(self) -> None:
        super().__init__(level=logging.WARNING)
        import weakref

        self._procs: "weakref.WeakSet[Procedures]" = weakref.WeakSet()

    def register(self, procs: "Procedures") -> None:
        self._procs.add(procs)

    def emit(self, record: logging.LogRecord) -> None:  # pragma: no cover - trivial
        for procs in list(self._procs):
            procs._user_log.append(
                {
                    "taskName": procs._current_task or "(no task)",
                    "message": record.getMessage(),
                    "level": record.levelname,
                }
            )


_LOG_HANDLER: _UserLogHandler | None = None


def _ensure_log_handler() -> _UserLogHandler:
    global _LOG_HANDLER
    if _LOG_HANDLER is None:
        _LOG_HANDLER = _UserLogHandler()
        logging.getLogger("graph_data_science_spark").addHandler(_LOG_HANDLER)
    return _LOG_HANDLER


class Procedures:
    """``gds.<algo>.<mode>`` dispatcher over a :class:`GraphCatalog`."""

    def __init__(self, catalog: GraphCatalog) -> None:
        from graph_data_science_spark.graph.models import ModelCatalog

        from graph_data_science_spark.ml.pipeline_catalog import PipelineCatalog

        self.catalog = catalog
        # gds.model.{list,exists,drop} + ModelCatalog.store/load analog;
        # models persist as JSON beside the graph catalog's parquet dirs.
        self.models = ModelCatalog(root=os.path.join(catalog.root, "_models"))
        # gds.pipeline.{list,exists,drop} + the builder procs
        # (gds.beta.pipeline.<kind>.create/addNodeProperty/.../train).
        self.pipelines = PipelineCatalog()
        self._registered: dict[str, Callable[..., DataFrame]] = {}
        # gds.listProgress analog: one row per dispatched task. The
        # reference shows only still-running tasks; a synchronous
        # dispatcher would always show an empty list, so this keeps the
        # session's task history (running → finished/failed) instead.
        self._tasks: list[dict[str, Any]] = []
        # gds.userLog analog: WARNING+ records emitted by the engine's
        # own loggers while a task runs, attributed to that task.
        self._user_log: list[dict[str, Any]] = []
        _ensure_log_handler().register(self)
        self._current_task: str | None = None

    def register_pregel(
        self,
        algo: str,
        computation,
        score_column: str | None = None,
        max_iterations: int = 20,
    ) -> None:
        """Register a user :class:`~graph_data_science_spark.pregel.api.
        PregelComputation` under a procedure name — the analog of the
        reference's annotation processor (``pregel-proc-generator/.../
        PregelProcessor.java``), which turns a PregelComputation class
        into ``gds.<name>.{stream,stats,mutate,write}`` procedures. The
        ``score_column`` (default: the first schema column) is surfaced
        as ``score`` so every facade mode works unchanged."""
        if algo in ALGORITHMS:
            raise ValueError(f"{algo!r} collides with a built-in algorithm name")
        from graph_data_science_spark.pregel.api import run_pregel

        col0 = score_column or next(iter(computation.schema))

        def _proc(graph: LinkGraph, **cfg) -> DataFrame:
            cfg.setdefault("max_iterations", max_iterations)
            out = run_pregel(graph, computation, **cfg).state
            return out.withColumnRenamed(col0, "score") if col0 != "score" else out

        self._registered[algo] = _proc

    def _run(self, algo: str, graph_name: str, **config) -> tuple[DataFrame, float]:
        fn = self._registered.get(algo) or ALGORITHMS.get(algo)
        if fn is None:
            raise KeyError(
                f"unknown algorithm {algo!r}; known: "
                f"{sorted([*ALGORITHMS, *self._registered])}"
            )
        post_cfg: dict[str, Any] = {}
        if algo in _COMMUNITY_POST_ALGOS:
            for key in ("min_community_size", "consecutive_ids"):
                if key in config:
                    post_cfg[key] = config.pop(key)
        graph = self.catalog.get(graph_name)
        task = {"taskName": f"{algo} :: {graph_name}", "status": "running",
                "config": dict(config)}
        self._tasks.append(task)
        self._current_task = task["taskName"]
        t0 = time.monotonic()
        try:
            result = fn(graph, **config)
            if post_cfg:
                from graph_data_science_spark.algorithms.community_post import (
                    community_postprocess,
                )

                result = community_postprocess(
                    result, community_col="score", **post_cfg
                )
        except Exception:
            task["status"] = "failed"
            task["seconds"] = time.monotonic() - t0
            raise
        finally:
            self._current_task = None
        task["status"] = "finished"
        task["seconds"] = time.monotonic() - t0
        return result, task["seconds"]

    def stream(self, algo: str, graph_name: str, **config) -> DataFrame:
        """Per-node results as a DataFrame (gds.<algo>.stream)."""
        result, _ = self._run(algo, graph_name, **config)
        return result

    def stats(self, algo: str, graph_name: str, **config) -> dict[str, Any]:
        """Summary statistics without materializing per-node rows to the
        caller (gds.<algo>.stats). Algorithms whose result shape is not a
        numeric per-node ``score`` (path streams, tree edges, similarity
        pairs, embeddings) get row-count-only stats — the reference's
        per-shape stats (e.g. similarityDistribution) aggregate the same
        stream."""
        result, wall = self._run(algo, graph_name, **config)
        score_type = dict(result.dtypes).get("score")
        if score_type in ("double", "float", "int", "bigint", "smallint", "tinyint"):
            if algo in _COMPONENT_STATS_ALGOS or algo in _COMMUNITY_STATS_ALGOS:
                # Distribution of community SIZES (reference
                # HistogramUtils.communitySummary over a size histogram),
                # two jobs total: sizes agg + sketch agg.
                sizes = result.groupBy("score").agg(F.count(F.lit(1)).alias("size"))
                dist = _distribution(sizes, "size", _COMMUNITY_PCTS)
                kind = "component" if algo in _COMPONENT_STATS_ALGOS else "community"
                n_groups = dist.pop("_count")
                return {
                    "nodeCount": result.count(),
                    f"{kind}Count": n_groups,
                    f"{kind}Distribution": dist,
                    "computeSeconds": wall,
                }
            dist = _distribution(result, "score", _CENTRALITY_PCTS)
            node_count = dist.pop("_count")
            return {
                "nodeCount": node_count,
                "min": dist["min"],
                "max": dist["max"],
                "mean": dist["mean"],
                "centralityDistribution": dist,
                "computeSeconds": wall,
            }
        return {"rowCount": result.count(), "computeSeconds": wall}

    def mutate(self, algo: str, graph_name: str, mutate_property: str, **config) -> dict[str, Any]:
        """Attach the result as a vertex property of the catalog graph
        (gds.<algo>.mutate): later reads of the graph see the property."""
        result, wall = self._run(algo, graph_name, **config)
        if "node_id" not in result.columns or "score" not in result.columns:
            raise ValueError(
                f"{algo!r} does not produce per-node (node_id, score) rows; "
                "mutate mode applies only to node-property results — use "
                "stream or write for path/pair/edge-shaped outputs"
            )
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

    # -- operability procs (gds.list / listProgress / userLog / memory.*) --
    def list_procedures(self, like: str | None = None) -> list[dict[str, str]]:
        """gds.list analog (reference ``ListProc.java``): every callable
        surface this dispatcher exposes — algorithm × mode, catalog ops,
        model/pipeline catalog ops — with a one-line description."""
        rows = []
        for name, fn in sorted({**ALGORITHMS, **self._registered}.items()):
            desc = (fn.__doc__ or "").strip().splitlines()
            desc = desc[0] if desc else f"{name} algorithm"
            for mode in ("stream", "stats", "mutate", "write"):
                rows.append({"name": f"gds.{name}.{mode}", "description": desc})
                rows.append(
                    {
                        "name": f"gds.{name}.{mode}.estimate",
                        "description": f"memory estimate for {name} (Procedures.estimate)",
                    }
                )
        for holder, prefix in (
            (self.catalog, "gds.graph"),
            (self.models, "gds.model"),
            (self.pipelines, "gds.pipeline"),
        ):
            for attr in sorted(dir(holder)):
                if attr.startswith("_"):
                    continue
                m = getattr(holder, attr)
                if not callable(m):
                    continue
                desc = (m.__doc__ or "").strip().splitlines()
                rows.append(
                    {"name": f"{prefix}.{attr}", "description": desc[0] if desc else ""}
                )
        # Operability procs on this dispatcher itself (reference ListProc,
        # ListProgressProc, UserLogProc, memory list/summary).
        for name, method in (
            ("gds.list", self.list_procedures),
            ("gds.listProgress", self.list_progress),
            ("gds.userLog", self.user_log),
            ("gds.memory.list", self.memory_list),
            ("gds.memory.summary", self.memory_summary),
        ):
            desc = (method.__doc__ or "").strip().splitlines()
            rows.append({"name": name, "description": desc[0] if desc else ""})
        # Pipeline *builder* surface, reference-spelled per pipeline kind
        # (`gds.beta.pipeline.linkPrediction.addLogisticRegression` et al.
        # — proc/pipeline-catalog/.../LinkPredictionPipelineAddStepProcs.java);
        # each maps to the same-named snake_case TrainingPipeline method.
        from graph_data_science_spark.ml.pipeline_catalog import (
            LinkPredictionPipeline,
            NodeClassificationPipeline,
            NodeRegressionPipeline,
        )

        def _camel(attr: str) -> str:
            head, *rest = attr.split("_")
            return head + "".join(w.capitalize() for w in rest)

        for kind, cls in (
            ("linkPrediction", LinkPredictionPipeline),
            ("nodeClassification", NodeClassificationPipeline),
            ("nodeRegression", NodeRegressionPipeline),
        ):
            rows.append(
                {
                    "name": f"gds.pipeline.{kind}.create",
                    "description": f"create a named {kind} training pipeline",
                }
            )
            rows.append(
                {
                    "name": f"gds.pipeline.{kind}.predict",
                    "description": (
                        "apply the trained pipeline model: result.model.predict(df) / "
                        "result.predictions (train returns the result object)"
                    ),
                }
            )
            for attr in sorted(dir(cls)):
                if attr.startswith("_") or attr == "to_map":
                    continue
                m = getattr(cls, attr)
                if not callable(m):
                    continue
                desc = (m.__doc__ or "").strip().splitlines()
                rows.append(
                    {
                        "name": f"gds.pipeline.{kind}.{_camel(attr)}",
                        "description": desc[0] if desc else "",
                    }
                )
        if like:
            rows = [r for r in rows if like.lower() in r["name"].lower()]
        return rows

    def list_progress(self) -> list[dict[str, Any]]:
        """gds.listProgress analog: this session's dispatched tasks with
        status running/finished/failed and wall seconds. (The reference
        lists only still-running tasks; a synchronous dispatcher keeps the
        session history instead — documented deviation.)"""
        return [dict(t) for t in self._tasks]

    def user_log(self) -> list[dict[str, Any]]:
        """gds.userLog analog: WARNING+ messages the engine emitted,
        attributed to the task that was running."""
        return [dict(r) for r in self._user_log]

    def memory_list(self) -> list[dict[str, Any]]:
        """gds.memory.list analog: per-graph footprint + pre-run memory
        prediction for every catalogued graph."""
        return [self.catalog.memory_usage(m["name"]) for m in self.catalog.list()]

    def memory_summary(self) -> dict[str, Any]:
        """gds.memory.summary analog: catalog-wide totals."""
        rows = self.memory_list()
        return {
            "graphCount": len(rows),
            "totalNodeCount": sum(r["nodeCount"] for r in rows),
            "totalRelationshipCount": sum(r["relationshipCount"] for r in rows),
            "totalParquetBytes": sum(
                r["edgesParquetBytes"] + r["verticesParquetBytes"] for r in rows
            ),
            "totalPredictedStateMb": round(sum(r["predictedStateMb"] for r in rows), 2),
            "totalPredictedShuffleMb": round(
                sum(r["predictedShuffleMb"] for r in rows), 2
            ),
            "modelCount": self.models.model_count(),
        }

    def estimate_datapipe(self, op: str, row_count: int, **config) -> dict[str, Any]:
        """Estimate mode for the corpus-scale datapipe operators (dedup,
        ANN, packing) — same output shape as ``estimate()``, driven by
        corpus row count instead of |V|/|E| (``datapipe/estimate.py``)."""
        from graph_data_science_spark.datapipe.estimate import estimate_datapipe

        return estimate_datapipe(op, row_count, **config)

    def write(self, algo: str, graph_name: str, path: str, **config) -> dict[str, Any]:
        """Persist per-node results to the backing store (gds.<algo>.write;
        parquet here ≡ an Iceberg append on a cluster)."""
        result, wall = self._run(algo, graph_name, **config)
        result.write.mode("overwrite").parquet(path)
        n = result.sparkSession.read.parquet(path).count()
        return {"nodePropertiesWritten": n, "path": path, "computeSeconds": wall}

    # Per-algorithm state/message row widths for estimate() — the analog of
    # the reference's per-algo MemoryEstimateDefinition classes
    # (``algo/.../pagerank/PageRankMemoryEstimateDefinition.java`` et al.):
    # bytes per vertex-state row and per shuffled message row. Embedding
    # algorithms scale with the embedding dimension (handled in estimate());
    # unlisted algorithms use the SuperstepLoop.predict defaults (32, 24).
    _ESTIMATE_ROW_BYTES: dict[str, tuple[int, int]] = {
        "pageRank": (24, 16),  # (node_id, score, delta) / (node_id, msg)
        "articleRank": (24, 16),
        "eigenvector": (24, 16),
        "wcc": (16, 16),  # (node_id, component) / min-label messages
        "labelPropagation": (24, 24),
        "scc": (24, 16),
        "k1coloring": (16, 16),
        "kcore": (16, 16),
        "sllpa": (40, 24),  # memberships array amortized
        "triangleCount": (16, 24),
        "louvain": (32, 24),
        "leiden": (32, 24),
        "bfs": (16, 16),
        "bellmanFord": (24, 24),  # (node_id, dist, parent)
        "dijkstra": (24, 24),
        "deltaStepping": (24, 24),
        "betweenness": (40, 32),  # per-(source, node) pair rows — see note
        "closeness": (40, 32),
        "harmonic": (40, 32),
    }
    _EMBEDDING_ALGOS = {"fastRP", "node2vec", "beta.graphSage", "hashgnn"}
    _PAIR_FRONTIER_ALGOS = {"betweenness", "closeness", "harmonic"}

    def estimate(self, algo: str, graph_name: str, **config) -> dict[str, Any]:
        """``gds.<algo>.<mode>.estimate`` analog (reference
        ``MemoryEstimateResult.java`` over the per-algo
        ``MemoryEstimateDefinition``s): predict memory from the catalog
        manifest's |V| and |E| WITHOUT scanning data or running anything.
        Returns bytesMin/bytesMax + the superstep-loop prediction fields;
        where GDS's guard aborts (it cannot spill), a shuffle engine
        spills, so the result carries ``predictedSpill`` instead."""
        if self._registered.get(algo) is None and ALGORITHMS.get(algo) is None:
            raise KeyError(f"unknown algorithm {algo!r}")
        m = self.catalog.memory_usage(graph_name)
        v, e = int(m["nodeCount"]), int(m["relationshipCount"])
        state_b, msg_b = self._ESTIMATE_ROW_BYTES.get(algo, (32, 24))
        if algo in self._EMBEDDING_ALGOS:
            dim = int(
                config.get("embedding_dim")
                or config.get("dimensions")
                or config.get("embedding_dimension", 64)
            )
            state_b = 8 + 8 * dim  # node_id + dense double vector
            msg_b = state_b  # neighbor aggregation ships vectors
        sources = config.get("sources")
        n_sources = (
            len(sources)
            if sources is not None and not isinstance(sources, DataFrame)
            else config.get("sample_size") or v
        )
        if algo in self._PAIR_FRONTIER_ALGOS:
            # state is per-(source, node) pair rows at the frontier; the
            # upper bound scales with the source count (exact all-sources
            # defaults are guarded by exact_source_limit for this reason).
            state_b = state_b * max(1, int(n_sources))
        state_mb = round(v * state_b / 1e6, 2)
        shuffle_mb = round(e * msg_b / 1e6, 2)
        bytes_min = int(v * state_b)
        bytes_max = int(v * state_b + e * msg_b)
        out = {
            "algorithm": algo,
            "graphName": graph_name,
            "nodeCount": v,
            "relationshipCount": e,
            "bytesMin": bytes_min,
            "bytesMax": bytes_max,
            "requiredMemory": f"[{bytes_min // 1_000_000} MB ... {bytes_max // 1_000_000} MB]",
            "predictedStateMb": state_mb,
            "predictedShuffleMb": shuffle_mb,
        }
        if algo in self._PAIR_FRONTIER_ALGOS:
            out["sources"] = int(n_sources)
            out["note"] = (
                "pair-frontier algorithm: state scales with sources x "
                "reachable; exact all-sources runs are guarded by "
                "exact_source_limit"
            )
        return out
