"""Shortest paths / BFS as min-reducer supersteps.

Reference semantics:
- ``algo/.../paths/delta/DeltaStepping.java:52`` and
  ``paths/bellmanford/BellmanFord.java:48`` — single-source shortest
  distances over (optionally) weighted directed edges; unreachable nodes
  are absent from the result stream; Bellman-Ford additionally detects
  negative cycles.
- ``algo/.../paths/traverse/BFS.java:62`` — breadth-first traversal;
  re-expressed here as per-node hop depth (the traversal *order* of a
  shared-memory cursor walk has no stable meaning under distributed
  execution; depth is the invariant the fixtures check).

Spark execution — frontier Bellman-Ford, the scale-correct shape for both
delta-stepping and Bellman-Ford on a shuffle engine:

- the edge table is hash-partitioned by ``src`` once and cached
  (``prep_edges_sql``); every relaxation round co-locates on the cached
  side, only the (shrinking) frontier shuffles;
- a round relaxes ONLY the frontier (nodes improved last round):
  ``candidate(v) = min_{(u,v)} dist(u) + w(u,v)`` — one join + one
  min-aggregate, all whole-stage codegen (this is Pregel's
  ``Reducer.Min`` message combiner as a hash aggregate);
- new distances = outer-merge of candidates into the distance frame,
  keeping the min; the improved-count rides the commit job as an
  Observation (no extra action); converged when 0 improved.
- delta-stepping's bucket ordering is a *work-scheduling* optimization
  for shared memory — on Spark the rounds are already bulk-synchronous,
  so plain frontier relaxation does the same work per shuffle with no
  priority queue. Negative-cycle detection: more than |V| rounds without
  convergence ⇒ flagged, matching Bellman-Ford.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.pregel.spmv import prep_edges_sql
from graph_data_science_spark.pregel.superstep import SuperstepLoop, edge_lineage


@dataclass
class PathResult:
    distances: DataFrame  # (node_id long, distance double) — reachable nodes only
    ran_iterations: int
    did_converge: bool
    negative_cycle: bool
    loop: SuperstepLoop


def shortest_paths(
    graph: LinkGraph,
    source: int,
    weighted: bool = True,
    max_iterations: int | None = None,
    checkpoint_dir: str | None = None,
    num_blocks: int | None = None,
) -> PathResult:
    """Single-source shortest distances. ``weighted=False`` treats every
    edge as weight 1 (= BFS hop counts). Unreachable nodes are omitted,
    matching the reference's stream shape."""
    spark = graph.edges.sparkSession
    n = graph.with_node_count()
    if max_iterations is None:
        max_iterations = n + 1
    e = graph.edges if weighted else graph.edges.select("src", "dst", F.lit(1.0).alias("weight"))
    prepped = prep_edges_sql(
        e.select("src", "dst", F.col("weight").alias("norm_w")), num_partitions=num_blocks
    )

    loop = SuperstepLoop(spark, "sssp", checkpoint_dir, lineage=edge_lineage(graph.edges))
    dist = spark.createDataFrame([(int(source), 0.0)], "node long, dist double")
    dist = loop.commit(dist, 0, {"frontier": 1})
    frontier = dist

    converged = False
    it = 0
    for it in range(1, max_iterations + 1):
        cand = (
            prepped.join(frontier, prepped["src"] == frontier["node"], "inner")
            .groupBy("dst")
            .agg(F.min(F.col("dist") + F.col("norm_w")).alias("cand"))
        )
        merged = (
            dist.join(cand, dist["node"] == cand["dst"], "full_outer")
            .select(
                F.coalesce(F.col("node"), F.col("dst")).alias("node"),
                F.least(F.col("dist"), F.col("cand")).alias("dist"),
                (
                    F.col("dist").isNull()
                    | (F.col("cand").isNotNull() & (F.col("cand") < F.col("dist")))
                ).alias("_improved"),
            )
        )
        obs = Observation()
        merged = merged.observe(
            obs, F.sum(F.when(F.col("_improved"), 1).otherwise(0)).alias("improved")
        )
        new_dist = loop.commit(merged, it, {}, observation=obs)
        improved = int(obs.get.get("improved") or 0)
        frontier = new_dist.filter(F.col("_improved")).select("node", "dist")
        dist = new_dist.select("node", "dist")
        if improved == 0:
            converged = True
            break

    prepped.unpersist()
    negative_cycle = not converged and it >= n
    return PathResult(
        distances=dist.select(F.col("node").alias("node_id"), F.col("dist").alias("distance")),
        ran_iterations=it,
        did_converge=converged,
        negative_cycle=negative_cycle,
        loop=loop,
    )


def bfs_levels(
    graph: LinkGraph,
    source: int,
    max_depth: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node_id, level): minimum hop count from ``source`` along edge
    direction; unreachable nodes omitted (reference BFS.java:62 — depth is
    the distributed-stable invariant of the traversal)."""
    res = shortest_paths(
        graph,
        source,
        weighted=False,
        max_iterations=max_depth,
        checkpoint_dir=checkpoint_dir,
    )
    return res.distances.select("node_id", F.col("distance").cast("long").alias("level"))
