"""Yen's K shortest loopless paths.

Reference: ``algo/src/main/java/org/neo4j/gds/paths/yens/Yens.java:40`` —
k shortest loopless source→target paths; path 1 is Dijkstra's, each next
path is the best spur candidate over the previous path's prefixes with
(a) the next-edges of already-found paths sharing the root prefix and
(b) the root's interior nodes removed from the graph.

Spark execution: the outer structure (k rounds × spur indices) IS the
algorithm — the reference parallelizes spur tasks across threads; here
each spur's Dijkstra is itself a distributed frontier search, and the
per-spur graph filters are tiny literal predicates (≤ k·|path| edge pairs
and |path| nodes) that Catalyst folds into the cached edge scan. Paths
live on the driver (they are the k-row result, bounded and small); the
graph never does. Candidate ordering matches the reference's priority
queue: (totalCost, then node-id sequence lexicographically — our
deterministic stand-in for its insertion order).

Like the reference's non-multigraph mode (``trackRelationships=false``),
parallel edges collapse to their minimum weight.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.paths import dijkstra
from graph_data_science_spark.graph.build import LinkGraph


@dataclass
class YensResult:
    # (index, source_node, target_node, total_cost, node_ids, costs) — one
    # row per found path, index 0 = shortest; < k rows when the graph has
    # fewer loopless paths.
    paths: DataFrame
    found: int


def _first_path(res) -> tuple | None:
    rows = res.paths.collect()
    if not rows:
        return None
    r = rows[0]
    return (tuple(r["node_ids"]), tuple(r["costs"]), float(r["total_cost"]))


def yens(
    graph: LinkGraph,
    source: int,
    target: int,
    k: int,
    weighted: bool = True,
    max_iterations: int | None = None,
) -> YensResult:
    spark = graph.edges.sparkSession
    source, target = int(source), int(target)

    first = _first_path(dijkstra(graph, source, targets=[target], weighted=weighted,
                                 max_iterations=max_iterations))
    out_schema = (
        "index long, source_node long, target_node long, total_cost double, "
        "node_ids array<long>, costs array<double>"
    )
    if first is None:
        return YensResult(paths=spark.createDataFrame([], out_schema), found=0)

    a_paths: list[tuple] = [first]  # (node_ids, costs, total)
    candidates: dict[tuple, tuple] = {}  # node_ids -> (total, costs)

    for _ in range(1, k):
        prev_nodes, prev_costs, _prev_total = a_paths[-1]
        for spur_idx in range(len(prev_nodes) - 1):
            root = prev_nodes[: spur_idx + 1]
            spur_node = int(root[-1])
            root_cost = float(prev_costs[spur_idx])
            # Remove the next edge of every found path sharing this root.
            removed = {
                (int(p[0][spur_idx]), int(p[0][spur_idx + 1]))
                for p in a_paths
                if len(p[0]) > spur_idx + 1 and p[0][: spur_idx + 1] == root
            }
            interior = [int(x) for x in root[:-1]]
            e = graph.edges
            if interior:
                e = e.filter(~F.col("src").isin(interior) & ~F.col("dst").isin(interior))
            if removed:
                pair = F.struct(F.col("src"), F.col("dst"))
                banned = F.array(
                    *[
                        F.struct(F.lit(s).cast("long").alias("src"), F.lit(d).cast("long").alias("dst"))
                        for s, d in removed
                    ]
                )
                e = e.filter(~F.array_contains(banned, pair))
            spur = _first_path(
                dijkstra(
                    LinkGraph(edges=e, node_count=graph.node_count),
                    spur_node,
                    targets=[target],
                    weighted=weighted,
                    max_iterations=max_iterations,
                )
            )
            if spur is None:
                continue
            s_nodes, s_costs, s_total = spur
            cand_nodes = root[:-1] + s_nodes
            if cand_nodes in candidates or any(p[0] == cand_nodes for p in a_paths):
                continue
            cand_costs = tuple(prev_costs[:spur_idx]) + tuple(root_cost + c for c in s_costs)
            candidates[cand_nodes] = (root_cost + s_total, cand_costs)
        if not candidates:
            break
        best_nodes = min(candidates, key=lambda nid: (candidates[nid][0], nid))
        total, costs = candidates.pop(best_nodes)
        a_paths.append((best_nodes, costs, total))

    rows = [
        (i, source, target, p[2], list(p[0]), list(p[1]))
        for i, p in enumerate(a_paths)
    ]
    return YensResult(paths=spark.createDataFrame(rows, out_schema), found=len(rows))
