"""Depth-first traversal.

Reference: ``algo/src/main/java/org/neo4j/gds/paths/traverse/DFS.java:31``
— an explicitly SINGLE-THREADED stack walk (HugeLongArrayStack + BitSet):
nodes are marked visited when *pushed*, neighbors are pushed in adjacency
order (ascending mapped id in GDS's sorted CSR) and popped LIFO, so the
next node visited is the highest-id unvisited neighbor. ``maxDepth``
stops expanding below the given depth. The result is the visit order.

Spark position: DFS order is inherently sequential — each visit depends
on the entire traversal before it, so there is no partition-parallel
formulation (unlike BFS *depth*, which is a fixpoint — see
``paths.bfs_levels``). The reference runs exactly this loop on one
thread over the in-memory CSR; the honest distributed analog is the same
kernel on the driver over a collected adjacency, with an explicit scale
guard (same policy as the all-sources guards in ``betweenness.py``) —
NOT a pretend-parallel rewrite. The collect is grouped+sorted on the
cluster (one shuffle) and ships one Arrow batch per node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph

# Above this many edges the adjacency collect is refused (a driver-side
# walk over more is a misuse, not a scale path): mirror of the reference's
# single-threaded positioning. Raise explicitly to override.
DFS_MAX_EDGES = 5_000_000


def dfs(
    graph: LinkGraph,
    source: int,
    max_depth: int | None = None,
    max_edges: int = DFS_MAX_EDGES,
) -> DataFrame:
    """(node_id long, visit_order long) — DFS visit order from ``source``
    along edge direction, reference push/pop conventions (visited set on
    push; neighbors pushed ascending ⇒ visited descending)."""
    m = graph.relationship_count()
    if m > max_edges:
        raise ValueError(
            f"dfs: graph has {m} edges > max_edges={max_edges}; DFS order is "
            "inherently sequential (reference DFS.java:31 is single-threaded) "
            "— pass a larger max_edges explicitly to collect anyway, or use "
            "bfs_levels/shortest_paths for a partition-parallel traversal"
        )
    adj_rows = (
        graph.edges.select("src", "dst")
        .groupBy("src")
        .agg(F.sort_array(F.collect_set("dst")).alias("nbrs"))
        .collect()
    )
    adj = {int(r["src"]): [int(x) for x in r["nbrs"]] for r in adj_rows}

    source = int(source)
    visited = {source}
    stack = [(source, 0)]  # (node, depth)
    order: list[tuple[int, int]] = []
    while stack:
        node, depth = stack.pop()
        order.append((node, len(order)))
        if max_depth is not None and depth >= max_depth:
            continue
        for t in adj.get(node, ()):  # ascending push = descending visit
            if t not in visited:
                visited.add(t)
                stack.append((t, depth + 1))

    spark = graph.edges.sparkSession
    return spark.createDataFrame(order, "node_id long, visit_order long")
