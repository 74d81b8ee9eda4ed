"""Depth-first traversal.

Reference: ``algo/src/main/java/org/neo4j/gds/paths/traverse/DFS.java:31``
— an explicitly SINGLE-THREADED stack walk (HugeLongArrayStack + BitSet):
nodes are marked visited when *pushed*, neighbors are pushed in adjacency
order (ascending mapped id in GDS's sorted CSR) and popped LIFO, so the
next node visited is the highest-id unvisited neighbor. ``maxDepth``
stops expanding below the given depth. The result is the visit order.

Spark position — two regimes:

1. **Tree-reachable graphs (distributed, no collect, no size cap)**: when
   every node reachable from ``source`` has exactly one in-edge within
   the reachable subgraph (in-degree-1 check after a frontier-join BFS),
   the DFS tree is forced — there is only one traversal — and its
   preorder is computable without any sequential walk via the
   Euler-tour/subtree-interval machinery (same as
   ``biconnectivity.py``): subtree sizes bottom-up, then
   ``tin(v) = tin(parent) + 1 + Σ size(later-id siblings)`` top-down
   (LATER ids first: LIFO pop of ascending pushes visits the
   highest-id child first). O(depth) rounds of adjacent-level joins —
   the same round structure as BFS itself.
2. **General graphs (driver kernel, guarded)**: with cycles/cross edges
   the DFS tree depends on the entire visit history (lexicographic DFS
   is P-complete) — no partition-parallel formulation exists, and the
   reference runs exactly this loop single-threaded over its in-memory
   CSR. The honest distributed analog is the same kernel on the driver
   over a collected adjacency with an explicit scale guard (same policy
   as the all-sources guards in ``betweenness.py``) — NOT a
   pretend-parallel rewrite. The collect is grouped+sorted on the
   cluster (one shuffle), one Arrow batch per node.

``mode="auto"`` (default) runs the BFS + in-degree-1 check and picks;
``"tree"`` forces regime 1 (raising if the graph is not tree-reachable);
``"driver"`` forces regime 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.pregel.superstep import (
    materialize_roundtrip,
    roundtrip_mark,
    roundtrip_release,
)

# Above this many edges the adjacency collect is refused (a driver-side
# walk over more is a misuse, not a scale path): mirror of the reference's
# single-threaded positioning. Raise explicitly to override. Only applies
# to the general-graph driver kernel — the tree path has no cap.
DFS_MAX_EDGES = 5_000_000


def dfs(
    graph: LinkGraph,
    source: int,
    max_depth: int | None = None,
    max_edges: int = DFS_MAX_EDGES,
    mode: str = "auto",
) -> DataFrame:
    """(node_id long, visit_order long) — DFS visit order from ``source``
    along edge direction, reference push/pop conventions (visited set on
    push; neighbors pushed ascending ⇒ visited descending)."""
    if mode not in ("auto", "tree", "driver"):
        raise ValueError(f"dfs: unknown mode {mode!r}")
    source = int(source)
    if mode != "driver":
        out = _dfs_tree_preorder(graph, source, max_depth)
        if out is not None:
            return out
        if mode == "tree":
            raise ValueError(
                "dfs: mode='tree' but the subgraph reachable from the source "
                "is not in-degree-1 (cycles or converging edges) — the DFS "
                "tree is history-dependent; use mode='auto'/'driver'"
            )
    return _dfs_driver(graph, source, max_depth, max_edges)


def _dfs_tree_preorder(
    graph: LinkGraph, source: int, max_depth: int | None
) -> DataFrame | None:
    """Distributed preorder when the reachable subgraph is a tree;
    None when it is not (caller falls back)."""
    spark = graph.edges.sparkSession
    n = graph.with_node_count()
    cap = int(max_depth) if max_depth is not None else n

    mark = roundtrip_mark()
    edges = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()  # the driver kernel's collect_set dedup, same semantics
    )
    edges = materialize_roundtrip(edges, tag="dfs_edges")

    # Directed BFS from the source: (node, parent, depth), min-parent
    # tie-break (irrelevant once the in-degree-1 check passes — the
    # parent is unique).
    visited = spark.createDataFrame(
        [(source, None, 0)], "node long, parent long, depth long"
    )
    visited = materialize_roundtrip(visited, tag="dfs_bfs", keep_last=2)
    frontier = visited.select("node")
    for d in range(1, cap + 1):
        nxt = (
            edges.join(frontier, edges["src"] == frontier["node"])
            .select(F.col("dst").alias("node"), F.col("src").alias("parent"))
            .groupBy("node")
            .agg(F.min("parent").alias("parent"))
            .join(
                visited.select(F.col("node").alias("_v")),
                F.col("node") == F.col("_v"),
                "left_anti",
            )
            .select("node", "parent", F.lit(d).cast("long").alias("depth"))
        )
        nxt = materialize_roundtrip(nxt, tag="dfs_bfs", keep_last=3)
        if nxt.isEmpty():
            break
        visited = materialize_roundtrip(visited.union(nxt), tag="dfs_bfs", keep_last=3)
        frontier = nxt.select("node")

    # Tree check: within the reachable set every non-source node has
    # in-degree exactly 1 and the source has 0. One aggregate action.
    reach = visited.select("node")
    inner = (
        edges.join(reach.withColumnRenamed("node", "src"), "src")
        .join(reach.withColumnRenamed("node", "dst"), "dst")
    )
    indeg = inner.groupBy("dst").agg(F.count(F.lit(1)).alias("c"))
    bad = indeg.filter((F.col("c") > 1) | (F.col("dst") == source)).limit(1).count()
    if bad > 0:
        roundtrip_release(mark)
        return None

    # max_depth truncation: a popped node at depth >= max_depth does not
    # expand (DFS.java maxDepth), so exactly the nodes with
    # depth <= max_depth are visited — already enforced by the BFS cap.
    tree = visited
    maxd = int((tree.agg(F.max("depth").alias("m")).collect()[0]["m"]) or 0)

    # Subtree sizes bottom-up (exactly _sweep_up's sum spec, inlined to
    # avoid the undirected-module import cycle staying minimal).
    done: DataFrame | None = None
    sizes: DataFrame | None = None
    for d in range(maxd, -1, -1):
        level = tree.filter(F.col("depth") == d).select(
            "node", "parent", F.lit(1).cast("long").alias("size")
        )
        if done is not None:
            child_agg = (
                done.groupBy("parent").agg(F.sum("size").alias("_cs")).withColumnRenamed("parent", "_p")
            )
            level = (
                level.join(child_agg, level["node"] == child_agg["_p"], "left")
                .select(
                    "node",
                    "parent",
                    (F.col("size") + F.coalesce(F.col("_cs"), F.lit(0))).alias("size"),
                )
            )
        level = materialize_roundtrip(level.withColumn("depth", F.lit(d).cast("long")),
                                      tag="dfs_sizes", keep_last=2)
        done = level
        sizes = level if sizes is None else sizes.union(level)
        sizes = materialize_roundtrip(sizes, tag="dfs_sizes_all", keep_last=2)

    tr = tree.join(sizes.select("node", "size"), "node")
    tr = materialize_roundtrip(tr, tag="dfs_tr")

    # Preorder top-down. Sibling offset = Σ sizes of LATER-id siblings
    # (ascending push + LIFO pop ⇒ highest id visited first).
    tin = tr.filter(F.col("depth") == 0).select("node", F.lit(0).cast("long").alias("tin"))
    tin = materialize_roundtrip(tin, tag="dfs_tin", keep_last=2)
    for d in range(1, maxd + 1):
        level = tr.filter(F.col("depth") == d)
        w = (
            Window.partitionBy("parent")
            .orderBy(F.desc("node"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        nxt = (
            level.withColumn("_off", F.coalesce(F.sum("size").over(w), F.lit(0)))
            .join(tin.select(F.col("node").alias("parent"), F.col("tin").alias("_pt")), "parent")
            .select("node", (F.col("_pt") + 1 + F.col("_off")).alias("tin"))
        )
        nxt = materialize_roundtrip(nxt, tag="dfs_tin", keep_last=3)
        tin = materialize_roundtrip(tin.union(nxt), tag="dfs_tin", keep_last=3)

    out = tin.select(F.col("node").alias("node_id"), F.col("tin").alias("visit_order"))
    out = materialize_roundtrip(out, tag="dfs_out")
    roundtrip_release(mark, keep=(out,))
    return out


def _dfs_driver(
    graph: LinkGraph, source: int, max_depth: int | None, max_edges: int
) -> DataFrame:
    m = graph.relationship_count()
    if m > max_edges:
        raise ValueError(
            f"dfs: graph has {m} edges > max_edges={max_edges}; DFS order on a "
            "non-tree graph is inherently sequential (reference DFS.java:31 is "
            "single-threaded) — pass a larger max_edges explicitly to collect "
            "anyway, or use bfs_levels/shortest_paths for a partition-parallel "
            "traversal"
        )
    adj_rows = (
        graph.edges.select("src", "dst")
        .groupBy("src")
        .agg(F.sort_array(F.collect_set("dst")).alias("nbrs"))
        .collect()
    )
    adj = {int(r["src"]): [int(x) for x in r["nbrs"]] for r in adj_rows}

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
