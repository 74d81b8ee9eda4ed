"""Betweenness centrality — Brandes over a multi-source BFS
(reference ``algo/.../betweenness/BetweennessCentrality.java:45-150``).

Reference semantics: per source s, a BFS computes depth(s,v) and the
shortest-path counts σ(s,v); the backward sweep accumulates dependencies
``δ(s,v) = Σ_{w : v→w on a shortest path} σ(s,v)/σ(s,w) · (1 + δ(s,w))``
and ``centrality(v) += δ(s,v) / divisor`` (divisor 2 for undirected
schemas, :72). Sampling (``SelectionStrategy``) runs Brandes from a node
subset — the standard approximation; pass ``sources`` for the same effect.

Spark re-expression — ALL sources advance together (the MSBFS analog):

- forward: per level one join + aggregate computes the next frontier's
  ``σ(s,w) = Σ σ(s,v)`` over (v→w) edges from the current frontier,
  first-discovery enforced with an anti-join against the visited set;
- backward: from the deepest level up, one join per level computes
  δ via the formula above (edges joined between consecutive levels only);
- final: one aggregation over all (s, v) dependency pairs.

State per level is (source, node, sigma[, delta]) — the O(V·sampled)
pair frames Brandes inherently needs; levels are parquet-round-tripped
(multi-reference loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.pregel.superstep import (
    materialize_roundtrip,
    roundtrip_mark,
    roundtrip_release,
)


def betweenness(
    graph: LinkGraph,
    sources: DataFrame | None = None,
    undirected: bool = False,
    max_depth: int | None = None,
    exact_source_limit: int | None = None,
    auto_sample_size: int | None = None,
) -> DataFrame:
    """(node_id, score). ``sources=None`` runs exact Brandes from every
    node up to ``exact_source_limit`` nodes (default
    guard_all_sources.DEFAULT_EXACT_SOURCE_LIMIT); larger graphs are
    auto-sampled with a logged cap — exact all-sources Brandes state is
    O(V·reachable) pair rows, a scale-killer the reference also guards via
    SelectionStrategy sampling. Pass a sampled frame for the standard
    approximation. ``undirected=True`` halves scores (each pair visited
    from both endpoints), matching the reference's divisor — pass it when
    the edge table is symmetrized."""
    from graph_data_science_spark.algorithms.centrality_extra import (
        DEFAULT_AUTO_SAMPLE_SIZE,
        DEFAULT_EXACT_SOURCE_LIMIT,
        guard_all_sources,
    )

    spark = graph.edges.sparkSession
    _mark = roundtrip_mark()
    edges = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    edges = materialize_roundtrip(edges, tag="bc_edges")

    sources, _sampled = guard_all_sources(
        graph,
        sources,
        "betweenness",
        exact_source_limit if exact_source_limit is not None else DEFAULT_EXACT_SOURCE_LIMIT,
        auto_sample_size if auto_sample_size is not None else DEFAULT_AUTO_SAMPLE_SIZE,
    )
    if sources is None:
        src_nodes = graph.node_ids().select(F.col("node_id").alias("source"))
    else:
        src_nodes = sources.select(F.col(sources.columns[0]).alias("source"))

    # ---- forward: levels[d] = (source, node, sigma) -----------------------
    frontier = materialize_roundtrip(
        src_nodes.select("source", F.col("source").alias("node"), F.lit(1.0).alias("sigma")),
        tag="bc_f",
    )
    visited = frontier.select("source", "node")
    levels: list[DataFrame] = [frontier]
    depth = 0
    while True:
        depth += 1
        if max_depth is not None and depth > max_depth:
            break
        nxt = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .select("source", F.col("dst").alias("node"), "sigma")
            .join(visited, ["source", "node"], "left_anti")
            .groupBy("source", "node")
            .agg(F.sum("sigma").alias("sigma"))
        )
        frontier = materialize_roundtrip(nxt, tag="bc_f")
        if frontier.limit(1).count() == 0:
            break
        levels.append(frontier)
        visited = materialize_roundtrip(
            visited.union(frontier.select("source", "node")), tag="bc_v", keep_last=2
        )

    # ---- backward: delta sweeps from the deepest level up -----------------
    # delta at the deepest level is 0; at level d:
    #   delta(s,v) = Σ over (v→w), w in level d+1:
    #                sigma(s,v)/sigma(s,w) · (1 + delta(s,w))
    deltas: list[DataFrame] = []
    below: DataFrame | None = None  # (source, node, sigma, delta) of level d+1
    for d in range(len(levels) - 1, -1, -1):
        lvl = levels[d]
        if below is None:
            cur = lvl.select("source", "node", "sigma", F.lit(0.0).alias("delta"))
        else:
            contrib = (
                edges.join(lvl.withColumnRenamed("node", "src"), "src")
                .join(
                    below.select(
                        "source",
                        F.col("node").alias("dst"),
                        F.col("sigma").alias("sig_w"),
                        F.col("delta").alias("del_w"),
                    ),
                    ["source", "dst"],
                )
                .groupBy("source", F.col("src").alias("node"))
                .agg(
                    F.sum((F.lit(1.0) + F.col("del_w")) / F.col("sig_w")).alias("ratio_sum")
                )
            )
            cur = (
                lvl.join(contrib, ["source", "node"], "left")
                .select(
                    "source",
                    "node",
                    "sigma",
                    (F.col("sigma") * F.coalesce(F.col("ratio_sum"), F.lit(0.0))).alias("delta"),
                )
            )
        cur = materialize_roundtrip(cur, tag="bc_b")
        if d > 0:  # the source itself accumulates no dependency
            deltas.append(cur.select("node", "delta"))
        below = cur

    divisor = 2.0 if undirected else 1.0
    if deltas:
        alld = deltas[0]
        for p in deltas[1:]:
            alld = alld.union(p)
        scored = alld.groupBy(F.col("node").alias("node_id")).agg(
            (F.sum("delta") / F.lit(divisor)).alias("score")
        )
        # Bake the aggregate down to V rows, then reclaim every per-level
        # (source, node) frame — exact Brandes state is O(V·sources) rows
        # per level and must not accumulate in /dev/shm for the caller''s
        # lifetime.
        scored = materialize_roundtrip(scored, tag="bc_out")
    else:
        scored = spark.createDataFrame([], "node_id long, score double")
    roundtrip_release(_mark, keep=[scored])
    return (
        graph.node_ids()
        .join(scored, "node_id", "left")
        .select("node_id", F.coalesce(F.col("score"), F.lit(0.0)).alias("score"))
    )
