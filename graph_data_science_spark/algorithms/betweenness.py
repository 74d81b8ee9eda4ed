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


def betweenness_weighted(
    graph: LinkGraph,
    sources: DataFrame | None = None,
    undirected: bool = False,
    exact_source_limit: int | None = None,
    auto_sample_size: int | None = None,
) -> DataFrame:
    """Weighted Brandes betweenness — the reference's Dijkstra-based
    forward traverser (``algo/.../betweenness/WeightedForwardTraverser.java:79-116``):
    per source, distances come from non-negative-weight shortest paths,
    σ counts *weighted* shortest paths (equal-cost predecessors compared
    with exact double equality, ``:106``, parallel relationships each
    counted, ``:107-108``), and the backward sweep accumulates the same
    δ dependency as the unweighted form in decreasing-distance order.

    Spark re-expression — the priority queue has no shared-memory analog,
    so the sweep order is re-derived from join algebra:

    1. *distances*: all sources relax together in one (source, node)-keyed
       frontier (``all_shortest_paths(weighted=True)``), O(longest-path
       hops) shuffles total;
    2. *shortest-path DAG*: one edges ⨝ dist ⨝ dist join keeps (u→v)
       where ``dist(u) + w == dist(v)`` — exact equality, matching the
       reference's ``Double.compare == 0``: a predecessor's candidate cost
       was computed by the identical float ops during relaxation, so the
       bits agree;
    3. *topological levels*: longest-hop level per (source, node) via
       max-propagation rounds (level(v) = 1 + max over DAG-preds) —
       any reverse-topological order is a valid Brandes sweep order, and
       levels give one that batches into O(depth) joins;
    4. *σ forward / δ backward*: one join per level, exactly the
       unweighted code's sweep but sliced by DAG level instead of BFS
       depth (successors may sit any number of levels up, so the
       backward join runs against all finalized higher levels).

    Same all-sources guard as ``betweenness`` (exact state is
    O(V·sources) pair rows). Weights must be non-negative (reference
    ``validateRelationshipWeightPropertyIsPositive``).
    """
    from graph_data_science_spark.algorithms.centrality_extra import (
        DEFAULT_AUTO_SAMPLE_SIZE,
        DEFAULT_EXACT_SOURCE_LIMIT,
        guard_all_sources,
    )
    from graph_data_science_spark.algorithms.paths import all_shortest_paths

    spark = graph.edges.sparkSession
    _mark = roundtrip_mark()
    # Keep parallel edge rows: the reference appends a predecessor (and adds
    # to sigma) once per relationship. Self-loops never lie on a shortest path.
    edges = graph.edges.select("src", "dst", "weight").filter(F.col("src") != F.col("dst"))
    edges = materialize_roundtrip(edges, tag="bcw_edges")

    sources, _sampled = guard_all_sources(
        graph,
        sources,
        "betweenness_weighted",
        exact_source_limit if exact_source_limit is not None else DEFAULT_EXACT_SOURCE_LIMIT,
        auto_sample_size if auto_sample_size is not None else DEFAULT_AUTO_SAMPLE_SIZE,
    )
    if sources is None:
        src_frame = graph.node_ids().select("node_id")
    else:
        src_frame = sources.select(F.col(sources.columns[0]).alias("node_id"))

    # ---- 1. multi-source weighted distances --------------------------------
    asp = all_shortest_paths(
        LinkGraph(edges=edges, vertices=graph.node_ids(), node_count=graph.node_count),
        sources=src_frame,
        weighted=True,
    )
    dist = materialize_roundtrip(
        asp.distances.select(
            F.col("source_node").alias("source"),
            F.col("target_node").alias("node"),
            F.col("distance").alias("dist"),
        ),
        tag="bcw_dist",
    )

    # ---- 2. shortest-path DAG ----------------------------------------------
    dag = (
        edges.join(
            dist.select("source", F.col("node").alias("src"), F.col("dist").alias("_du")),
            "src",
        )
        .join(
            dist.select("source", F.col("node").alias("dst"), F.col("dist").alias("_dv")),
            ["source", "dst"],
        )
        .filter(F.col("_du") + F.col("weight") == F.col("_dv"))
        .select("source", F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    dag = materialize_roundtrip(dag, tag="bcw_dag")

    # ---- 3. longest-hop topological level per (source, node) ---------------
    lvl = src_frame.select(
        F.col("node_id").alias("source"), F.col("node_id").alias("node"), F.lit(0).alias("lvl")
    )
    lvl = materialize_roundtrip(lvl, tag="bcw_lvl")
    frontier = lvl
    max_rounds = graph.with_node_count() + 1
    for _ in range(max_rounds):
        cand = (
            dag.join(frontier.withColumnRenamed("node", "u"), ["source", "u"])
            .groupBy("source", F.col("v").alias("node"))
            .agg((F.max("lvl") + F.lit(1)).alias("_cand"))
        )
        merged = (
            lvl.join(cand, ["source", "node"], "full_outer")
            .select(
                "source",
                "node",
                F.greatest(F.coalesce(F.col("lvl"), F.lit(-1)), F.coalesce(F.col("_cand"), F.lit(-1))).alias("lvl"),
                (
                    F.col("lvl").isNull()
                    | (F.col("_cand").isNotNull() & (F.col("_cand") > F.col("lvl")))
                ).alias("_improved"),
            )
        )
        merged = materialize_roundtrip(merged, tag="bcw_lvl", keep_last=2)
        frontier = merged.filter(F.col("_improved")).select("source", "node", "lvl")
        lvl = merged.select("source", "node", "lvl")
        if frontier.limit(1).count() == 0:
            break
    max_lvl_row = lvl.agg(F.max("lvl").alias("m")).collect()[0]
    max_lvl = int(max_lvl_row["m"] if max_lvl_row["m"] is not None else 0)

    # ---- 4a. sigma, by increasing level ------------------------------------
    levels: list[DataFrame] = [
        materialize_roundtrip(
            src_frame.select(
                F.col("node_id").alias("source"),
                F.col("node_id").alias("node"),
                F.lit(1.0).alias("sigma"),
            ),
            tag="bcw_sig",
        )
    ]
    sig_done = levels[0]
    for d in range(1, max_lvl + 1):
        nodes_d = lvl.filter(F.col("lvl") == d).select("source", F.col("node").alias("v"))
        sig_d = (
            dag.join(nodes_d, ["source", "v"], "left_semi")
            .join(sig_done.withColumnRenamed("node", "u"), ["source", "u"])
            .groupBy("source", F.col("v").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        sig_d = materialize_roundtrip(sig_d, tag="bcw_sig")
        levels.append(sig_d)
        sig_done = materialize_roundtrip(sig_done.union(sig_d), tag="bcw_sigdone", keep_last=2)

    # ---- 4b. delta, by decreasing level -------------------------------------
    deltas: list[DataFrame] = []
    done: DataFrame | None = None  # (source, node, sigma, delta), levels > d
    for d in range(max_lvl, -1, -1):
        lvl_sig = levels[d]
        if done is None:
            cur = lvl_sig.select("source", "node", "sigma", F.lit(0.0).alias("delta"))
        else:
            dag_d = dag.join(
                lvl_sig.select("source", F.col("node").alias("u")), ["source", "u"], "left_semi"
            )
            contrib = (
                dag_d.join(
                    done.select(
                        "source",
                        F.col("node").alias("v"),
                        F.col("sigma").alias("sig_w"),
                        F.col("delta").alias("del_w"),
                    ),
                    ["source", "v"],
                )
                .groupBy("source", F.col("u").alias("node"))
                .agg(F.sum((F.lit(1.0) + F.col("del_w")) / F.col("sig_w")).alias("ratio_sum"))
            )
            cur = lvl_sig.join(contrib, ["source", "node"], "left").select(
                "source",
                "node",
                "sigma",
                (F.col("sigma") * F.coalesce(F.col("ratio_sum"), F.lit(0.0))).alias("delta"),
            )
        cur = materialize_roundtrip(cur, tag="bcw_del")
        if d > 0:
            deltas.append(cur.select("node", "delta"))
        done = cur if done is None else materialize_roundtrip(
            done.union(cur), tag="bcw_done", keep_last=2
        )

    divisor = 2.0 if undirected else 1.0
    if deltas:
        alld = deltas[0]
        for p in deltas[1:]:
            alld = alld.union(p)
        scored = alld.groupBy(F.col("node").alias("node_id")).agg(
            (F.sum("delta") / F.lit(divisor)).alias("score")
        )
        scored = materialize_roundtrip(scored, tag="bcw_out")
    else:
        scored = spark.createDataFrame([], "node_id long, score double")
    roundtrip_release(_mark, keep=[scored])
    return (
        graph.node_ids()
        .join(scored, "node_id", "left")
        .select("node_id", F.coalesce(F.col("score"), F.lit(0.0)).alias("score"))
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
