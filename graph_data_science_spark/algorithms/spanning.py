"""Spanning tree family: minimum/maximum spanning tree, k-spanning tree,
Steiner tree approximation.

Reference semantics:
- ``algo/src/main/java/org/neo4j/gds/spanningtree/Prim.java:43`` —
  sequential Prim from ``startNodeId`` over the undirected graph; result
  ``SpanningTree.java:32`` is (head, nodeCount, effectiveNodeCount,
  parent[], costToParent[], totalWeight); ``minMax`` flips min/max.
  Only the start node's connected component is spanned; nodes outside it
  keep parent −1.
- ``algo/.../kspanningtree/KSpanningTree.java:18`` — prunes/grows the MST
  to a k-NODE subtree (grow-and-crop-worst-leaf heuristic).
- ``algo/.../steiner/ShortestPathsSteinerAlgorithm`` — heuristic Steiner
  tree connecting ``terminals`` to ``sourceId`` via shortest paths.

Spark execution — Borůvka, not Prim. Prim's priority queue is a
shared-memory work-*ordering* structure with no distributed analog;
Borůvka is the classic partition-parallel MST: every component picks its
lightest outgoing edge simultaneously (one join + one struct-min
aggregate, all whole-stage codegen), components merge (component count at
least halves per round ⇒ O(log V) rounds), chosen edges accumulate into
the forest. With a deterministic total order on edges — struct
``(weight, canon_src, canon_dst)`` — the lightest-edge choice is a pure
function, so the only cycles in the parent map are mutual pairs, broken
to the min-id root; pointer doubling then collapses chains (the same
path-halving shape as ``wcc.py``). For distinct weights Borůvka and Prim
return the *identical* tree; under ties both are tie-break-defined and we
document ours (lexicographic struct min).

Rooting: Borůvka yields an unrooted forest; the reference's parent array
is rooted at ``start_node``. Tree paths are unique, so a BFS frontier
sweep over the forest edges from ``start_node`` assigns each node its
unique tree parent in O(tree diameter) rounds — the same frontier shape
as ``paths.shortest_paths`` and inherently cheaper (frontier rows only).

K-spanning-tree: the reference's one-leaf-at-a-time crop is sequential by
construction; the bulk-synchronous analog prunes the worst
``min(batch, n−k)`` *current* leaves per round (deterministic rank by
(cost desc, node id)). Both are heuristics for the same NP-hard objective
(KSpanningTree.java documents growApproach as approximate); results can
differ on adversarial ties — tie-break documented here.

Steiner: union of the weighted shortest paths source→terminal (the
path-union heuristic, the first phase of the reference's shortest-path
Steiner before its sequential rerouting pass — LinkCutTree rotations are
pointer-machine operations with no bulk-synchronous analog, so the
rerouting refinement is out of scope and the result is the plain
path-union approximation, stated honestly).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.pregel.superstep import (
    materialize_roundtrip,
    roundtrip_mark,
    roundtrip_release,
)


@dataclass
class SpanningTreeResult:
    # (node_id long, parent long, cost_to_parent double) — reachable nodes
    # only; the root row has parent = -1, cost_to_parent = 0.0 (reference
    # Prim.java fills parent with EMPTY = -1).
    tree: DataFrame
    total_weight: float
    effective_node_count: int
    ran_iterations: int


def _canon_edges(graph: LinkGraph) -> DataFrame:
    """Undirected edge set with a canonical (lo, hi) key, parallel edges
    collapsed to their minimum weight (deterministic; parallel edges can
    never both be in an MST)."""
    e = graph.edges.select("src", "dst", "weight").filter(F.col("src") != F.col("dst"))
    return (
        e.select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
            F.col("weight").cast("double").alias("w"),
        )
        .groupBy("lo", "hi")
        .agg(F.min("w").alias("w"))
    )


def minimum_spanning_forest(
    graph: LinkGraph,
    objective: str = "min",
    max_iterations: int = 64,
) -> tuple[DataFrame, DataFrame, int]:
    """Borůvka minimum (or maximum) spanning forest over the symmetrized
    graph. Returns (forest_edges(lo, hi, w), components(node, comp),
    rounds). The forest spans every component of the whole graph; callers
    slice out one component for Prim parity."""
    if objective not in ("min", "max"):
        raise ValueError(f"objective must be 'min' or 'max', got {objective!r}")
    sign = 1.0 if objective == "min" else -1.0
    spark = graph.edges.sparkSession
    canon = _canon_edges(graph).select("lo", "hi", (F.lit(sign) * F.col("w")).alias("w"))
    sym = canon.select(F.col("lo").alias("src"), F.col("hi").alias("dst"), "w").union(
        canon.select(F.col("hi").alias("src"), F.col("lo").alias("dst"), "w")
    )
    sym = sym.repartition(spark.sparkContext.defaultParallelism, "src").persist()
    sym.count()

    _mark = roundtrip_mark()
    comp = graph.node_ids().select(F.col("node_id").alias("node"), F.col("node_id").alias("comp"))
    comp = materialize_roundtrip(comp, tag="boruvka", keep_last=2)
    forest = spark.createDataFrame([], "lo long, hi long, w double")

    rounds = 0
    for rounds in range(1, max_iterations + 1):
        # Label endpoints with their component, keep crossing edges only.
        cs = comp.select(F.col("node").alias("src"), F.col("comp").alias("c_src"))
        cd = comp.select(F.col("node").alias("dst"), F.col("comp").alias("c_dst"))
        cross = (
            sym.join(cs, "src")
            .join(cd, "dst")
            .filter(F.col("c_src") != F.col("c_dst"))
        )
        # Lightest outgoing edge per component — struct-min gives the
        # deterministic total order (w, lo, hi) so ties are a function.
        picked = (
            cross.groupBy("c_src")
            .agg(
                F.min(
                    F.struct(
                        F.col("w"),
                        F.least("src", "dst").alias("lo"),
                        F.greatest("src", "dst").alias("hi"),
                        F.col("c_dst"),
                    )
                ).alias("m")
            )
            .select(
                F.col("c_src").alias("c"),
                F.col("m.c_dst").alias("p"),
                F.col("m.lo").alias("lo"),
                F.col("m.hi").alias("hi"),
                F.col("m.w").alias("w"),
            )
        )
        obs = Observation()
        picked = picked.observe(obs, F.count(F.lit(1)).alias("n_picked"))
        picked = materialize_roundtrip(picked, tag="boruvka_pick", keep_last=1)
        if not int(obs.get.get("n_picked") or 0):
            break
        # Chosen undirected edges (mutual picks collapse via distinct).
        forest = forest.union(picked.select("lo", "hi", "w")).distinct()
        forest = materialize_roundtrip(forest, tag="boruvka_forest", keep_last=2)

        # Merge components: parent map c -> p; the deterministic min-edge
        # choice makes every cycle a mutual pair — root it at min(c, p).
        parent = picked.select("c", "p")
        mutual = (
            picked.select(F.col("c").alias("a"), F.col("p").alias("b"))
            .join(
                picked.select(F.col("p").alias("a"), F.col("c").alias("b")),
                ["a", "b"],
                "left_semi",
            )
            .filter(F.col("a") < F.col("b"))
            .select(F.col("a").alias("c"))
            .withColumn("is_root", F.lit(True))
        )
        par = (
            parent.join(mutual, "c", "left")
            .select(
                "c",
                F.when(F.col("is_root"), F.col("c")).otherwise(F.col("p")).alias("p"),
            )
        )
        # Pointer-double the (small, halving) component-parent map to its
        # roots; forest depth is bounded by the chain of picks, collapses
        # in O(log depth).
        par = materialize_roundtrip(par, tag="boruvka_par", keep_last=2)
        for _ in range(max_iterations):
            obs2 = Observation()
            g = par.select(F.col("c").alias("gc"), F.col("p").alias("gp"))
            doubled = (
                par.join(g, par["p"] == g["gc"], "left")
                .select("c", F.coalesce(F.col("gp"), F.col("p")).alias("np"), F.col("p"))
                .observe(
                    obs2,
                    F.sum(F.when(F.col("np") != F.col("p"), 1).otherwise(0)).alias("chg"),
                )
                .select("c", F.col("np").alias("p"))
            )
            par = materialize_roundtrip(doubled, tag="boruvka_par", keep_last=2)
            if not int(obs2.get.get("chg") or 0):
                break
        comp = (
            comp.join(par, comp["comp"] == par["c"], "left")
            .select("node", F.coalesce(F.col("p"), F.col("comp")).alias("comp"))
        )
        comp = materialize_roundtrip(comp, tag="boruvka", keep_last=2)

    sym.unpersist()
    forest_out = materialize_roundtrip(
        forest.select("lo", "hi", (F.lit(sign) * F.col("w")).alias("w")), tag="boruvka_out"
    )
    comp_out = materialize_roundtrip(comp, tag="boruvka_out")
    roundtrip_release(_mark, keep=[forest_out, comp_out])
    return forest_out, comp_out, rounds


def spanning_tree(
    graph: LinkGraph,
    start_node: int,
    objective: str = "min",
    max_iterations: int = 64,
) -> SpanningTreeResult:
    """Minimum (``objective='min'``) or maximum (``'max'``) weight spanning
    tree of ``start_node``'s connected component, rooted at ``start_node``
    (reference ``Prim.java:43`` / ``SpanningTreeParameters`` minMax)."""
    forest, comp, rounds = minimum_spanning_forest(graph, objective, max_iterations)
    _mark = roundtrip_mark()
    start_comp = comp.filter(F.col("node") == int(start_node)).select("comp")
    members = comp.join(F.broadcast(start_comp), "comp", "left_semi").select("node")
    tree_edges = (
        forest.join(members.select(F.col("node").alias("lo")), "lo", "left_semi")
        .select("lo", "hi", "w")
    )

    # Root at start_node: frontier sweep over tree edges (unique paths).
    tsym = tree_edges.select(F.col("lo").alias("src"), F.col("hi").alias("dst"), "w").union(
        tree_edges.select(F.col("hi").alias("src"), F.col("lo").alias("dst"), "w")
    )
    tsym = tsym.persist()
    spark = graph.edges.sparkSession
    rooted = spark.createDataFrame(
        [(int(start_node), -1, 0.0)], "node long, parent long, cost double"
    )
    rooted = materialize_roundtrip(rooted, tag="mst_root", keep_last=2)
    frontier = rooted.select("node")
    for _ in range(max_iterations * 64):
        step = (
            tsym.join(frontier.withColumnRenamed("node", "src"), "src")
            .join(rooted.select(F.col("node").alias("dst")), "dst", "left_anti")
            .groupBy("dst")
            .agg(F.min(F.struct(F.col("src").alias("parent"), F.col("w"))).alias("m"))
            .select(
                F.col("dst").alias("node"),
                F.col("m.parent").alias("parent"),
                F.col("m.w").alias("cost"),
            )
        )
        obs = Observation()
        step = step.observe(obs, F.count(F.lit(1)).alias("n"))
        step = materialize_roundtrip(step, tag="mst_front", keep_last=2)
        if not int(obs.get.get("n") or 0):
            break
        rooted = materialize_roundtrip(rooted.union(step), tag="mst_root", keep_last=2)
        frontier = step.select("node")
    tsym.unpersist()

    agg = rooted.agg(
        F.sum(F.col("cost")).alias("tw"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    tree = materialize_roundtrip(
        rooted.select(
            F.col("node").alias("node_id"),
            "parent",
            F.col("cost").alias("cost_to_parent"),
        ),
        tag="mst_out",
    )
    roundtrip_release(_mark, keep=[tree])
    return SpanningTreeResult(
        tree=tree,
        total_weight=float(agg["tw"] or 0.0),
        effective_node_count=int(agg["n"]),
        ran_iterations=rounds,
    )


def k_spanning_tree(
    graph: LinkGraph,
    start_node: int,
    k: int,
    objective: str = "min",
    prune_batch: int = 64,
    max_iterations: int = 64,
) -> SpanningTreeResult:
    """k-NODE spanning tree (reference ``KSpanningTree.java:18``): the MST
    pruned to ``k`` nodes by repeatedly removing the worst current leaves
    (cost desc for min, asc for max; ties to the larger node id). The
    reference crops one leaf at a time inside a grow loop — sequential by
    construction; this bulk version removes up to ``prune_batch`` worst
    leaves per round (the start node is never pruned). Both are heuristics
    for the same NP-hard objective; tie cases can differ and the batch
    knob trades rounds for fidelity (batch=1 reproduces strict
    one-at-a-time order)."""
    res = spanning_tree(graph, start_node, objective, max_iterations)
    n = res.effective_node_count
    if n <= k:
        return res
    _mark = roundtrip_mark()
    tree = res.tree
    worse = F.desc("cost_to_parent") if objective == "min" else F.asc("cost_to_parent")
    removed = 0
    while removed < n - k:
        take = min(prune_batch, n - k - removed)
        parents = tree.select(F.col("parent").alias("node_id")).distinct()
        leaves = (
            tree.join(parents, "node_id", "left_anti")
            .filter(F.col("node_id") != int(start_node))
            .orderBy(worse, F.desc("node_id"))
            .limit(take)
            .select("node_id")
        )
        obs = Observation()
        pruned = tree.join(leaves, "node_id", "left_anti").observe(
            obs, F.count(F.lit(1)).alias("n")
        )
        tree = materialize_roundtrip(pruned, tag="kmst", keep_last=2)
        left = int(obs.get.get("n") or 0)
        if left == n - removed:  # no prunable leaf (degenerate)
            break
        removed = n - left
    agg = tree.agg(F.sum("cost_to_parent").alias("tw"), F.count(F.lit(1)).alias("n")).collect()[0]
    tree = materialize_roundtrip(tree, tag="kmst_out")
    roundtrip_release(_mark, keep=[tree])
    return SpanningTreeResult(
        tree=tree,
        total_weight=float(agg["tw"] or 0.0),
        effective_node_count=int(agg["n"]),
        ran_iterations=res.ran_iterations,
    )


@dataclass
class SteinerResult:
    # (node_id, parent, cost_to_parent) rows for every node on some
    # source→terminal shortest path; root row = (source, -1, 0.0).
    tree: DataFrame
    total_weight: float
    effective_node_count: int
    terminals_reached: int


def steiner_tree_approx(
    graph: LinkGraph,
    source: int,
    terminals: list[int],
    weighted: bool = True,
) -> SteinerResult:
    """Path-union Steiner heuristic: the union of the weighted shortest
    paths source→terminal (first phase of the reference's shortest-path
    Steiner, ``algo/.../steiner/ShortestPathsSteinerAlgorithm``; its
    LinkCutTree rerouting refinement is pointer-machine-sequential and out
    of scope — documented approximation). Deterministic given
    ``dijkstra``'s struct-min tie-break, so the tree (not just its weight)
    is reproducible. Unreachable terminals are skipped (counted in
    ``terminals_reached``)."""
    from graph_data_science_spark.algorithms.paths import dijkstra

    res = dijkstra(graph, source, targets=[int(t) for t in terminals], weighted=weighted)
    _mark = roundtrip_mark()
    # Parent pointers restricted to nodes on some returned path.
    on_paths = res.paths.select(F.explode("node_ids").alias("node_id")).distinct()
    reached = res.paths.count()
    tree = (
        res.distances.join(on_paths, "node_id", "left_semi")
        .select(
            "node_id",
            F.coalesce(F.col("parent"), F.lit(-1)).alias("parent"),
            F.col("distance").alias("dist"),
        )
    )
    pcost = tree.select(F.col("node_id").alias("parent"), F.col("dist").alias("pdist"))
    tree = (
        tree.join(pcost, "parent", "left")
        .select(
            "node_id",
            "parent",
            F.when(F.col("parent") == -1, F.lit(0.0))
            .otherwise(F.col("dist") - F.coalesce(F.col("pdist"), F.lit(0.0)))
            .alias("cost_to_parent"),
        )
    )
    agg = tree.agg(F.sum("cost_to_parent").alias("tw"), F.count(F.lit(1)).alias("n")).collect()[0]
    tree = materialize_roundtrip(tree, tag="steiner_out")
    roundtrip_release(_mark, keep=[tree])
    return SteinerResult(
        tree=tree,
        total_weight=float(agg["tw"] or 0.0),
        effective_node_count=int(agg["n"]),
        terminals_reached=reached,
    )


@dataclass
class PrizeSteinerResult:
    # (node_id, parent, cost_to_parent) for every node of the root's tree
    # component; parent = -1 marks the root, parent = -2 marks PRUNED nodes
    # (sentinels of the reference PrizeSteinerTreeResult.java: ROOT=-1,
    # PRUNED=-2); pruned rows carry cost_to_parent = 0.0.
    tree: DataFrame
    total_weight: float  # Σ cost_to_parent over kept edges
    sum_of_prizes: float  # Σ prize over kept nodes
    effective_node_count: int  # kept nodes (root included)


def prize_steiner_tree(
    graph: LinkGraph,
    prizes: DataFrame,
    root: int,
    max_iterations: int = 64,
) -> PrizeSteinerResult:
    """Prize-collecting Steiner tree: strong pruning over an MST substrate.

    The reference (``algo/.../pricesteiner/PCSTFast.java``) runs a
    Goemans–Williamson growth phase (moats + pairing heaps — inherently
    sequential pointer machinery) to pick a tree, then **StrongPruning**
    (``StrongPruning.java:87-113``): peel leaves, fold ``prize`` into
    ``dp``, keep the edge to the parent iff ``cost < dp(leaf)`` and add
    ``dp(leaf) - cost`` to the parent, else prune the whole subtree. The
    distributed analog here substitutes the growth phase with the Borůvka
    minimum spanning tree of ``root``'s component (documented
    approximation — the pruning phase, where the prize/cost trade-off is
    decided, is the reference recurrence exactly) and runs the same DP
    level-synchronously:

    - upward: O(tree depth) leaf-peel rounds, each a leaf selection
      (anti-join on remaining parents) + grouped gain fold into parents;
    - downward: O(tree depth) frontier rounds propagating keep decisions
      root→leaves (a subtree whose top edge was cut is pruned wholesale,
      matching the reference's subtree pruning at ``:112``).

    ``prizes``: (node_id long, prize double) — missing nodes read as 0.
    Ties (``dp == cost``) prune, matching the reference's strict ``<``.
    Unlike the reference, the solution is rooted at the caller's ``root``
    rather than at the growth phase's best cluster — the DP below the
    root is identical.
    """
    base = spanning_tree(graph, int(root)).tree
    _mark = roundtrip_mark()
    pz = prizes.select("node_id", F.col("prize").cast("double").alias("prize"))
    active = (
        base.filter(F.col("parent") != -1)
        .join(pz, "node_id", "left")
        .select(
            "node_id",
            "parent",
            "cost_to_parent",
            F.coalesce(F.col("prize"), F.lit(0.0)).alias("dp"),
        )
    )
    active = materialize_roundtrip(active, tag="pcst_up", keep_last=2)

    decided_frames = []
    for _ in range(max_iterations * 64):
        inner = active.select(F.col("parent").alias("p")).distinct()
        leaves = active.join(inner, active["node_id"] == inner["p"], "left_anti")
        obs = Observation()
        leaves = leaves.observe(obs, F.count(F.lit(1)).alias("n"))
        leaves = materialize_roundtrip(leaves, tag="pcst_leaf", keep_last=2)
        if not int(obs.get.get("n") or 0):
            break
        decided = leaves.select(
            "node_id",
            "parent",
            "cost_to_parent",
            (F.col("dp") > F.col("cost_to_parent")).alias("keep"),
        )
        decided = materialize_roundtrip(decided, tag="pcst_dec")
        decided_frames.append(decided)
        gains = (
            decided.filter(F.col("keep"))
            .join(leaves.select("node_id", "dp"), "node_id")
            .groupBy(F.col("parent").alias("g_node"))
            .agg(F.sum(F.col("dp") - F.col("cost_to_parent")).alias("gain"))
        )
        rem = active.join(leaves.select("node_id"), "node_id", "left_anti")
        active = (
            rem.join(gains, rem["node_id"] == gains["g_node"], "left")
            .select(
                rem["node_id"],
                rem["parent"],
                rem["cost_to_parent"],
                (rem["dp"] + F.coalesce(gains["gain"], F.lit(0.0))).alias("dp"),
            )
        )
        active = materialize_roundtrip(active, tag="pcst_up", keep_last=2)

    spark = graph.edges.sparkSession
    if decided_frames:
        all_dec = decided_frames[0]
        for fr in decided_frames[1:]:
            all_dec = all_dec.union(fr)
        all_dec = materialize_roundtrip(all_dec, tag="pcst_alldec")
    else:
        all_dec = spark.createDataFrame(
            [], "node_id long, parent long, cost_to_parent double, keep boolean"
        )

    # Downward sweep: keep(v) ⟺ keep-edge(v) ∧ keep(parent(v)); root kept.
    kept = spark.createDataFrame([(int(root), -1, 0.0)], "node_id long, parent long, cost_to_parent double")
    kept = materialize_roundtrip(kept, tag="pcst_kept", keep_last=2)
    frontier = kept.select("node_id")
    for _ in range(max_iterations * 64):
        children = (
            all_dec.filter(F.col("keep"))
            .join(frontier.withColumnRenamed("node_id", "f"), F.col("parent") == F.col("f"))
            .select("node_id", "parent", "cost_to_parent")
        )
        obs = Observation()
        children = children.observe(obs, F.count(F.lit(1)).alias("n"))
        children = materialize_roundtrip(children, tag="pcst_front", keep_last=2)
        if not int(obs.get.get("n") or 0):
            break
        kept = materialize_roundtrip(kept.union(children), tag="pcst_kept", keep_last=2)
        frontier = children.select("node_id")

    pruned = base.join(kept.select("node_id"), "node_id", "left_anti").select(
        "node_id", F.lit(-2).cast("long").alias("parent"), F.lit(0.0).alias("cost_to_parent")
    )
    tree = materialize_roundtrip(kept.union(pruned), tag="pcst_out")
    agg = (
        kept.join(pz, "node_id", "left")
        .agg(
            F.sum("cost_to_parent").alias("tw"),
            F.sum(F.coalesce(F.col("prize"), F.lit(0.0))).alias("pz"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    roundtrip_release(_mark, keep=[tree])
    return PrizeSteinerResult(
        tree=tree,
        total_weight=float(agg["tw"] or 0.0),
        sum_of_prizes=float(agg["pz"] or 0.0),
        effective_node_count=int(agg["n"]),
    )
