"""Bridges, articulation points, and biconnected components.

Reference semantics:
- ``algo/.../bridges/Bridges.java:33`` — undirected bridges via iterative
  Tarjan DFS (``tin``/``low`` arrays, explicit event stack); a tree edge
  ``(v, to)`` is a bridge iff ``low(to) > tin(v)``; one parallel copy of
  the parent edge is skipped, further copies kill bridge-ness
  (``parent_skipped``, ``Bridges.java:103-113``).
- ``algo/.../articulationpoints/ArticulationPoints.java:29`` — same DFS;
  returns the BitSet of cut vertices.

Spark execution — Tarjan's DFS is inherently sequential, so this module
uses the Tarjan–Vishkin reduction (the classical PRAM biconnectivity
algorithm; see JaJa, *An Introduction to Parallel Algorithms*, §5.2),
which works over an ARBITRARY rooted spanning tree:

1. rooted spanning forest via multi-source BFS (root = WCC component
   minimum; deterministic min-parent tie-break) — frontier joins;
2. preorder intervals ``[tin, tout]`` without a DFS: subtree sizes by a
   bottom-up level sweep, then ``tin`` top-down (each child's offset = a
   window cumulative sum of earlier siblings' sizes);
3. ``low/high(v)`` = min/max preorder reached from subtree(v) by one
   non-tree hop: per-node partner-``tin`` min/max, then the same
   bottom-up sweep;
4. **bridges** (exact, no randomization): tree edge ``(p,c)`` is a bridge
   iff ``low(c) ≥ tin(c)`` and ``high(c) ≤ tout(c)`` — a non-tree edge
   crossing the subtree boundary always contributes a partner preorder
   outside ``[tin(c), tout(c)]``, and a fully-inside edge never does.
   Parallel copies of a tree edge contribute the parent's ``tin`` (a
   crossing) and so correctly kill bridge-ness;
5. **biconnected components**: the Tarjan–Vishkin auxiliary graph over
   tree edges (aux node id = the child endpoint):
   rule A — a non-tree edge ``{x,y}`` with DISJOINT intervals (neither
   an ancestor of the other) joins tree edges ``(p(x),x)`` and
   ``(p(y),y)``; rule B — tree edges ``(p(v),v)`` and ``(v,w)`` join iff
   subtree(w) escapes subtree(v) (``low(w) < tin(v)`` or
   ``high(w) > tout(v)``). WCC over the aux graph labels each tree edge
   with its block; a non-tree edge inherits the block of its deeper
   (larger ``tin``) endpoint's tree edge;
6. **articulation points**: a vertex is a cut vertex iff its incident
   edges lie in ≥ 2 distinct blocks (the block-cut-tree criterion; this
   uniformly covers the DFS root's ≥-2-children special case).

Every sweep is level-synchronized: O(tree depth) rounds of small
adjacent-level joins — at web scale (small-world link graphs) depth is
O(log V); a path graph degrades to O(V) rounds, exactly like BFS itself.
All steps are joins / hash aggregates / window sums — zero Python UDFs,
nothing driver-side beyond the per-level loop.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.algorithms.wcc import wcc
from graph_data_science_spark.pregel.superstep import (
    materialize_roundtrip,
    roundtrip_mark,
    roundtrip_release,
)


@dataclass
class BiconnectivityResult:
    bridges: DataFrame  # (from long, to long) — from = tree parent side, from < to canonical
    articulation_points: DataFrame  # (node_id long)
    # (node_id long, parent long|null, depth long, tin long, tout long,
    #  low long|null, high long|null, block long|null) — block of the
    # (parent,node) tree edge; null for roots.
    tree: DataFrame


def _canon_undirected(edges: DataFrame) -> DataFrame:
    """Undirected occurrence list, canonical (u < v), self-loops dropped,
    each input row counted once (direction collapsed, multiplicity kept
    — matching the reference's multigraph handling)."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("mult"))
    )


def _bfs_forest(sym: DataFrame, roots: DataFrame, max_rounds: int) -> DataFrame:
    """(node, parent, depth) rooted spanning forest; roots have parent
    null. ``sym`` must be symmetric (src, dst). Deterministic: first
    touch wins, min-parent tie-break within a level."""
    visited = roots.select(
        F.col("node_id").alias("node"), F.lit(None).cast("long").alias("parent"),
        F.lit(0).cast("long").alias("depth"),
    )
    visited = materialize_roundtrip(visited, tag="bico_bfs", keep_last=2)
    frontier = visited.select("node")
    for d in range(1, max_rounds + 1):
        nxt = (
            sym.join(frontier, sym["src"] == frontier["node"], "inner")
            .select(F.col("dst").alias("node"), F.col("src").alias("parent"))
            .groupBy("node")
            .agg(F.min("parent").alias("parent"))
            .join(visited.select(F.col("node").alias("_v")), F.col("node") == F.col("_v"), "left_anti")
            .select("node", "parent", F.lit(d).cast("long").alias("depth"))
        )
        nxt = materialize_roundtrip(nxt, tag="bico_bfs", keep_last=3)
        if nxt.isEmpty():
            break
        visited = materialize_roundtrip(visited.union(nxt), tag="bico_bfs", keep_last=3)
        frontier = nxt.select("node")
    return visited


def _sweep_up(tree: DataFrame, leaf_vals: DataFrame, val_cols: dict, max_depth: int) -> DataFrame:
    """Bottom-up subtree aggregation over a BFS tree (children are exactly
    one level deeper). ``leaf_vals``: (node, <col>...) per-node local
    values; ``val_cols``: {col: "min"|"max"|"sum"} aggregate spec.
    Returns (node, <col>...) with each column aggregated over the node's
    whole subtree (local value combined with children's results)."""
    aggf = {"min": F.min, "max": F.max, "sum": F.sum}
    done: DataFrame | None = None  # levels >= d+1, each fully aggregated
    for d in range(max_depth, -1, -1):
        level = (
            tree.filter(F.col("depth") == d)
            .select("node", "parent")
            .join(leaf_vals, "node", "left")
        )
        if done is not None:
            child_agg = (
                done.filter(F.col("depth") == d + 1)
                .groupBy("parent")
                .agg(*[aggf[k](c).alias(f"_c_{c}") for c, k in val_cols.items()])
                .withColumnRenamed("parent", "_p")
            )
            level = level.join(child_agg, level["node"] == child_agg["_p"], "left")
            merged = []
            for c, k in val_cols.items():
                if k == "sum":
                    merged.append(
                        (F.coalesce(F.col(c), F.lit(0)) + F.coalesce(F.col(f"_c_{c}"), F.lit(0))).alias(c)
                    )
                elif k == "min":
                    merged.append(F.least(F.col(c), F.col(f"_c_{c}")).alias(c))  # least skips nulls
                else:
                    merged.append(F.greatest(F.col(c), F.col(f"_c_{c}")).alias(c))
            level = level.select("node", "parent", *merged)
        else:
            level = level.select("node", "parent", *[F.col(c) for c in val_cols])
        level = level.withColumn("depth", F.lit(d).cast("long"))
        done = level if done is None else done.union(level.select(*done.columns))
        done = materialize_roundtrip(done, tag="bico_up", keep_last=2)
    return done.select("node", *val_cols)


def biconnectivity(graph: LinkGraph, max_depth: int | None = None) -> BiconnectivityResult:
    """Compute bridges + articulation points + per-tree-edge block labels
    in one pass (they share the spanning forest and the interval sweeps).
    ``max_depth``: optional cap on BFS/sweep rounds (defaults |V|)."""
    spark = graph.edges.sparkSession
    n = graph.with_node_count()
    cap = int(max_depth if max_depth is not None else n)

    mark = roundtrip_mark()
    occ = _canon_undirected(graph.edges)  # (u, v, mult), u < v
    occ = materialize_roundtrip(occ, tag="bico_occ")
    sym = occ.select(F.col("u").alias("src"), F.col("v").alias("dst")).union(
        occ.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    sym = materialize_roundtrip(sym, tag="bico_sym")

    # 1. spanning forest, rooted at each component's minimum node id
    # (our WCC labels components by their min member, union-by-min).
    und = LinkGraph(edges=sym.select("src", "dst", F.lit(1.0).alias("weight")), node_count=n)
    comp = wcc(und).components
    # union-by-min WCC labels a component by its minimum member, and its
    # node_ids() covers the full dense range — so isolated nodes are
    # already their own (root) components.
    roots = comp.filter(F.col("node_id") == F.col("component")).select("node_id")
    tree0 = _bfs_forest(sym, roots, cap)  # (node, parent, depth)
    maxd_row = tree0.agg(F.max("depth").alias("m")).collect()[0]
    maxd = int(maxd_row["m"] or 0)

    # 2. subtree sizes (bottom-up), then preorder tin (top-down).
    sizes = _sweep_up(
        tree0, tree0.select("node", F.lit(1).cast("long").alias("size")),
        {"size": "sum"}, maxd,
    )
    tr = tree0.join(sizes, "node")  # (node, parent, depth, size)
    tr = materialize_roundtrip(tr, tag="bico_tr")

    tin = tr.filter(F.col("depth") == 0).select("node", F.lit(0).cast("long").alias("tin"))
    tin = materialize_roundtrip(tin, tag="bico_tin", keep_last=2)
    for d in range(1, maxd + 1):
        level = tr.filter(F.col("depth") == d)
        w = Window.partitionBy("parent").orderBy("node").rowsBetween(
            Window.unboundedPreceding, -1
        )
        nxt = (
            level.withColumn("_off", F.coalesce(F.sum("size").over(w), F.lit(0)))
            .join(tin.select(F.col("node").alias("parent"), F.col("tin").alias("_pt")), "parent")
            .select("node", (F.col("_pt") + 1 + F.col("_off")).alias("tin"))
        )
        nxt = materialize_roundtrip(nxt, tag="bico_tin", keep_last=3)
        tin = materialize_roundtrip(tin.union(nxt), tag="bico_tin", keep_last=3)
    tr = tr.join(tin, "node").withColumn("tout", F.col("tin") + F.col("size") - 1)
    tr = materialize_roundtrip(tr, tag="bico_tr2")

    # 3. non-tree occurrences: subtract ONE copy of each tree edge
    # (Bridges.java parent_skipped — exactly one parent copy is tree).
    tedge = tr.filter(F.col("parent").isNotNull()).select(
        F.least("node", "parent").alias("u"), F.greatest("node", "parent").alias("v"),
    )
    nontree = (
        occ.join(tedge.withColumn("_t", F.lit(1)), ["u", "v"], "left")
        .select("u", "v", (F.col("mult") - F.coalesce(F.col("_t"), F.lit(0))).alias("mult"))
        .filter(F.col("mult") > 0)
    )
    pre = tr.select("node", "tin", "tout")
    nt = (
        nontree.join(pre.select(F.col("node").alias("u"), F.col("tin").alias("tin_u"),
                                F.col("tout").alias("tout_u")), "u")
        .join(pre.select(F.col("node").alias("v"), F.col("tin").alias("tin_v"),
                         F.col("tout").alias("tout_v")), "v")
    )
    nt = materialize_roundtrip(nt, tag="bico_nt")

    # per-node partner-tin min/max over non-tree incidences
    partner = nt.select(F.col("u").alias("node"), F.col("tin_v").alias("pt")).union(
        nt.select(F.col("v").alias("node"), F.col("tin_u").alias("pt"))
    )
    local_reach = partner.groupBy("node").agg(
        F.min("pt").alias("low"), F.max("pt").alias("high")
    )
    reach = _sweep_up(tr.select("node", "parent", "depth"), local_reach,
                      {"low": "min", "high": "max"}, maxd)
    tr = tr.join(reach, "node", "left")
    tr = materialize_roundtrip(tr, tag="bico_tr3")

    # 4. bridges: no non-tree edge crosses the subtree boundary.
    bridges = tr.filter(
        F.col("parent").isNotNull()
        & (F.col("low").isNull() | (F.col("low") >= F.col("tin")))
        & (F.col("high").isNull() | (F.col("high") <= F.col("tout")))
    ).select(F.col("parent").alias("from"), F.col("node").alias("to"))

    # 5. Tarjan–Vishkin auxiliary graph over tree edges (aux id = child).
    aux_a = nt.filter(
        ~((F.col("tin_u") <= F.col("tin_v")) & (F.col("tin_v") <= F.col("tout_u")))
        & ~((F.col("tin_v") <= F.col("tin_u")) & (F.col("tin_u") <= F.col("tout_v")))
    ).select(F.col("u").alias("src"), F.col("v").alias("dst"))
    child = tr.filter(F.col("parent").isNotNull())
    aux_b = (
        child.alias("w")
        .join(
            child.alias("v"),
            F.col("w.parent") == F.col("v.node"),
        )
        .filter(
            (F.col("w.low").isNotNull() & (F.col("w.low") < F.col("v.tin")))
            | (F.col("w.high").isNotNull() & (F.col("w.high") > F.col("v.tout")))
        )
        .select(F.col("v.node").alias("src"), F.col("w.node").alias("dst"))
    )
    aux_edges = aux_a.union(aux_b).withColumn("weight", F.lit(1.0))
    aux = wcc(LinkGraph(edges=aux_edges, node_count=n)).components
    # restrict to actual tree-edge aux nodes; singleton blocks keep own id
    block = (
        child.select("node")
        .join(aux, aux["node_id"] == F.col("node"), "left")
        .select("node", F.coalesce(F.col("component"), F.col("node")).alias("block"))
    )
    block = materialize_roundtrip(block, tag="bico_block")

    # 6. articulation points: incident edges in >= 2 distinct blocks.
    tree_inc = (
        child.select("node", "parent")
        .join(block, "node")
        .select(F.col("node").alias("a"), F.col("parent").alias("b"), "block")
    )
    nt_child = nt.select(
        "u", "v", F.when(F.col("tin_u") > F.col("tin_v"), F.col("u")).otherwise(F.col("v")).alias("deep")
    )
    nt_inc = (
        nt_child.join(block, block["node"] == nt_child["deep"])
        .select(F.col("u").alias("a"), F.col("v").alias("b"), "block")
    )
    inc = tree_inc.union(nt_inc)
    incident = inc.select(F.col("a").alias("node_id"), "block").union(
        inc.select(F.col("b").alias("node_id"), "block")
    )
    arts = (
        incident.groupBy("node_id")
        .agg(F.countDistinct("block").alias("nb"))
        .filter(F.col("nb") >= 2)
        .select("node_id")
    )

    tree_out = tr.select(
        F.col("node").alias("node_id"), "parent", "depth", "tin", "tout", "low", "high"
    ).join(block.select(F.col("node").alias("node_id"), "block"), "node_id", "left")

    bridges = materialize_roundtrip(bridges, tag="bico_res")
    arts = materialize_roundtrip(arts, tag="bico_res")
    tree_out = materialize_roundtrip(tree_out, tag="bico_res")
    roundtrip_release(mark, keep=(bridges, arts, tree_out))
    return BiconnectivityResult(bridges=bridges, articulation_points=arts, tree=tree_out)


def bridges(graph: LinkGraph) -> DataFrame:
    """(from, to) bridge edges (reference ``Bridges.java:33`` result;
    from/to oriented parent→child in our forest, a superset orientation
    of the reference's DFS-tree orientation — same edge SET)."""
    return biconnectivity(graph).bridges


def articulation_points(graph: LinkGraph) -> DataFrame:
    """(node_id) cut vertices (reference ``ArticulationPoints.java:29``)."""
    return biconnectivity(graph).articulation_points
