"""Louvain community detection as synchronous local moves + graph coarsening.

Reference: ``algo/.../louvain/Louvain.java:50`` — levels of modularity
optimization (``ModularityOptimization.java``) followed by graph
aggregation, default maxLevels=10, tolerance=1e-4; relationships are
treated as undirected and parallel edges sum.

Spark re-expression (SURVEY.md §2.B): GDS's inner loop moves nodes one at a
time under color partitioning (shared-memory asynchrony). A shuffle engine
moves *all* nodes of a parity class per round instead:

- per inner round, every node scores each neighboring community by the
  standard modularity gain ``k_{i,c} − k_i·Σtot(c)/2m`` (the shared
  ``−k_i²/2m`` and self-loop terms cancel between candidates, with the
  node's own contribution removed from its current community's Σtot);
- the best strictly-improving move is applied ONLY when it goes *down*
  in community-id space on even rounds and *up* on odd rounds (the
  standard direction-alternation of distributed Louvain, e.g. Sotera DGA):
  an A↔B label swap needs one down-move and one up-move in the same round,
  so fully-synchronous oscillation is impossible by construction, and the
  gate is deterministic on any cluster;
- rounds end when two consecutive rounds (both parities) move nothing;
- coarsening contracts each community to a super-node (groupBy on the
  community pair — one shuffle), self-loops carry intra-community weight,
  and the next level runs on the contracted graph, so per-level cost
  shrinks geometrically like the reference's.

Everything is Catalyst joins/aggregates; no Python executes per row.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.pregel.superstep import (
    materialize_roundtrip,
    roundtrip_mark,
    roundtrip_release,
)


def _materialize(df: DataFrame, prev: DataFrame | None = None) -> DataFrame:
    """Parquet round-trip (see pregel.superstep.materialize_roundtrip for
    why neither localCheckpoint nor persist survives a loop that references
    the previous state several times per round). ``prev`` is accepted for
    call-site symmetry; round-trip files are reclaimed at process exit."""
    return materialize_roundtrip(df, tag="louvain")


@dataclass
class LouvainResult:
    communities: DataFrame  # (node_id long, community long)
    modularities: list  # final modularity per level
    ran_levels: int
    # (node_id, intermediate_communities array<long>) when requested:
    # element i = the node's community after level i (the reference's
    # dendrogram, ``Louvain.java:111-125`` — intermediateCommunityIds
    # has length ranLevels, last element == the final community).
    intermediate: DataFrame | None = None


def _intermediate_frame(node_ids: DataFrame, snapshots: list[DataFrame]) -> DataFrame:
    """Zip per-level (node_id, community) snapshots into one array column.
    ≤ max_levels equi-joins on node_id — co-partitioned after the first
    shuffle, so the zip costs one exchange regardless of level count."""
    df = node_ids.select("node_id")
    cols = []
    for i, snap in enumerate(snapshots):
        df = df.join(snap.withColumnRenamed("community", f"_l{i}"), "node_id")
        cols.append(F.col(f"_l{i}"))
    return df.select("node_id", F.array(*cols).alias("intermediate_communities"))


def _sym_and_loops(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Symmetrized non-loop edges (both directions, weights summed per pair)
    + per-node self-loop weights."""
    e = edges.groupBy("src", "dst").agg(F.sum("weight").alias("w"))
    loops = (
        e.filter(F.col("src") == F.col("dst"))
        .select(F.col("src").alias("node"), F.col("w").alias("loop_w"))
    )
    nonloop = e.filter(F.col("src") != F.col("dst"))
    sym = (
        nonloop.select("src", "dst", "w")
        .union(nonloop.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    return sym, loops


def _one_level(
    edges: DataFrame, max_inner: int, gamma: float = 1.0
) -> tuple[DataFrame, float]:
    """Run local moves on one level; returns (assignment(node, comm), Q)."""
    spark = edges.sparkSession
    sym, loops = _sym_and_loops(edges)
    sym = sym.persist()
    nodes = (
        sym.select(F.col("src").alias("node"))
        .union(sym.select(F.col("dst").alias("node")))
        .union(loops.select("node"))
        .distinct()
    )
    # k_i = Σ neighbor weights + 2·self-loop (standard Louvain degree).
    deg = (
        sym.groupBy(F.col("src").alias("node")).agg(F.sum("w").alias("kn"))
        .join(loops, "node", "full_outer")
        .select(
            "node",
            (F.coalesce(F.col("kn"), F.lit(0.0)) + 2.0 * F.coalesce(F.col("loop_w"), F.lit(0.0))).alias("k"),
        )
    ).persist()
    two_m = deg.agg(F.sum("k").alias("s")).collect()[0]["s"] or 0.0
    if two_m == 0.0:
        assign = nodes.select("node", F.col("node").alias("comm"))
        sym.unpersist()
        deg.unpersist()
        return assign, 0.0

    assign = _materialize(nodes.select("node", F.col("node").alias("comm")))
    quiet_rounds = 0
    for rnd in range(max_inner * 2):
        a_dst = assign.select(F.col("node").alias("dst"), F.col("comm").alias("c_dst"))
        # k_{i,c}: weight from each node into each neighboring community.
        nbr_w = (
            sym.join(a_dst, "dst")
            .groupBy(F.col("src").alias("node"), F.col("c_dst").alias("cand"))
            .agg(F.sum("w").alias("k_ic"))
        )
        # Ensure a candidate row for the node's own community (k_ic may be 0).
        own = assign.select("node", F.col("comm").alias("cand"), F.lit(0.0).alias("k_ic"))
        cands = (
            nbr_w.union(own)
            .groupBy("node", "cand")
            .agg(F.sum("k_ic").alias("k_ic"))
        )
        tot = (
            assign.join(deg, "node")
            .groupBy(F.col("comm").alias("cand"))
            .agg(F.sum("k").alias("sig_tot"))
        )
        scored = (
            cands.join(tot, "cand")
            .join(assign, "node")
            .join(deg, "node")
            .select(
                "node",
                "cand",
                "comm",
                (
                    F.col("k_ic")
                    - F.lit(float(gamma))
                    * F.col("k")
                    * (F.col("sig_tot") - F.when(F.col("cand") == F.col("comm"), F.col("k")).otherwise(F.lit(0.0)))
                    / F.lit(two_m)
                ).alias("score"),
            )
        )
        w_best = Window.partitionBy("node").orderBy(F.desc("score"), F.asc("cand"))
        best = (
            scored.withColumn("_rk", F.row_number().over(w_best))
            .filter(F.col("_rk") == 1)
            .select("node", F.col("cand").alias("best"), F.col("score").alias("best_score"), "comm")
        )
        stay = scored.filter(F.col("cand") == F.col("comm")).select(
            "node", F.col("score").alias("stay_score")
        )
        direction_ok = (
            (F.col("best") < F.col("comm")) if rnd % 2 == 0 else (F.col("best") > F.col("comm"))
        )
        obs = Observation()
        improving = F.col("best_score") > F.col("stay_score") + F.lit(1e-12)
        new_assign = (
            best.join(stay, "node")
            .select(
                "node",
                F.when(direction_ok & improving, F.col("best"))
                .otherwise(F.col("comm")).alias("comm"),
                (direction_ok & improving).alias("_moved"),
            )
            .observe(obs, F.sum(F.when(F.col("_moved"), 1).otherwise(0)).alias("moves"))
        )
        assign = _materialize(new_assign.select("node", "comm"), prev=assign)
        if int(obs.get.get("moves") or 0) == 0:
            quiet_rounds += 1
            if quiet_rounds >= 2:
                break
        else:
            quiet_rounds = 0

    # Modularity of this level's assignment: Q = Σ_c [in_c/2m − (tot_c/2m)²],
    # where in_c counts both directions of intra edges + 2·loops.
    a_src = assign.select(F.col("node").alias("src"), F.col("comm").alias("c_src"))
    a_dst = assign.select(F.col("node").alias("dst"), F.col("comm").alias("c_dst"))
    intra = (
        sym.join(a_src, "src").join(a_dst, "dst")
        .filter(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias("comm"))
        .agg(F.sum("w").alias("in2"))
    )
    loop_in = (
        loops.join(assign, "node")
        .groupBy("comm")
        .agg((2.0 * F.sum("loop_w")).alias("lin2"))
    )
    tot = assign.join(deg, "node").groupBy("comm").agg(F.sum("k").alias("sig_tot"))
    q = (
        tot.join(intra, "comm", "left")
        .join(loop_in, "comm", "left")
        .select(
            (
                (F.coalesce(F.col("in2"), F.lit(0.0)) + F.coalesce(F.col("lin2"), F.lit(0.0)))
                / F.lit(two_m)
                - (F.col("sig_tot") / F.lit(two_m)) * (F.col("sig_tot") / F.lit(two_m))
            ).alias("qc")
        )
        .agg(F.sum("qc").alias("q"))
        .collect()[0]["q"]
    )
    sym.unpersist()
    deg.unpersist()
    return assign, float(q or 0.0)


def louvain(
    graph: LinkGraph,
    max_levels: int = 10,
    max_inner_iterations: int = 10,
    tolerance: float = 1e-4,
    include_intermediate: bool = False,
) -> LouvainResult:
    """Communities over the undirected interpretation of the graph. The
    returned community ids are the (level-contracted) representative node
    ids — stable for a fixed input, arbitrary otherwise, like the
    reference's (canonicalize per-community downstream if needed).
    ``include_intermediate`` additionally returns the per-level dendrogram
    (the reference's ``includeIntermediateCommunities`` stream option)."""
    edges = graph.edges.select("src", "dst", F.col("weight").cast("double").alias("weight"))
    mapping = graph.node_ids().select("node_id", F.col("node_id").alias("community"))
    modularities: list[float] = []
    snapshots: list[DataFrame] = []
    levels = 0
    _mark = roundtrip_mark()
    for _lvl in range(max_levels):
        assign, q = _one_level(edges, max_inner_iterations)
        n_before = assign.count()
        n_comms = assign.select("comm").distinct().count()
        levels += 1
        modularities.append(q)
        new_mapping = _materialize(
            mapping.join(assign, mapping["community"] == assign["node"], "left")
            .select(
                "node_id",
                F.coalesce(F.col("comm"), F.col("community")).alias("community"),
            )
        )
        mapping = new_mapping
        if include_intermediate:
            snapshots.append(mapping)
        if n_comms == n_before:
            break  # nothing contracted — fixpoint
        if len(modularities) >= 2 and q - modularities[-2] < tolerance:
            break
        # Coarsen: communities become nodes; parallel edges sum; loops kept.
        a_src = assign.select(F.col("node").alias("src"), F.col("comm").alias("c_src"))
        a_dst = assign.select(F.col("node").alias("dst"), F.col("comm").alias("c_dst"))
        new_edges = _materialize(
            edges.join(a_src, "src").join(a_dst, "dst")
            .groupBy(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"))
            .agg(F.sum("weight").alias("weight"))
        )
        edges = new_edges
    roundtrip_release(_mark, keep=[mapping, *snapshots])
    intermediate = (
        _intermediate_frame(graph.node_ids(), snapshots) if include_intermediate else None
    )
    return LouvainResult(
        communities=mapping,
        modularities=modularities,
        ran_levels=levels,
        intermediate=intermediate,
    )


def modularity_optimization(
    graph: LinkGraph, max_iterations: int = 10
) -> LouvainResult:
    """Single-level modularity optimization (reference
    ``algo/.../modularityoptimization/ModularityOptimization.java`` — the
    inner engine Louvain levels over, exposed standalone like the GDS
    procedure). One _one_level run, no coarsening."""
    edges = graph.edges.select("src", "dst", F.col("weight").cast("double").alias("weight"))
    _mark = roundtrip_mark()
    assign, q = _one_level(edges, max_iterations)
    nodes = graph.node_ids()
    mapping = materialize_roundtrip(
        nodes.join(assign, nodes["node_id"] == assign["node"], "left")
        .select(
            "node_id",
            F.coalesce(F.col("comm"), F.col("node_id")).alias("community"),
        ),
        tag="modopt_out",
    )
    roundtrip_release(_mark, keep=[mapping])
    return LouvainResult(communities=mapping, modularities=[q], ran_levels=1)


def _refine_connectivity(level_edges: DataFrame, assign: DataFrame) -> DataFrame:
    """Leiden's connectivity guarantee: split every community into its
    connected components over the intra-community subgraph; the refined
    community id is the minimum member node id (deterministic)."""
    from graph_data_science_spark.algorithms.wcc import wcc as _wcc
    from graph_data_science_spark.graph.build import LinkGraph as _LG

    a_src = assign.select(F.col("node").alias("src"), F.col("comm").alias("c_src"))
    a_dst = assign.select(F.col("node").alias("dst"), F.col("comm").alias("c_dst"))
    intra = (
        level_edges.join(a_src, "src").join(a_dst, "dst")
        .filter(F.col("c_src") == F.col("c_dst"))
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )
    sub = _LG(edges=intra, vertices=assign.select(F.col("node").alias("node_id")))
    comps = _wcc(sub).components  # component = min member node id
    return comps.select(F.col("node_id").alias("node"), F.col("component").alias("comm"))


def leiden(
    graph: LinkGraph,
    gamma: float = 1.0,
    max_levels: int = 10,
    max_inner_iterations: int = 10,
    tolerance: float = 1e-4,
    include_intermediate: bool = False,
) -> LouvainResult:
    """Leiden community detection (reference ``algo/.../leiden/Leiden.java:44``).

    Reference shape: per level, local moves with resolution γ (the CPM/
    modularity gain scaled by ``γ·k_i·Σtot/2m``), then a REFINEMENT phase
    that breaks communities into well-connected pieces before aggregation —
    the property Louvain lacks (it can emit internally disconnected
    communities, the problem Leiden was published to fix).

    Spark re-expression: local moves = the shared ``_one_level`` engine
    with γ threaded into the gain; refinement = connected-components over
    each community's induced subgraph (the deterministic core of the
    guarantee — the reference's additional θ-randomized subset merging is
    a quality heuristic on top, replaced here by the exact split; every
    returned community is connected by construction). Aggregation then
    contracts the REFINED partition, exactly like the reference.
    """
    edges = graph.edges.select("src", "dst", F.col("weight").cast("double").alias("weight"))
    mapping = graph.node_ids().select("node_id", F.col("node_id").alias("community"))
    modularities: list[float] = []
    snapshots: list[DataFrame] = []
    levels = 0
    _mark = roundtrip_mark()
    for _lvl in range(max_levels):
        assign, _q = _one_level(edges, max_inner_iterations, gamma=gamma)
        refined = materialize_roundtrip(_refine_connectivity(edges, assign), tag="leiden")
        n_before = refined.count()
        n_comms = refined.select("comm").distinct().count()
        levels += 1
        # report modularity of the refined (returned) partition
        from graph_data_science_spark.algorithms.misc import modularity as _mod
        from graph_data_science_spark.graph.build import LinkGraph as _LG

        q = _mod(
            _LG(edges=edges, vertices=refined.select(F.col("node").alias("node_id"))),
            refined.select(F.col("node").alias("node_id"), F.col("comm").alias("community")),
        )
        modularities.append(q)
        mapping = materialize_roundtrip(
            mapping.join(refined, mapping["community"] == refined["node"], "left")
            .select(
                "node_id",
                F.coalesce(F.col("comm"), F.col("community")).alias("community"),
            ),
            tag="leiden_map",
        )
        if include_intermediate:
            snapshots.append(mapping)
        if n_comms == n_before:
            break
        if len(modularities) >= 2 and q - modularities[-2] < tolerance:
            break
        a_src = refined.select(F.col("node").alias("src"), F.col("comm").alias("c_src"))
        a_dst = refined.select(F.col("node").alias("dst"), F.col("comm").alias("c_dst"))
        edges = materialize_roundtrip(
            edges.join(a_src, "src").join(a_dst, "dst")
            .groupBy(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"))
            .agg(F.sum("weight").alias("weight")),
            tag="leiden_edges",
        )
    roundtrip_release(_mark, keep=[mapping, *snapshots])
    intermediate = (
        _intermediate_frame(graph.node_ids(), snapshots) if include_intermediate else None
    )
    return LouvainResult(
        communities=mapping,
        modularities=modularities,
        ran_levels=levels,
        intermediate=intermediate,
    )
