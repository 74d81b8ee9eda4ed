"""Approximate Maximum (or Minimum) k-Cut.

Reference: ``algo/src/main/java/org/neo4j/gds/approxmaxkcut/ApproxMaxKCut.java:47``
— GRASP: ``iterations`` restarts of (random placement → local search),
keeping the best-cost candidate; ``minimize`` flips max-k-cut to
min-k-cut; cost = Σ w(u,v) over relationships whose endpoints are in
different communities (counted per directed relationship, once).

Spark execution:
- placement: portable deterministic hash of (node, seed, restart) mod k —
  the distributed analog of PlaceNodesRandomly with a fixed seed;
- local search: each round computes, for every node and every community
  c, the incident weight w(v → members(c)) over the symmetrized edge set
  (one join + one (node, community) hash aggregate + a k-way explode —
  all whole-stage codegen, no UDFs), then moves nodes with a strictly
  improving best community. The reference's LocalSearch serializes moves
  through per-node locks; bulk-synchronous simultaneous moves can
  oscillate (two adjacent nodes swapping forever), so each round moves a
  deterministic pseudo-random HALF of the improvable nodes (hash of
  (node, round)) — any lockstep cycle breaks with geometric probability
  while staying fully reproducible. Converged when no node has an
  improving move (counted over ALL nodes in the same commit job).
  Both engines are heuristics for the same NP-hard objective with
  documented tie-breaks; cut costs are comparable, assignments need not
  bit-match (same contract as K1Coloring — any valid local optimum).
- unsupported reference knobs: ``vnsMaxNeighborhoodOrder`` (VNS random
  perturbation walk is sequential-stateful) and ``minCommunitySizes``
  (global cardinality locks); both raise if requested — no silent caps.
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
class MaxKCutResult:
    assignments: DataFrame  # (node_id long, community int)
    cut_cost: float
    restarts_run: int


def _cut_cost(edges: DataFrame, assign: DataFrame) -> float:
    a_src = assign.select(F.col("node").alias("src"), F.col("comm").alias("c_src"))
    a_dst = assign.select(F.col("node").alias("dst"), F.col("comm").alias("c_dst"))
    row = (
        edges.join(a_src, "src")
        .join(a_dst, "dst")
        .agg(
            F.sum(
                F.when(F.col("c_src") != F.col("c_dst"), F.col("weight")).otherwise(0.0)
            ).alias("cut")
        )
        .collect()[0]
    )
    return float(row["cut"] or 0.0)


def approx_max_k_cut(
    graph: LinkGraph,
    k: int = 2,
    iterations: int = 4,
    minimize: bool = False,
    local_rounds: int = 32,
    seed: int = 42,
    vns_max_neighborhood_order: int = 0,
    min_community_sizes: list[int] | None = None,
) -> MaxKCutResult:
    if vns_max_neighborhood_order:
        raise NotImplementedError(
            "VNS perturbation (vnsMaxNeighborhoodOrder > 0) is a sequential "
            "stateful walk with no bulk-synchronous analog; run more GRASP "
            "iterations instead"
        )
    if min_community_sizes:
        raise NotImplementedError(
            "minCommunitySizes needs global cardinality locks; unsupported"
        )
    spark = graph.edges.sparkSession
    e = graph.edges.select("src", "dst", F.col("weight").cast("double").alias("weight"))
    sym = e.select("src", "dst", "weight").union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    sym = sym.repartition(spark.sparkContext.defaultParallelism, "src").persist()
    sym.count()
    nodes = graph.node_ids().select(F.col("node_id").alias("node"))
    # all (node, community) option rows, built once
    options = nodes.select("node", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("c"))

    # For max-cut the best move MINIMIZES weight into the chosen community
    # (internal weight is what the cut loses); minimize flips it.
    pick_best = F.min if not minimize else F.max

    best_assign: DataFrame | None = None
    best_cost: float | None = None
    _mark = roundtrip_mark()
    for restart in range(int(iterations)):
        assign = nodes.select(
            "node",
            (
                F.abs(F.xxhash64(F.col("node"), F.lit(int(seed)), F.lit(restart))) % k
            ).cast("int").alias("comm"),
        )
        assign = materialize_roundtrip(assign, tag=f"maxkcut_r{restart}", keep_last=2)
        for rnd in range(int(local_rounds)):
            a_dst = assign.select(F.col("node").alias("dst"), F.col("comm").alias("nbr_comm"))
            w_to = (
                sym.join(a_dst, "dst")
                .groupBy(F.col("src").alias("node"), F.col("nbr_comm").alias("c"))
                .agg(F.sum("weight").alias("w"))
            )
            # Equal-weight choices tie-break by a per-(node, round) hash, not
            # by community id: two adjacent simultaneous movers would
            # otherwise deterministically pick the SAME empty community and
            # oscillate — decorrelated ties make the parity sweep converge
            # (the reference avoids this by serializing moves through locks).
            scored = (
                options.join(w_to, ["node", "c"], "left")
                .select("node", "c", F.coalesce(F.col("w"), F.lit(0.0)).alias("w"))
                .groupBy("node")
                .agg(
                    pick_best(
                        F.struct(
                            F.col("w"),
                            F.xxhash64(F.col("node"), F.col("c"), F.lit(rnd), F.lit(int(seed))).alias("tie"),
                            F.col("c"),
                        )
                    ).alias("m")
                )
                .select("node", F.col("m.c").alias("best_c"), F.col("m.w").alias("best_w"))
            )
            # own-community weight (0 when the node has no neighbor there)
            own_w = (
                assign.join(
                    w_to, (assign["node"] == w_to["node"]) & (assign["comm"] == w_to["c"]), "left"
                )
                .select(assign["node"].alias("node"), "comm", F.coalesce(F.col("w"), F.lit(0.0)).alias("own_w"))
            )
            # Random half per round, NOT id parity: a fixed parity class
            # lets two same-parity adjacent nodes co-move in lockstep every
            # round (deterministic oscillation — observed on the triangle
            # fixture); a fresh hash half each round breaks any such cycle
            # with geometric probability while keeping full determinism.
            movable = F.xxhash64(F.col("node"), F.lit(rnd), F.lit(int(seed) + 7)) % 2 == 0
            improving = (
                (F.col("best_w") < F.col("own_w")) if not minimize else (F.col("best_w") > F.col("own_w"))
            )
            obs = Observation()
            stepped = (
                own_w.join(scored, "node")
                .select(
                    "node",
                    F.when(movable & improving, F.col("best_c"))
                    .otherwise(F.col("comm"))
                    .cast("int")
                    .alias("comm"),
                    improving.alias("_improvable"),
                )
                .observe(
                    obs,
                    F.sum(F.when(F.col("_improvable"), 1).otherwise(0)).alias("improvable"),
                )
                .select("node", "comm")
            )
            assign = materialize_roundtrip(stepped, tag=f"maxkcut_r{restart}", keep_last=2)
            # Exact convergence: stop when NO node has an improving move —
            # counted over all nodes, not just this round's movable half,
            # so an unlucky half-draw can't end the search early.
            if int(obs.get.get("improvable") or 0) == 0:
                break
        cost = _cut_cost(e, assign)
        # maximize: keep the larger cut; minimize: keep the smaller.
        if best_cost is None or (cost > best_cost if not minimize else cost < best_cost):
            best_cost, best_assign = cost, assign
    sym.unpersist()

    out = materialize_roundtrip(
        best_assign.select(F.col("node").alias("node_id"), F.col("comm").alias("community")),
        tag="maxkcut_out",
    )
    roundtrip_release(_mark, keep=[out])
    return MaxKCutResult(assignments=out, cut_cost=float(best_cost), restarts_run=int(iterations))
