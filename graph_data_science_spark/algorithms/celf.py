"""CELF influence maximization (independent cascade).

Reference: ``algo/src/main/java/org/neo4j/gds/influenceMaximization/
CELF.java:36`` — greedy seed selection maximizing expected independent-
cascade spread, estimated over ``monteCarloSimulations`` live-edge draws
with ``propagationProbability``; CELF's lazy-forward queue avoids
re-evaluating marginal gains that cannot win.

Spark execution — the set-cover form of the SAME greedy:

In a fixed live-edge draw, IC reachability is monotone-additive:
``reach(A ∪ B) = reach(A) ∪ reach(B)``. So the expected spread of any
seed set is determined by each node's own reach set, computed ONCE:

1. live edges: ``(src, dst, sim)`` where a portable hash of
   (src, dst, sim, seed) draws < p — the deterministic distributed analog
   of the reference's per-simulation RNG; one frame for all simulations;
2. per-candidate reach sets ``R_v ⊆ (candidate, sim, node)``: one
   multi-source frontier fixpoint over ALL candidates and sims at once
   (join + distinct per round, O(diameter) rounds);
3. greedy: marginal gain of v given chosen set T is
   ``|R_v \\ covered|`` — one anti-join + count aggregate per of the k
   rounds; argmax with (gain desc, node asc) tie-break.

This computes the EXACT lazy-greedy result (CELF is an evaluation-order
optimization of the same argmax sequence) with k joins instead of the
reference's sequential queue — the distributed-friendly shape.

Scale knobs (both logged, no silent caps): ``candidate_pool_size`` keeps
the top-out-degree candidates (reach-state is candidates × sims × reach
rows); ``monte_carlo_simulations`` is the variance/cost dial.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.pregel.superstep import (
    materialize_roundtrip,
    roundtrip_mark,
    roundtrip_release,
)

logger = logging.getLogger(__name__)

_HASH_SPACE = float(1 << 32)


@dataclass
class CelfResult:
    # (node_id long, spread double) in selection order: spread = expected
    # cumulative cascade size after adding this seed (reference CELF
    # stream shape).
    seeds: DataFrame
    seed_list: list[int]


def celf(
    graph: LinkGraph,
    seed_set_size: int,
    monte_carlo_simulations: int = 100,
    propagation_probability: float = 0.1,
    seed: int = 42,
    candidate_pool_size: int | None = None,
    max_iterations: int = 64,
) -> CelfResult:
    spark = graph.edges.sparkSession
    k = int(seed_set_size)
    S = int(monte_carlo_simulations)

    candidates = graph.node_ids().select(F.col("node_id").alias("cand"))
    if candidate_pool_size is not None:
        pool = (
            graph.edges.groupBy(F.col("src").alias("cand"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .orderBy(F.desc("deg"), F.asc("cand"))
            .limit(int(candidate_pool_size))
            .select("cand")
        )
        # nodes outside the pool can still be REACHED, just not selected.
        logger.warning(
            "celf: candidate pool capped to top-%d out-degree nodes (of %d)",
            candidate_pool_size,
            graph.with_node_count(),
        )
        candidates = pool

    # Live-edge draws for all simulations at once.
    sims = spark.range(S).select(F.col("id").cast("int").alias("sim"))
    live = (
        graph.edges.select("src", "dst")
        .crossJoin(F.broadcast(sims))
        .filter(
            (F.abs(F.xxhash64(F.col("src"), F.col("dst"), F.col("sim"), F.lit(int(seed))))
             % (1 << 32)) / F.lit(_HASH_SPACE)
            < F.lit(float(propagation_probability))
        )
    )
    live = live.repartition(spark.sparkContext.defaultParallelism, "src").persist()
    live.count()

    _mark = roundtrip_mark()
    # Per-candidate reach fixpoint over (cand, sim, node).
    reach = candidates.crossJoin(F.broadcast(sims)).select(
        "cand", "sim", F.col("cand").alias("node")
    )
    reach = materialize_roundtrip(reach, tag="celf_reach", keep_last=2)
    frontier = reach
    for _ in range(max_iterations):
        step = (
            live.join(
                frontier.select("cand", "sim", F.col("node").alias("src")), ["sim", "src"]
            )
            .select("cand", "sim", F.col("dst").alias("node"))
            .distinct()
            .join(reach, ["cand", "sim", "node"], "left_anti")
        )
        obs = Observation()
        step = step.observe(obs, F.count(F.lit(1)).alias("n"))
        step = materialize_roundtrip(step, tag="celf_front", keep_last=2)
        if not int(obs.get.get("n") or 0):
            break
        reach = materialize_roundtrip(reach.union(step), tag="celf_reach", keep_last=2)
        frontier = step
    live.unpersist()

    # Greedy max-cover over the reach sets.
    chosen: list[int] = []
    spreads: list[float] = []
    covered = None  # (sim, node) already reached by the chosen set
    remaining = reach
    total_covered = 0
    for _ in range(k):
        gains = remaining if covered is None else remaining.join(
            covered, ["sim", "node"], "left_anti"
        )
        top = (
            gains.groupBy("cand")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.desc("gain"), F.asc("cand"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        best, gain = int(top[0]["cand"]), int(top[0]["gain"])
        chosen.append(best)
        total_covered += gain
        spreads.append(total_covered / S)
        best_reach = reach.filter(F.col("cand") == best).select("sim", "node")
        covered = materialize_roundtrip(
            best_reach if covered is None else covered.union(best_reach).distinct(),
            tag="celf_cov",
            keep_last=2,
        )
        remaining = remaining.filter(F.col("cand") != best)

    seeds = spark.createDataFrame(
        list(zip(chosen, spreads)), "node_id long, spread double"
    )
    seeds = materialize_roundtrip(seeds, tag="celf_out")
    roundtrip_release(_mark, keep=[seeds])
    return CelfResult(seeds=seeds, seed_list=chosen)
