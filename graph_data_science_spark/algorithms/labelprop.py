"""Label Propagation (reference ``algo/.../labelpropagation/LabelPropagation.java``).

Vote semantics per GDS:

- node v collects votes from the **targets of its out-edges** in the
  projected orientation; each vote's weight is
  ``edge weight × nodeWeight(target)``
  (``ComputeStepConsumer.java:49-58``);
- the adopted label maximizes total vote weight, ties resolve to the
  **smaller label id** (``ComputeStepConsumer.java:64-77``);
- initial label: ``seed`` value when a seed property is given, else
  ``maxSeedId + node_id + 1`` (``InitStep.java:72-74``); with no seeds at
  all the label is the node id (constant offsets don't affect partitions);
- converged when no node changed; default maxIterations 10
  (``LabelPropagationBaseConfig.java:40``).

GDS updates a shared label array **asynchronously in batch order**
(``ComputeStep.java:80-90``, ``LabelPropagation.java:113-131``) — an
order-dependent semantics with no shared-memory analog on a cluster. Two
modes here:

- ``mode="sync"`` (default, fully distributed): two-wave synchronous LPA —
  each iteration updates nodes with even ids first (from current labels),
  then odd ids (seeing the even wave's updates). Each wave is a join + vote
  aggregation + per-node argmax window. The half-step ordering is the
  shared-nothing analog of GDS's batch-ordered async updates: it breaks the
  2-cycle oscillations pure synchronous LPA exhibits on bipartite-ish
  structures (SURVEY.md §7.3) while staying deterministic and fully
  partition-parallel. It reaches the same converged community *partitions*
  GDS's own tests assert (``LabelPropagationTest.java:172-187``); per-node
  label trajectories can differ mid-run; maxIterations caps like GDS.
- ``mode="gds_sequential"`` (compatibility/testing, small graphs only):
  exact emulation of GDS concurrency=1 batch-order async updates, for
  bit-exact parity with seeded fixtures (``LabelPropagationTest.java:108-129``).
  This intentionally runs on the driver and is guarded to ≤100k nodes —
  it exists to *verify* semantics, not to process data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.pregel.spmv import (
    detect_hot_sources,
    prep_edges_sql_salted,
    replicate_state_for_salts,
)
from graph_data_science_spark.pregel.superstep import SuperstepLoop, edge_lineage


@dataclass
class LabelPropResult:
    labels: DataFrame  # (node_id long, label long)
    ran_iterations: int
    did_converge: bool


def _initial_labels(graph: LinkGraph, seed_col: str | None) -> DataFrame:
    nodes = graph.node_ids()
    if seed_col is not None and graph.vertices is not None and seed_col in graph.vertices.columns:
        seeds = graph.vertices.select("node_id", F.col(seed_col).cast("long").alias("seed"))
        max_seed = seeds.agg(F.max("seed").alias("m")).collect()[0]["m"] or 0
        return seeds.select(
            "node_id",
            F.coalesce(F.col("seed"), F.col("node_id") + F.lit(int(max_seed) + 1)).alias("label"),
        )
    return nodes.select("node_id", F.col("node_id").alias("label"))


def label_propagation(
    graph: LinkGraph,
    max_iterations: int = 10,
    seed_col: str | None = None,
    node_weight_col: str | None = None,
    mode: str = "sync",
    checkpoint_dir: str | None = None,
    hot_degree_threshold: int = 2_000_000,
) -> LabelPropResult:
    if mode == "gds_sequential":
        return _label_propagation_sequential(graph, max_iterations, seed_col, node_weight_col)

    spark = graph.edges.sparkSession
    edges = graph.edges.select("src", "dst", F.col("weight").cast("double").alias("weight"))
    if node_weight_col is not None and graph.vertices is not None:
        nw = graph.vertices.select(
            F.col("node_id").alias("dst"), F.col(node_weight_col).cast("double").alias("node_w")
        )
        edges = edges.join(nw, "dst", "left").withColumn(
            "weight", F.col("weight") * F.coalesce(F.col("node_w"), F.lit(1.0))
        ).drop("node_w")
    edges = edges.repartition(spark.sparkContext.defaultParallelism, "dst").persist()
    edges.count()
    # LPA pulls: the vote gather joins edges to labels on DST, so a hot
    # in-degree hub is the straggler here — salt its edges on src-hash
    # (same fix as the rank loops'/WCC's src-keyed salting; votes are a
    # sum-by-(src,label) aggregate, which recombines exactly).
    hot = detect_hot_sources(edges, hot_degree_threshold, key="dst")
    if hot is not None:
        salted = prep_edges_sql_salted(edges, hot, key="dst", spread="src")
        edges.unpersist()
        edges = salted

    loop = SuperstepLoop(
        spark,
        "labelprop",
        checkpoint_dir,
        lineage=edge_lineage(
            graph.edges,
            params={"algo": "labelprop", "seed_col": seed_col, "node_weight_col": node_weight_col},
            content_sample=checkpoint_dir is not None,
        ),
    )
    labels = loop.commit(_initial_labels(graph, seed_col).select(F.col("node_id").alias("node"), "label"), 0, {})

    def wave(labels_df: DataFrame, parity: int) -> DataFrame:
        # Gather votes from out-neighbors: label(dst) weighted by edge weight,
        # updating only nodes with node_id % 2 == parity.
        if hot is None:
            gathered = edges.join(labels_df, edges["dst"] == labels_df["node"], "inner")
        else:
            lab_s = replicate_state_for_salts(labels_df.select("node", "label"), hot)
            gathered = edges.join(
                lab_s,
                (edges["dst"] == lab_s["node"]) & (edges["salt"] == lab_s["salt"]),
                "inner",
            )
        votes = (
            gathered
            .filter(F.pmod(F.col("src"), F.lit(2)) == parity)
            .groupBy(F.col("src").alias("n"), F.col("label").alias("cand"))
            .agg(F.sum("weight").alias("vote"))
        )
        w = Window.partitionBy("n").orderBy(F.desc("vote"), F.asc("cand"))
        winners = votes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).select(
            "n", F.col("cand").alias("new_label")
        )
        return labels_df.join(winners, labels_df["node"] == winners["n"], "left").select(
            "node",
            F.col("label").alias("old_label"),
            F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
        )

    def changed_obs(df: DataFrame):
        obs = Observation()
        return obs, df.observe(
            obs, F.sum(F.when(F.col("label") != F.col("old_label"), 1).otherwise(0)).alias("changed")
        )

    converged, it = False, 0
    for it in range(1, max_iterations + 1):
        obs1, half = changed_obs(wave(labels, 0))
        half = loop.commit(half.select("node", "label"), 2 * it - 1, observation=obs1)
        obs2, full = changed_obs(wave(half, 1))
        labels = loop.commit(full.select("node", "label"), 2 * it, observation=obs2)
        if not ((obs1.get.get("changed") or 0) + (obs2.get.get("changed") or 0)):
            converged = True
            break

    edges.unpersist()
    return LabelPropResult(
        labels=labels.select(F.col("node").alias("node_id"), "label"),
        ran_iterations=it,
        did_converge=converged,
    )


def _label_propagation_sequential(
    graph: LinkGraph,
    max_iterations: int,
    seed_col: str | None,
    node_weight_col: str | None,
) -> LabelPropResult:
    """GDS concurrency=1 parity mode: in-id-order async updates (driver-side,
    guarded small). Exists for fixture-exact verification only."""
    import numpy as np

    n = graph.with_node_count()
    if n > 100_000:
        raise ValueError("gds_sequential mode is a parity/testing mode; use mode='sync' at scale")

    init = {r["node_id"]: r["label"] for r in _initial_labels(graph, seed_col).collect()}
    labels = np.array([init.get(v, v) for v in range(n)], dtype=np.int64)
    nw = np.ones(n)
    if node_weight_col is not None and graph.vertices is not None:
        for r in graph.vertices.select("node_id", node_weight_col).collect():
            nw[r["node_id"]] = float(r[node_weight_col] or 1.0)
    adj: dict[int, list[tuple[int, float]]] = {}
    for r in graph.edges.collect():
        adj.setdefault(int(r["src"]), []).append((int(r["dst"]), float(r["weight"])))

    converged, it = False, 0
    for it in range(1, max_iterations + 1):
        changed = 0
        for v in range(n):  # batch order, async shared-array update (GDS ComputeStep.java:80-90)
            outs = adj.get(v)
            if not outs:
                continue
            votes: dict[int, float] = {}
            for t, w in outs:
                lbl = int(labels[t])
                votes[lbl] = votes.get(lbl, 0.0) + w * nw[t]
            best = min(votes, key=lambda k: (-votes[k], k))  # max vote, tie → smaller label
            if best != labels[v]:
                labels[v] = best
                changed += 1
        if changed == 0:
            converged = True
            break

    spark = graph.edges.sparkSession
    out = spark.createDataFrame(
        [(int(v), int(labels[v])) for v in range(n)], "node_id long, label long"
    )
    return LabelPropResult(labels=out, ran_iterations=it, did_converge=converged)
