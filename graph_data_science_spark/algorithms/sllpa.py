"""Speaker-Listener LPA — overlapping communities
(reference ``algo/.../sllpa/SpeakerListenerLPAComputation.java``).

Reference semantics:
- every node keeps a label memory, seeded with its own id (init + the
  "votes for itself when no in-edges" rule, :24-28);
- superstep 0: send own id to neighbors (:11-13);
- supersteps 1..propagationSteps: **listen** — memory slot[superstep] =
  most frequent incoming label, ties to the smaller label (:44-64); then
  **speak** — to EACH neighbor independently, send a uniformly random slot
  of the memory filled so far (:66-72);
- final superstep: listen, then **prune** — keep labels whose relative
  frequency in the memory is > minAssociationStrength (default 0.2,
  SpeakerListenerLPAConfig), the node's (overlapping) community set
  (:74-141). propagationSteps = maxIterations − 1.

Spark re-expression: the per-edge random draw becomes
``hash(seed, src, dst, step) mod (step+1)`` — the same uniform choice,
but reproducible under any partitioning (GDS itself is seedable for tests).
``rng="xxhash"`` (default) uses the JVM xxhash64; ``rng="portable"`` uses
an md5-derived hash that replays bit-identically in ANSI SQL, so the whole
multi-step run (including every random draw) is oracle-checkable against
DuckDB — the same trick as walks.py's portable mode.
Memory is an array column extended by one slot per superstep; the listen
step is one join + count aggregate + top-1 window; the speak draw is a pure
column expression over the edge table. State is round-tripped per superstep
(multi-reference loop — see pregel.superstep.materialize_roundtrip).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.pregel.superstep import materialize_roundtrip


@dataclass
class SllpaResult:
    communities: DataFrame  # (node_id long, community_ids array<long>)
    ran_iterations: int


def speaker_listener_lpa(
    graph: LinkGraph,
    max_iterations: int = 10,
    min_association_strength: float = 0.2,
    random_seed: int = 42,
    rng: str = "xxhash",
) -> SllpaResult:
    spark = graph.edges.sparkSession
    edges = graph.edges.select("src", "dst").persist()
    edges.count()
    nodes = graph.node_ids().select(F.col("node_id").alias("node"))

    # memory[0] = own id; one slot appended per listen step. The reference
    # pre-fills every slot with the node id, so a slot that receives no
    # messages keeps the node's own vote — replicated via coalesce below.
    state = materialize_roundtrip(
        nodes.select("node", F.array(F.col("node")).alias("labels")), tag="sllpa", keep_last=2
    )

    propagation_steps = max_iterations - 1
    for step in range(1, propagation_steps + 1):
        # speak: each edge (u→v) carries a uniform slot of u's memory.
        if rng == "portable":
            payload = F.concat_ws(
                ":",
                F.lit(str(int(random_seed))),
                F.col("src").cast("string"),
                F.col("dst").cast("string"),
                F.lit(str(step)),
            )
            draw = F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")
        else:
            draw = F.xxhash64(F.lit(int(random_seed)), F.col("src"), F.col("dst"), F.lit(step))
        pick = (F.pmod(draw, F.size(F.col("labels"))) + 1).cast("int")
        sent = (
            edges.join(state.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst"), F.element_at(F.col("labels"), pick).alias("lbl"))
        )
        # listen: most frequent incoming label, ties to the smaller label.
        w = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("lbl"))
        winners = (
            sent.groupBy("dst", "lbl").agg(F.count("*").alias("cnt"))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(F.col("dst").alias("node"), F.col("lbl").alias("win"))
        )
        state = materialize_roundtrip(
            state.join(winners, "node", "left").select(
                "node",
                F.concat(
                    F.col("labels"), F.array(F.coalesce(F.col("win"), F.col("node")))
                ).alias("labels"),
            ),
            tag="sllpa",
            keep_last=2,
        )

    # prune: labels with relative frequency > threshold form the node's
    # overlapping community set.
    exploded = state.select("node", F.explode("labels").alias("lbl"), F.size("labels").alias("n"))
    kept = (
        exploded.groupBy("node", "lbl", "n")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") / F.col("n") > F.lit(float(min_association_strength)))
        .groupBy("node")
        .agg(F.array_sort(F.collect_list("lbl")).alias("community_ids"))
    )
    out = nodes.join(kept, "node", "left").select(
        F.col("node").alias("node_id"),
        F.coalesce(F.col("community_ids"), F.array().cast("array<bigint>")).alias("community_ids"),
    )
    edges.unpersist()
    return SllpaResult(communities=out, ran_iterations=max_iterations)
