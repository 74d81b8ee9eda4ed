"""K-1 Coloring (reference ``algo/.../k1coloring/K1Coloring.java:65``).

GDS semantics: greedy iterative coloring of the undirected graph — every
node picks the smallest color not used by its neighbors; conflicting
adjacent equal colors are resolved by letting ONE side keep the color and
marking the other dirty for the next round (``ColoringStep.java`` /
``ValidationStep.java``); terminates when no conflicts remain. The result
is a valid proper coloring (not necessarily minimal — same contract as the
reference).

Spark re-expression, one round = two Catalyst passes:

1. recolor the dirty set: ``mex`` (minimum excluded value) of each dirty
   node's neighbor colors, computed as a whole-column expression —
   ``aggregate(array_sort(collect_set(nbr_color)), 0, (acc, x) → acc +
   (x = acc))`` — no UDF; per-group memory is bounded by max degree,
   the same bound the reference's per-node bitset has;
2. validate: any remaining edge with equal endpoint colors marks the
   *higher* node id dirty (deterministic tiebreak, mirroring the
   reference's "keep the lower id" rule).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph, to_undirected
from graph_data_science_spark.pregel.superstep import materialize_roundtrip


@dataclass
class ColoringResult:
    colors: DataFrame  # (node_id long, color long)
    ran_iterations: int
    did_converge: bool


def k1coloring(graph: LinkGraph, max_iterations: int = 100) -> ColoringResult:
    spark = graph.edges.sparkSession
    und = (
        to_undirected(graph.edges.select("src", "dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(spark.sparkContext.defaultParallelism, "src")
        .persist()
    )
    und.count()

    nodes = graph.node_ids().select(F.col("node_id").alias("node"))
    # Parquet round-trip per round — the validation pass references colors
    # twice per round; see pregel.superstep.materialize_roundtrip.
    colors = materialize_roundtrip(
        nodes.select("node", F.lit(0).cast("long").alias("color")), tag="k1c", keep_last=2
    )
    dirty = colors.select("node")  # everyone recolors in round 1

    # mex of a sorted distinct color array: fold acc+1 on every exact match.
    def _mex(arr):
        return F.aggregate(
            F.array_sort(arr), F.lit(0).cast("long"),
            lambda acc, x: F.when(x == acc, acc + 1).otherwise(acc),
        )

    converged = False
    it = 0
    for it in range(1, max_iterations + 1):
        # 1. recolor dirty nodes to the mex of their neighbors' colors.
        nbr_colors = (
            und.join(dirty.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(colors.select(F.col("node").alias("dst"), F.col("color").alias("c")), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(_mex(F.collect_set("c")).alias("new_color"))
        )
        recolored = (
            colors.join(nbr_colors, "node", "left")
            .select("node", F.coalesce(F.col("new_color"), F.col("color")).alias("color"))
        )
        colors = materialize_roundtrip(recolored, tag="k1c", keep_last=2)

        # 2. validate: equal-colored edges re-dirty the higher endpoint.
        a = colors.select(F.col("node").alias("src"), F.col("color").alias("ca"))
        b = colors.select(F.col("node").alias("dst"), F.col("color").alias("cb"))
        obs = Observation()
        conflicts = (
            und.join(a, "src").join(b, "dst")
            .filter((F.col("ca") == F.col("cb")) & (F.col("src") > F.col("dst")))
            .select(F.col("src").alias("node"))
            .distinct()
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        dirty = materialize_roundtrip(conflicts, tag="k1c_dirty", keep_last=2)
        if not int(obs.get.get("n") or 0):
            converged = True
            break

    und.unpersist()
    return ColoringResult(
        colors=colors.select(F.col("node").alias("node_id"), "color"),
        ran_iterations=it,
        did_converge=converged,
    )
