"""Indirect Exposure (reference
``algo/.../indirectExposure/IndirectExposureComputation.java``).

Reference semantics: sanctioned nodes start with exposure 1 (hop 0, root =
parent = self) and push to neighbors; every other node is visited ONCE —
on first contact it takes the MAX incoming exposure, divides by its own
total transfer volume, records (hop, parent, root of the winning sender),
and propagates once. A frontier/max-reducer Pregel, i.e. one join + one
windowed max per superstep here:

- messages carry ``exposure(parent) · w(edge)`` (the Pregel
  applyRelationshipWeight hook) over the UNDIRECTED projection (the
  reference test projects Orientation.UNDIRECTED);
- per-target best = MAX message (ties to the smaller sender — the
  deterministic stand-in for the reducer's arbitrary winner);
- visited gating via anti-join; new exposure = best message / total
  transfer volume (Σ edge weights over both directions);
- rounds = O(diameter); state round-tripped per level. Verified against
  IndirectExposureTest.java's golden exposures/hops/parents/roots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.pregel.superstep import (
    materialize_roundtrip,
    roundtrip_mark,
    roundtrip_release,
)


def indirect_exposure(
    graph: LinkGraph,
    sanctioned: DataFrame,
    max_iterations: int = 100,
) -> DataFrame:
    """(node_id, exposure, hop, parent, root); unreached nodes carry
    exposure 0.0 and null hop/parent/root (the UNDEFINED sentinel)."""
    spark = graph.edges.sparkSession
    _mark = roundtrip_mark()
    edges = graph.edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    # total transfer volume per node: Σ|w| over both directions.
    vol = (
        edges.select(F.col("src").alias("node"), F.abs("w").alias("w"))
        .union(edges.select(F.col("dst").alias("node"), F.abs("w").alias("w")))
        .groupBy("node")
        .agg(F.sum("w").alias("total"))
    )
    vol = materialize_roundtrip(vol, tag="expo_vol")
    und = materialize_roundtrip(
        edges.select("src", "dst", "w")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w")),
        tag="expo_und",
    )

    sanc = sanctioned.select(F.col(sanctioned.columns[0]).alias("node"))
    frontier = materialize_roundtrip(
        sanc.select(
            "node",
            F.lit(1.0).alias("exposure"),
            F.lit(0).alias("hop"),
            F.col("node").alias("parent"),
            F.col("node").alias("root"),
        ),
        tag="expo_f",
    )
    visited = frontier.select("node")
    results = [frontier]
    for hop in range(1, max_iterations + 1):
        msgs = (
            und.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("exposure") * F.col("w")).alias("msg"),
                F.col("src").alias("sender"),
                F.col("root").alias("par_root"),
            )
            .join(visited, ["node"], "left_anti")
        )
        w = Window.partitionBy("node").orderBy(F.desc("msg"), F.asc("sender"))
        best = (
            msgs.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .join(vol, "node", "left")
            .select(
                "node",
                (F.col("msg") / F.coalesce(F.col("total"), F.lit(1.0))).alias("exposure"),
                F.lit(hop).alias("hop"),
                F.col("sender").alias("parent"),
                F.col("par_root").alias("root"),
            )
        )
        frontier = materialize_roundtrip(best, tag="expo_f")
        if frontier.limit(1).count() == 0:
            break
        results.append(frontier)
        visited = materialize_roundtrip(
            visited.union(frontier.select("node")), tag="expo_v", keep_last=2
        )

    out = results[0]
    for r in results[1:]:
        out = out.union(r)
    out = materialize_roundtrip(out, tag="expo_out")
    roundtrip_release(_mark, keep=[out])
    nodes = graph.node_ids()
    return (
        nodes.join(out.withColumnRenamed("node", "node_id"), "node_id", "left")
        .select(
            "node_id",
            F.coalesce(F.col("exposure"), F.lit(0.0)).alias("exposure"),
            F.col("hop").cast("int").alias("hop"),
            "parent",
            "root",
        )
    )
