"""Strongly connected components (reference ``algo/.../scc/Scc.java:36``).

GDS runs sequential Tarjan — a depth-first stack walk with no distributed
analog. The shuffle re-expression is the standard coloring SCC
(Orzan's FB-coloring, the textbook Pregel/MapReduce SCC):

outer round (until no nodes remain):
  1. **trim**: nodes with no in-edges or no out-edges in the remaining
     subgraph are singleton SCCs — peel to fixpoint (this alone resolves
     all of a DAG);
  2. **color**: propagate ``color(v) = max(v, max_{u→v} color(u))`` to
     fixpoint (O(diameter) rounds of join + max-agg) — v's color becomes
     the largest remaining node id that can reach it;
  3. **capture**: each color root (node id == its color) does a *backward*
     reachability restricted to its own color class; everything reached is
     exactly the root's SCC — assign component = root id and remove.

Every step is Catalyst joins/aggregates over the edge table with
localCheckpoint lineage truncation per round. Component id = the maximum
node id of the component (deterministic; relabel downstream for a min-id
convention). Worst case O(diameter) inner rounds × O(#distinct SCC
'levels') outer rounds — the accepted distributed trade for losing
Tarjan's stack.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.pregel.superstep import (
    free_checkpointed,
    materialize_roundtrip,
    roundtrip_mark,
    roundtrip_release,
)


@dataclass
class SccResult:
    components: DataFrame  # (node_id long, component long)
    outer_rounds: int


def _ckpt(df: DataFrame) -> DataFrame:
    """Parquet round-trip — each SCC round references the previous round's
    frames several times under joins; see
    pregel.superstep.materialize_roundtrip for why localCheckpoint (stats
    blow-up) and persist (analyzer tree blow-up) both fail that shape."""
    return materialize_roundtrip(df, tag="scc")


def scc(graph: LinkGraph, max_outer_rounds: int = 1000) -> SccResult:
    spark = graph.edges.sparkSession
    _mark = roundtrip_mark()
    live_edges = _ckpt(
        graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    )
    live_nodes = _ckpt(graph.node_ids().select(F.col("node_id").alias("node")))
    assigned: list[DataFrame] = []
    rounds = 0

    while rounds < max_outer_rounds and live_nodes.limit(1).count() > 0:
        rounds += 1

        # -- 1. trim singleton SCCs to fixpoint -----------------------------
        while True:
            has_out = live_edges.select(F.col("src").alias("node")).distinct()
            has_in = live_edges.select(F.col("dst").alias("node")).distinct()
            keep = _ckpt(live_nodes.join(has_out, "node", "left_semi").join(has_in, "node", "left_semi"))
            trimmed = _ckpt(live_nodes.join(keep, "node", "left_anti"))
            if trimmed.limit(1).count() == 0:
                free_checkpointed(trimmed)
                free_checkpointed(live_nodes)
                live_nodes = keep
                break
            assigned.append(
                trimmed.select(F.col("node").alias("node_id"), F.col("node").alias("component"))
            )
            free_checkpointed(live_nodes)
            live_nodes = keep
            new_edges = _ckpt(
                live_edges.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
                .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
                .select("src", "dst")
            )
            free_checkpointed(live_edges)
            live_edges = new_edges
        if live_nodes.limit(1).count() == 0:
            break

        # -- 2. forward max-color propagation to fixpoint -------------------
        color = _ckpt(live_nodes.select("node", F.col("node").alias("color")))
        while True:
            msgs = (
                live_edges.join(color, live_edges["src"] == color["node"], "inner")
                .groupBy(F.col("dst").alias("n"))
                .agg(F.max("color").alias("in_color"))
            )
            obs = Observation()
            new_color = (
                color.join(msgs, color["node"] == msgs["n"], "left")
                .select(
                    "node",
                    F.greatest(F.col("color"), F.coalesce(F.col("in_color"), F.col("color"))).alias("color"),
                    (F.coalesce(F.col("in_color"), F.lit(-1)) > F.col("color")).alias("_chg"),
                )
                .observe(obs, F.sum(F.when(F.col("_chg"), 1).otherwise(0)).alias("changed"))
                .select("node", "color")
            )
            new_color = _ckpt(new_color)
            free_checkpointed(color)
            color = new_color
            if not int(obs.get.get("changed") or 0):
                break

        # -- 3. backward capture within each color class --------------------
        reached = _ckpt(color.filter(F.col("node") == F.col("color")))  # the roots
        frontier = reached
        while frontier.limit(1).count() > 0:
            preds = (
                live_edges.join(
                    frontier.select(F.col("node").alias("dst"), F.col("color").alias("fcolor")),
                    "dst",
                )
                .select(F.col("src").alias("node"), F.col("fcolor"))
                .distinct()
            )
            cand = (
                preds.join(color, "node")
                .filter(F.col("color") == F.col("fcolor"))
                .select("node", "color")
                .distinct()
            )
            frontier = _ckpt(cand.join(reached, "node", "left_anti"))
            if frontier.limit(1).count() == 0:
                break
            reached = _ckpt(reached.union(frontier))
        assigned.append(
            reached.select(F.col("node").alias("node_id"), F.col("color").alias("component"))
        )

        # -- remove captured nodes and their edges --------------------------
        new_nodes = _ckpt(live_nodes.join(reached, "node", "left_anti"))
        free_checkpointed(live_nodes)
        live_nodes = new_nodes
        rm_src = reached.select(F.col("node").alias("src"))
        rm_dst = reached.select(F.col("node").alias("dst"))
        new_edges = _ckpt(
            live_edges.join(rm_src, "src", "left_anti").join(rm_dst, "dst", "left_anti")
        )
        free_checkpointed(live_edges)
        live_edges = new_edges
        free_checkpointed(color)

    if not assigned:
        components = spark.createDataFrame([], "node_id long, component long")
    else:
        components = assigned[0]
        for part in assigned[1:]:
            components = components.union(part)
        components = materialize_roundtrip(components, tag="scc_out")
    roundtrip_release(_mark, keep=[components])
    return SccResult(components=components, outer_rounds=rounds)
