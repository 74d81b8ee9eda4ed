"""Link-prediction topology measures (reference
``alpha/alpha-proc/.../linkprediction/LinkPredictionFunc.java:38-120`` +
``NeighborsFinder.java:41-70``).

The reference exposes these as per-pair Cypher functions; the engine-shaped
equivalent is one DataFrame operator that scores a whole *pairs table* in a
single pass — the form a link-prediction candidate-generation job actually
needs at scale. For each (node1, node2) pair:

- ``common_neighbors``      |N(a) ∩ N(b)|
- ``adamic_adar``           Σ_z∈N(a)∩N(b) 1/ln(deg(z))
- ``resource_allocation``   Σ_z∈N(a)∩N(b) 1/deg(z)
- ``preferential_attachment`` deg(a) · deg(b)
- ``total_neighbors``       |N(a) ∪ N(b)| = deg(a) + deg(b) − |N(a)∩N(b)|
- ``same_community``        1.0 if community(a) == community(b) (optional)

Neighbor semantics follow ``NeighborsFinder``: neighbor sets are *distinct*
nodes, self-loops excluded, and for direction ``both`` an edge in either
orientation makes a neighbor. ``findCommonNeighbors``'s flipped-direction
edge check reduces to z ∈ N_dir(a) ∩ N_dir(b) for every direction (and z can
never equal a or b because findNeighbors drops the node itself), so the set
algebra above is exact. deg(x) = |N_dir(x)| — the reference's
``degree(node, direction)`` counts relationships, which coincides on the
deduplicated simple graphs a LinkGraph models (documented deviation for
multigraphs).

Shuffle shape (100 TB): two hash joins of the pairs table against the
neighbor list (key = node id, AQE-skew-splittable), one pair aggregation,
plus two broadcast-or-shuffle joins for the per-node degrees. Never
all-pairs: the caller supplies the candidate pairs (typically LSH buckets or
same-community blocking — see ``datapipe/``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph


def _neighbors(graph: LinkGraph, direction: str) -> DataFrame:
    """(node, nbr) distinct pairs under the direction; self-loops dropped."""
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if direction == "outgoing":
        n = e.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
    elif direction == "incoming":
        n = e.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
    elif direction == "both":
        n = e.select(F.col("src").alias("node"), F.col("dst").alias("nbr")).union(
            e.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
        )
    else:
        raise ValueError(f"unknown direction {direction!r}")
    return n.distinct()


def link_prediction(
    graph: LinkGraph,
    pairs: DataFrame,
    direction: str = "both",
    community: DataFrame | None = None,
) -> DataFrame:
    """Score every (node1, node2) pair in ``pairs`` with the five topology
    measures (plus ``same_community`` when a (node_id, community) frame is
    given). Pairs whose endpoints are equal score 0 on the intersection
    measures and |N(a)| on total_neighbors, matching the reference's
    ``node1.equals(node2) → emptySet`` guard."""
    p = pairs.select(
        F.col(pairs.columns[0]).alias("node1"), F.col(pairs.columns[1]).alias("node2")
    )
    nbr = _neighbors(graph, direction)
    deg = nbr.groupBy("node").agg(F.count("*").alias("deg"))

    # z ∈ N(node1) ∩ N(node2), aggregated per pair with deg(z) folded in.
    za = nbr.select(F.col("node").alias("node1"), F.col("nbr").alias("z"))
    zb = nbr.select(F.col("node").alias("node2"), F.col("nbr").alias("z"))
    zd = deg.select(F.col("node").alias("z"), F.col("deg").alias("zdeg"))
    inter = (
        p.filter(F.col("node1") != F.col("node2"))
        .join(za, "node1")
        .join(zb, ["node2", "z"])
        .join(zd, "z")
        .groupBy("node1", "node2")
        .agg(
            F.count("*").cast("double").alias("common_neighbors"),
            # zdeg == 1 → 1/ln(1) = +Infinity, the reference's Java result;
            # Spark's ANSI mode would raise DIVIDE_BY_ZERO instead.
            F.sum(
                F.when(F.col("zdeg") == 1, F.lit(float("inf"))).otherwise(
                    1.0 / F.log("zdeg")
                )
            ).alias("adamic_adar"),
            F.sum(1.0 / F.col("zdeg")).alias("resource_allocation"),
        )
    )

    d1 = deg.select(F.col("node").alias("node1"), F.col("deg").alias("deg1"))
    d2 = deg.select(F.col("node").alias("node2"), F.col("deg").alias("deg2"))
    out = (
        p.join(d1, "node1", "left")
        .join(d2, "node2", "left")
        .join(inter, ["node1", "node2"], "left")
        .select(
            "node1",
            "node2",
            F.coalesce("common_neighbors", F.lit(0.0)).alias("common_neighbors"),
            F.coalesce("adamic_adar", F.lit(0.0)).alias("adamic_adar"),
            F.coalesce("resource_allocation", F.lit(0.0)).alias("resource_allocation"),
            (
                F.coalesce("deg1", F.lit(0)).cast("double")
                * F.coalesce("deg2", F.lit(0)).cast("double")
            ).alias("preferential_attachment"),
            F.when(
                F.col("node1") == F.col("node2"),
                F.coalesce("deg1", F.lit(0)).cast("double"),
            )
            .otherwise(
                F.coalesce("deg1", F.lit(0)).cast("double")
                + F.coalesce("deg2", F.lit(0)).cast("double")
                - F.coalesce("common_neighbors", F.lit(0.0))
            )
            .alias("total_neighbors"),
        )
    )
    if community is not None:
        c = community.select(
            F.col(community.columns[0]).alias("_cn"), F.col(community.columns[1]).alias("_cc")
        )
        out = (
            out.join(c.withColumnRenamed("_cn", "node1").withColumnRenamed("_cc", "_c1"), "node1", "left")
            .join(c.withColumnRenamed("_cn", "node2").withColumnRenamed("_cc", "_c2"), "node2", "left")
            .withColumn(
                "same_community",
                F.when(
                    F.col("_c1").isNotNull() & (F.col("_c1") == F.col("_c2")), F.lit(1.0)
                ).otherwise(F.lit(0.0)),
            )
            .drop("_c1", "_c2")
        )
    return out
