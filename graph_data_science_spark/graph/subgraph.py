"""Subgraph filtering + graph sampling.

- Subgraph filter (reference ``subgraph-filtering/.../GraphStoreFilter.java``
  + the expression AST under ``expression/Expression.java:113-541``): GDS
  parses a small predicate language over node/relationship properties and
  builds a filtered, re-densified graph store. Catalyst IS that expression
  engine here — filters are Spark SQL boolean expressions over the vertex /
  edge tables; the operator's real job is the re-densify + closure step
  (drop edges with a filtered endpoint, optionally remap ids).
- Random-walk-with-restarts sampling (reference
  ``graph-sampling/.../rwr/RandomWalkWithRestarts.java``): sample a node
  set by restarting deterministic walks from seed nodes until the target
  fraction is reached, then induce the subgraph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.graph.ids import dense_ids


def subgraph_filter(
    graph: LinkGraph,
    node_filter: str = "true",
    relationship_filter: str = "true",
    redensify: bool = False,
) -> LinkGraph:
    """Filtered LinkGraph: nodes where ``node_filter`` (a Spark SQL boolean
    expression over the vertex table's columns) holds, edges where
    ``relationship_filter`` (over src/dst/weight + any extra edge columns)
    holds AND both endpoints survive. ``redensify=True`` remaps surviving
    node ids to a dense [0, n) space (the GDS IdMap rebuild), returning a
    graph whose vertices carry ``original_id``."""
    vertices = graph.vertices
    if vertices is None:
        vertices = graph.node_ids()
    keep_nodes = vertices.filter(F.expr(node_filter)).select("node_id").distinct()
    edges = (
        graph.edges.filter(F.expr(relationship_filter))
        .join(keep_nodes.withColumnRenamed("node_id", "src"), "src", "left_semi")
        .join(keep_nodes.withColumnRenamed("node_id", "dst"), "dst", "left_semi")
    )
    if not redensify:
        kept_vertices = vertices.join(keep_nodes, "node_id", "left_semi")
        return LinkGraph(edges=edges, vertices=kept_vertices)
    idmap = dense_ids(keep_nodes.withColumnRenamed("node_id", "original_id"), ["original_id"])
    new_edges = (
        edges.join(idmap.select(F.col("original_id").alias("src"), F.col("node_id").alias("_ns")), "src")
        .join(idmap.select(F.col("original_id").alias("dst"), F.col("node_id").alias("_nd")), "dst")
        .select(
            F.col("_ns").alias("src"),
            F.col("_nd").alias("dst"),
            *[c for c in edges.columns if c not in ("src", "dst")],
        )
    )
    n = idmap.count()
    return LinkGraph(edges=new_edges, vertices=idmap.select("node_id", "original_id"), node_count=n)


def rwr_sample(
    graph: LinkGraph,
    start_nodes: DataFrame,
    sample_fraction: float = 0.15,
    restart_probability: float = 0.1,
    random_seed: int = 42,
    max_rounds: int = 100,
) -> LinkGraph:
    """Random-walk-with-restarts node sampling + induced subgraph.

    Deterministic frontier variant of RandomWalkWithRestarts.java: each
    round every frontier walker either restarts (hash draw <
    restart_probability) or steps to a hash-picked out-neighbor; every
    visited node joins the sample; stop at ``sample_fraction`` of the node
    count (or when walks die out)."""
    from pyspark.sql import Window

    spark = graph.edges.sparkSession
    n = graph.node_ids().count()
    target = max(1, int(sample_fraction * n))

    w = Window.partitionBy("src").orderBy("dst")
    adj = (
        graph.edges.select("src", "dst").distinct()
        .withColumn("r", F.row_number().over(w))
        .withColumn("deg", F.count("*").over(Window.partitionBy("src")))
        .persist()
    )
    adj.count()
    degs = adj.select("src", "deg").distinct()

    starts = start_nodes.select(F.col(start_nodes.columns[0]).alias("start"))
    cur = starts.select("start", F.col("start").alias("node"))
    sample = cur.select("node").distinct().localCheckpoint(eager=True)
    for rnd in range(1, max_rounds + 1):
        if sample.count() >= target:
            break
        draw = F.pmod(
            F.xxhash64(F.lit(int(random_seed)), F.col("start"), F.col("node"), F.lit(rnd)),
            F.lit(1_000_000),
        ) / 1_000_000.0
        restart = draw < F.lit(float(restart_probability))
        stepped = (
            cur.join(degs, cur["node"] == degs["src"], "left")
            .select(
                "start",
                F.when(restart | F.col("deg").isNull(), F.col("start")).otherwise(F.col("node")).alias("node"),
                F.when(restart | F.col("deg").isNull(), F.lit(None).cast("long")).otherwise(
                    F.pmod(
                        F.xxhash64(F.lit(int(random_seed) + 1), F.col("start"), F.col("node"), F.lit(rnd)),
                        F.col("deg"),
                    )
                    + 1
                ).alias("_pick"),
            )
        )
        moved = (
            stepped.filter(F.col("_pick").isNotNull())
            .join(adj, (stepped["node"] == adj["src"]) & (adj["r"] == stepped["_pick"]))
            .select("start", F.col("dst").alias("node"))
        )
        restarted = stepped.filter(F.col("_pick").isNull()).select("start", "node")
        cur = moved.union(restarted).localCheckpoint(eager=True)
        sample = sample.union(cur.select("node")).distinct().localCheckpoint(eager=True)

    induced = (
        graph.edges.join(sample.withColumnRenamed("node", "src"), "src", "left_semi")
        .join(sample.withColumnRenamed("node", "dst"), "dst", "left_semi")
    )
    adj.unpersist()
    return LinkGraph(edges=induced, vertices=sample.select(F.col("node").alias("node_id")))
