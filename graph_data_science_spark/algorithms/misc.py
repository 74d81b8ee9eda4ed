"""Smaller GDS community/structure operators as pure DataFrame algebra.

- modularity    (reference ``algo/.../modularity/ModularityCalculator.java:39``)
- conductance   (reference ``algo/.../conductance/Conductance.java:40``)
- k-core        (reference ``algo/.../kcore/KCoreDecomposition.java:40``)
- topological sort / DAG longest path
                (reference ``algo/.../dag/topologicalsort/TopologicalSort.java:55``)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph, to_undirected


def modularity(graph: LinkGraph, assignment: DataFrame) -> float:
    """Modularity Q of a community assignment (node_id, community) over the
    undirected interpretation of the graph:
    Q = Σ_c [ e_c/m − (deg_c / 2m)² ], two aggregate passes."""
    und = to_undirected(graph.edges)  # each undirected edge counted twice
    two_m = und.count()
    if two_m == 0:
        return 0.0
    a = assignment.select(F.col("node_id").alias("src"), F.col("community").alias("c_src"))
    b = assignment.select(F.col("node_id").alias("dst"), F.col("community").alias("c_dst"))
    joined = und.join(a, "src").join(b, "dst")
    intra = (
        joined.filter(F.col("c_src") == F.col("c_dst"))
        .groupBy("c_src")
        .agg(F.count("*").alias("e2"))  # 2 × intra-community edges
    )
    degsum = joined.groupBy("c_src").agg(F.count("*").alias("deg"))
    stats = (
        degsum.join(intra, "c_src", "left")
        .select(
            (F.coalesce(F.col("e2"), F.lit(0)) / F.lit(float(two_m))).alias("frac"),
            (F.col("deg") / F.lit(float(two_m))).alias("degfrac"),
        )
        .agg(F.sum(F.col("frac") - F.col("degfrac") * F.col("degfrac")).alias("q"))
        .collect()[0]["q"]
    )
    return float(stats or 0.0)


def conductance(graph: LinkGraph, assignment: DataFrame) -> DataFrame:
    """Per-community conductance: boundary / min(volume, total−volume)
    over the undirected interpretation. Returns (community, conductance)."""
    und = to_undirected(graph.edges)
    a = assignment.select(F.col("node_id").alias("src"), F.col("community").alias("c_src"))
    b = assignment.select(F.col("node_id").alias("dst"), F.col("community").alias("c_dst"))
    joined = und.join(a, "src").join(b, "dst")
    total = joined.count()
    per = joined.groupBy(F.col("c_src").alias("community")).agg(
        F.count("*").alias("volume"),
        F.sum(F.when(F.col("c_src") != F.col("c_dst"), 1).otherwise(0)).alias("boundary"),
    )
    denom = F.least(F.col("volume"), F.lit(total) - F.col("volume"))
    return per.select(
        "community",
        F.when(denom > 0, F.col("boundary") / denom).otherwise(F.lit(0.0)).alias("conductance"),
    )


@dataclass
class KCoreResult:
    cores: DataFrame  # (node_id, core)
    degeneracy: int


def k_core(graph: LinkGraph, max_iterations: int = 1_000_000) -> KCoreResult:
    """K-core decomposition by iterative peeling: repeatedly remove nodes of
    degree < k; a node's core number is the largest k at which it survives.
    Each round is a degree aggregate + anti-join — O(degeneracy) rounds."""
    spark = graph.edges.sparkSession
    und = (
        graph.edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    assigned = graph.node_ids().select("node_id", F.lit(0).alias("core")).persist()
    live = und
    k = 1
    it = 0
    while it < max_iterations:
        it += 1
        deg = (
            live.select(F.col("a").alias("node_id"))
            .union(live.select(F.col("b").alias("node_id")))
            .groupBy("node_id")
            .agg(F.count("*").alias("d"))
        ).persist()
        n_live = deg.count()
        if n_live == 0:
            break
        keep = deg.filter(F.col("d") >= k).select("node_id").persist()
        n_keep = keep.count()
        if n_keep == n_live:
            # everyone survives at k → they all have core ≥ k; raise k
            assigned = (
                assigned.join(keep.withColumn("_k", F.lit(k)), "node_id", "left")
                .select("node_id", F.when(F.col("_k").isNotNull(), F.lit(k)).otherwise(F.col("core")).alias("core"))
                .localCheckpoint(eager=True)
            )
            k += 1
        else:
            live = (
                live.join(keep.withColumnRenamed("node_id", "a"), "a", "left_semi")
                .join(keep.withColumnRenamed("node_id", "b"), "b", "left_semi")
                .localCheckpoint(eager=True)
            )
        deg.unpersist()
        keep.unpersist()
    und.unpersist()
    return KCoreResult(cores=assigned, degeneracy=max(k - 1, 0))


@dataclass
class TopoResult:
    order: DataFrame  # (node_id, level) — level = longest-path depth from any source
    is_dag: bool


def topological_sort(graph: LinkGraph, max_iterations: int = 100_000) -> TopoResult:
    """Kahn-style level peeling: level(v) = iteration at which v's in-degree
    reaches zero; equals the DAG longest-path depth. Nodes still present
    when no zero-in-degree node exists lie on a cycle → is_dag False."""
    edges = graph.edges.select("src", "dst").persist()
    remaining_nodes = graph.node_ids().persist()
    levels = None
    live_edges = edges
    level = 0
    is_dag = True
    spark = graph.edges.sparkSession
    while level < max_iterations:
        n_remaining = remaining_nodes.count()
        if n_remaining == 0:
            break
        with_indeg = remaining_nodes.join(
            live_edges.select(F.col("dst").alias("node_id")).distinct(), "node_id", "left_anti"
        )
        zero = with_indeg.persist()
        n_zero = zero.count()
        if n_zero == 0:
            is_dag = False
            break
        batch = zero.select("node_id", F.lit(level).alias("level"))
        levels = batch if levels is None else levels.union(batch)
        remaining_nodes = remaining_nodes.join(zero, "node_id", "left_anti").localCheckpoint(eager=True)
        live_edges = live_edges.join(
            zero.select(F.col("node_id").alias("src")), "src", "left_anti"
        ).localCheckpoint(eager=True)
        zero.unpersist()
        level += 1
    edges.unpersist()
    if levels is None:
        levels = spark.createDataFrame([], "node_id long, level int")
    return TopoResult(order=levels, is_dag=is_dag)
