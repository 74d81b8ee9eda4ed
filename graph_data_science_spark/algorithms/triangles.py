"""Exact triangle counting + local clustering coefficient.

GDS counts each triangle once via sorted-adjacency intersection with node
ordering ``c < b < a`` (reference
``algo/.../triangle/intersect/GraphIntersect.java:52-124``); self-loops are
ignored and parallel edges deduped in-cursor (``GraphIntersect.java:133-145``);
nodes whose degree exceeds ``maxDegree`` are excluded with local count
**-1** (``IntersectingTriangleCount.java:57,145-149``); input must be
undirected (``TriangleCountBaseConfig.java:50-60``).

Spark-first re-expression: **adjacency intersection under a degree-ordered
orientation** — the distributed form of the reference's sorted-adjacency
cursor intersect.

1. canonicalize the undirected edge set: ``(min, max)`` per edge, drop
   self-loops, distinct (= in-cursor dedup);
2. compute each node's distinct-neighbor degree and orient every edge from
   the smaller to the larger endpoint under the total order
   ``(degree, node_id)`` — compared directly as a tuple expression, no rank
   materialization. Each oriented out-degree is then O(√m)-bounded — the
   same work bound the reference gets from degree-ordered intersection;
3. build each node's **out-adjacency array** (``collect_list`` over the
   oriented edges) and join every oriented edge (u, v) to both endpoints'
   arrays; ``array_intersect(adj(u), adj(v))`` enumerates exactly the w
   with order(w) > order(v) > order(u), so each triangle is found once,
   keyed by its lowest edge. The intersection runs inside whole-stage
   codegen; the only shuffles are the edge⋈adjacency joins (≈ 2× the edge
   table). The previous wedge-join plan shuffled the full Σ outdeg²
   wedge stream (34× the edge count on the co-parts benchmark graph) into
   the closing join — the intersection plan moves that volume into
   streamed map-side array scans and cuts the query's wall time ≈ 4×.
   Per-row bound: a node's array is its oriented out-neighborhood,
   O(√m) ids (the orientation bound), NOT its raw degree — hubs are
   oriented away from; ``max_degree`` remains the explicit escape hatch;
4. per-node counts = explode the 3 corners → groupBy().count(); excluded
   nodes get -1, untouched nodes 0.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph


@dataclass
class TriangleResult:
    per_node: DataFrame  # (node_id long, triangles long)
    global_count: int


def _canonical_undirected(edges: DataFrame) -> DataFrame:
    """(a < b) canonical undirected simple edges: self-loops out, parallels deduped."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _orient(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Orient each canonical edge from the smaller to the larger endpoint
    under the total order (degree, node_id) — a tuple comparison, no rank
    materialization. Returns (lo, hi)."""
    da = deg.select(F.col("node_id").alias("a"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("node_id").alias("b"), F.col("degree").alias("deg_b"))
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
    )


# Optional hot-key salting for the adj_v attach join (a node this many
# oriented edges point AT gets its adjacency replicated across salts).
# DEFAULT OFF (None): the hypothesis that the suite's triangle
# strong-scaling loss was this join-key straggler was TESTED and
# REFUTED — salting left the 4×4-executor wall unchanged (16.4 → 17.8 s,
# `STANDALONE_SCALING_suite_tri_salted.json`) while the hot-detection
# aggregate cost the 1×4 level ~40% (36.5 → 63.1 s); the non-scaling
# component is the wedge intersect's memory-bandwidth demand on a
# single host (MEMBW_PROBE.json: host memcpy scales 0.863 from 4→16
# workers), which a multi-host cluster does not share. The machinery
# stays for graphs where one key's row skew truly dominates — set a
# finite threshold to enable.
TRIANGLE_HOT_IN_DEGREE: int | None = None
TRIANGLE_SALTS = 32


def _oriented_triangles(oriented: DataFrame) -> DataFrame:
    """One row (x, y, z) per triangle, keyed by its lowest oriented edge:
    for each oriented edge (u, v), the closing corners are
    ``array_intersect(outAdj(u), outAdj(v))`` — every w there satisfies
    order(w) > order(v) > order(u), so no dedup filter is needed. The
    orientation's O(√m) out-degree bound caps both array widths and the
    intersection work per edge (GraphIntersect's cursor bound).

    When ``TRIANGLE_HOT_IN_DEGREE`` is set (default off — see the
    constant's note for the recorded negative result), mega-hubs get
    their adj_v rows replicated across ``TRIANGLE_SALTS`` salts and
    their fact rows spread by a hash of the OTHER endpoint; non-hot keys
    join on salt 0 with zero replication. Results identical (the salt is
    join-routing only)."""
    adj = oriented.groupBy("lo").agg(F.collect_list("hi").alias("nbrs"))
    adj_u = adj.select(F.col("lo"), F.col("nbrs").alias("nbrs_u"))
    adj_v = adj.select(F.col("lo").alias("hi"), F.col("nbrs").alias("nbrs_v"))
    with_u = oriented.join(adj_u, "lo")

    hot_rows = (
        oriented.groupBy("hi")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= TRIANGLE_HOT_IN_DEGREE)
        .select("hi")
        .collect()
        if TRIANGLE_HOT_IN_DEGREE is not None
        else []
    )
    if not hot_rows:
        joined = with_u.join(adj_v, "hi")  # inner: a hi with no out-nbrs closes nothing
    else:
        hot = [int(r["hi"]) for r in hot_rows]
        s = TRIANGLE_SALTS
        fact = with_u.withColumn(
            "_salt",
            F.when(F.col("hi").isin(hot), F.pmod(F.xxhash64("lo"), F.lit(s))).otherwise(
                F.lit(0)
            ).cast("int"),
        )
        adj_v_s = (
            adj_v.withColumn(
                "_salt_arr",
                F.when(
                    F.col("hi").isin(hot), F.sequence(F.lit(0), F.lit(s - 1))
                ).otherwise(F.array(F.lit(0))),
            )
            .withColumn("_salt", F.explode("_salt_arr"))  # sequence/array are already int
            .drop("_salt_arr")
        )
        joined = fact.join(adj_v_s, ["hi", "_salt"]).drop("_salt")
    return joined.select(
        F.col("lo").alias("x"),
        F.col("hi").alias("y"),
        F.explode(F.array_intersect("nbrs_u", "nbrs_v")).alias("z"),
    )


def triangle_count(graph: LinkGraph, max_degree: int | None = None) -> TriangleResult:
    spark = graph.edges.sparkSession
    und = _canonical_undirected(graph.edges)

    deg = (
        und.select(F.col("a").alias("node_id"))
        .union(und.select(F.col("b").alias("node_id")))
        .groupBy("node_id")
        .agg(F.count("*").alias("degree"))
    )

    excluded = None
    if max_degree is not None:
        excluded = deg.filter(F.col("degree") > max_degree).select("node_id").persist()
        ex_a = excluded.select(F.col("node_id").alias("a"))
        ex_b = excluded.select(F.col("node_id").alias("b"))
        und = und.join(ex_a, "a", "left_anti").join(ex_b, "b", "left_anti")
        deg = (
            und.select(F.col("a").alias("node_id"))
            .union(und.select(F.col("b").alias("node_id")))
            .groupBy("node_id")
            .agg(F.count("*").alias("degree"))
        )

    oriented = _orient(und, deg).persist()
    tris = _oriented_triangles(oriented).persist()

    global_count = tris.count()

    corners = (
        tris.select(F.col("x").alias("node_id"))
        .union(tris.select(F.col("y").alias("node_id")))
        .union(tris.select(F.col("z").alias("node_id")))
        .groupBy("node_id")
        .agg(F.count("*").alias("triangles"))
    )
    nodes = graph.node_ids()
    per_node = nodes.join(corners, "node_id", "left").select(
        "node_id", F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles")
    )
    if excluded is not None:
        ex = excluded.withColumn("_ex", F.lit(True))
        per_node = per_node.join(ex, "node_id", "left").select(
            "node_id",
            F.when(F.col("_ex"), F.lit(-1)).otherwise(F.col("triangles")).cast("long").alias("triangles"),
        )
        excluded.unpersist()

    tris.unpersist()
    oriented.unpersist()
    return TriangleResult(per_node=per_node, global_count=global_count)


def triangle_listing(graph: LinkGraph, max_degree: int | None = None) -> DataFrame:
    """(a < b < c) node-id triples, one row per triangle (the stream mode of
    the reference's TriangleStream.java). Same degree-ordered adjacency
    intersection as triangle_count; the triple is re-sorted to id order for
    a stable output contract."""
    und = _canonical_undirected(graph.edges)
    deg = (
        und.select(F.col("a").alias("node_id"))
        .union(und.select(F.col("b").alias("node_id")))
        .groupBy("node_id")
        .agg(F.count("*").alias("degree"))
    )
    if max_degree is not None:
        keep = deg.filter(F.col("degree") <= max_degree).select("node_id")
        und = und.join(keep.withColumnRenamed("node_id", "a"), "a", "left_semi").join(
            keep.withColumnRenamed("node_id", "b"), "b", "left_semi"
        )
        deg = (
            und.select(F.col("a").alias("node_id"))
            .union(und.select(F.col("b").alias("node_id")))
            .groupBy("node_id")
            .agg(F.count("*").alias("degree"))
        )
    tris = _oriented_triangles(_orient(und, deg))
    ordered = F.array_sort(F.array("x", "y", "z"))
    return tris.select(
        F.element_at(ordered, 1).alias("a"),
        F.element_at(ordered, 2).alias("b"),
        F.element_at(ordered, 3).alias("c"),
    )


def local_clustering_coefficient(
    graph: LinkGraph,
    max_degree: int | None = None,
    precomputed_triangles: DataFrame | None = None,
) -> DataFrame:
    """LCC(v) = 2·T(v) / (deg(v)·(deg(v)−1)) over the simple undirected graph
    (reference ``algo/.../triangle/LocalClusteringCoefficient.java:57-75``);
    degree < 2 → 0.0; maxDegree-excluded nodes (triangles = -1) → NaN
    (``LocalClusteringCoefficient.java:132-134`` — excluded is not the same
    as zero clustering). Returns (node_id long, lcc double)."""
    tri = precomputed_triangles
    if tri is None:
        tri = triangle_count(graph, max_degree=max_degree).per_node
    und = _canonical_undirected(graph.edges)
    deg = (
        und.select(F.col("a").alias("node_id"))
        .union(und.select(F.col("b").alias("node_id")))
        .groupBy("node_id")
        .agg(F.count("*").alias("degree"))
    )
    return (
        tri.join(deg, "node_id", "left")
        .select(
            "node_id",
            F.when(F.col("triangles") < 0, F.lit(float("nan")))
            .when(
                F.coalesce(F.col("degree"), F.lit(0)) >= 2,
                2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )
