"""Closeness + harmonic centrality via multi-source BFS.

Reference semantics:
- ``algo/.../closeness/ClosenessCentrality.java:36-78``: MSBFS accumulates
  ``farness(v) = Σ_u d(u,v)`` and ``component(v) = #sources reaching v``
  (self at depth 0 not counted); centrality = ``component / farness``
  (DefaultCentralityComputer.java), or Wasserman-Faust
  ``(component/farness)·(component/(nodeCount-1))``
  (WassermanFaustCentralityComputer.java).
- ``algo/.../harmonic/HarmonicCentrality.java``: ``Σ_u (1/d(u,v)) / (n-1)``.

GDS's MSBFS packs 64 concurrent BFS sources into bitset words — a
shared-memory trick. The shuffle re-expression runs ALL sources at once as
a (source, node) pair frontier: each level is one join + anti-join against
the visited set, so the whole computation is O(diameter) shuffles
regardless of source count. Exact all-pairs state is O(V·reachable) pairs —
the same asymptotic work the reference does, just materialized; at 100 TB
scale callers pass a ``sources`` sample (the standard approximation —
centralities scale by |sample| instead of |V|, ratios preserved).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import logging

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.pregel.superstep import (
    materialize_roundtrip,
    roundtrip_mark,
    roundtrip_release,
)

logger = logging.getLogger(__name__)

# Exact all-sources state is O(V · reachable) pair rows — fine at test
# scale, fatal at 100 TB. Above this node count the engine refuses to run
# exact-by-default and auto-samples instead (logged — no silent caps),
# mirroring the reference's SelectionStrategy sampling
# (``algo/.../betweenness/SelectionStrategy.java``).
DEFAULT_EXACT_SOURCE_LIMIT = 100_000
DEFAULT_AUTO_SAMPLE_SIZE = 1_024


def guard_all_sources(
    graph,
    sources,
    algo: str,
    exact_source_limit: int = DEFAULT_EXACT_SOURCE_LIMIT,
    auto_sample_size: int = DEFAULT_AUTO_SAMPLE_SIZE,
    sample_seed: int = 42,
):
    """Resolve the source frame for an all-sources algorithm.

    Explicit ``sources`` pass through untouched. ``sources=None`` runs
    exact from every node only below ``exact_source_limit`` nodes; above
    it, a deterministic uniform sample of ``auto_sample_size`` nodes
    (smallest ``xxhash64(seed, node_id)`` — reproducible under any
    partitioning) is substituted and a WARNING is logged stating the cap.
    Returns (source_frame_or_None, sampled: bool). ``None`` means "all
    nodes" (caller keeps its existing default path).
    """
    from pyspark.sql import functions as _F

    if sources is not None:
        return sources, False
    n = graph.node_ids().count()
    if n <= exact_source_limit:
        return None, False
    sample = (
        graph.node_ids()
        .select(
            "node_id",
            _F.xxhash64(_F.lit(int(sample_seed)), _F.col("node_id")).alias("_h"),
        )
        .orderBy("_h")
        .limit(int(auto_sample_size))
        .select("node_id")
    )
    logger.warning(
        "%s: %d nodes exceeds exact_source_limit=%d; auto-sampling %d "
        "sources (seed=%d). Scores approximate the exact values scaled by "
        "the sample fraction; pass sources= explicitly to control this.",
        algo, n, exact_source_limit, auto_sample_size, sample_seed,
    )
    return sample, True



def msbfs_distances(
    graph: LinkGraph,
    sources: DataFrame | None = None,
    max_depth: int | None = None,
    exact_source_limit: int = DEFAULT_EXACT_SOURCE_LIMIT,
    auto_sample_size: int = DEFAULT_AUTO_SAMPLE_SIZE,
) -> DataFrame:
    """(source long, node_id long, depth int) for every node reachable from
    each source along edge direction, depth ≥ 1 (self-distance excluded,
    matching the reference's BfsConsumer which never fires at depth 0).

    ``sources=None`` = all nodes, but only up to ``exact_source_limit``
    nodes; larger graphs are auto-sampled with a logged cap (see
    guard_all_sources)."""
    edges = graph.edges.select("src", "dst").distinct()
    sources, _sampled = guard_all_sources(
        graph, sources, "msbfs_distances", exact_source_limit, auto_sample_size
    )
    if sources is None:
        sources = graph.node_ids().select(F.col("node_id").alias("source"))
    else:
        sources = sources.select(F.col(sources.columns[0]).alias("source"))
    frontier = materialize_roundtrip(
        sources.select("source", F.col("source").alias("node")), tag="msbfs"
    )
    visited = frontier
    out_parts: list[DataFrame] = []
    depth = 0
    while True:
        depth += 1
        if max_depth is not None and depth > max_depth:
            break
        nxt = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .select("source", F.col("dst").alias("node"))
            .distinct()
            .join(visited, ["source", "node"], "left_anti")
        )
        frontier = materialize_roundtrip(nxt, tag="msbfs")
        if frontier.limit(1).count() == 0:
            break
        out_parts.append(frontier.select("source", F.col("node"), F.lit(depth).alias("depth")))
        visited = materialize_roundtrip(visited.union(frontier), tag="msbfs_v", keep_last=2)
    spark = graph.edges.sparkSession
    if not out_parts:
        return spark.createDataFrame([], "source long, node_id long, depth int")
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.union(p)
    return out.select("source", F.col("node").alias("node_id"), "depth")


def closeness(
    graph: LinkGraph,
    wasserman_faust: bool = False,
    sources: DataFrame | None = None,
    exact_source_limit: int = DEFAULT_EXACT_SOURCE_LIMIT,
    auto_sample_size: int = DEFAULT_AUTO_SAMPLE_SIZE,
) -> DataFrame:
    """(node_id, score): component/farness, optionally Wasserman-Faust
    improved. Unreached nodes score 0.0 (farness 0 guard, reference
    parity)."""
    n = graph.node_ids().count()
    _mark = roundtrip_mark()
    d = msbfs_distances(
        graph,
        sources=sources,
        exact_source_limit=exact_source_limit,
        auto_sample_size=auto_sample_size,
    )
    agg = materialize_roundtrip(
        d.groupBy("node_id").agg(
            F.sum("depth").alias("farness"), F.count("*").alias("component")
        ),
        tag="closeness_out",
    )
    roundtrip_release(_mark, keep=[agg])
    base = F.col("component") / F.col("farness")
    if wasserman_faust:
        score = base * (F.col("component") / F.lit(float(n - 1) if n > 1 else 1.0))
    else:
        score = base
    scored = agg.select("node_id", score.alias("score"))
    return (
        graph.node_ids()
        .join(scored, "node_id", "left")
        .select("node_id", F.coalesce(F.col("score"), F.lit(0.0)).alias("score"))
    )


def harmonic_centrality(
    graph: LinkGraph,
    sources: DataFrame | None = None,
    exact_source_limit: int = DEFAULT_EXACT_SOURCE_LIMIT,
    auto_sample_size: int = DEFAULT_AUTO_SAMPLE_SIZE,
) -> DataFrame:
    """(node_id, score): Σ 1/d(u,v) / (n−1) (HarmonicCentrality.java)."""
    n = graph.node_ids().count()
    _mark = roundtrip_mark()
    d = msbfs_distances(
        graph,
        sources=sources,
        exact_source_limit=exact_source_limit,
        auto_sample_size=auto_sample_size,
    )
    inv = materialize_roundtrip(
        d.groupBy("node_id").agg(F.sum(1.0 / F.col("depth")).alias("inv_farness")),
        tag="harmonic_out",
    )
    roundtrip_release(_mark, keep=[inv])
    denom = float(n - 1) if n > 1 else 1.0
    return (
        graph.node_ids()
        .join(inv, "node_id", "left")
        .select(
            "node_id",
            (F.coalesce(F.col("inv_farness"), F.lit(0.0)) / F.lit(denom)).alias("score"),
        )
    )
