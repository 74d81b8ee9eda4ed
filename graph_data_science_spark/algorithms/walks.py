"""CollapsePath + deterministic random walks.

- CollapsePath (reference ``algo/.../walking/CollapsePath.java:44``):
  traverse a path template (a sequence of relationship hops) and emit one
  direct edge per (start, end) pair — a chain of joins; parallel results
  dedupe; self-loops optionally dropped (``allowSelfLoops``).
- RandomWalk (reference ``algo/.../traverse/RandomWalk.java``, node2vec
  sampling): the reference draws from a per-thread RNG; a shuffle engine
  needs walks that are reproducible regardless of partitioning, so the
  next step is chosen by ``xxhash64(seed, walk_id, step) mod degree`` over
  the rank-ordered adjacency — an unbiased uniform choice (the node2vec
  p/q biases reweight this choice; uniform == p=q=1, GDS's default).

Both are pure Catalyst joins; the walk is ``walk_length`` sequential
joins against the rank-indexed adjacency (cached once, reused per step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph


def collapse_path(
    hops: list[DataFrame],
    allow_self_loops: bool = False,
) -> DataFrame:
    """Collapse a template of edge tables into direct (src, dst) edges:
    hop i's dst joins hop i+1's src. Result is distinct."""
    assert hops, "need at least one hop"
    cur = hops[0].select("src", "dst")
    for nxt in hops[1:]:
        cur = (
            cur.join(nxt.select(F.col("src").alias("_m"), F.col("dst").alias("_d")), cur["dst"] == F.col("_m"))
            .select("src", F.col("_d").alias("dst"))
        )
    if not allow_self_loops:
        cur = cur.filter(F.col("src") != F.col("dst"))
    return cur.distinct()


def _hash(rng: str, seed: int, step: int):
    if rng == "portable":
        payload = F.concat_ws(
            ":", F.lit(str(int(seed))), F.col("walk_id").cast("string"), F.lit(str(step))
        )
        return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")
    return F.xxhash64(F.lit(int(seed)), F.col("walk_id"), F.lit(step))


def random_walks(
    graph: LinkGraph,
    walks_per_node: int = 2,
    walk_length: int = 5,
    random_seed: int = 42,
    start_nodes: DataFrame | None = None,
    rng: str = "xxhash",
) -> DataFrame:
    """(walk_id long, start long, step int, node_id long): uniform random
    walks along edge direction; a walk ends early at a node with no
    out-edges (reference RandomWalk.java dead-end behavior). walk_id =
    start·walks_per_node + replica, deterministic."""
    spark = graph.edges.sparkSession
    # Rank-indexed adjacency: nbr #r of each src (1-based), cached once.
    w = Window.partitionBy("src").orderBy("dst")
    adj = (
        graph.edges.select("src", "dst").distinct()
        .withColumn("r", F.row_number().over(w))
        .withColumn("deg", F.count("*").over(Window.partitionBy("src")))
        .persist()
    )
    adj.count()

    starts = start_nodes if start_nodes is not None else graph.node_ids()
    starts = starts.select(F.col(starts.columns[0]).alias("start"))
    cur = starts.crossJoin(
        spark.range(walks_per_node).select(F.col("id").alias("_rep"))
    ).select(
        (F.col("start") * walks_per_node + F.col("_rep")).alias("walk_id"),
        "start",
        F.col("start").alias("node_id"),
    )
    degs = adj.select("src", "deg").distinct()
    out = cur.select("walk_id", "start", F.lit(0).alias("step"), "node_id")
    for step in range(1, walk_length):
        # Two joins, no fan-out: first fetch the degree to derive the pick,
        # then join on (src, rank == pick) — a hub node never multiplies the
        # walk rows by its degree.
        with_pick = (
            cur.join(degs, cur["node_id"] == degs["src"], "inner")
            .select(
                "walk_id",
                "start",
                "node_id",
                (F.pmod(_hash(rng, random_seed, step), F.col("deg")) + 1).alias("_pick"),
            )
        )
        cur = (
            with_pick.join(
                adj,
                (with_pick["node_id"] == adj["src"]) & (adj["r"] == with_pick["_pick"]),
                "inner",
            )
            .select("walk_id", "start", F.col("dst").alias("node_id"))
        )
        out = out.union(cur.select("walk_id", "start", F.lit(step).alias("step"), "node_id"))
    out = out.localCheckpoint(eager=True)
    adj.unpersist()
    return out


def random_walk_visit_counts(
    graph: LinkGraph,
    walks_per_node: int = 2,
    walk_length: int = 5,
    random_seed: int = 42,
    start_nodes: DataFrame | None = None,
    rng: str = "xxhash",
) -> DataFrame:
    """Per-node visit counts across all random walks (reference
    ``algo/.../traversal/RandomWalkCountingNodeVisits.java:40`` — the
    ``gds.randomWalk.stats`` mode, which tallies a HugeAtomicLongArray
    instead of streaming the walks). Nodes never visited report 0, like
    the reference's dense array.

    Shape: the walk simulation is :func:`random_walks` (two joins per
    step, no hub fan-out); the tally is ONE hash aggregation over the walk
    rows plus a broadcast-friendly left join to restore zero-visit nodes —
    at 100 TB the agg output is |V| rows, the cheap side.

    Returns (node_id long, visits long)."""
    walks = random_walks(
        graph,
        walks_per_node=walks_per_node,
        walk_length=walk_length,
        random_seed=random_seed,
        start_nodes=start_nodes,
        rng=rng,
    )
    counts = walks.groupBy("node_id").agg(F.count("*").alias("visits"))
    return (
        graph.node_ids()
        .select(F.col("node_id"))
        .join(counts, "node_id", "left")
        .select("node_id", F.coalesce(F.col("visits"), F.lit(0)).cast("long").alias("visits"))
    )
