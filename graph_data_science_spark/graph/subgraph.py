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


def cnarw_edge_bias(graph: LinkGraph) -> DataFrame:
    """Per-edge CNARW acceptance bias over the symmetrized simple graph
    (reference ``graph-sampling/.../cnarw/CommonNeighbourAwareNextNodeStrategy.java:51-81``):
    for every adjacent pair (u, v),
    ``overlap = |N(u) ∩ N(v)| / min(|N(u)|, |N(v)|)`` (OverlapSimilarity on
    the two adjacency lists) and the walker accepts a uniform candidate v
    with probability ``bias = 1 − overlap`` — the defining math of the
    sampler, factored out so it can be verified standalone (and reused by
    :func:`cnarw_sample`).

    Returns (u, v, cn, du, dv, ov, bias) — one row per DIRECTED adjacent
    pair of the symmetrized graph. Distributed shape: a shared-neighbor
    join restricted to edges (O(wedges incident to edges), never
    all-pairs); the join keys are node ids (uniform under hashing), hot
    hubs are AQE skew-join's case.
    """
    und = (
        graph.edges.select("src", "dst")
        .union(graph.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    degs = und.groupBy("src").agg(F.count("*").alias("deg"))
    za = und.select(F.col("src").alias("u"), F.col("dst").alias("z"))
    zb = und.select(F.col("src").alias("v"), F.col("dst").alias("z"))
    common = (
        und.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(za, "u")
        .join(zb, ["v", "z"])
        .groupBy("u", "v")
        .agg(F.count("*").alias("cn"))
    )
    du = degs.select(F.col("src").alias("u"), F.col("deg").alias("du"))
    dv = degs.select(F.col("src").alias("v"), F.col("deg").alias("dv"))
    ov = F.coalesce("cn", F.lit(0)) / F.least("du", "dv")
    return (
        und.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(common, ["u", "v"], "left")
        .join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            F.coalesce("cn", F.lit(0)).alias("cn"),
            "du",
            "dv",
            ov.alias("ov"),
            (F.lit(1.0) - ov).alias("bias"),
        )
    )


def cnarw_sample(
    graph: LinkGraph,
    start_nodes: DataFrame,
    sample_fraction: float = 0.15,
    restart_probability: float = 0.1,
    random_seed: int = 42,
    max_rounds: int = 100,
    max_attempts: int = 8,
) -> LinkGraph:
    """Common-neighbour-aware random-walk node sampling + induced subgraph
    (reference ``graph-sampling/.../cnarw/CommonNeighbourAwareRandomWalk.java``
    + ``CommonNeighbourAwareNextNodeStrategy.java:51-65``).

    CNARW biases each step AWAY from neighbors that share many common
    neighbors with the current node: a uniform candidate v from N(u) is
    accepted with probability ``1 − overlap(u, v)`` where
    ``overlap = |N(u)∩N(v)| / min(|N(u)|,|N(v)|)`` (the reference's
    OverlapSimilarity on sorted adjacency) — rejected draws resample. This
    reaches fringe regions faster than uniform RWR on clustered graphs.

    Distributed shape: the per-step rejection loop needs overlap(u, v) for
    *adjacent* pairs only, so it is precomputed ONCE as a DataFrame (a
    shared-neighbor join restricted to edges — O(wedges incident to edges),
    never all-pairs) and the walk itself is the same hash-seeded frontier
    loop as :func:`rwr_sample`. The reference's unbounded rejection loop is
    bounded at ``max_attempts`` hash draws per round (the walker stays put
    when all are rejected — at most a geometric-tail bias of
    2^-max_attempts per step, documented cap, no silent truncation:
    acceptance uses attempt-indexed draws so the chain is deterministic in
    ``random_seed``).
    """
    spark = graph.edges.sparkSession
    from pyspark.sql import Window

    n = graph.node_ids().count()
    target = max(1, int(sample_fraction * n))

    w = Window.partitionBy("src").orderBy("dst")
    und = (
        graph.edges.select("src", "dst")
        .union(graph.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    adj = (
        und.withColumn("r", F.row_number().over(w))
        .withColumn("deg", F.count("*").over(Window.partitionBy("src")))
        .persist()
    )
    adj.count()
    degs = adj.select("src", "deg").distinct()

    overlap = (
        cnarw_edge_bias(graph)
        .select("u", "v", "ov")
        .persist()
    )
    overlap.count()

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
        base = cur.join(degs, cur["node"] == degs["src"], "left").select(
            "start",
            "node",
            F.when(restart | F.col("deg").isNull(), F.lit(None).cast("long"))
            .otherwise(F.col("deg"))
            .alias("deg"),
        )
        stay = base.filter(F.col("deg").isNull()).select(
            "start", F.col("start").alias("node")
        )
        walkers = base.filter(F.col("deg").isNotNull())
        # max_attempts candidate draws per walker, first accepted wins.
        att = walkers.select(
            "start",
            "node",
            "deg",
            F.explode(F.sequence(F.lit(1), F.lit(int(max_attempts)))).alias("att"),
        )
        picked = att.withColumn(
            "_pick",
            F.pmod(
                F.xxhash64(
                    F.lit(int(random_seed) + 1),
                    F.col("start"),
                    F.col("node"),
                    F.lit(rnd),
                    F.col("att"),
                ),
                F.col("deg"),
            )
            + 1,
        )
        cand = picked.join(
            adj,
            (picked["node"] == adj["src"]) & (adj["r"] == picked["_pick"]),
        ).select("start", F.col("node").alias("u"), F.col("dst").alias("v"), "att")
        accept_draw = F.pmod(
            F.xxhash64(
                F.lit(int(random_seed) + 2),
                F.col("start"),
                F.col("u"),
                F.col("v"),
                F.lit(rnd),
                F.col("att"),
            ),
            F.lit(1_000_000),
        ) / 1_000_000.0
        accepted = (
            cand.join(overlap, ["u", "v"])
            .filter(accept_draw <= 1.0 - F.col("ov"))
        )
        aw = Window.partitionBy("start", "u").orderBy("att")
        first = (
            accepted.withColumn("_rn", F.row_number().over(aw))
            .filter(F.col("_rn") == 1)
            .select("start", F.col("v").alias("node"))
        )
        # Walkers whose every attempt was rejected stay in place this round.
        moved_keys = first.select("start").distinct()
        stuck = walkers.join(moved_keys, "start", "left_anti").select("start", "node")
        cur = first.union(stuck).union(stay).localCheckpoint(eager=True)
        sample = sample.union(cur.select("node")).distinct().localCheckpoint(eager=True)

    induced = (
        graph.edges.join(sample.withColumnRenamed("node", "src"), "src", "left_semi")
        .join(sample.withColumnRenamed("node", "dst"), "dst", "left_semi")
    )
    adj.unpersist()
    overlap.unpersist()
    return LinkGraph(edges=induced, vertices=sample.select(F.col("node").alias("node_id")))
