"""Round-3 driver-contract queries (batch 5): spanning tree family.

- ``mst_supply_bridges``: Borůvka MST == Prim (reference
  ``spanningtree/Prim.java:43``) on the weighted supply forest with
  forced inter-region bridges and redundant heavy intra-region edges —
  the bridges are cut edges (must be in any spanning tree) and every
  redundant edge is strictly the heaviest edge of every cycle it closes
  (cycle property ⇒ excluded), so the full MST is closed-form.
- ``k_spanning_star``: k-node pruning (``kspanningtree/KSpanningTree.java:18``)
  on a hub-and-spoke graph with strictly increasing spoke weights —
  the surviving k−1 leaves are exactly the cheapest, closed-form.
- ``steiner_supply_terminals``: path-union Steiner
  (``steiner/ShortestPathsSteinerAlgorithm`` phase 1) on the weighted
  supply TREE — tree paths are unique, so the result is the union of
  closed-form root→terminal paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.spanning import (
    k_spanning_tree,
    spanning_tree,
    steiner_tree_approx,
)
from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.queries import _t
from graph_data_science_spark.queries_ext import _supply_tree_graph

# --------------------------------------------------------------------------
# MST over supply forest + bridges + redundant heavy edges
# --------------------------------------------------------------------------


def _bridged_supply_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    base = _supply_tree_graph(spark, sf_dir, weighted=True)
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    # Cut-edge bridges: region 0 — region r (weight 500 + r). Redundant
    # heavy edges: nation pairs within a region (weight 600) — strictly
    # heavier than any tree path they parallel (tree weights ≤ 11).
    bridges = region.filter(F.col("r_regionkey") > 0).select(
        F.lit(0).cast("long").alias("src"),
        F.col("r_regionkey").cast("long").alias("dst"),
        (500 + F.col("r_regionkey")).cast("double").alias("weight"),
    )
    redundant = (
        nation.alias("a")
        .join(nation.alias("b"), F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        .filter(F.col("a.n_nationkey") < F.col("b.n_nationkey"))
        .select(
            (10 + F.col("a.n_nationkey")).cast("long").alias("src"),
            (10 + F.col("b.n_nationkey")).cast("long").alias("dst"),
            F.lit(600.0).alias("weight"),
        )
    )
    return LinkGraph(
        edges=base.edges.union(bridges).union(redundant),
        vertices=base.vertices,
        node_count=base.node_count,
    )


def q_mst(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _bridged_supply_graph(spark, sf_dir)
    res = spanning_tree(g, start_node=0, objective="min")
    return res.tree.select("node_id", "parent", "cost_to_parent")


Q_MST_SQL = """
    SELECT CAST(0 AS BIGINT) AS node_id, CAST(-1 AS BIGINT) AS parent, 0.0 AS cost_to_parent
    UNION ALL
    SELECT CAST(r_regionkey AS BIGINT), CAST(0 AS BIGINT), CAST(500 + r_regionkey AS DOUBLE)
      FROM region WHERE r_regionkey > 0
    UNION ALL
    SELECT CAST(10 + n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT),
           CAST(1 + n_nationkey % 3 AS DOUBLE)
      FROM nation
    UNION ALL
    SELECT CAST(50 + s_suppkey AS BIGINT), CAST(10 + s_nationkey AS BIGINT),
           CAST(1 + s_suppkey % 5 AS DOUBLE)
      FROM supplier
    UNION ALL
    SELECT CAST(2000 + c_custkey AS BIGINT), CAST(10 + c_nationkey AS BIGINT),
           CAST(1 + c_custkey % 7 AS DOUBLE)
      FROM customer
    UNION ALL
    SELECT CAST(100000 + o_orderkey AS BIGINT), CAST(2000 + o_custkey AS BIGINT),
           CAST(1 + o_orderkey % 11 AS DOUBLE)
      FROM orders
"""


# --------------------------------------------------------------------------
# k-spanning tree on a customer star
# --------------------------------------------------------------------------

_KSPAN_K = 50


def q_kspan(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    edges = customer.select(
        F.lit(0).cast("long").alias("src"),
        (2000 + F.col("c_custkey")).cast("long").alias("dst"),
        F.col("c_custkey").cast("double").alias("weight"),
    )
    g = LinkGraph(edges=edges)
    res = k_spanning_tree(g, start_node=0, k=_KSPAN_K, prune_batch=1024)
    return res.tree.select("node_id", "parent", "cost_to_parent")


Q_KSPAN_SQL = f"""
    SELECT CAST(0 AS BIGINT) AS node_id, CAST(-1 AS BIGINT) AS parent, 0.0 AS cost_to_parent
    UNION ALL
    SELECT * FROM (
        SELECT CAST(2000 + c_custkey AS BIGINT) AS node_id, CAST(0 AS BIGINT) AS parent,
               CAST(c_custkey AS DOUBLE) AS cost_to_parent
        FROM customer ORDER BY c_custkey ASC LIMIT {_KSPAN_K - 1}
    )
"""


# --------------------------------------------------------------------------
# Steiner path union on the weighted supply tree
# --------------------------------------------------------------------------

_STEINER_TERMINALS = 5


def q_steiner(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _supply_tree_graph(spark, sf_dir, weighted=True)
    terms = [
        int(r["t"])
        for r in (
            _t(spark, sf_dir, "orders")
            .join(_t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
            .join(_t(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
            .filter(F.col("n_regionkey") == 0)
            .select((100000 + F.col("o_orderkey")).cast("long").alias("t"))
            .orderBy("t")
            .limit(_STEINER_TERMINALS)
            .collect()
        )
    ]
    res = steiner_tree_approx(g, source=0, terminals=terms)
    return res.tree.select("node_id", "parent", "cost_to_parent")


Q_STEINER_SQL = f"""
    WITH terms AS (
        SELECT o_orderkey, o_custkey, c_nationkey
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        WHERE n_regionkey = 0
        ORDER BY o_orderkey ASC LIMIT {_STEINER_TERMINALS}
    )
    SELECT CAST(0 AS BIGINT) AS node_id, CAST(-1 AS BIGINT) AS parent, 0.0 AS cost_to_parent
    UNION ALL
    SELECT DISTINCT CAST(10 + c_nationkey AS BIGINT), CAST(0 AS BIGINT),
           CAST(1 + c_nationkey % 3 AS DOUBLE)
      FROM terms
    UNION ALL
    SELECT DISTINCT CAST(2000 + o_custkey AS BIGINT), CAST(10 + c_nationkey AS BIGINT),
           CAST(1 + o_custkey % 7 AS DOUBLE)
      FROM terms
    UNION ALL
    SELECT CAST(100000 + o_orderkey AS BIGINT), CAST(2000 + o_custkey AS BIGINT),
           CAST(1 + o_orderkey % 11 AS DOUBLE)
      FROM terms
"""


# --------------------------------------------------------------------------
# DFS visit order on the region-0 supply tree. The engine's conventions
# (reference DFS.java:31 — visited on push, neighbors pushed ascending ⇒
# visited descending) make preorder-with-descending-siblings, which the
# oracle reproduces by sorting negated root paths lexicographically
# (prefix < extension = preorder; −id ascending = id descending).
# --------------------------------------------------------------------------


def q_dfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.algorithms.traverse import dfs

    g = _supply_tree_graph(spark, sf_dir, weighted=False)
    return dfs(g, source=0).select("node_id", "visit_order")


Q_DFS_SQL = """
    WITH RECURSIVE edges AS (
        SELECT CAST(0 AS BIGINT) AS src, CAST(10 + n_nationkey AS BIGINT) AS dst
          FROM nation WHERE n_regionkey = 0
        UNION ALL
        SELECT CAST(10 + s_nationkey AS BIGINT), CAST(50 + s_suppkey AS BIGINT) FROM supplier
        UNION ALL
        SELECT CAST(10 + c_nationkey AS BIGINT), CAST(2000 + c_custkey AS BIGINT) FROM customer
        UNION ALL
        SELECT CAST(2000 + o_custkey AS BIGINT), CAST(100000 + o_orderkey AS BIGINT) FROM orders
    ),
    walk AS (
        SELECT CAST(0 AS BIGINT) AS node_id, [CAST(0 AS BIGINT)] AS pneg
        UNION ALL
        SELECT e.dst, list_append(w.pneg, -e.dst)
        FROM walk w JOIN edges e ON e.src = w.node_id
    )
    SELECT node_id,
           CAST(ROW_NUMBER() OVER (ORDER BY pneg) - 1 AS BIGINT) AS visit_order
    FROM walk
"""


# --------------------------------------------------------------------------
# A* to the cheapest region-0 order node. Coordinates are micro-degree
# points (node_id · 1e-6 latitude): the haversine heuristic is tiny but
# nonzero — admissible against the integer edge weights (every edge ≥ 1,
# every h ≤ ~0.07 NM) — so pruning is exercised and the result must equal
# Dijkstra's closed-form tree path (A* is exact; AStar.java:37 wraps the
# same Dijkstra).
# --------------------------------------------------------------------------


def q_astar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.algorithms.paths import astar

    g = _supply_tree_graph(spark, sf_dir, weighted=True)
    target = int(
        _t(spark, sf_dir, "orders")
        .join(_t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(_t(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_regionkey") == 0)
        .agg(F.min(100000 + F.col("o_orderkey")).alias("t"))
        .collect()[0]["t"]
    )
    coords = g.vertices.select(
        "node_id",
        (F.col("node_id") * 1e-6).alias("latitude"),
        F.lit(0.0).alias("longitude"),
    )
    res = astar(g, source=0, target=target, coords=coords)
    return res.paths.select(
        "index",
        "source_node",
        "target_node",
        F.col("total_cost").cast("long").alias("total_cost"),
        "node_ids",
        F.transform(F.col("costs"), lambda c: c.cast("long")).alias("costs"),
    )


Q_ASTAR_SQL = """
    WITH t AS (
        SELECT o_orderkey, o_custkey, c_nationkey
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        WHERE n_regionkey = 0
        ORDER BY o_orderkey ASC LIMIT 1
    )
    SELECT CAST(0 AS BIGINT) AS index, CAST(0 AS BIGINT) AS source_node,
           CAST(100000 + o_orderkey AS BIGINT) AS target_node,
           CAST((1 + c_nationkey % 3) + (1 + o_custkey % 7) + (1 + o_orderkey % 11) AS BIGINT) AS total_cost,
           [CAST(0 AS BIGINT), CAST(10 + c_nationkey AS BIGINT), CAST(2000 + o_custkey AS BIGINT),
            CAST(100000 + o_orderkey AS BIGINT)] AS node_ids,
           [CAST(0 AS BIGINT), CAST(1 + c_nationkey % 3 AS BIGINT),
            CAST((1 + c_nationkey % 3) + (1 + o_custkey % 7) AS BIGINT),
            CAST((1 + c_nationkey % 3) + (1 + o_custkey % 7) + (1 + o_orderkey % 11) AS BIGINT)] AS costs
    FROM t
"""


# --------------------------------------------------------------------------
# Yens K=4 shortest paths over a via-node gadget built from nation: source
# 0 reaches target 1 through via node 100+n with both hops costing 1+n —
# the k shortest paths are exactly the k smallest nationkeys, closed-form
# (reference Yens.java:40; candidate order (totalCost, node sequence)).
# --------------------------------------------------------------------------

_YENS_K = 4


def q_yens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.algorithms.yens import yens

    nation = _t(spark, sf_dir, "nation")
    via = nation.select(
        (100 + F.col("n_nationkey")).cast("long").alias("via"),
        (1.0 + F.col("n_nationkey")).cast("double").alias("w"),
    )
    edges = via.select(F.lit(0).cast("long").alias("src"), F.col("via").alias("dst"), F.col("w").alias("weight")).union(
        via.select(F.col("via").alias("src"), F.lit(1).cast("long").alias("dst"), F.col("w").alias("weight"))
    )
    res = yens(LinkGraph(edges=edges), source=0, target=1, k=_YENS_K)
    return res.paths.select(
        "index",
        "source_node",
        "target_node",
        F.col("total_cost").cast("long").alias("total_cost"),
        "node_ids",
        F.transform(F.col("costs"), lambda c: c.cast("long")).alias("costs"),
    )


Q_YENS_SQL = f"""
    SELECT CAST(n_nationkey AS BIGINT) AS index, CAST(0 AS BIGINT) AS source_node,
           CAST(1 AS BIGINT) AS target_node,
           CAST(2 * (1 + n_nationkey) AS BIGINT) AS total_cost,
           [CAST(0 AS BIGINT), CAST(100 + n_nationkey AS BIGINT), CAST(1 AS BIGINT)] AS node_ids,
           [CAST(0 AS BIGINT), CAST(1 + n_nationkey AS BIGINT), CAST(2 * (1 + n_nationkey) AS BIGINT)] AS costs
    FROM nation WHERE n_nationkey < {_YENS_K}
"""


# --------------------------------------------------------------------------
# Approx Max-k-Cut on a perfect matching: each round a hash-random half
# of the improvable nodes moves (maxkcut.py); a same-community pair splits
# permanently whenever exactly one endpoint is drawn (p=1/2 per round, 32
# rounds, deterministic hash ⇒ every pair splits; split pairs never
# re-merge — neither endpoint has an improving move). The gate is the
# per-edge cut invariant (assignments themselves are engine-arbitrary
# local optima, same contract as K1 coloring).
# --------------------------------------------------------------------------


def q_maxkcut(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.algorithms.maxkcut import approx_max_k_cut

    customer = _t(spark, sf_dir, "customer")
    edges = customer.select(
        (1000 + 2 * F.col("c_custkey")).cast("long").alias("src"),
        (1000001 + 2 * F.col("c_custkey")).cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    nodes = edges.select(F.col("src").alias("node_id")).union(edges.select(F.col("dst")))
    res = approx_max_k_cut(LinkGraph(edges=edges, vertices=nodes), k=2, iterations=1)
    a = res.assignments
    return (
        edges.join(a.withColumnRenamed("node_id", "src").withColumnRenamed("community", "c_src"), "src")
        .join(a.withColumnRenamed("node_id", "dst").withColumnRenamed("community", "c_dst"), "dst")
        .select("src", "dst", (F.col("c_src") != F.col("c_dst")).alias("is_cut"))
    )


Q_MAXKCUT_SQL = """
    SELECT CAST(1000 + 2 * c_custkey AS BIGINT) AS src,
           CAST(1000001 + 2 * c_custkey AS BIGINT) AS dst,
           TRUE AS is_cut
    FROM customer
"""


QUERIES_EXT5 = {
    "mst_supply_bridges": q_mst,
    "k_spanning_star": q_kspan,
    "steiner_supply_terminals": q_steiner,
    "dfs_supply_tree": q_dfs,
    "astar_supply_order": q_astar,
    "yens_via_gadget": q_yens,
    "maxkcut_matching": q_maxkcut,
}

ORACLES_EXT5 = {
    "mst_supply_bridges": Q_MST_SQL,
    "k_spanning_star": Q_KSPAN_SQL,
    "steiner_supply_terminals": Q_STEINER_SQL,
    "dfs_supply_tree": Q_DFS_SQL,
    "astar_supply_order": Q_ASTAR_SQL,
    "yens_via_gadget": Q_YENS_SQL,
    "maxkcut_matching": Q_MAXKCUT_SQL,
}
