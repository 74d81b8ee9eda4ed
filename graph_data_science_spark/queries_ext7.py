"""Round-3 driver-contract queries (batch 7): biconnectivity + DAG paths.

- ``bridges_hub_cliques`` / ``articulation_hub_cliques``: Tarjan–Vishkin
  bridges and cut vertices (reference ``bridges/Bridges.java:33``,
  ``articulationpoints/ArticulationPoints.java:29``) on a hub-and-clique
  fixture with closed-form answers: a hub node linked to one corner of a
  triangle per nation, plus one pendant supplier per supplier row. Every
  link/pendant edge is a bridge; the hub and every linked corner are the
  articulation points; triangle edges are in 2-edge-connected blocks.
  The fixture is depth-3 by construction (the level-synchronized interval
  sweeps cost O(depth) rounds).
- ``dag_longest_path_routes``: reference
  ``dag/longestPath/DagLongestPath.java:58`` — per-node heaviest incoming
  path on a two-route DAG (hub → customer-mid → sink vs hub → sink
  direct) where the winning route flips on ``c_custkey % 7``; paths,
  per-hop costs and the bulk-synchronous improvement tie-break
  (strict ``>`` keeps the earlier round's parent) are all closed-form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.biconnectivity import biconnectivity
from graph_data_science_spark.algorithms.dag import dag_longest_path
from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.queries import _t

# --------------------------------------------------------------------------
# hub-and-cliques biconnectivity fixture
#   node 0              — hub
#   1+3n, 2+3n, 3+3n    — triangle per nation n (always 25 nations)
#   76 + s_suppkey      — pendant leaf per supplier (attached to its
#                          nation's linked corner 1+3*s_nationkey);
#                          76 clears the last corner (3*25 = 75) because
#                          the testdata's s_suppkey starts at 0
# --------------------------------------------------------------------------


def _hub_clique_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    n3 = F.col("n_nationkey").cast("long") * 3
    links = nation.select(F.lit(0).cast("long").alias("src"), (n3 + 1).alias("dst"))
    tri = (
        nation.select((n3 + 1).alias("src"), (n3 + 2).alias("dst"))
        .union(nation.select((n3 + 2).alias("src"), (n3 + 3).alias("dst")))
        .union(nation.select((n3 + 1).alias("src"), (n3 + 3).alias("dst")))
    )
    pendants = supplier.select(
        (F.col("s_nationkey").cast("long") * 3 + 1).alias("src"),
        (F.col("s_suppkey").cast("long") + 76).alias("dst"),
    )
    edges = links.union(tri).union(pendants).withColumn("weight", F.lit(1.0))
    return LinkGraph(edges=edges)


def q_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = biconnectivity(_hub_clique_graph(spark, sf_dir))
    return res.bridges.select(
        F.least("from", "to").alias("u"), F.greatest("from", "to").alias("v")
    )


Q_BRIDGES_SQL = """
    SELECT CAST(0 AS BIGINT) AS u, CAST(1 + 3 * n_nationkey AS BIGINT) AS v FROM nation
    UNION ALL
    SELECT CAST(1 + 3 * s_nationkey AS BIGINT), CAST(76 + s_suppkey AS BIGINT) FROM supplier
"""


def q_articulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = biconnectivity(_hub_clique_graph(spark, sf_dir))
    return res.articulation_points.select("node_id")


Q_ARTICULATION_SQL = """
    SELECT CAST(0 AS BIGINT) AS node_id
    UNION ALL
    SELECT CAST(1 + 3 * n_nationkey AS BIGINT) FROM nation
"""


# --------------------------------------------------------------------------
# DAG longest path: two-route race
#   0 → c (weight c%7+1), c → off+c (4.0), 0 → off+c (8.0); off = max custkey.
#   Round 1 settles the direct route (cost 8); round 2 improves via the mid
#   only when (c%7+1)+4 > 8, i.e. c%7 >= 4 — a tie (c%7 == 3) keeps the
#   direct parent because improvement is strict.
# --------------------------------------------------------------------------


def q_dag_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    # testdata keys are 0-based: mid(c) = c+1 keeps the hub id 0 unique
    # (c=0 would otherwise self-loop the hub = a cycle), sinks start past
    # the last mid.
    off = int(customer.agg(F.max("c_custkey").alias("m")).collect()[0]["m"]) + 1
    c = F.col("c_custkey").cast("long")
    mid_in = customer.select(
        F.lit(0).cast("long").alias("src"), (c + 1).alias("dst"),
        (c % 7 + 1).cast("double").alias("weight"),
    )
    sink_via = customer.select(
        (c + 1).alias("src"), (c + 1 + off).alias("dst"), F.lit(4.0).alias("weight")
    )
    sink_direct = customer.select(
        F.lit(0).cast("long").alias("src"), (c + 1 + off).alias("dst"),
        F.lit(8.0).alias("weight"),
    )
    g = LinkGraph(edges=mid_in.union(sink_via).union(sink_direct), node_count=2 * off + 1)
    res = dag_longest_path(g)
    return res.paths.select("target_node", "total_cost", "node_ids", "costs")


Q_DAG_LONGEST_SQL = """
    WITH off AS (SELECT MAX(c_custkey) + 1 AS m FROM customer)
    SELECT CAST(0 AS BIGINT) AS target_node, 0.0 AS total_cost,
           [CAST(0 AS BIGINT)] AS node_ids, [0.0] AS costs
    UNION ALL
    SELECT CAST(c_custkey + 1 AS BIGINT),
           CAST(c_custkey % 7 + 1 AS DOUBLE),
           [CAST(0 AS BIGINT), CAST(c_custkey + 1 AS BIGINT)],
           [0.0, CAST(c_custkey % 7 + 1 AS DOUBLE)]
      FROM customer
    UNION ALL
    SELECT CAST(c_custkey + 1 + off.m AS BIGINT),
           CASE WHEN c_custkey % 7 >= 4
                THEN CAST(c_custkey % 7 + 5 AS DOUBLE) ELSE 8.0 END,
           CASE WHEN c_custkey % 7 >= 4
                THEN [CAST(0 AS BIGINT), CAST(c_custkey + 1 AS BIGINT),
                      CAST(c_custkey + 1 + off.m AS BIGINT)]
                ELSE [CAST(0 AS BIGINT), CAST(c_custkey + 1 + off.m AS BIGINT)] END,
           CASE WHEN c_custkey % 7 >= 4
                THEN [0.0, CAST(c_custkey % 7 + 1 AS DOUBLE),
                      CAST(c_custkey % 7 + 5 AS DOUBLE)]
                ELSE [0.0, 8.0] END
      FROM customer, off
"""


# --------------------------------------------------------------------------
# prize-collecting Steiner star fixture
#   hub node = customer count (one past the last 0-based custkey); one
#   edge hub→custkey with cost (custkey % 7) + 1; prize(custkey) =
#   max(acctbal, 0) / 1000. The MST of a star IS the star, so strong
#   pruning's keep rule (prize > cost strictly, StrongPruning.java:112)
#   is closed-form per leaf; ties (acctbal exactly 1000·cost) prune in
#   both engines (same double arithmetic).
# --------------------------------------------------------------------------


def q_prize_steiner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """prize_steiner_tree (reference algo/.../pricesteiner/PCSTFast.java +
    StrongPruning.java) on a star: parent = hub for kept leaves, -2 for
    pruned, -1 for the hub root."""
    from graph_data_science_spark.algorithms.spanning import prize_steiner_tree

    cust = _t(spark, sf_dir, "customer")
    n = cust.count()
    edges = cust.select(
        F.lit(int(n)).cast("long").alias("src"),
        F.col("c_custkey").cast("long").alias("dst"),
        (F.col("c_custkey") % 7 + 1).cast("double").alias("weight"),
    )
    prizes = cust.select(
        F.col("c_custkey").cast("long").alias("node_id"),
        (F.greatest(F.col("c_acctbal").cast("double"), F.lit(0.0)) / F.lit(1000.0)).alias(
            "prize"
        ),
    )
    g = LinkGraph(edges=edges, node_count=int(n) + 1)
    res = prize_steiner_tree(g, prizes, root=int(n))
    return res.tree.select("node_id", "parent", "cost_to_parent")


Q_PRIZE_STEINER_SQL = """
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS hub FROM customer),
    c AS (
      SELECT CAST(c_custkey AS BIGINT) AS node_id,
             CAST(c_custkey % 7 + 1 AS DOUBLE) AS cost,
             GREATEST(CAST(c_acctbal AS DOUBLE), 0.0) / 1000.0 AS prize
        FROM customer
    )
    SELECT node_id,
           CASE WHEN prize > cost THEN (SELECT hub FROM n)
                ELSE CAST(-2 AS BIGINT) END AS parent,
           CASE WHEN prize > cost THEN cost ELSE 0.0 END AS cost_to_parent
      FROM c
    UNION ALL
    SELECT (SELECT hub FROM n) AS node_id,
           CAST(-1 AS BIGINT) AS parent,
           0.0 AS cost_to_parent
"""


QUERIES_EXT7 = {
    "bridges_hub_cliques": q_bridges,
    "articulation_hub_cliques": q_articulation,
    "dag_longest_path_routes": q_dag_longest,
    "prize_steiner_customers": q_prize_steiner,
}

ORACLES_EXT7 = {
    "bridges_hub_cliques": Q_BRIDGES_SQL,
    "articulation_hub_cliques": Q_ARTICULATION_SQL,
    "dag_longest_path_routes": Q_DAG_LONGEST_SQL,
    "prize_steiner_customers": Q_PRIZE_STEINER_SQL,
}
