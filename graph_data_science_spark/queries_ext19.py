"""Round-3 driver-contract queries (batch 19): CNARW sampler bias.

- ``cnarw_overlap_bias``: the defining math of the reference's
  common-neighbour-aware random-walk sampler
  (``graph-sampling/.../cnarw/CommonNeighbourAwareNextNodeStrategy.java:51-81``):
  for every adjacent (u, v) of the symmetrized co-ordered-parts graph,
  ``overlap = |N(u) ∩ N(v)| / min(|N(u)|, |N(v)|)`` and the walker's
  acceptance probability ``bias = 1 − overlap``. The walk itself is
  hash-seeded and pytest-gated (``tests/test_linkpred_simext.py``); this
  row gates the bias table the walk consumes, bit-for-bit — cn/du/dv are
  exact integers, so the double division is IEEE-identical across engines
  and the floor-scaled fixed-point bucket can't flip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.queries import COPART_EDGES_SQL, _copart_graph, _e

QUERIES_EXT19: dict = {}
ORACLES_EXT19: dict = {}


def q_cnarw_overlap_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.graph.subgraph import cnarw_edge_bias

    g = _copart_graph(spark, sf_dir)
    return cnarw_edge_bias(g).select(
        "u", "v", "cn", "du", "dv", _e(F.col("bias"), 6).alias("bias_e6")
    )


Q_CNARW_SQL = f"""
WITH e AS MATERIALIZED ({COPART_EDGES_SQL}),
und AS (SELECT a AS s, b AS d FROM e UNION SELECT b, a FROM e),
deg AS (SELECT s, COUNT(*) AS dg FROM und GROUP BY s),
cn AS (
    SELECT p.s AS u, p.d AS v, COUNT(*) AS cn
    FROM und p JOIN und za ON za.s = p.s JOIN und zb ON zb.s = p.d AND zb.d = za.d
    GROUP BY p.s, p.d
)
SELECT CAST(p.s AS BIGINT) AS u,
       CAST(p.d AS BIGINT) AS v,
       CAST(COALESCE(cn.cn, 0) AS BIGINT) AS cn,
       CAST(du.dg AS BIGINT) AS du,
       CAST(dv.dg AS BIGINT) AS dv,
       CAST(FLOOR((1.0 - CAST(COALESCE(cn.cn, 0) AS DOUBLE) / LEAST(du.dg, dv.dg))
                  * 1e6 + 0.3183098861837907) AS BIGINT) AS bias_e6
FROM und p
LEFT JOIN cn ON cn.u = p.s AND cn.v = p.d
JOIN deg du ON du.s = p.s
JOIN deg dv ON dv.s = p.d
"""

QUERIES_EXT19["cnarw_overlap_bias"] = q_cnarw_overlap_bias
ORACLES_EXT19["cnarw_overlap_bias"] = Q_CNARW_SQL


# --- community post-processing (CommunityCompanion analog) -----------------
# ``minCommunitySize`` + ``consecutiveIds`` applied to WCC over the order
# chains (reference CommunityCompanion.java:100-111,
# ConsecutiveLongNodePropertyValues.java:46-59): whole components below the
# size bar are dropped FIRST, then surviving ids densify to 0..k-1 in
# first-appearance (min surviving node id) order. On this fixture the raw
# component id IS the component's min node id, so first-appearance order ==
# component-id order and DENSE_RANK replays the mapping exactly.


def q_wcc_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.algorithms.community_post import (
        community_postprocess,
    )
    from graph_data_science_spark.algorithms.wcc import wcc
    from graph_data_science_spark.queries import _order_chain_graph

    g = _order_chain_graph(spark, sf_dir)
    comps = wcc(g).components
    return community_postprocess(
        comps,
        community_col="component",
        min_community_size=10,
        consecutive_ids=True,
    ).select("node_id", "component")


Q_WCC_CONSECUTIVE_SQL = """
WITH comp AS (
    SELECT CAST(o_orderkey AS BIGINT) AS node_id,
           CAST(MIN(o_orderkey) OVER (PARTITION BY o_custkey) AS BIGINT) AS component
    FROM orders
),
kept AS (
    SELECT node_id, component
    FROM (SELECT node_id, component,
                 COUNT(*) OVER (PARTITION BY component) AS sz
          FROM comp)
    WHERE sz >= 10
)
SELECT node_id,
       CAST(DENSE_RANK() OVER (ORDER BY component) - 1 AS BIGINT) AS component
FROM kept
"""

QUERIES_EXT19["wcc_consecutive_chains"] = q_wcc_consecutive
ORACLES_EXT19["wcc_consecutive_chains"] = Q_WCC_CONSECUTIVE_SQL
