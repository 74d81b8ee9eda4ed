"""Round-3 driver-contract queries (batch 20): weighted betweenness.

``betweenness_weighted_ring``: weighted Brandes (reference
``algo/.../betweenness/WeightedForwardTraverser.java:79-116`` — Dijkstra
distances, equal-cost σ splitting, δ backward sweep) on a deterministic
ring-plus-chord digraph over the first 10 nations: ``i → (i+1)%10`` with
weight ``(i%3)+1`` and ``i → (i+2)%10`` with weight ``(i%4)+2``. Chords
beat two ring hops exactly when their weights say so, producing pairs
with multiple equal-cost shortest paths — the σ-splitting case that
distinguishes weighted Brandes from hop-count Brandes. Weights are small
integers, so every path cost is an exact double and the shortest-path
sets agree bit-for-bit across engines.

The DuckDB oracle is brute force: enumerate ALL simple paths with a
recursive CTE (10 nodes, out-degree 2 — bounded), keep per-(s,t) minimum
cost, and sum per-pair through-ratios over interior nodes — the Brandes
definition computed literally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.queries import _e, _t

QUERIES_EXT20: dict = {}
ORACLES_EXT20: dict = {}


def _ring_chord_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    nodes = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey") < 10)
        .select(F.col("n_nationkey").cast("long").alias("node_id"))
    )
    ring = nodes.select(
        F.col("node_id").alias("src"),
        ((F.col("node_id") + 1) % 10).alias("dst"),
        ((F.col("node_id") % 3) + 1).cast("double").alias("weight"),
    )
    chord = nodes.select(
        F.col("node_id").alias("src"),
        ((F.col("node_id") + 2) % 10).alias("dst"),
        ((F.col("node_id") % 4) + 2).cast("double").alias("weight"),
    )
    return LinkGraph(edges=ring.union(chord), vertices=nodes, node_count=10)


def q_betweenness_weighted_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.algorithms.betweenness import betweenness_weighted

    g = _ring_chord_graph(spark, sf_dir)
    return betweenness_weighted(g).select(
        "node_id", _e(F.col("score"), 6).alias("score_e6")
    )


Q_BETWEENNESS_WEIGHTED_SQL = """
WITH RECURSIVE nodes AS (
    SELECT CAST(n_nationkey AS BIGINT) AS id FROM nation WHERE n_nationkey < 10
),
e AS (
    SELECT id AS src, (id + 1) % 10 AS dst, CAST((id % 3) + 1 AS DOUBLE) AS w FROM nodes
    UNION ALL
    SELECT id, (id + 2) % 10, CAST((id % 4) + 2 AS DOUBLE) FROM nodes
),
paths AS (
    SELECT src AS s, dst AS t, w AS cost, [src, dst] AS vis FROM e
    UNION ALL
    SELECT p.s, e.dst, p.cost + e.w, list_append(p.vis, e.dst)
    FROM paths p JOIN e ON e.src = p.t
    WHERE NOT list_contains(p.vis, e.dst)
),
best AS (SELECT s, t, MIN(cost) AS bc FROM paths GROUP BY s, t),
sp AS (
    SELECT p.s, p.t, p.vis
    FROM paths p JOIN best b ON b.s = p.s AND b.t = p.t AND p.cost = b.bc
),
sigma AS (SELECT s, t, COUNT(*) AS sig FROM sp GROUP BY s, t),
thru AS (
    SELECT s, t, UNNEST(list_slice(vis, 2, length(vis) - 1)) AS v FROM sp
),
thru_counts AS (SELECT s, t, v, COUNT(*) AS sig_v FROM thru GROUP BY s, t, v),
dep AS (
    SELECT tc.v AS node_id, SUM(CAST(tc.sig_v AS DOUBLE) / sg.sig) AS score
    FROM thru_counts tc JOIN sigma sg ON sg.s = tc.s AND sg.t = tc.t
    GROUP BY tc.v
)
SELECT n.id AS node_id,
       CAST(FLOOR(COALESCE(dep.score, 0) * 1e6 + 0.3183098861837907) AS BIGINT) AS score_e6
FROM nodes n LEFT JOIN dep ON dep.node_id = n.id
"""

QUERIES_EXT20["betweenness_weighted_ring"] = q_betweenness_weighted_ring
ORACLES_EXT20["betweenness_weighted_ring"] = Q_BETWEENNESS_WEIGHTED_SQL
