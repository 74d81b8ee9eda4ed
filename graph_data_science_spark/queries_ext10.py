"""Round-3 driver-contract queries (batch 10): similarity metric
completions + link-prediction topology functions + one-hot encoding.

- ``node_similarity_cosine``: the reference's third NodeSimilarity metric
  (``CosineSimilarityComputer.java:31-36`` — 0/1-vector cosine,
  |A∩B|/(√|A|·√|B|)) over customer→part baskets.
- ``node_similarity_weighted_jaccard`` / ``_weighted_cosine``: the
  weighted metric family (``JaccardSimilarityComputer.java:40-81``,
  ``CosineSimilarityComputer.java:39-84``) with edge weight = Σ quantity;
  integer-valued weights keep every aggregate bit-exact across engines.
- ``link_prediction_supply``: the alpha link-prediction function family
  (``LinkPredictionFunc.java:38-120``) scored as one DataFrame pass over
  consecutive-customer candidate pairs on the supply web.
- ``one_hot_nation_regions``: ``gds.alpha.ml.oneHotEncoding``
  (``OneHotEncodingFunc.java:33-52``) as a pure column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.linkpred import link_prediction
from graph_data_science_spark.algorithms.similarity import (
    node_similarity,
    node_similarity_weighted,
)
from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.ml.encoding import one_hot_encoding
from graph_data_science_spark.queries import (
    CUSTPART_EDGES_SQL,
    SUPPLY_EDGES_SQL,
    _custpart_graph,
    _e,
    _supply_web_graph,
    _t,
)

# --------------------------------------------------------------------------
# Unweighted cosine NodeSimilarity
# --------------------------------------------------------------------------


def q_node_similarity_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _custpart_graph(spark, sf_dir)
    return node_similarity(g, metric="cosine", top_k=5).select(
        "node1", "node2", "rank", _e(F.col("similarity"), 6).alias("sim_e6")
    )


Q_NODESIM_COSINE_SQL = f"""
    WITH e AS ({CUSTPART_EDGES_SQL}),
    sz AS (SELECT src, COUNT(*) AS sz FROM e GROUP BY src),
    inter AS (
        SELECT a.src AS n1, b.src AS n2, COUNT(*) AS c
        FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
        GROUP BY a.src, b.src
    ),
    half AS (
        SELECT n1, n2, CAST(c AS DOUBLE) / (SQRT(sa.sz) * SQRT(sb.sz)) AS similarity
        FROM inter JOIN sz sa ON sa.src = n1 JOIN sz sb ON sb.src = n2
    ),
    sym AS (SELECT n1, n2, similarity FROM half
            UNION ALL SELECT n2, n1, similarity FROM half),
    ranked AS (
        SELECT n1, n2, similarity,
               ROW_NUMBER() OVER (PARTITION BY n1 ORDER BY similarity DESC, n2 ASC) AS rank
        FROM sym
    )
    SELECT CAST(n1 AS BIGINT) AS node1, CAST(n2 AS BIGINT) AS node2,
           CAST(rank AS INT) AS rank,
           CAST(FLOOR(similarity * 1e6 + 0.3183098861837907) AS BIGINT) AS sim_e6
    FROM ranked WHERE rank <= 5
"""

# --------------------------------------------------------------------------
# Weighted NodeSimilarity (weight = Σ l_quantity per customer→part edge)
# --------------------------------------------------------------------------

WEIGHTED_BASKET_EDGES_SQL = """
    SELECT o_custkey AS src, l_partkey AS dst, SUM(l_quantity) AS w
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_custkey, l_partkey
"""


def _weighted_basket_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            F.col("l_partkey").cast("long").alias("dst"),
            F.col("l_quantity").cast("double").alias("weight"),
        )
    )
    max_id = edges.agg(F.greatest(F.max("src"), F.max("dst")).alias("m")).collect()[0]["m"]
    return LinkGraph(edges=edges, node_count=int(max_id) + 1)


def _q_nodesim_weighted(spark: SparkSession, sf_dir: str, metric: str) -> DataFrame:
    g = _weighted_basket_graph(spark, sf_dir)
    return node_similarity_weighted(g, metric=metric, top_k=5).select(
        "node1", "node2", "rank", _e(F.col("similarity"), 6).alias("sim_e6")
    )


def q_nodesim_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q_nodesim_weighted(spark, sf_dir, "jaccard")


def q_nodesim_weighted_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q_nodesim_weighted(spark, sf_dir, "cosine")


def _weighted_sql(sim_expr: str) -> str:
    return f"""
    WITH e AS ({WEIGHTED_BASKET_EDGES_SQL}),
    st AS (
        SELECT src, COUNT(*) AS sz, SUM(w) AS wsum, SUM(w * w) AS w2sum
        FROM e GROUP BY src
    ),
    pair AS (
        SELECT a.src AS n1, b.src AS n2,
               SUM(LEAST(a.w, b.w)) AS smin, SUM(a.w * b.w) AS sprod
        FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
        GROUP BY a.src, b.src
    ),
    half AS (
        SELECT n1, n2, {sim_expr} AS similarity
        FROM pair JOIN st sa ON sa.src = n1 JOIN st sb ON sb.src = n2
    ),
    sym AS (SELECT n1, n2, similarity FROM half
            UNION ALL SELECT n2, n1, similarity FROM half),
    ranked AS (
        SELECT n1, n2, similarity,
               ROW_NUMBER() OVER (PARTITION BY n1 ORDER BY similarity DESC, n2 ASC) AS rank
        FROM sym WHERE similarity >= 0.0
    )
    SELECT CAST(n1 AS BIGINT) AS node1, CAST(n2 AS BIGINT) AS node2,
           CAST(rank AS INT) AS rank,
           CAST(FLOOR(similarity * 1e6 + 0.3183098861837907) AS BIGINT) AS sim_e6
    FROM ranked WHERE rank <= 5
"""


Q_NODESIM_WJACCARD_SQL = _weighted_sql("smin / (sa.wsum + sb.wsum - smin)")
Q_NODESIM_WCOSINE_SQL = _weighted_sql("sprod / (SQRT(sa.w2sum) * SQRT(sb.w2sum))")

# --------------------------------------------------------------------------
# Link-prediction topology measures on the supply web
# --------------------------------------------------------------------------


def q_link_prediction_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _supply_web_graph(spark, sf_dir)
    cust = _t(spark, sf_dir, "customer").select(
        (2000 + F.col("c_custkey")).cast("long").alias("node1")
    )
    pairs = cust.join(
        cust.select(F.col("node1").alias("node2")),
        F.col("node1") + 1 == F.col("node2"),
    ).select("node1", "node2")
    return link_prediction(g, pairs, direction="both").select(
        "node1",
        "node2",
        F.col("common_neighbors").cast("long").alias("common_neighbors"),
        _e(F.col("adamic_adar"), 6).alias("adamic_adar_e6"),
        _e(F.col("resource_allocation"), 6).alias("resource_allocation_e6"),
        F.col("preferential_attachment").cast("long").alias("preferential_attachment"),
        F.col("total_neighbors").cast("long").alias("total_neighbors"),
    )


Q_LINKPRED_SQL = f"""
    WITH e AS ({SUPPLY_EDGES_SQL}),
    nbr AS (
        SELECT src AS node, dst AS nbr FROM e WHERE src <> dst
        UNION
        SELECT dst, src FROM e WHERE src <> dst
    ),
    deg AS (SELECT node, COUNT(*) AS deg FROM nbr GROUP BY node),
    pairs AS (
        SELECT 2000 + a.c_custkey AS n1, 2000 + b.c_custkey AS n2
        FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
    ),
    inter AS (
        SELECT p.n1, p.n2, COUNT(*) AS cn,
               SUM(1.0 / LN(dz.deg)) AS aa, SUM(1.0 / dz.deg) AS ra
        FROM pairs p
        JOIN nbr na ON na.node = p.n1
        JOIN nbr nb ON nb.node = p.n2 AND nb.nbr = na.nbr
        JOIN deg dz ON dz.node = na.nbr
        WHERE p.n1 <> p.n2
        GROUP BY p.n1, p.n2
    )
    SELECT CAST(p.n1 AS BIGINT) AS node1, CAST(p.n2 AS BIGINT) AS node2,
           CAST(COALESCE(i.cn, 0) AS BIGINT) AS common_neighbors,
           CAST(FLOOR(COALESCE(i.aa, 0) * 1e6 + 0.3183098861837907) AS BIGINT) AS adamic_adar_e6,
           CAST(FLOOR(COALESCE(i.ra, 0) * 1e6 + 0.3183098861837907) AS BIGINT) AS resource_allocation_e6,
           CAST(COALESCE(d1.deg, 0) * COALESCE(d2.deg, 0) AS BIGINT) AS preferential_attachment,
           CAST(COALESCE(d1.deg, 0) + COALESCE(d2.deg, 0) - COALESCE(i.cn, 0) AS BIGINT) AS total_neighbors
    FROM pairs p
    LEFT JOIN deg d1 ON d1.node = p.n1
    LEFT JOIN deg d2 ON d2.node = p.n2
    LEFT JOIN inter i ON i.n1 = p.n1 AND i.n2 = p.n2
"""

# --------------------------------------------------------------------------
# One-hot encoding
# --------------------------------------------------------------------------


def q_one_hot_nation_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    available = F.sequence(F.lit(0), F.lit(4)).cast("array<bigint>")
    selected = F.array(
        F.col("n_regionkey").cast("long"), F.pmod(F.col("n_nationkey"), F.lit(5)).cast("long")
    )
    return nation.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        one_hot_encoding(available, selected).alias("encoding"),
    )


Q_ONE_HOT_SQL = """
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
           list_transform(range(0, 5),
               i -> CAST(CASE WHEN i = n_regionkey OR i = n_nationkey % 5
                              THEN 1 ELSE 0 END AS BIGINT)) AS encoding
    FROM nation
"""


QUERIES_EXT10 = {
    "node_similarity_cosine": q_node_similarity_cosine,
    "node_similarity_weighted_jaccard": q_nodesim_weighted_jaccard,
    "node_similarity_weighted_cosine": q_nodesim_weighted_cosine,
    "link_prediction_supply": q_link_prediction_supply,
    "one_hot_nation_regions": q_one_hot_nation_regions,
}

ORACLES_EXT10 = {
    "node_similarity_cosine": Q_NODESIM_COSINE_SQL,
    "node_similarity_weighted_jaccard": Q_NODESIM_WJACCARD_SQL,
    "node_similarity_weighted_cosine": Q_NODESIM_WCOSINE_SQL,
    "link_prediction_supply": Q_LINKPRED_SQL,
    "one_hot_nation_regions": Q_ONE_HOT_SQL,
}
