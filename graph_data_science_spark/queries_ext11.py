"""Round-3 driver-contract queries (batch 11): the ``gds.similarity.*``
vector-function family, the KNN per-property metric family, and
random-walk visit counting.

- ``similarity_functions_baskets``: all six ``gds.similarity.*`` functions
  (``proc/common/.../functions/SimilaritiesFunc.java:40-118``) over paired
  order-quantity vectors — multiset jaccard (duplicates count), raw cosine,
  pearson, euclidean distance + similarity, distinct-set overlap, in one
  whole-stage-codegen scan.
- ``knn_euclidean_embeddings`` / ``knn_combined_embeddings``: NN-descent
  with the reference's Euclidean metric (``metrics/Euclidean.java:28-40``)
  and the multi-property combined mean (``CombinedSimilarityComputer.java:40-46``
  — (cos+1)/2 on the embedding + 1/(1+|Δ|) on a scalar), run to the exact
  fixed point on a 40-vector sub-corpus so brute-force SQL is the oracle
  (the reference's own exact-on-small-fixture KnnTest strategy).
- ``random_walk_visit_counts_supply``: ``gds.randomWalk.stats``
  (``traversal/RandomWalkCountingNodeVisits.java:40``) — per-node visit
  tallies over portable-RNG walks, bit-replayed in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark import functions as GF
from graph_data_science_spark.algorithms.knn import knn
from graph_data_science_spark.algorithms.walks import random_walk_visit_counts
from graph_data_science_spark.graph.ranks import ordered_rank
from graph_data_science_spark.queries import _e, _t
from graph_data_science_spark.queries_ext import _supply_tree_graph
from graph_data_science_spark.queries_ext2 import _WALK_LEN, _WALK_SEED, Q_WALKS_SQL

# --------------------------------------------------------------------------
# gds.similarity.* function family over paired order-quantity vectors
# --------------------------------------------------------------------------


def q_similarity_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of consecutive (by orderkey rank) orders with ≥4 line items;
    vectors = the first 4 quantities in linenumber order. Quantities are
    small integers with heavy duplication — exactly the regime where the
    reference's MULTISET jaccard differs from the naive set version."""
    li = _t(spark, sf_dir, "lineitem")
    vecs = (
        li.groupBy("l_orderkey")
        .agg(
            F.slice(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col("l_linenumber"),
                                F.col("l_quantity").cast("double").alias("l_quantity"),
                            )
                        )
                    ),
                    lambda s: s["l_quantity"],
                ),
                1,
                4,
            ).alias("v"),
            F.count("*").alias("cnt"),
        )
        .filter(F.col("cnt") >= 4)
        .select(F.col("l_orderkey").cast("long").alias("okey"), "v")
    )
    # distributed rank (bit-identical to row_number() OVER (ORDER BY okey))
    ranked = ordered_rank(vecs, ["okey"], rank_col="_r0").withColumn(
        "r", (F.col("_r0") + 1).cast("int")
    ).drop("_r0")
    a = ranked.filter(F.col("r") % 2 == 1).select(
        ((F.col("r") + 1) / 2).cast("long").alias("pair_id"), F.col("okey").alias("a"), F.col("v").alias("va")
    )
    b = ranked.filter(F.col("r") % 2 == 0).select(
        (F.col("r") / 2).cast("long").alias("pair_id"), F.col("okey").alias("b"), F.col("v").alias("vb")
    )
    va, vb = F.col("va"), F.col("vb")
    return (
        a.join(b, "pair_id")
        .select(
            "a",
            "b",
            _e(GF.jaccard(va, vb), 6).alias("jaccard_e6"),
            _e(GF.cosine(va, vb), 6).alias("cosine_e6"),
            _e(GF.pearson(va, vb), 6).alias("pearson_e6"),
            _e(GF.euclidean_distance(va, vb), 6).alias("dist_e6"),
            _e(GF.euclidean(va, vb), 6).alias("euclid_e6"),
            _e(GF.overlap(va, vb), 6).alias("overlap_e6"),
        )
    )


_FLOOR = "0.3183098861837907"


def _fe(expr: str, scale: int) -> str:
    return f"CAST(FLOOR(({expr}) * 1e{scale} + {_FLOOR}) AS BIGINT)"


Q_SIMFUNC_SQL = f"""
    WITH vecs AS (
        SELECT CAST(l_orderkey AS BIGINT) AS okey,
               (list(CAST(l_quantity AS DOUBLE) ORDER BY l_linenumber, l_quantity))[1:4] AS v
        FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) >= 4
    ),
    ranked AS (SELECT okey, v, ROW_NUMBER() OVER (ORDER BY okey) AS r FROM vecs),
    pa AS (SELECT CAST((r + 1) / 2 AS BIGINT) AS pair_id, okey AS a, v AS va
           FROM ranked WHERE r % 2 = 1),
    pb AS (SELECT CAST(r / 2 AS BIGINT) AS pair_id, okey AS b, v AS vb
           FROM ranked WHERE r % 2 = 0),
    pairs AS (SELECT pair_id, a, b, va, vb FROM pa JOIN pb USING (pair_id)),
    -- multiset jaccard: Σ_v min(count_a(v), count_b(v)) over 4+4 elements
    ca AS (SELECT pair_id, x, COUNT(*) AS c1
           FROM (SELECT pair_id, UNNEST(va) AS x FROM pairs) GROUP BY pair_id, x),
    cb AS (SELECT pair_id, x, COUNT(*) AS c2
           FROM (SELECT pair_id, UNNEST(vb) AS x FROM pairs) GROUP BY pair_id, x),
    inter AS (SELECT pair_id, SUM(LEAST(c1, c2)) AS mi,
                     SUM(CASE WHEN c2 > 0 AND c1 > 0 THEN 1 ELSE 0 END) AS di
              FROM ca JOIN cb USING (pair_id, x) GROUP BY pair_id),
    elems AS (SELECT pair_id, i,
                     CAST(va[i] AS DOUBLE) AS x, CAST(vb[i] AS DOUBLE) AS y
              FROM pairs, UNNEST(range(1, 5)) AS t(i)),
    stats AS (
        SELECT pair_id,
               SUM(x * y) AS dot, SUM(x * x) AS xx, SUM(y * y) AS yy,
               AVG(x) AS mx, AVG(y) AS my,
               SUM((x - y) * (x - y)) AS ssd
        FROM elems GROUP BY pair_id
    ),
    pear AS (
        SELECT pair_id,
               SUM((x - mx) * (y - my)) AS pdot,
               SUM((x - mx) * (x - mx)) AS pxx,
               SUM((y - my) * (y - my)) AS pyy
        FROM elems JOIN stats USING (pair_id) GROUP BY pair_id
    )
    SELECT p.a, p.b,
           {_fe("COALESCE(inter.mi, 0) / (8.0 - COALESCE(inter.mi, 0))", 6)} AS jaccard_e6,
           {_fe("stats.dot / SQRT(stats.xx * stats.yy)", 6)} AS cosine_e6,
           {_fe("CASE WHEN pear.pxx * pear.pyy > 0 THEN pear.pdot / SQRT(pear.pxx * pear.pyy) ELSE 0.0 END", 6)} AS pearson_e6,
           {_fe("SQRT(stats.ssd)", 6)} AS dist_e6,
           {_fe("1.0 / (1.0 + SQRT(stats.ssd))", 6)} AS euclid_e6,
           {_fe("COALESCE(inter.di, 0) / 4.0", 6)} AS overlap_e6
    FROM pairs p
    JOIN stats USING (pair_id) JOIN pear USING (pair_id)
    LEFT JOIN inter USING (pair_id)
"""

# --------------------------------------------------------------------------
# KNN metric family: euclidean + combined, exact on the 40-vector fixture
# --------------------------------------------------------------------------

_KNN_ARGS = dict(
    k=5,
    id_col="vec_id",
    vec_col="embedding",
    max_iterations=20,
    min_iterations=20,
    delta_threshold=0.0,
    random_seed=3,
    explore=6,
)


def q_knn_euclidean(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 40)
    res = knn(emb, metric="euclidean", **_KNN_ARGS)
    return res.neighbors.select(
        "node1", "node2", "rank", _e(F.col("similarity"), 4).alias("sim_e4")
    )


_KNN_EUCL_CORE = """
    WITH sub AS (SELECT * FROM embeddings WHERE vec_id < 40),
    ae AS MATERIALIZED (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM sub, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
    sims AS (
        SELECT a.vec_id AS node1, b.vec_id AS node2,
               {SIM} AS sim
        FROM ae a JOIN ae b ON a.i = b.i AND a.vec_id <> b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ),
    ranked AS (
        SELECT node1, node2, sim,
               ROW_NUMBER() OVER (PARTITION BY node1 ORDER BY sim DESC, node2 ASC) AS rank
        FROM sims
    )
    SELECT node1, node2, CAST(rank AS INT) AS rank,
           CAST(FLOOR(sim * 1e4 + 0.3183098861837907) AS BIGINT) AS sim_e4
    FROM ranked WHERE rank <= 5
"""

Q_KNN_EUCL_SQL = _KNN_EUCL_CORE.format(
    SIM="1.0 / (1.0 + SQRT(SUM((a.x - b.x) * (a.x - b.x))))"
)


def q_knn_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined = mean of (cos+1)/2 on the embedding and 1/(1+|Δ|) on the
    scalar ``vec_id % 7`` — both reference metrics, averaged per
    ``CombinedSimilarityComputer``."""
    emb = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 40)
        .withColumn("scalar", (F.col("vec_id") % 7).cast("double"))
    )
    res = knn(
        emb,
        properties=[("embedding", "gds-cosine"), ("scalar", "absdiff")],
        **_KNN_ARGS,
    )
    return res.neighbors.select(
        "node1", "node2", "rank", _e(F.col("similarity"), 4).alias("sim_e4")
    )


Q_KNN_COMBINED_SQL = _KNN_EUCL_CORE.format(
    SIM=(
        # (cos+1)/2 with the reference's safeSimilarity zero-norm guard
        "(CASE WHEN SUM(a.x * a.x) * SUM(b.x * b.x) > 0"
        " THEN (SUM(a.x * b.x) / SQRT(SUM(a.x * a.x) * SUM(b.x * b.x)) + 1.0) / 2.0"
        " ELSE 0.0 END"
        " + 1.0 / (1.0 + ABS(CAST(a.vec_id % 7 AS DOUBLE) - CAST(b.vec_id % 7 AS DOUBLE)))) / 2.0"
    )
)

# --------------------------------------------------------------------------
# Random-walk visit counts (gds.randomWalk.stats)
# --------------------------------------------------------------------------


def q_walk_visit_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _supply_tree_graph(spark, sf_dir, weighted=False)
    nation = _t(spark, sf_dir, "nation")
    starts = nation.select((10 + F.col("n_nationkey")).cast("long").alias("node_id"))
    return random_walk_visit_counts(
        g,
        walks_per_node=1,
        walk_length=_WALK_LEN,
        random_seed=_WALK_SEED,
        start_nodes=starts,
        rng="portable",
    ).select("node_id", "visits")


Q_WALK_VISITS_SQL = f"""
    WITH walks AS ({Q_WALKS_SQL}),
    counts AS (SELECT node_id, COUNT(*) AS visits FROM walks GROUP BY node_id),
    allnodes AS (
        SELECT CAST(r_regionkey AS BIGINT) AS node_id FROM region
        UNION ALL SELECT 10 + n_nationkey FROM nation
        UNION ALL SELECT 50 + s_suppkey FROM supplier
        UNION ALL SELECT 2000 + c_custkey FROM customer
        UNION ALL SELECT 100000 + o_orderkey FROM orders
    )
    SELECT a.node_id, CAST(COALESCE(c.visits, 0) AS BIGINT) AS visits
    FROM allnodes a LEFT JOIN counts c ON c.node_id = a.node_id
"""


QUERIES_EXT11 = {
    "similarity_functions_baskets": q_similarity_functions,
    "knn_euclidean_embeddings": q_knn_euclidean,
    "knn_combined_embeddings": q_knn_combined,
    "random_walk_visit_counts_supply": q_walk_visit_counts,
}

ORACLES_EXT11 = {
    "similarity_functions_baskets": Q_SIMFUNC_SQL,
    "knn_euclidean_embeddings": Q_KNN_EUCL_SQL,
    "knn_combined_embeddings": Q_KNN_COMBINED_SQL,
    "random_walk_visit_counts_supply": Q_WALK_VISITS_SQL,
}
