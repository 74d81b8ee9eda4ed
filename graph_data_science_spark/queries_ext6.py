"""Round-3 driver-contract queries (batch 6): CELF influence
maximization, GraphSage inference, ML pipelines (node classification +
link prediction). Merged into ``queries.QUERIES`` / ``queries.ORACLES``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.queries import _t

# --------------------------------------------------------------------------
# CELF on disjoint nation stars with p = 1: every simulation's cascade is
# full reachability, so the greedy sequence is closed-form — hubs by star
# size (1 + member count) descending, node id ascending; spreads are the
# running cumulative sums (disjoint stars add exactly).
# Reference CELF.java:36 — greedy argmax; celf.py computes the identical
# sequence via reach-set max-cover.
# --------------------------------------------------------------------------

_CELF_K = 3


def q_celf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.algorithms.celf import celf

    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    edges = customer.select(
        (10 + F.col("c_nationkey")).cast("long").alias("src"),
        (1000 + F.col("c_custkey")).cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    vertices = nation.select((10 + F.col("n_nationkey")).cast("long").alias("node_id")).union(
        customer.select((1000 + F.col("c_custkey")).cast("long"))
    )
    res = celf(
        LinkGraph(edges=edges, vertices=vertices),
        seed_set_size=_CELF_K,
        monte_carlo_simulations=2,
        propagation_probability=1.0,
    )
    return res.seeds.select("node_id", "spread")


Q_CELF_SQL = f"""
    WITH sizes AS (
        SELECT CAST(10 + n_nationkey AS BIGINT) AS node_id,
               1 + COUNT(c_custkey) AS sz
        FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_nationkey
    ),
    ranked AS (
        SELECT node_id, sz, ROW_NUMBER() OVER (ORDER BY sz DESC, node_id ASC) AS rk
        FROM sizes
    )
    SELECT node_id,
           CAST(SUM(sz) OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS spread
    FROM ranked WHERE rk <= {_CELF_K}
"""


# --------------------------------------------------------------------------
# GraphSage (identity weights, one layer) on customer mirror pairs: the
# self-inclusive neighbor mean and final L2 row-normalization are
# closed-form per pair (MeanAggregator.java / GraphSageHelper
# NormalizeRows). Both engines evaluate the same IEEE expression tree
# (avg of two doubles, x/sqrt(a²+b²)), so values bit-match.
# --------------------------------------------------------------------------


def q_graphsage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.algorithms.graphsage import graphsage, identity_weights

    customer = _t(spark, sf_dir, "customer")
    a = (1000 + 2 * F.col("c_custkey")).cast("long")
    b = (2000001 + 2 * F.col("c_custkey")).cast("long")
    edges = customer.select(a.alias("src"), b.alias("dst"), F.lit(1.0).alias("weight")).union(
        customer.select(b.alias("src"), a.alias("dst"), F.lit(1.0))
    )
    feats = customer.select(
        a.alias("node_id"),
        F.array((1 + F.col("c_custkey") % 5).cast("double"), F.lit(0.0)).alias("features"),
    ).union(
        customer.select(
            b.alias("node_id"),
            F.array(F.lit(0.0), (1 + F.col("c_custkey") % 3).cast("double")),
        )
    )
    g = LinkGraph(edges=edges, vertices=feats.select("node_id"))
    res = graphsage(g, feats, identity_weights(2))
    return res.embeddings.select("node_id", "embedding")


Q_GRAPHSAGE_SQL = """
    WITH pairs AS (
        SELECT c_custkey AS c,
               CAST(1 + c_custkey % 5 AS DOUBLE) / 2 AS mx,
               CAST(1 + c_custkey % 3 AS DOUBLE) / 2 AS my
        FROM customer
    ),
    normed AS (
        SELECT c, mx, my, SQRT(mx * mx + my * my) AS nrm FROM pairs
    )
    SELECT CAST(1000 + 2 * c AS BIGINT) AS node_id, [mx / nrm, my / nrm] AS embedding FROM normed
    UNION ALL
    SELECT CAST(2000001 + 2 * c AS BIGINT), [mx / nrm, my / nrm] FROM normed
"""


# --------------------------------------------------------------------------
# Node classification pipeline: feature x = ±1 by custkey parity, label =
# parity — linearly separable with margin 2, so the trained logistic
# model must classify every customer exactly (reference
# NodeClassificationTrainingPipeline.java; logreg.py deterministic
# full-batch GD).
# --------------------------------------------------------------------------


def q_node_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.ml import node_classification_pipeline

    customer = _t(spark, sf_dir, "customer")
    feats = customer.select(
        (1000 + F.col("c_custkey")).cast("long").alias("node_id"),
        F.array((2.0 * (F.col("c_custkey") % 2) - 1.0).cast("double")).alias("features"),
        (F.col("c_custkey") % 2).cast("long").alias("label"),
    )
    res = node_classification_pipeline(feats, max_epochs=60)
    return res.predictions.select("node_id", "predicted")


Q_NODECLASS_SQL = """
    SELECT CAST(1000 + c_custkey AS BIGINT) AS node_id,
           CAST(c_custkey % 2 AS BIGINT) AS predicted
    FROM customer
"""


# --------------------------------------------------------------------------
# Link prediction pipeline: customer cliques per GROUP with one-hot group
# features. Every same-group pair IS a positive edge, so every surviving
# hash-sampled negative is cross-group — hadamard features separate them
# perfectly (sum 1 vs 0) and the trained model's decision is closed-form:
# predicted = same-group. Probes: consecutive same-group pairs (scales
# with sf) + group-representative cross pairs.
# The group key is ``c_custkey % 25`` rather than ``c_nationkey``:
# custkeys are contiguous, so every group has the same size at EVERY
# scale factor. With c_nationkey at sf0.001 (150 customers) the
# hypergeometric group sizes ranged 3..13, and the rarest dim's share of
# the mean gradient (0.004 vs the uniform 0.02) could not outgrow the
# bias drift within the epoch budget — the trained margin w_n + b stayed
# negative for the smallest nations, misclassifying their probes, while
# the balanced shares at sf0.01+ converged fine. Balance, not epochs, is
# what makes the fixture scale-invariant (320 epochs at sf0.001 made the
# margin WORSE: the all-zero-feature negatives act on the bias alone).
# Reference LinkPredictionTrainingPipeline.java + HadamardFeatureStep.
# --------------------------------------------------------------------------


def _group_onehot_features(customer) -> DataFrame:
    dims = [F.when(F.col("c_custkey") % 25 == i, 1.0).otherwise(0.0) for i in range(25)]
    return customer.select(
        (1000 + F.col("c_custkey")).cast("long").alias("node_id"),
        F.array(*dims).alias("features"),
    )


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.ml import link_prediction_pipeline

    customer = _t(spark, sf_dir, "customer").withColumn(
        "grp", F.col("c_custkey") % 25
    )
    cliq = (
        customer.alias("x")
        .join(customer.alias("y"), F.col("x.grp") == F.col("y.grp"))
        .filter(F.col("x.c_custkey") < F.col("y.c_custkey"))
        .select(
            (1000 + F.col("x.c_custkey")).cast("long").alias("src"),
            (1000 + F.col("y.c_custkey")).cast("long").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    feats = _group_onehot_features(customer)
    g = LinkGraph(edges=cliq, vertices=feats.select("node_id"))
    res = link_prediction_pipeline(g, feats, feature_type="hadamard", max_epochs=40)

    wn = Window.partitionBy("grp").orderBy("c_custkey")
    same = (
        customer.select(
            "grp",
            (1000 + F.col("c_custkey")).cast("long").alias("src"),
            (1000 + F.lead("c_custkey").over(wn)).cast("long").alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .select("src", "dst")
    )
    reps = customer.groupBy("grp").agg(F.min("c_custkey").alias("mk"))
    cross = (
        reps.alias("x")
        .join(reps.alias("y"), F.col("x.grp") < F.col("y.grp"))
        .select(
            (1000 + F.col("x.mk")).cast("long").alias("src"),
            (1000 + F.col("y.mk")).cast("long").alias("dst"),
        )
    )
    probes = same.union(cross)
    return res.predict(probes).select("src", "dst", "predicted")


Q_LINKPRED_SQL = """
    WITH same AS (
        SELECT c_custkey % 25 AS grp,
               CAST(1000 + c_custkey AS BIGINT) AS src,
               CAST(1000 + LEAD(c_custkey) OVER (PARTITION BY c_custkey % 25 ORDER BY c_custkey) AS BIGINT) AS dst
        FROM customer
    ),
    reps AS (
        SELECT c_custkey % 25 AS grp, MIN(c_custkey) AS mk FROM customer GROUP BY c_custkey % 25
    )
    SELECT src, dst, CAST(1 AS BIGINT) AS predicted FROM same WHERE dst IS NOT NULL
    UNION ALL
    SELECT CAST(1000 + x.mk AS BIGINT), CAST(1000 + y.mk AS BIGINT), CAST(0 AS BIGINT)
    FROM reps x JOIN reps y ON x.grp < y.grp
"""


QUERIES_EXT6 = {
    "celf_nation_stars": q_celf,
    "graphsage_mirror_pairs": q_graphsage,
    "node_classification_parity": q_node_classification,
    "link_prediction_cliques": q_link_prediction,
}

ORACLES_EXT6 = {
    "celf_nation_stars": Q_CELF_SQL,
    "graphsage_mirror_pairs": Q_GRAPHSAGE_SQL,
    "node_classification_parity": Q_NODECLASS_SQL,
    "link_prediction_cliques": Q_LINKPRED_SQL,
}
