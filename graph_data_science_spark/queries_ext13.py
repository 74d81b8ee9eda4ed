"""Round-3 driver-contract queries (batch 13): the ML model family.

- ``linreg_normal_customers``: linear regression via the ridge normal
  equations (``models/linearregression/LinearRegressionObjective.java:40-56``,
  penalty 0 here) — the 1-feature exact OLS solution is closed-form in
  SQL, so the whole train+predict path is oracle-gated.
- ``mlp_forward_customers``: the MLP forward kernel
  (``models/mlp/MLPClassifier.predictionsVariable:52-62`` — ReLU hidden
  stack + softmax) with FIXED literal weights, replayed as explicit SQL
  arithmetic. Gates the predict path users run at scale.
- ``random_forest_stump_customers``: a single depth-1 tree, no bootstrap,
  full feature bag — deterministic CART whose Gini split search
  (``decisiontree/Splitter.findBestSplit:26-110``) is replicated with
  window functions; gates training + the `feature < threshold` traversal
  (``DecisionTreePredictor.predict:20-26``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.ml.linreg import train_linear_regression
from graph_data_science_spark.ml.mlp import MLPClassifierModel
from graph_data_science_spark.ml.randomforest import train_random_forest
from graph_data_science_spark.queries import _e, _t

# --------------------------------------------------------------------------
# Linear regression (normal equations), 1 feature → SQL closed form
# --------------------------------------------------------------------------


def q_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("custkey"),
        F.array((F.col("c_acctbal") / 10000.0).cast("double")).alias("features"),
        (
            (F.col("c_acctbal") / 5000.0) + (F.col("c_nationkey") / 25.0)
        ).cast("double").alias("target"),
    )
    m = train_linear_regression(cust, solver="normal", penalty=0.0)
    return m.predict(cust).select("custkey", _e(F.col("prediction"), 5).alias("pred_e5"))


Q_LINREG_SQL = """
    WITH pts AS (
        SELECT CAST(c_custkey AS BIGINT) AS custkey,
               CAST(c_acctbal / 10000.0 AS DOUBLE) AS x,
               CAST(c_acctbal / 5000.0 + c_nationkey / 25.0 AS DOUBLE) AS y
        FROM customer
    ),
    stats AS (
        SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy
        FROM pts
    ),
    fit AS (
        SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
               (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS icept
        FROM stats
    )
    SELECT custkey,
           CAST(FLOOR((slope * x + icept) * 1e5 + 0.3183098861837907) AS BIGINT) AS pred_e5
    FROM pts, fit
"""

# --------------------------------------------------------------------------
# MLP forward pass with fixed literal weights
# --------------------------------------------------------------------------

_W1 = [[1.0, -0.5], [0.25, 0.75]]
_B1 = [0.1, -0.2]
_W2 = [[0.5, -1.0], [-0.25, 0.8]]
_B2 = [0.0, 0.05]


def q_mlp_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("custkey"),
        F.array(
            (F.col("c_acctbal") / 10000.0).cast("double"),
            (F.col("c_nationkey") / 25.0).cast("double"),
        ).alias("features"),
    )
    model = MLPClassifierModel(
        weights=[np.array(_W1), np.array(_W2)],
        biases=[np.array(_B1), np.array(_B2)],
        classes=[0, 1],
    )
    out = model.predict(cust)
    return out.select(
        "custkey",
        _e(F.element_at("probabilities", 1), 6).alias("p0_e6"),
        _e(F.element_at("probabilities", 2), 6).alias("p1_e6"),
        F.col("prediction"),
    )


Q_MLP_SQL = f"""
    WITH pts AS (
        SELECT CAST(c_custkey AS BIGINT) AS custkey,
               CAST(c_acctbal / 10000.0 AS DOUBLE) AS x0,
               CAST(c_nationkey / 25.0 AS DOUBLE) AS x1
        FROM customer
    ),
    hidden AS (
        SELECT custkey,
               GREATEST(0.0, x0 * {_W1[0][0]} + x1 * {_W1[0][1]} + {_B1[0]}) AS h0,
               GREATEST(0.0, x0 * {_W1[1][0]} + x1 * {_W1[1][1]} + {_B1[1]}) AS h1
        FROM pts
    ),
    logits AS (
        SELECT custkey,
               h0 * {_W2[0][0]} + h1 * {_W2[0][1]} + {_B2[0]} AS z0,
               h0 * {_W2[1][0]} + h1 * {_W2[1][1]} + {_B2[1]} AS z1
        FROM hidden
    ),
    soft AS (
        SELECT custkey,
               EXP(z0 - GREATEST(z0, z1)) AS e0, EXP(z1 - GREATEST(z0, z1)) AS e1,
               z0, z1
        FROM logits
    )
    SELECT custkey,
           CAST(FLOOR(e0 / (e0 + e1) * 1e6 + 0.3183098861837907) AS BIGINT) AS p0_e6,
           CAST(FLOOR(e1 / (e0 + e1) * 1e6 + 0.3183098861837907) AS BIGINT) AS p1_e6,
           CAST(CASE WHEN e1 > e0 THEN 1 ELSE 0 END AS BIGINT) AS prediction
    FROM soft
"""

# --------------------------------------------------------------------------
# Random forest: deterministic depth-1 stump, Gini split search in SQL
# --------------------------------------------------------------------------


def q_rf_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("custkey"),
        F.array(F.col("c_acctbal").cast("double")).alias("features"),
        (F.col("c_nationkey") < 12).cast("long").alias("label"),
    )
    m = train_random_forest(
        cust,
        number_of_trees=1,
        max_depth=1,
        samples_ratio=0.0,
        max_features_ratio=1.0,
        random_seed=1,
    )
    return m.predict(cust).select("custkey", "prediction")


Q_RF_STUMP_SQL = """
    WITH pts AS (
        SELECT CAST(c_custkey AS BIGINT) AS custkey,
               CAST(c_acctbal AS DOUBLE) AS x,
               CASE WHEN c_nationkey < 12 THEN 1 ELSE 0 END AS y
        FROM customer
    ),
    srt AS (
        SELECT x, y,
               ROW_NUMBER() OVER (ORDER BY x) AS r,
               COUNT(*) OVER () AS n,
               SUM(y) OVER () AS tot1
        FROM pts
    ),
    cum AS (
        SELECT r, x, n, tot1,
               SUM(y) OVER (ORDER BY r) AS c1,
               LEAD(x) OVER (ORDER BY r) AS nx
        FROM srt
    ),
    -- candidate boundaries: value changes; threshold = first right value,
    -- score formula mirrors the trainer bit-for-bit:
    -- lw·(1 − (l1² + l0²)/lw²) + rw·(1 − (r1² + r0²)/rw²)
    scored AS (
        SELECT nx AS thr,
               CAST(r AS DOUBLE) AS lw, CAST(n - r AS DOUBLE) AS rw,
               CAST(c1 AS DOUBLE) AS l1, CAST(r - c1 AS DOUBLE) AS l0,
               CAST(tot1 - c1 AS DOUBLE) AS r1, CAST((n - r) - (tot1 - c1) AS DOUBLE) AS r0
        FROM cum WHERE nx IS NOT NULL AND nx <> x
    ),
    best AS (
        SELECT thr,
               CASE WHEN l1 > l0 THEN 1 ELSE 0 END AS left_pred,
               CASE WHEN r1 > r0 THEN 1 ELSE 0 END AS right_pred,
               ROW_NUMBER() OVER (
                   ORDER BY lw * (1 - (l1 * l1 + l0 * l0) / (lw * lw))
                          + rw * (1 - (r1 * r1 + r0 * r0) / (rw * rw)),
                          thr
               ) AS rk
        FROM scored
    )
    SELECT p.custkey,
           CAST(CASE WHEN p.x < b.thr THEN b.left_pred ELSE b.right_pred END AS BIGINT)
               AS prediction
    FROM pts p, (SELECT * FROM best WHERE rk = 1) b
"""


QUERIES_EXT13 = {
    "linreg_normal_customers": q_linreg,
    "mlp_forward_customers": q_mlp_forward,
    "random_forest_stump_customers": q_rf_stump,
}

ORACLES_EXT13 = {
    "linreg_normal_customers": Q_LINREG_SQL,
    "mlp_forward_customers": Q_MLP_SQL,
    "random_forest_stump_customers": Q_RF_STUMP_SQL,
}
