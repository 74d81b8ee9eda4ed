"""Round-3 driver-contract queries (batch 14): evaluation metrics.

- ``classification_metrics_customers``: per-class precision/recall/F1 +
  support (``ml/ml-algo/.../metrics/classification/{Precision,Recall,
  F1Score}.java``) over a deterministic rule-based prediction.
- ``regression_metrics_orders``: MSE / RMSE / MAE
  (``metrics/regression/RegressionMetrics.java:33-80``).
- ``aucpr_customers``: area under the precision-recall curve
  (``metrics/LinkMetric.java:40-95``) — distinct-threshold descending
  sweep, curve closed at (0, 1), trapezoidal integration — replicated
  point-for-point in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.ml.metrics import (
    aucpr,
    classification_metrics,
    regression_metrics,
)
from graph_data_science_spark.queries import _e, _t


def q_classification_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        (F.col("c_nationkey") < 12).cast("long").alias("target"),
        (F.col("c_acctbal") > 5000).cast("long").alias("prediction"),
    )
    return classification_metrics(cust).select(
        "cls",
        _e(F.col("precision"), 6).alias("precision_e6"),
        _e(F.col("recall"), 6).alias("recall_e6"),
        _e(F.col("f1"), 6).alias("f1_e6"),
        "support",
    )


def _fe(expr: str, scale: int) -> str:
    return f"CAST(FLOOR(({expr}) * 1e{scale} + 0.3183098861837907) AS BIGINT)"


Q_CLS_METRICS_SQL = f"""
    WITH pts AS (
        SELECT CASE WHEN c_nationkey < 12 THEN 1 ELSE 0 END AS target,
               CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END AS prediction
        FROM customer
    ),
    per_t AS (
        SELECT target AS cls,
               SUM(CASE WHEN prediction = target THEN 1 ELSE 0 END) AS tp,
               SUM(CASE WHEN prediction <> target THEN 1 ELSE 0 END) AS fn,
               COUNT(*) AS support
        FROM pts GROUP BY target
    ),
    per_p AS (
        SELECT prediction AS cls, COUNT(*) AS fp
        FROM pts WHERE prediction <> target GROUP BY prediction
    ),
    stats AS (
        SELECT COALESCE(t.cls, p.cls) AS cls,
               COALESCE(tp, 0) AS tp, COALESCE(fp, 0) AS fp,
               COALESCE(fn, 0) AS fn, COALESCE(support, 0) AS support
        FROM per_t t FULL OUTER JOIN per_p p ON t.cls = p.cls
    )
    SELECT CAST(cls AS BIGINT) AS cls,
           {_fe("CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END", 6)} AS precision_e6,
           {_fe("CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END", 6)} AS recall_e6,
           {_fe("CASE WHEN 2 * tp + fp + fn > 0 THEN 2.0 * tp / (2 * tp + fp + fn) ELSE 0.0 END", 6)} AS f1_e6,
           CAST(support AS BIGINT) AS support
    FROM stats
"""


def q_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("double").alias("target"),
        (30000.0 + 2.0 * F.col("o_custkey")).cast("double").alias("prediction"),
    )
    return regression_metrics(orders).select(
        _e(F.col("mean_squared_error") / 1e6, 4).alias("mse_m6_e4"),
        _e(F.col("root_mean_squared_error"), 4).alias("rmse_e4"),
        _e(F.col("mean_absolute_error"), 4).alias("mae_e4"),
    )


Q_REG_METRICS_SQL = f"""
    WITH pts AS (
        SELECT CAST(o_totalprice AS DOUBLE) AS y,
               CAST(30000.0 + 2.0 * o_custkey AS DOUBLE) AS p
        FROM orders
    )
    SELECT {_fe("AVG((p - y) * (p - y)) / 1e6", 4)} AS mse_m6_e4,
           {_fe("SQRT(AVG((p - y) * (p - y)))", 4)} AS rmse_e4,
           {_fe("AVG(ABS(p - y))", 4)} AS mae_e4
    FROM pts
"""


def q_aucpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        ((F.abs(F.col("c_acctbal")) % 1000.0) / 1000.0).cast("double").alias("probability"),
        (F.col("c_nationkey") < 12).cast("long").alias("label"),
    )
    value = aucpr(cust)
    df = spark.createDataFrame([(float(value),)], "aucpr double")
    return df.select(_e(F.col("aucpr"), 6).alias("aucpr_e6"))


Q_AUCPR_SQL = f"""
    WITH pts AS (
        SELECT CAST((ABS(c_acctbal) % 1000.0) / 1000.0 AS DOUBLE) AS prob,
               CASE WHEN c_nationkey < 12 THEN 1 ELSE 0 END AS label
        FROM customer
    ),
    groups AS (
        SELECT prob AS thr,
               SUM(CASE WHEN label > 0 THEN 1 ELSE 0 END) AS pos,
               SUM(CASE WHEN label <= 0 THEN 1 ELSE 0 END) AS neg
        FROM pts GROUP BY prob
    ),
    curve AS (
        SELECT SUM(pos) OVER (ORDER BY thr DESC) AS tp,
               SUM(neg) OVER (ORDER BY thr DESC) AS fp
        FROM groups
    ),
    totals AS (SELECT SUM(pos) AS p FROM groups),
    rawpts AS (
        SELECT CAST(tp AS DOUBLE) / (SELECT p FROM totals) AS recall,
               CAST(tp AS DOUBLE) / (tp + fp) AS precision
        FROM curve
        UNION ALL SELECT 0.0, 1.0
    ),
    seq AS (
        SELECT recall, precision,
               LAG(recall) OVER (ORDER BY recall ASC, precision DESC) AS r0,
               LAG(precision) OVER (ORDER BY recall ASC, precision DESC) AS p0
        FROM rawpts
    )
    SELECT {_fe("SUM((recall - r0) * (precision + p0) / 2.0)", 6)} AS aucpr_e6
    FROM seq WHERE r0 IS NOT NULL
"""


QUERIES_EXT14 = {
    "classification_metrics_customers": q_classification_metrics,
    "regression_metrics_orders": q_regression_metrics,
    "aucpr_customers": q_aucpr,
}

ORACLES_EXT14 = {
    "classification_metrics_customers": Q_CLS_METRICS_SQL,
    "regression_metrics_orders": Q_REG_METRICS_SQL,
    "aucpr_customers": Q_AUCPR_SQL,
}
