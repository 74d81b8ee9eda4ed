"""Evaluation metrics (reference ``ml/ml-algo/.../metrics/``:
``classification/{Accuracy,GlobalAccuracy,Precision,Recall,F1Score,F1Macro,
F1Weighted}.java``, ``regression/RegressionMetrics.java:33-80``,
``LinkMetric.java:40-95`` — AUCPR).

All metrics are single aggregations over a (target, prediction[, prob])
frame — one shuffle on the class key for per-class metrics, one global agg
for the rest. AUCPR builds the precision-recall curve as a distributed
cumulative scan over DISTINCT thresholds (descending sweep, ties grouped —
exactly the reference's signed-probability walk; ``graph/ranks.py``
two-level scan, never a single-partition window) and integrates trapezoids
with a point-index self-join; the curve has at most |distinct scores|
points, and ``max_thresholds`` bounds even that for continuous scores.

Per-class F1 = 2TP/(2TP+FP+FN) (``F1Score.java``); macro = unweighted mean
over the class set; weighted = Σ f1·support / Σ support (``F1Weighted``).
Classes with zero denominator score 0, as the reference's division guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_stats(
    df: DataFrame, target_col: str = "target", prediction_col: str = "prediction"
) -> DataFrame:
    """(cls, tp, fp, fn, support) per class appearing in targets or
    predictions."""
    t = F.col(target_col)
    p = F.col(prediction_col)
    per_target = df.groupBy(t.alias("cls")).agg(
        F.sum((p == t).cast("long")).alias("tp"),
        F.sum((p != t).cast("long")).alias("fn"),
        F.count("*").alias("support"),
    )
    per_pred = df.filter(p != t).groupBy(p.alias("cls")).agg(F.count("*").alias("fp"))
    return (
        per_target.join(per_pred, "cls", "outer")
        .select(
            "cls",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("fp", F.lit(0)).alias("fp"),
            F.coalesce("fn", F.lit(0)).alias("fn"),
            F.coalesce("support", F.lit(0)).alias("support"),
        )
    )


def classification_metrics(
    df: DataFrame, target_col: str = "target", prediction_col: str = "prediction"
) -> DataFrame:
    """Per-class (cls, precision, recall, f1, support); zero-denominator
    classes score 0 like the reference guards."""
    stats = confusion_stats(df, target_col, prediction_col)
    prec = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    rec = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
    ).otherwise(0.0)
    return stats.select(
        "cls", prec.alias("precision"), rec.alias("recall"), f1.alias("f1"), "support"
    )


def classification_summary(
    df: DataFrame, target_col: str = "target", prediction_col: str = "prediction"
) -> dict:
    """{accuracy, f1_macro, f1_weighted} — GlobalAccuracy / F1Macro /
    F1Weighted."""
    per = classification_metrics(df, target_col, prediction_col)
    row = per.agg(
        F.avg("f1").alias("f1_macro"),
        (F.sum(F.col("f1") * F.col("support")) / F.sum("support")).alias("f1_weighted"),
    ).collect()[0]
    acc = df.agg(
        F.avg((F.col(prediction_col) == F.col(target_col)).cast("double")).alias("a")
    ).collect()[0]["a"]
    return {
        "accuracy": float(acc),
        "f1_macro": float(row["f1_macro"]),
        "f1_weighted": float(row["f1_weighted"]),
    }


def regression_metrics(
    df: DataFrame, target_col: str = "target", prediction_col: str = "prediction"
) -> DataFrame:
    """One row: (mean_squared_error, root_mean_squared_error,
    mean_absolute_error) — ``RegressionMetrics.java:33-80``."""
    err = F.col(prediction_col) - F.col(target_col)
    return df.agg(
        F.avg(err * err).alias("mean_squared_error"),
        F.sqrt(F.avg(err * err)).alias("root_mean_squared_error"),
        F.avg(F.abs(err)).alias("mean_absolute_error"),
    )


def aucpr(
    df: DataFrame,
    probability_col: str = "probability",
    label_col: str = "label",
    negative_class_weight: float = 1.0,
    max_thresholds: int | None = None,
) -> float:
    """Area under the precision-recall curve (``LinkMetric.AUCPR:40-95``):
    sweep thresholds descending over DISTINCT scores (ties enter the curve
    together, as the reference's signed-probability walk), precision =
    TP / (TP + w·FP), recall = TP / P, close the curve at (0, 1), integrate
    trapezoids. Returns 0 when there are no positives, per the reference.

    ``max_thresholds``: the curve sweeps DISTINCT scores, which for
    continuous scores is O(N) curve points (distributed, but still O(N)
    rows materialized). Setting this caps the sweep by
    equi-width-quantizing scores into at most that many value
    buckets first (each bucket keyed by its maximum member score) — the
    resulting curve is the exact curve sampled at the bucket boundaries,
    the standard large-scale approximation. ``None`` preserves the
    reference's exact distinct-score semantics."""
    lbl = F.col(label_col).cast("double")
    prob = F.col(probability_col).cast("double")
    if max_thresholds is not None:
        bounds = df.agg(F.min(prob).alias("lo"), F.max(prob).alias("hi")).collect()[0]
        lo, hi = bounds["lo"], bounds["hi"]
        if lo is not None and hi is not None and lo < hi:
            bucket = F.least(
                F.width_bucket(prob, F.lit(float(lo)), F.lit(float(hi)), F.lit(int(max_thresholds))),
                F.lit(int(max_thresholds)),
            )
            agg = (
                df.groupBy(bucket.alias("_b"))
                .agg(
                    F.max(prob).alias("thr"),
                    F.sum((lbl > 0).cast("long")).alias("pos"),
                    F.sum((lbl <= 0).cast("long")).alias("neg"),
                )
                .drop("_b")
            )
            return _aucpr_from_curve(df, agg, lbl, negative_class_weight)
    agg = (
        df.groupBy(prob.alias("thr"))
        .agg(
            F.sum((lbl > 0).cast("long")).alias("pos"),
            F.sum((lbl <= 0).cast("long")).alias("neg"),
        )
    )
    return _aucpr_from_curve(df, agg, lbl, negative_class_weight)


def _aucpr_from_curve(df, agg, lbl, negative_class_weight):
    # Cumulative tp/fp over thresholds DESCENDING plus the curve-point
    # index, via the distributed two-level scan (graph/ranks.py) instead
    # of a single-partition global window. The integration order the
    # reference walks — (recall asc, precision desc) — IS threshold-desc
    # order: recall = tp/P is non-decreasing as thr falls, and within an
    # equal-recall run (tp constant) fp strictly grows so precision
    # strictly falls; the closing point (recall 0, precision 1) precedes
    # every curve point (a curve point with precision 1 has fp=0, tp>0 ⇒
    # recall>0; one with recall 0 has tp=0 ⇒ precision<1). So the lag
    # window becomes a self-join on the scan's point index, with the
    # k=0 point lagging onto the closing point via coalesce.
    totals = df.agg(
        F.sum((lbl > 0).cast("long")).alias("p"), F.sum((lbl <= 0).cast("long")).alias("n")
    ).collect()[0]
    p_count = int(totals["p"] or 0)
    if p_count == 0:
        return 0.0
    from graph_data_science_spark.graph.ranks import ordered_scan

    # The scan + area run several actions over the curve frame (bucket
    # sizing count, range agg, bucket totals, final area) — persist it so
    # the distinct-threshold groupBy over the scored input runs ONCE, not
    # once per action (aucpr runs per fold per candidate in CV selection).
    agg = agg.withColumn("_negthr", -F.col("thr")).persist()
    try:
        curve = ordered_scan(
            agg,
            ["_negthr"],
            {"pos": "tp", "neg": "fp"},
            rank_col="_k",
            n_buckets=None,
        )
        pts = curve.select(
            "_k",
            (F.col("tp") / F.lit(float(p_count))).alias("recall"),
            (
                F.col("tp")
                / (F.col("tp") + F.lit(float(negative_class_weight)) * F.col("fp"))
            ).alias("precision"),
        )
        prev = pts.select(
            (F.col("_k") + 1).alias("_k"),
            F.col("recall").alias("r0"),
            F.col("precision").alias("p0"),
        )
        tz = pts.join(prev, "_k", "left").select(
            "recall",
            "precision",
            F.coalesce(F.col("r0"), F.lit(0.0)).alias("r0"),
            F.coalesce(F.col("p0"), F.lit(1.0)).alias("p0"),
        )
        area = tz.agg(
            F.sum((F.col("recall") - F.col("r0")) * (F.col("precision") + F.col("p0")) / 2.0)
        ).collect()[0][0]
    finally:
        agg.unpersist()
    return float(area or 0.0)
