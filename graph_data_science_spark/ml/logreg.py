"""Distributed logistic regression — the model family behind the
reference's ML pipelines.

Reference: ``ml/ml-core/src/main/java/org/neo4j/gds/ml/models/logisticregression/
LogisticRegressionTrainer.java`` — batched gradient descent over a
cross-entropy objective with L2 penalty (``Training.java`` drives the
loop; GDS defaults: maxEpochs=100, tolerance=1e-3, learningRate via Adam).

Spark execution — FULL-batch deterministic gradient descent with zero
Python in the row path:

- the weight vector lives on the driver (d+1 doubles — it is the model,
  not data) and enters each epoch's plan as an array literal;
- per-row margin: ``aggregate(zip_with(x, w, (a,b) -> a*b), 0.0, +)``
  plus bias — whole-stage codegen;
- gradient: residual ``σ(margin) − y`` per row, then ``posexplode`` the
  feature array and one (dim)-key hash aggregate ``Σ residual·x_j`` —
  ONE shuffle of d rows per epoch, map-side combined. The loss rides the
  same job as an extra aggregate (no second action).

This trades the reference's mini-batch Adam for deterministic full-batch
GD with inverse-time decay: identical model family and objective,
reproducible across cluster sizes (mini-batch order is execution-order-
dependent on a cluster — the one thing a distributed engine must not
depend on). Multiclass is one-vs-rest over this binary trainer (the
reference trains softmax; OvR is the distributed-friendly equivalent
surface — documented divergence, same prediction API).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _dot(x_col, w: list[float]):
    lit_w = F.array(*[F.lit(float(v)) for v in w])
    return F.aggregate(
        F.zip_with(x_col, lit_w, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def _sigmoid(col):
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-col))


@dataclass
class LogisticRegressionModel:
    weights: list[float]  # per class (OvR); binary = one entry
    bias: list[float]
    classes: list[int]
    dim: int
    epochs_run: int
    final_loss: float
    loss_history: list[float] = field(default_factory=list)

    def predict(self, df: DataFrame, features: str = "features") -> DataFrame:
        """Adds ``predicted`` (class) and ``probability`` columns. For
        binary models probability = P(class=classes[1])."""
        if len(self.classes) == 2 and len(self.weights) == 1:
            p1 = _sigmoid(_dot(F.col(features), self.weights[0]) + F.lit(self.bias[0]))
            return df.withColumn("probability", p1).withColumn(
                "predicted",
                F.when(p1 >= 0.5, F.lit(self.classes[1])).otherwise(F.lit(self.classes[0])).cast("long"),
            )
        # OvR: argmax of per-class scores.
        scores = F.array(
            *[
                _sigmoid(_dot(F.col(features), w) + F.lit(b))
                for w, b in zip(self.weights, self.bias)
            ]
        )
        pos = F.array_position(scores, F.array_max(scores))  # 1-based; first max wins ties
        cls = F.array(*[F.lit(int(c)) for c in self.classes])
        return df.withColumn("probability", F.array_max(scores)).withColumn(
            "predicted", F.element_at(cls, pos.cast("int")).cast("long")
        )


def _train_binary(
    df: DataFrame,
    dim: int,
    label_col: str,
    feature_col: str,
    max_epochs: int,
    learning_rate: float,
    l2: float,
    tolerance: float,
) -> tuple[list[float], float, int, float, list[float]]:
    n = df.count()
    if n == 0:
        raise ValueError("empty training frame")
    w = [0.0] * dim
    b = 0.0
    prev_loss = None
    history: list[float] = []
    epoch = 0
    for epoch in range(1, max_epochs + 1):
        lr = learning_rate / (1.0 + 0.01 * epoch)  # inverse-time decay
        margin = _dot(F.col(feature_col), w) + F.lit(b)
        scored = df.select(
            F.col(feature_col).alias("x"),
            F.col(label_col).cast("double").alias("y"),
            (_sigmoid(margin) - F.col(label_col).cast("double")).alias("resid"),
            margin.alias("m"),
        )
        # Stable cross-entropy: max(0, m*(1-2y)) + log1p(e^-|m|) — built-ins.
        loss_term = F.log1p(F.exp(-F.abs(F.col("m")))) + F.greatest(
            F.lit(0.0), F.col("m") * (F.lit(1.0) - 2 * F.col("y"))
        )
        obs = Observation()
        scored = scored.observe(
            obs, F.sum("resid").alias("gb"), F.sum(loss_term).alias("loss")
        )
        parts = (
            scored.select("resid", F.posexplode("x").alias("j", "xj"))
            .groupBy("j")
            .agg(F.sum(F.col("resid") * F.col("xj")).alias("g"))
        )
        grads = {int(r["j"]): float(r["g"]) for r in parts.collect()}
        tot = obs.get  # bias gradient + loss rode the same job
        loss = float(tot["loss"]) / n + 0.5 * l2 * sum(v * v for v in w)
        history.append(loss)
        gb = float(tot["gb"]) / n
        w = [
            wi - lr * (grads.get(j, 0.0) / n + l2 * wi)
            for j, wi in enumerate(w)
        ]
        b -= lr * gb
        if prev_loss is not None and abs(prev_loss - loss) < tolerance:
            break
        prev_loss = loss
    return w, b, epoch, history[-1], history


def train_logistic_regression(
    df: DataFrame,
    label_col: str = "label",
    feature_col: str = "features",
    max_epochs: int = 100,
    learning_rate: float = 1.0,
    l2: float = 0.0,
    tolerance: float = 1e-6,
    dim: int | None = None,
) -> LogisticRegressionModel:
    """Train on (features array<double>, label long). Binary labels train
    one sigmoid; >2 classes train one-vs-rest. ``dim``: feature-vector
    width; None probes the first row (one extra tiny job — pass it
    explicitly in pipelines, mirroring datapipe/ann.py)."""
    if dim is None:
        dim_row = df.select(F.size(F.col(feature_col)).alias("d")).first()
        if dim_row is None:
            raise ValueError("empty training frame")
        dim = int(dim_row["d"])
    classes = sorted(int(r[label_col]) for r in df.select(label_col).distinct().collect())
    if len(classes) < 2:
        raise ValueError(f"need >= 2 classes, got {classes}")
    df = df.persist()
    try:
        if len(classes) == 2:
            y = F.when(F.col(label_col) == classes[1], 1.0).otherwise(0.0)
            w, b, ep, loss, hist = _train_binary(
                df.withColumn("_y", y), dim, "_y", feature_col,
                max_epochs, learning_rate, l2, tolerance,
            )
            return LogisticRegressionModel([w], [b], classes, dim, ep, loss, hist)
        weights, biases, total_ep, losses = [], [], 0, []
        for c in classes:
            y = F.when(F.col(label_col) == c, 1.0).otherwise(0.0)
            w, b, ep, loss, hist = _train_binary(
                df.withColumn("_y", y), dim, "_y", feature_col,
                max_epochs, learning_rate, l2, tolerance,
            )
            weights.append(w)
            biases.append(b)
            total_ep = max(total_ep, ep)
            losses.append(loss)
        return LogisticRegressionModel(
            weights, biases, classes, dim, total_ep, sum(losses) / len(losses), losses
        )
    finally:
        df.unpersist()
