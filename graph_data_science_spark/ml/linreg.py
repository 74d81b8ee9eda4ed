"""Linear regression (reference
``ml/ml-algo/.../models/linearregression/LinearRegressionTrainer.java`` /
``LinearRegressionObjective.java:40-56`` / ``LinearRegressor.java:35-43``):
loss = mean((w·x + b − y)²) + penalty·‖w‖² (bias unpenalized), prediction
= w·x + b.

Two trainers:

- ``solver="normal"`` (default): the exact minimizer via the ridge normal
  equations ``(XᵀX/n + penalty·I)·w = Xᵀy/n`` with an unpenalized bias
  (intercept column, zero ridge on its row). XᵀX/Xᵀy are accumulated as
  per-partition NumPy Gram matrices inside ``mapInPandas`` (Arrow-batched,
  one row of d² floats per partition back to the driver) and solved with
  ``numpy.linalg.solve`` — d is model-sized, the data pass is a single
  scan, no shuffle at all. This is the 100 TB path: one pass, O(d²)
  driver state.
- ``solver="gd"``: full-batch gradient descent mirroring the reference's
  objective exactly (same loss; gradient aggregated like
  ``logreg._train_binary``: bias grad + loss ride an Observation in the
  same job, weight grads via posexplode sum).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def _dot(x_col: Column, w: list[float]) -> Column:
    expr = F.lit(0.0)
    for j, wj in enumerate(w):
        expr = expr + F.element_at(x_col, j + 1) * F.lit(float(wj))
    return expr


@dataclass
class LinearRegressionModel:
    weights: list[float]
    bias: float
    loss: float = float("nan")
    epochs: int = 0
    history: list = field(default_factory=list)

    def predict(self, df: DataFrame, features: str = "features") -> DataFrame:
        """``LinearRegressor.predict``: w·x + b as a pure column expr."""
        return df.withColumn(
            "prediction", _dot(F.col(features), self.weights) + F.lit(float(self.bias))
        )


def _gram_stats(df: DataFrame, feature_col: str, label_col: str, dim: int):
    """One scan → (XᵀX, Xᵀy, Σy, Σy², n) with X including an intercept
    column; per-partition NumPy accumulation, driver-side sum."""
    import pandas as pd

    d1 = dim + 1  # + intercept
    schema = f"g array<double>, xy array<double>, sy double, syy double, n long"

    def acc(batches):
        g = np.zeros((d1, d1))
        xy = np.zeros(d1)
        sy = 0.0
        syy = 0.0
        n = 0
        for pdf in batches:
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[feature_col]])
            if x.size == 0:
                continue
            x = np.hstack([x, np.ones((x.shape[0], 1))])
            y = pdf[label_col].to_numpy(dtype=np.float64)
            g += x.T @ x
            xy += x.T @ y
            sy += float(y.sum())
            syy += float((y * y).sum())
            n += len(y)
        yield pd.DataFrame(
            [{"g": g.ravel().tolist(), "xy": xy.tolist(), "sy": sy, "syy": syy, "n": n}]
        )

    rows = df.select(feature_col, label_col).mapInPandas(acc, schema).collect()
    g = np.zeros((d1, d1))
    xy = np.zeros(d1)
    sy = syy = 0.0
    n = 0
    for r in rows:
        g += np.array(r["g"]).reshape(d1, d1)
        xy += np.array(r["xy"])
        sy += r["sy"]
        syy += r["syy"]
        n += r["n"]
    return g, xy, sy, syy, n


def train_linear_regression(
    df: DataFrame,
    label_col: str = "target",
    feature_col: str = "features",
    penalty: float = 0.0,
    solver: str = "normal",
    max_epochs: int = 100,
    learning_rate: float = 0.1,
    tolerance: float = 1e-9,
    dim: int | None = None,
) -> LinearRegressionModel:
    if dim is None:
        dim = len(df.select(feature_col).first()[0])
    if solver == "normal":
        g, xy, _, syy, n = _gram_stats(df, feature_col, label_col, dim)
        if n == 0:
            raise ValueError("empty training frame")
        a = g / n
        for j in range(dim):  # ridge on weights only, not the intercept row
            a[j, j] += penalty
        sol = np.linalg.solve(a, xy / n)
        w, b = sol[:dim].tolist(), float(sol[dim])
        # loss at the solution (one number from the same Gram stats):
        # mean((Xs−y)²) = sᵀGs/n − 2 sᵀxy/n + Σy²/n with s = [w, b]
        mse = float(sol @ g @ sol - 2 * sol @ xy + syy) / n
        return LinearRegressionModel(
            weights=w, bias=b, loss=mse + penalty * float(np.dot(w, w)), epochs=0
        )
    if solver != "gd":
        raise ValueError(f"unknown solver {solver!r}")

    n = df.count()
    if n == 0:
        raise ValueError("empty training frame")
    w = [0.0] * dim
    b = 0.0
    prev = None
    history: list[float] = []
    epoch = 0
    for epoch in range(1, max_epochs + 1):
        resid = (_dot(F.col(feature_col), w) + F.lit(b) - F.col(label_col)).alias("resid")
        scored = df.select(F.col(feature_col).alias("x"), resid)
        obs = Observation()
        scored = scored.observe(
            obs, F.sum("resid").alias("gb"), F.sum(F.col("resid") ** 2).alias("sq")
        )
        parts = (
            scored.select("resid", F.posexplode("x").alias("j", "xj"))
            .groupBy("j")
            .agg(F.sum(F.col("resid") * F.col("xj")).alias("g"))
        )
        grads = {int(r["j"]): float(r["g"]) for r in parts.collect()}
        tot = obs.get
        loss = float(tot["sq"]) / n + penalty * sum(v * v for v in w)
        history.append(loss)
        w = [
            wi - learning_rate * (2.0 * grads.get(j, 0.0) / n + 2.0 * penalty * wi)
            for j, wi in enumerate(w)
        ]
        b -= learning_rate * 2.0 * float(tot["gb"]) / n
        if prev is not None and abs(prev - loss) < tolerance:
            break
        prev = loss
    return LinearRegressionModel(weights=w, bias=b, loss=history[-1], epochs=epoch, history=history)
