"""MLP classifier (reference
``ml/ml-algo/.../models/mlp/MLPClassifier.java:40-62`` /
``MLPClassifierTrainer.java`` / ``MLPClassifierData.java``): a stack of
ReLU(x·Wᵢᵀ + bᵢ) hidden layers followed by Softmax, trained on
cross-entropy.

Distributed shape: the model is driver-sized (layer matrices of a few
thousand floats) while the data is the big side, so training is
data-parallel synchronous gradient descent — each epoch broadcasts the
weights, every partition computes its NumPy forward/backward gradient sums
inside ``mapInPandas`` (Arrow batches, fully vectorized), and the driver
sums the per-partition gradients and steps with Adam (the reference's
optimizer, ``MLPClassifierTrainer`` uses the gradient-descent Training
harness with Adam default). One scan per epoch, no shuffle.

Determinism: weights init with a seeded ``numpy.random.Generator``
(Kaiming-uniform like the reference's ``MLPClassifierData.create`` uniform
init); partition gradient sums are float64 and the driver adds them in
sorted partition order.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _forward(x: np.ndarray, weights, biases):
    """Hidden ReLU stack + softmax logits (MLPClassifier.predictionsVariable)."""
    h = x
    hiddens = [h]
    for wm, bv in zip(weights[:-1], biases[:-1]):
        h = np.maximum(h @ wm.T + bv, 0.0)
        hiddens.append(h)
    logits = h @ weights[-1].T + biases[-1]
    z = logits - logits.max(axis=1, keepdims=True)
    ez = np.exp(z)
    probs = ez / ez.sum(axis=1, keepdims=True)
    return hiddens, probs


@dataclass
class MLPClassifierModel:
    weights: list  # list[np.ndarray] — layer i: (out_i, in_i)
    biases: list  # list[np.ndarray]
    classes: list  # sorted original class values; output k = classes[k]
    loss: float = float("nan")
    epochs: int = 0
    history: list = field(default_factory=list)

    def predict(self, df: DataFrame, features: str = "features") -> DataFrame:
        """(input columns) + probabilities array<double> + prediction
        (original class value of the argmax), via one ``mapInPandas``."""
        import pandas as pd

        weights, biases, classes = self.weights, self.biases, self.classes
        cols = df.columns
        schema = (
            ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in cols)
            + ", probabilities array<double>, prediction long"
        )

        def run(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[features]])
                _, probs = _forward(x, weights, biases)
                out = pdf.copy()
                out["probabilities"] = [row.tolist() for row in probs]
                out["prediction"] = [int(classes[k]) for k in probs.argmax(axis=1)]
                yield out

        return df.mapInPandas(run, schema)


def train_mlp_classifier(
    df: DataFrame,
    label_col: str = "label",
    feature_col: str = "features",
    hidden_layer_sizes: tuple = (16,),
    max_epochs: int = 100,
    learning_rate: float = 0.01,
    penalty: float = 0.0,
    tolerance: float = 1e-7,
    random_seed: int = 42,
    dim: int | None = None,
) -> MLPClassifierModel:
    """Cross-entropy + penalty·Σ‖W‖² training with Adam, data-parallel
    gradient sums per epoch."""
    import pandas as pd

    classes = [r[0] for r in df.select(label_col).distinct().orderBy(label_col).collect()]
    cls_index = {c: k for k, c in enumerate(classes)}
    n_classes = len(classes)
    if dim is None:
        dim = len(df.select(feature_col).first()[0])
    n = df.count()
    if n == 0 or n_classes < 2:
        raise ValueError("need a non-empty frame with >= 2 classes")

    sizes = [dim, *hidden_layer_sizes, n_classes]
    rng = np.random.default_rng(random_seed)
    weights = [
        rng.uniform(-1.0, 1.0, size=(sizes[i + 1], sizes[i])) / np.sqrt(sizes[i])
        for i in range(len(sizes) - 1)
    ]
    biases = [np.zeros(sizes[i + 1]) for i in range(len(sizes) - 1)]

    # Adam state (reference Training harness default optimizer)
    m_w = [np.zeros_like(w) for w in weights]
    v_w = [np.zeros_like(w) for w in weights]
    m_b = [np.zeros_like(b) for b in biases]
    v_b = [np.zeros_like(b) for b in biases]
    beta1, beta2, eps = 0.9, 0.999, 1e-8

    prep = df.select(
        F.col(feature_col).alias("x"), F.col(label_col).cast("long").alias("y")
    )
    grad_schema = "pid long, flat array<double>, loss double, n long"
    history: list[float] = []
    prev = None
    epoch = 0
    for epoch in range(1, max_epochs + 1):
        w_bc, b_bc = [w.copy() for w in weights], [b.copy() for b in biases]

        def grad(batches):
            gw = [np.zeros_like(w) for w in w_bc]
            gb = [np.zeros_like(b) for b in b_bc]
            loss = 0.0
            cnt = 0
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["x"]])
                y = np.array([cls_index[v] for v in pdf["y"]], dtype=np.int64)
                hiddens, probs = _forward(x, w_bc, b_bc)
                loss += float(-np.log(np.clip(probs[np.arange(len(y)), y], 1e-15, 1)).sum())
                delta = probs
                delta[np.arange(len(y)), y] -= 1.0  # dL/dlogits (sum form)
                for i in range(len(w_bc) - 1, -1, -1):
                    gw[i] += delta.T @ hiddens[i]
                    gb[i] += delta.sum(axis=0)
                    if i > 0:
                        delta = (delta @ w_bc[i]) * (hiddens[i] > 0)
                cnt += len(y)
            flat = np.concatenate([g.ravel() for g in gw] + [g.ravel() for g in gb])
            yield pd.DataFrame([{"pid": 0, "flat": flat.tolist(), "loss": loss, "n": cnt}])

        rows = prep.mapInPandas(grad, grad_schema).collect()
        flat = np.zeros(sum(w.size for w in weights) + sum(b.size for b in biases))
        loss_sum = 0.0
        for r in rows:
            flat += np.array(r["flat"])
            loss_sum += r["loss"]
        loss = loss_sum / n + penalty * sum(float((w * w).sum()) for w in weights)
        history.append(loss)

        # unflatten + Adam step
        off = 0
        t = epoch
        for i, w in enumerate(weights):
            g = flat[off : off + w.size].reshape(w.shape) / n + 2.0 * penalty * w
            off += w.size
            m_w[i] = beta1 * m_w[i] + (1 - beta1) * g
            v_w[i] = beta2 * v_w[i] + (1 - beta2) * g * g
            mhat = m_w[i] / (1 - beta1**t)
            vhat = v_w[i] / (1 - beta2**t)
            weights[i] = w - learning_rate * mhat / (np.sqrt(vhat) + eps)
        for i, b in enumerate(biases):
            g = flat[off : off + b.size] / n
            off += b.size
            m_b[i] = beta1 * m_b[i] + (1 - beta1) * g
            v_b[i] = beta2 * v_b[i] + (1 - beta2) * g * g
            mhat = m_b[i] / (1 - beta1**t)
            vhat = v_b[i] / (1 - beta2**t)
            biases[i] = b - learning_rate * mhat / (np.sqrt(vhat) + eps)

        if prev is not None and abs(prev - loss) < tolerance:
            break
        prev = loss

    return MLPClassifierModel(
        weights=weights, biases=biases, classes=classes,
        loss=history[-1], epochs=epoch, history=history,
    )
