"""ML pipelines: node classification + link prediction.

Reference surfaces:
- ``pipeline/src/main/java/org/neo4j/gds/ml/pipeline/nodePipeline/classification/
  NodeClassificationTrainingPipeline.java`` — node property steps →
  feature selection → split → logistic regression → model with test
  metrics → predict.
- ``pipeline/.../linkPipeline/LinkPredictionTrainingPipeline.java`` —
  link feature steps (``linkfunctions/HadamardFeatureStep.java``,
  ``CosineFeatureStep.java``, ``L2FeatureStep.java``), negative sampling
  (``EdgeSplitter.java``), logistic regression, predict over candidate
  pairs.

Spark execution: feature assembly is array algebra (``zip_with`` /
``aggregate`` — codegen, no UDFs); the train/test split and negative
sampling are PORTABLE hash decisions (xxhash64 of the node/edge key and
seed — reproducible on any cluster size, unlike the reference's
SplittableRandom shuffles which are thread-order-dependent); training is
``ml.logreg`` full-batch GD. Model selection (GDS trains several
candidate configs and picks by validation metric) reduces here to one
explicit config — RandomForest/MLP model families are out of scope
(decision-tree training is pointer-chasing-sequential per node split;
the LR family is the reference's default and the one with a faithful
distributed formulation).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.ml.logreg import LogisticRegressionModel, train_logistic_regression


def _split_flag(key_cols: list, test_fraction: float, seed: int):
    """Deterministic test-set membership: portable hash in [0, 1)."""
    h = F.abs(F.xxhash64(*key_cols, F.lit(int(seed)))) % 1_000_000
    return h < int(test_fraction * 1_000_000)


def _accuracy_f1(pred: DataFrame, label_col: str) -> dict:
    per_class = (
        pred.groupBy(F.col(label_col).alias("cls"))
        .agg(
            F.sum(F.when(F.col("predicted") == F.col(label_col), 1).otherwise(0)).alias("tp"),
            F.count(F.lit(1)).alias("support"),
        )
    )
    pred_counts = pred.groupBy(F.col("predicted").alias("cls")).agg(
        F.count(F.lit(1)).alias("pred_n")
    )
    rows = per_class.join(pred_counts, "cls", "outer").fillna(0).collect()
    total = sum(r["support"] for r in rows)
    correct = sum(r["tp"] for r in rows)
    f1s = []
    for r in rows:
        prec = r["tp"] / r["pred_n"] if r["pred_n"] else 0.0
        rec = r["tp"] / r["support"] if r["support"] else 0.0
        f1s.append(2 * prec * rec / (prec + rec) if prec + rec else 0.0)
    return {
        "accuracy": correct / total if total else 0.0,
        "f1_macro": sum(f1s) / len(f1s) if f1s else 0.0,
        "test_size": total,
    }


@dataclass
class NodeClassificationResult:
    model: LogisticRegressionModel
    metrics: dict
    predictions: DataFrame  # (node_id, predicted, probability) over ALL input nodes


def node_classification_pipeline(
    features: DataFrame,
    label_col: str = "label",
    feature_col: str = "features",
    test_fraction: float = 0.3,
    seed: int = 42,
    max_epochs: int = 100,
    learning_rate: float = 1.0,
    l2: float = 0.0,
    tolerance: float = 1e-6,
) -> NodeClassificationResult:
    """``features``: (node_id long, features array<double>, label long)."""
    is_test = _split_flag([F.col("node_id")], test_fraction, seed)
    train = features.filter(~is_test)
    test = features.filter(is_test)
    model = train_logistic_regression(
        train, label_col, feature_col, max_epochs, learning_rate, l2, tolerance
    )
    metrics = _accuracy_f1(model.predict(test, feature_col), label_col)
    preds = model.predict(features, feature_col).select("node_id", "predicted", "probability")
    return NodeClassificationResult(model=model, metrics=metrics, predictions=preds)


_LINK_FEATURES: dict[str, Callable] = {
    # reference linkfunctions/: Hadamard, L2 are element-wise arrays;
    # Cosine is a single scalar feature.
    "hadamard": lambda a, b: F.zip_with(a, b, lambda x, y: x * y),
    "l2": lambda a, b: F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
    "cosine": lambda a, b: F.array(
        F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
        / (
            F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))
            * F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, v: s + v * v))
            + F.lit(1e-12)
        )
    ),
}


def link_features(
    pairs: DataFrame, node_features: DataFrame, feature_type: str = "hadamard"
) -> DataFrame:
    """(src, dst, …) × (node_id, features) → + ``features`` combined link
    feature array."""
    if feature_type not in _LINK_FEATURES:
        raise ValueError(f"feature_type must be one of {sorted(_LINK_FEATURES)}")
    fa = node_features.select(F.col("node_id").alias("src"), F.col("features").alias("_fa"))
    fb = node_features.select(F.col("node_id").alias("dst"), F.col("features").alias("_fb"))
    return (
        pairs.join(fa, "src")
        .join(fb, "dst")
        .withColumn("features", _LINK_FEATURES[feature_type](F.col("_fa"), F.col("_fb")))
        .drop("_fa", "_fb")
    )


@dataclass
class LinkPredictionResult:
    model: LogisticRegressionModel
    metrics: dict
    feature_type: str
    node_features: DataFrame

    def predict(self, pairs: DataFrame) -> DataFrame:
        """(src, dst) → + predicted (1 = link), probability."""
        feats = link_features(pairs, self.node_features, self.feature_type)
        return self.model.predict(feats).select("src", "dst", "predicted", "probability")


def link_prediction_pipeline(
    graph: LinkGraph,
    node_features: DataFrame,
    feature_type: str = "hadamard",
    negative_sampling_ratio: float = 1.0,
    test_fraction: float = 0.3,
    seed: int = 42,
    max_epochs: int = 100,
    learning_rate: float = 1.0,
    l2: float = 0.0,
    tolerance: float = 1e-6,
) -> LinkPredictionResult:
    """Train link prediction on ``graph``'s edges as positives and
    hash-sampled non-edges as negatives (reference ``EdgeSplitter.java``
    semantics: ratio × |positives| negative examples, uniform endpoint
    draws, existing edges rejected). Endpoints are drawn from the ACTUAL
    feature-bearing node set via a dense index (graph.ids.dense_ids) —
    drawing from [0, node_count) instead silently loses every candidate
    whose hashed id isn't a real node, skews the class balance, and the
    under-trained bias then misclassifies non-links."""
    from graph_data_science_spark.graph.ids import dense_ids

    pos = graph.edges.select("src", "dst").distinct()
    k_neg = max(1, int(round(negative_sampling_ratio)))
    idx = dense_ids(
        node_features.select(F.col("node_id").alias("real_id")), ["real_id"]
    ).select("real_id", F.col("node_id").alias("_idx"))
    n_real = idx.count()
    # Deterministic endpoint draws over the dense index; self-pairs and
    # real edges rejected.
    cand_idx = (
        pos.select(
            F.explode(F.sequence(F.lit(0), F.lit(k_neg - 1))).alias("i"), "src", "dst"
        )
        .select(
            (F.abs(F.xxhash64(F.col("src"), F.col("i"), F.lit(seed))) % n_real).alias("si"),
            (F.abs(F.xxhash64(F.col("dst"), F.col("i"), F.lit(seed + 1))) % n_real).alias("di"),
        )
    )
    cand = (
        cand_idx.join(idx.select(F.col("_idx").alias("si"), F.col("real_id").alias("src")), "si")
        .join(idx.select(F.col("_idx").alias("di"), F.col("real_id").alias("dst")), "di")
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    # Reject BOTH orientations: link features are symmetric, so a sampled
    # "negative" (b, a) whose reverse (a, b) is a real edge is a mislabeled
    # positive (reference EdgeSplitter samples against the undirected view).
    pos_undir = pos.unionByName(
        pos.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    neg = cand.join(pos_undir, ["src", "dst"], "left_anti")
    examples = pos.withColumn("label", F.lit(1)).unionByName(
        neg.withColumn("label", F.lit(0))
    )
    feats = link_features(examples, node_features, feature_type).select(
        "src", "dst", "features", F.col("label").cast("long").alias("label")
    )
    is_test = _split_flag([F.col("src"), F.col("dst")], test_fraction, seed)
    train = feats.filter(~is_test)
    test = feats.filter(is_test)
    model = train_logistic_regression(
        train, "label", "features", max_epochs, learning_rate, l2, tolerance
    )
    metrics = _accuracy_f1(model.predict(test), "label")
    return LinkPredictionResult(
        model=model, metrics=metrics, feature_type=feature_type, node_features=node_features
    )
