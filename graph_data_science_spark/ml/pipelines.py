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
``ml.logreg`` full-batch GD. Model selection mirrors the reference's
candidate loop (``pipeline/.../NodeClassificationTrain.java`` — each
candidate config is cross-validated with ``StratifiedKFoldSplitter``,
the best mean validation score wins, the winner retrains on the full
train set): pass ``model_candidates`` dicts with ``method`` ∈
{LogisticRegression, RandomForest, MLP} (the reference's three classifier
families, ``ml/ml-algo/.../models/ClassifierTrainerFactory.java``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.ml.logreg import LogisticRegressionModel, train_logistic_regression


def _split_flag(key_cols: list, test_fraction: float, seed: int):
    """Deterministic test-set membership: portable hash in [0, 1)."""
    h = F.abs(F.xxhash64(*key_cols, F.lit(int(seed)))) % 1_000_000
    return h < int(test_fraction * 1_000_000)


# Reference hyperparameter spellings → the trainers' own (GDS configs use
# camelCase throughout: TunableTrainerConfig / *TrainConfig.java). "penalty"
# maps to logreg's `l2` ONLY — the MLP and linear-regression trainers take
# `penalty` natively, so the alias is method-scoped.
_PARAM_ALIASES = {
    "learningRate": "learning_rate",
    "maxEpochs": "max_epochs",
    "maxDepth": "max_depth",
    "numberOfDecisionTrees": "number_of_trees",
    "hiddenLayerSizes": "hidden_layer_sizes",
    "minSplitSize": "min_split_size",
    "minLeafSize": "min_leaf_size",
    "maxFeaturesRatio": "max_features_ratio",
    "numberOfSamplesRatio": "samples_ratio",
    "randomSeed": "random_seed",
    "searchDepth": "search_depth",
}


def _normalize_params(cand: dict, method: str) -> dict:
    params = {_PARAM_ALIASES.get(k, k): v for k, v in cand.items() if k != "method"}
    if method == "LogisticRegression" and "penalty" in params:
        params["l2"] = params.pop("penalty")
    return params


def _fit_model(train: DataFrame, label_col: str, feature_col: str, cand: dict, seed: int):
    """Train one candidate config; returns (model, predict_fn) where
    predict_fn(df) adds ``predicted`` (long) + ``probability`` (double of
    the argmax class) regardless of the model family's native shape."""
    method = cand.get("method", "LogisticRegression")
    params = _normalize_params(cand, method)
    if method == "LogisticRegression":
        m = train_logistic_regression(train, label_col, feature_col, **params)
        return m, lambda df: m.predict(df, feature_col)
    if method == "RandomForest":
        from graph_data_science_spark.ml.randomforest import train_random_forest

        params.setdefault("random_seed", seed)
        m = train_random_forest(train, label_col=label_col, feature_col=feature_col, **params)

        def rf_predict(df: DataFrame) -> DataFrame:
            out = m.predict(df, features=feature_col)
            return out.withColumnRenamed("prediction", "predicted").withColumn(
                "probability", F.array_max("probabilities")
            )

        return m, rf_predict
    if method == "MLP":
        from graph_data_science_spark.ml.mlp import train_mlp_classifier

        params.setdefault("random_seed", seed)
        m = train_mlp_classifier(train, label_col=label_col, feature_col=feature_col, **params)

        def mlp_predict(df: DataFrame) -> DataFrame:
            out = m.predict(df, features=feature_col)
            return out.withColumnRenamed("prediction", "predicted").withColumn(
                "probability", F.array_max("probabilities")
            )

        return m, mlp_predict
    raise ValueError(f"unknown model method {method!r}")


def _select_and_train(
    train: DataFrame,
    label_col: str,
    feature_col: str,
    key_cols: list,
    candidates: list,
    validation_folds: int,
    seed: int,
):
    """The reference's model-selection loop: stratified k-fold CV per
    candidate on the TRAIN side only, best mean f1_macro wins (ties →
    first candidate, like the reference's strict improvement), winner
    retrains on all of train. Returns (model, predict_fn, stats)."""
    if len(candidates) == 1 or validation_folds < 2:
        m, pf = _fit_model(train, label_col, feature_col, candidates[0], seed)
        return m, pf, [{"candidate": candidates[0], "mean_f1_macro": None}]

    from graph_data_science_spark.ml.splitting import stratified_kfold_split

    ordered = train.withColumn("_ord", F.xxhash64(*key_cols, F.lit(int(seed))))
    folds = stratified_kfold_split(
        ordered, k=validation_folds, target_col=label_col, order_col="_ord"
    ).persist()
    folds.count()
    stats = []
    for cand in candidates:
        scores = []
        for f in range(validation_folds):
            tr = folds.filter(F.col("fold") != f).drop("fold", "_ord")
            va = folds.filter(F.col("fold") == f).drop("fold", "_ord")
            _, pf = _fit_model(tr, label_col, feature_col, cand, seed)
            scores.append(_accuracy_f1(pf(va), label_col)["f1_macro"])
        stats.append({"candidate": cand, "mean_f1_macro": sum(scores) / len(scores)})
    folds.unpersist()
    best = max(range(len(stats)), key=lambda i: stats[i]["mean_f1_macro"])
    # strict-improvement tie-break: max() returns the FIRST argmax already
    m, pf = _fit_model(train, label_col, feature_col, candidates[best], seed)
    return m, pf, stats


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
    model: object  # LogisticRegressionModel | RandomForestModel | MLPClassifierModel
    metrics: dict
    predictions: DataFrame  # (node_id, predicted, probability) over ALL input nodes
    candidate_stats: list = field(default_factory=list)


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
    model_candidates: list | None = None,
    validation_folds: int = 3,
) -> NodeClassificationResult:
    """``features``: (node_id long, features array<double>, label long).

    ``model_candidates``: list of config dicts, each with ``method`` ∈
    {LogisticRegression, RandomForest, MLP} plus that trainer's kwargs —
    cross-validated with ``validation_folds`` stratified folds on the
    train side, best mean f1_macro retrains on all of train (the
    reference's selection loop). Default: one LogisticRegression built
    from the scalar args (backward compatible)."""
    if model_candidates is None:
        model_candidates = [
            {
                "method": "LogisticRegression",
                "max_epochs": max_epochs,
                "learning_rate": learning_rate,
                "l2": l2,
                "tolerance": tolerance,
            }
        ]
    is_test = _split_flag([F.col("node_id")], test_fraction, seed)
    train = features.filter(~is_test)
    test = features.filter(is_test)
    model, predict_fn, stats = _select_and_train(
        train, label_col, feature_col, [F.col("node_id")], model_candidates,
        validation_folds, seed,
    )
    metrics = _accuracy_f1(predict_fn(test), label_col)
    preds = predict_fn(features).select("node_id", "predicted", "probability")
    return NodeClassificationResult(
        model=model, metrics=metrics, predictions=preds, candidate_stats=stats
    )


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
    model: object  # LogisticRegressionModel | RandomForestModel | MLPClassifierModel
    metrics: dict
    feature_type: str
    node_features: DataFrame
    candidate_stats: list = field(default_factory=list)
    _predict_fn: Callable | None = None

    def predict(self, pairs: DataFrame) -> DataFrame:
        """(src, dst) → + predicted (1 = link), probability."""
        feats = link_features(pairs, self.node_features, self.feature_type)
        out = self._predict_fn(feats) if self._predict_fn is not None else self.model.predict(feats)
        return out.select("src", "dst", "predicted", "probability")


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
    model_candidates: list | None = None,
    validation_folds: int = 3,
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
    if model_candidates is None:
        model_candidates = [
            {
                "method": "LogisticRegression",
                "max_epochs": max_epochs,
                "learning_rate": learning_rate,
                "l2": l2,
                "tolerance": tolerance,
            }
        ]
    model, predict_fn, stats = _select_and_train(
        train, "label", "features", [F.col("src"), F.col("dst")], model_candidates,
        validation_folds, seed,
    )
    metrics = _accuracy_f1(predict_fn(test), "label")
    return LinkPredictionResult(
        model=model, metrics=metrics, feature_type=feature_type,
        node_features=node_features, candidate_stats=stats, _predict_fn=predict_fn
    )


@dataclass
class NodeRegressionResult:
    model: object  # LinearRegressionModel | RandomForestModel
    metrics: dict  # test-side MSE / RMSE / MAE
    predictions: DataFrame  # (node_id, prediction) over ALL input nodes
    candidate_stats: list = field(default_factory=list)


def _fit_regressor(train: DataFrame, target_col: str, feature_col: str, cand: dict, seed: int):
    method = cand.get("method", "LinearRegression")
    params = _normalize_params(cand, method)
    if method == "LinearRegression":
        from graph_data_science_spark.ml.linreg import train_linear_regression

        m = train_linear_regression(train, label_col=target_col, feature_col=feature_col, **params)
        return m, lambda df: m.predict(df, features=feature_col)
    if method == "RandomForest":
        from graph_data_science_spark.ml.randomforest import train_random_forest

        params.setdefault("random_seed", seed)
        m = train_random_forest(
            train, label_col=target_col, feature_col=feature_col, regression=True, **params
        )
        return m, lambda df: m.predict(df, features=feature_col)
    raise ValueError(f"unknown regressor method {method!r}")


def node_regression_pipeline(
    features: DataFrame,
    target_col: str = "target",
    feature_col: str = "features",
    test_fraction: float = 0.3,
    seed: int = 42,
    model_candidates: list | None = None,
    validation_folds: int = 3,
) -> NodeRegressionResult:
    """Node regression pipeline (reference
    ``pipeline/.../nodePipeline/regression/NodeRegressionTrain.java:64-233``
    — candidate regressors cross-validated on RegressionMetrics, best
    mean MSE retrains on full train, test metrics on the holdout).
    Candidates: ``method`` ∈ {LinearRegression, RandomForest} (the
    reference's two regressor families, ``RegressionTrainerFactory``).
    Folds are plain mod-k over the seeded hash order (regression has no
    class to stratify on)."""
    from graph_data_science_spark.ml.metrics import regression_metrics

    if model_candidates is None:
        model_candidates = [{"method": "LinearRegression", "solver": "normal"}]
    is_test = _split_flag([F.col("node_id")], test_fraction, seed)
    train = features.filter(~is_test)
    test = features.filter(is_test)

    def _mse(pred: DataFrame) -> float:
        row = regression_metrics(pred, target_col=target_col, prediction_col="prediction").collect()[0]
        return float(row["mean_squared_error"])

    stats = []
    if len(model_candidates) > 1 and validation_folds >= 2:
        fold = (
            F.abs(F.xxhash64(F.col("node_id"), F.lit(int(seed) + 1))) % validation_folds
        )
        folded = train.withColumn("_fold", fold).persist()
        folded.count()
        for cand in model_candidates:
            scores = []
            for f in range(validation_folds):
                tr = folded.filter(F.col("_fold") != f).drop("_fold")
                va = folded.filter(F.col("_fold") == f).drop("_fold")
                _, pf = _fit_regressor(tr, target_col, feature_col, cand, seed)
                scores.append(_mse(pf(va)))
            stats.append({"candidate": cand, "mean_mse": sum(scores) / len(scores)})
        folded.unpersist()
        best = min(range(len(stats)), key=lambda i: stats[i]["mean_mse"])
        winner = model_candidates[best]
    else:
        winner = model_candidates[0]
        stats = [{"candidate": winner, "mean_mse": None}]

    model, predict_fn = _fit_regressor(train, target_col, feature_col, winner, seed)
    test_row = regression_metrics(
        predict_fn(test), target_col=target_col, prediction_col="prediction"
    ).collect()[0]
    metrics = {
        "mean_squared_error": float(test_row["mean_squared_error"]),
        "root_mean_squared_error": float(test_row["root_mean_squared_error"]),
        "mean_absolute_error": float(test_row["mean_absolute_error"]),
    }
    preds = predict_fn(features).select("node_id", "prediction")
    return NodeRegressionResult(
        model=model, metrics=metrics, predictions=preds, candidate_stats=stats
    )
