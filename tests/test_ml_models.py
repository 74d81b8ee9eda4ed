"""Linear regression / MLP / random forest (reference
``ml/ml-algo/.../models/{linearregression,mlp,randomforest}``)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.ml import (
    train_linear_regression,
    train_mlp_classifier,
    train_random_forest,
)


def _linear_df(spark, n=200, noise=0.0):
    rng = np.random.default_rng(7)
    x = rng.uniform(-2, 2, size=(n, 2))
    y = 3.0 * x[:, 0] - 1.5 * x[:, 1] + 0.5 + noise * rng.standard_normal(n)
    rows = [(x[i].tolist(), float(y[i])) for i in range(n)]
    return spark.createDataFrame(rows, "features array<double>, target double")


def test_linreg_normal_recovers_exact_solution(spark):
    df = _linear_df(spark)
    m = train_linear_regression(df, solver="normal")
    assert m.weights[0] == pytest.approx(3.0, abs=1e-9)
    assert m.weights[1] == pytest.approx(-1.5, abs=1e-9)
    assert m.bias == pytest.approx(0.5, abs=1e-9)
    assert m.loss == pytest.approx(0.0, abs=1e-12)
    pred = m.predict(df).select(
        F.max(F.abs(F.col("prediction") - F.col("target"))).alias("e")
    ).collect()[0]["e"]
    assert pred < 1e-9


def test_linreg_gd_converges(spark):
    df = _linear_df(spark)
    m = train_linear_regression(df, solver="gd", max_epochs=300, learning_rate=0.2)
    assert m.weights[0] == pytest.approx(3.0, abs=0.05)
    assert m.weights[1] == pytest.approx(-1.5, abs=0.05)
    # loss history monotone-ish: final < first
    assert m.history[-1] < m.history[0]


def test_linreg_ridge_shrinks(spark):
    df = _linear_df(spark)
    m0 = train_linear_regression(df, solver="normal", penalty=0.0)
    m1 = train_linear_regression(df, solver="normal", penalty=5.0)
    assert abs(m1.weights[0]) < abs(m0.weights[0])


def _blob_df(spark, n=60):
    rng = np.random.default_rng(3)
    rows = []
    for c, (cx, cy) in enumerate([(-2.0, -2.0), (2.0, 2.0), (-2.0, 2.0)]):
        pts = rng.standard_normal((n, 2)) * 0.4 + np.array([cx, cy])
        rows += [([float(p[0]), float(p[1])], c) for p in pts]
    return spark.createDataFrame(rows, "features array<double>, label long")


def test_mlp_separates_blobs(spark):
    df = _blob_df(spark)
    m = train_mlp_classifier(
        df, hidden_layer_sizes=(8,), max_epochs=150, learning_rate=0.05, random_seed=1
    )
    out = m.predict(df)
    acc = out.select(F.avg((F.col("prediction") == F.col("label")).cast("double"))).collect()[0][0]
    assert acc > 0.95
    # probabilities sum to 1 and history decreased
    s = out.select(F.aggregate("probabilities", F.lit(0.0), lambda a, v: a + v).alias("s")).agg(
        F.max(F.abs(F.col("s") - 1.0))
    ).collect()[0][0]
    assert s < 1e-9
    assert m.history[-1] < m.history[0]


def test_mlp_deterministic(spark):
    df = _blob_df(spark, n=20)
    m1 = train_mlp_classifier(df, hidden_layer_sizes=(4,), max_epochs=10, random_seed=5)
    m2 = train_mlp_classifier(df, hidden_layer_sizes=(4,), max_epochs=10, random_seed=5)
    for a, b in zip(m1.weights, m2.weights):
        assert np.allclose(a, b)


def test_random_forest_classifier_fits_blobs(spark):
    df = _blob_df(spark)
    m = train_random_forest(
        df, number_of_trees=5, max_depth=4, samples_ratio=1.0,
        max_features_ratio=1.0, random_seed=11,
    )
    out = m.predict(df)
    acc = out.select(F.avg((F.col("prediction") == F.col("label")).cast("double"))).collect()[0][0]
    assert acc > 0.95
    # vote-fraction probabilities (RandomForestClassifier:52-62): k/num_trees
    probs = out.select("probabilities").first()[0]
    assert all(abs(p * 5 - round(p * 5)) < 1e-12 for p in probs)


def test_random_forest_single_stump_threshold(spark):
    # 1 tree, depth 1, no bootstrap, 1 feature: the stump must split the
    # two value clusters at the first right-cluster value (left on <).
    rows = [([float(v)], 0) for v in (1.0, 2.0, 3.0)] + [([float(v)], 1) for v in (10.0, 11.0, 12.0)]
    df = spark.createDataFrame(rows, "features array<double>, label long")
    m = train_random_forest(
        df, number_of_trees=1, max_depth=1, samples_ratio=0.0,
        max_features_ratio=1.0, random_seed=1,
    )
    nodes = m.trees[0]
    root = nodes[0]
    assert root[1] == 0 and root[2] == pytest.approx(10.0)  # threshold = first right value
    preds = {tuple(r.features): r.prediction for r in m.predict(df).collect()}
    assert preds[(3.0,)] == 0 and preds[(10.0,)] == 1


def test_random_forest_regression_mean_leaves(spark):
    rows = [([float(i)], float(2 * i)) for i in range(20)]
    df = spark.createDataFrame(rows, "features array<double>, target double")
    m = train_random_forest(
        df, label_col="target", number_of_trees=3, max_depth=5,
        samples_ratio=0.0, max_features_ratio=1.0, regression=True, random_seed=2,
    )
    out = m.predict(df)
    err = out.select(F.max(F.abs(F.col("prediction") - F.col("target")))).collect()[0][0]
    assert err < 2.0  # depth-5 tree on 20 points: near-exact piecewise fit


def test_pipeline_model_candidates_selection(spark):
    from graph_data_science_spark.ml.pipelines import node_classification_pipeline

    df = _blob_df(spark, n=30).withColumn(
        "node_id", F.monotonically_increasing_id()
    )
    res = node_classification_pipeline(
        df,
        model_candidates=[
            {"method": "LogisticRegression", "max_epochs": 40, "learning_rate": 0.5},
            {"method": "RandomForest", "number_of_trees": 5, "max_depth": 4,
             "max_features_ratio": 1.0},
        ],
        validation_folds=2,
        seed=3,
    )
    assert len(res.candidate_stats) == 2
    assert all(s["mean_f1_macro"] is not None for s in res.candidate_stats)
    assert res.metrics["accuracy"] > 0.8
    assert res.predictions.count() == 90


def test_out_of_bag_error(spark):
    from graph_data_science_spark.ml import out_of_bag_error

    df = _blob_df(spark, n=40)
    m = train_random_forest(
        df, number_of_trees=8, max_depth=4, samples_ratio=1.0,
        max_features_ratio=1.0, random_seed=7,
    )
    err = out_of_bag_error(
        m, df, samples_ratio=1.0, random_seed=7
    )
    # well-separated blobs: OOB error should be small but is a real
    # holdout estimate (not 0-by-construction like train accuracy)
    assert 0.0 <= err < 0.2
    # deterministic
    assert err == out_of_bag_error(m, df, samples_ratio=1.0, random_seed=7)
    with pytest.raises(ValueError):
        out_of_bag_error(m, df, samples_ratio=0.0)


def test_node_regression_pipeline_candidates(spark):
    from graph_data_science_spark.ml import node_regression_pipeline

    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, size=(120, 2))
    y = 2.0 * x[:, 0] + 0.5 * x[:, 1] + 1.0
    rows = [(i, x[i].tolist(), float(y[i])) for i in range(120)]
    df = spark.createDataFrame(rows, "node_id long, features array<double>, target double")
    res = node_regression_pipeline(
        df,
        model_candidates=[
            {"method": "LinearRegression", "solver": "normal"},
            {"method": "RandomForest", "number_of_trees": 3, "max_depth": 3,
             "max_features_ratio": 1.0},
        ],
        validation_folds=2,
        seed=9,
    )
    # exactly linear target → linreg must win the CV and fit near-exactly
    assert res.candidate_stats[0]["mean_mse"] < res.candidate_stats[1]["mean_mse"]
    assert isinstance(res.model.weights, list)
    assert res.metrics["root_mean_squared_error"] < 1e-9
    assert res.predictions.count() == 120
