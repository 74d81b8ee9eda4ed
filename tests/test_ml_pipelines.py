"""ML pipelines: distributed logistic regression (separable fixtures),
node classification, link prediction (reference pipeline/ surfaces)."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.ml import (
    link_prediction_pipeline,
    node_classification_pipeline,
    train_logistic_regression,
)
from graph_data_science_spark.ml.pipelines import link_features


def test_logreg_separable_binary(spark):
    # x = ±1 with margin: the trained model must classify perfectly.
    rows = [(i, [1.0] if i % 2 else [-1.0], 1 if i % 2 else 0) for i in range(40)]
    df = spark.createDataFrame(rows, "node_id long, features array<double>, label long")
    model = train_logistic_regression(df, max_epochs=60)
    pred = model.predict(df)
    assert pred.filter(F.col("predicted") != F.col("label")).count() == 0
    assert model.final_loss < 0.3
    assert model.loss_history[0] > model.final_loss  # loss decreased


def test_logreg_deterministic(spark):
    rows = [(i, [float(i % 5 - 2), 1.0], 1 if i % 5 > 2 else 0) for i in range(30)]
    df = spark.createDataFrame(rows, "node_id long, features array<double>, label long")
    m1 = train_logistic_regression(df, max_epochs=20)
    m2 = train_logistic_regression(df, max_epochs=20)
    assert m1.weights == m2.weights and m1.bias == m2.bias


def test_logreg_multiclass_ovr(spark):
    # Three one-hot clusters — OvR must recover all three.
    rows = []
    for i in range(30):
        c = i % 3
        feat = [1.0 if j == c else 0.0 for j in range(3)]
        rows.append((i, feat, c * 10))  # non-contiguous class labels
    df = spark.createDataFrame(rows, "node_id long, features array<double>, label long")
    model = train_logistic_regression(df, max_epochs=60)
    assert model.classes == [0, 10, 20]
    pred = model.predict(df)
    assert pred.filter(F.col("predicted") != F.col("label")).count() == 0


def test_node_classification_pipeline(spark):
    rows = [(i, [2.0 * (i % 2) - 1.0], i % 2) for i in range(60)]
    df = spark.createDataFrame(rows, "node_id long, features array<double>, label long")
    res = node_classification_pipeline(df, max_epochs=60, test_fraction=0.3)
    assert res.metrics["accuracy"] == 1.0
    assert res.metrics["f1_macro"] == 1.0
    assert res.predictions.count() == 60


def test_link_features_shapes(spark):
    nf = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])], "node_id long, features array<double>"
    )
    pairs = spark.createDataFrame([(0, 1)], "src long, dst long")
    had = link_features(pairs, nf, "hadamard").collect()[0]["features"]
    assert had == [3.0, 8.0]
    l2 = link_features(pairs, nf, "l2").collect()[0]["features"]
    assert l2 == [4.0, 4.0]
    cos = link_features(pairs, nf, "cosine").collect()[0]["features"]
    assert cos[0] == pytest.approx(11.0 / ((5**0.5) * (25**0.5)), rel=1e-6)
    with pytest.raises(ValueError):
        link_features(pairs, nf, "nope")


def test_link_prediction_pipeline(spark):
    # Chain graph, feature = [position]: links are exactly the pairs with
    # l2 distance 1; every sampled negative has l2 >= 4 (distance-1 pairs
    # are all edges, rejected by the anti-join) — cleanly separable.
    n = 20
    nf = spark.createDataFrame(
        [(i, [float(i)]) for i in range(n)], "node_id long, features array<double>"
    )
    edges = [(i, i + 1, 1.0) for i in range(n - 1)]
    g = LinkGraph(
        edges=spark.createDataFrame(edges, "src long, dst long, weight double"),
        node_count=n,
    )
    res = link_prediction_pipeline(
        g, nf, feature_type="l2", max_epochs=200, test_fraction=0.25
    )
    probe = spark.createDataFrame([(0, 1), (0, 10)], "src long, dst long")
    out = {(r["src"], r["dst"]): r["predicted"] for r in res.predict(probe).collect()}
    assert out[(0, 1)] == 1
    assert out[(0, 10)] == 0
    assert res.metrics["accuracy"] >= 0.9
