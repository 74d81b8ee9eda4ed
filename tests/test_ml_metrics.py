"""Evaluation metrics (reference ``ml/ml-algo/.../metrics/``)."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.ml.metrics import (
    aucpr,
    classification_metrics,
    classification_summary,
    regression_metrics,
)


def test_classification_metrics_hand_values(spark):
    # targets:     1 1 1 0 0
    # predictions: 1 0 1 0 1
    rows = [(1, 1), (1, 0), (1, 1), (0, 0), (0, 1)]
    df = spark.createDataFrame(rows, "target long, prediction long")
    per = {r.cls: r for r in classification_metrics(df).collect()}
    # class 1: tp=2 fp=1 fn=1 → prec 2/3, rec 2/3, f1 = 4/6 = 2/3
    assert per[1].precision == pytest.approx(2 / 3)
    assert per[1].recall == pytest.approx(2 / 3)
    assert per[1].f1 == pytest.approx(2 / 3)
    # class 0: tp=1 fp=1 fn=1 → all 1/2
    assert per[0].f1 == pytest.approx(0.5)
    s = classification_summary(df)
    assert s["accuracy"] == pytest.approx(0.6)
    assert s["f1_macro"] == pytest.approx((2 / 3 + 0.5) / 2)
    assert s["f1_weighted"] == pytest.approx((3 * 2 / 3 + 2 * 0.5) / 5)


def test_regression_metrics_hand_values(spark):
    rows = [(1.0, 2.0), (3.0, 3.0), (5.0, 2.0)]  # errors: 1, 0, -3
    df = spark.createDataFrame(rows, "target double, prediction double")
    r = regression_metrics(df).collect()[0]
    assert r.mean_squared_error == pytest.approx(10 / 3)
    assert r.root_mean_squared_error == pytest.approx((10 / 3) ** 0.5)
    assert r.mean_absolute_error == pytest.approx(4 / 3)


def test_aucpr_perfect_and_empty(spark):
    # perfectly separated scores → AUCPR 1.0
    rows = [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)]
    df = spark.createDataFrame(rows, "probability double, label long")
    assert aucpr(df) == pytest.approx(1.0)
    # no positives → 0 (LinkMetric: positiveCount == 0 → 0.0)
    neg = spark.createDataFrame([(0.5, 0)], "probability double, label long")
    assert aucpr(neg) == 0.0


def test_aucpr_mixed_hand_computed(spark):
    # scores desc: (0.9,1) (0.7,0) (0.5,1)
    # thresholds: 0.9 → tp1 fp0 → (r=.5, p=1); 0.7 → (r=.5, p=.5);
    # 0.5 → (r=1, p=2/3); plus closing (0,1).
    # area = .5*(1+1)/2 [0→.5 via (0,1)-(.5,1)] + 0 [equal recall]
    #        + .5*(.5+2/3)/2 [.5→1]
    rows = [(0.9, 1), (0.7, 0), (0.5, 1)]
    df = spark.createDataFrame(rows, "probability double, label long")
    expected = 0.5 * (1 + 1) / 2 + 0.5 * (0.5 + 2 / 3) / 2
    assert aucpr(df) == pytest.approx(expected)


def test_aucpr_negative_class_weight(spark):
    rows = [(0.9, 1), (0.7, 0), (0.5, 1)]
    df = spark.createDataFrame(rows, "probability double, label long")
    # heavier negatives → lower precision at the 0.7 and 0.5 points
    assert aucpr(df, negative_class_weight=2.0) < aucpr(df)


def test_aucpr_quantized_mode(spark):
    """max_thresholds caps the curve sweep; with enough buckets to keep
    every distinct score in its own bucket the result is EXACT, and with
    few buckets it stays within coarse-sampling error of the exact area."""
    import random

    from graph_data_science_spark.ml.metrics import aucpr

    rng = random.Random(11)
    rows = [(rng.random(), 1 if rng.random() < 0.4 else 0) for _ in range(500)]
    df = spark.createDataFrame(rows, "probability double, label int")
    exact = aucpr(df)
    fine = aucpr(df, max_thresholds=100000)
    coarse = aucpr(df, max_thresholds=32)
    # equi-width buckets can merge the odd pair of neighbors (birthday
    # collisions), so fine is near-exact rather than bit-exact
    assert abs(fine - exact) < 1e-3
    assert abs(coarse - exact) < 0.05
    assert abs(fine - exact) <= abs(coarse - exact) + 1e-9
    # quantized curve has at most max_thresholds+1 sweep rows: sanity via
    # a tiny bucket count still returning a valid area
    tiny = aucpr(df, max_thresholds=2)
    assert 0.0 < tiny <= 1.0
