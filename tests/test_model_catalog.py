"""Model catalog: set/get/exists/drop/list/publish + store/load round-trip
(reference ``model-catalog-api/.../ModelCatalog.java:30``, procedure surface
``gds.model.list`` / ``gds.model.exists`` / ``gds.model.drop``)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph.models import ModelCatalog
from graph_data_science_spark.ml import (
    train_linear_regression,
    train_logistic_regression,
    train_mlp_classifier,
    train_random_forest,
)


def _linear_df(spark, n=120):
    rng = np.random.default_rng(11)
    x = rng.uniform(-2, 2, size=(n, 2))
    y = 2.0 * x[:, 0] - x[:, 1] + 0.25
    rows = [(x[i].tolist(), float(y[i])) for i in range(n)]
    return spark.createDataFrame(rows, "features array<double>, target double")


def _blob_df(spark, n=40):
    rng = np.random.default_rng(5)
    rows = []
    for c, (cx, cy) in enumerate([(-2.0, -2.0), (2.0, 2.0)]):
        pts = rng.standard_normal((n, 2)) * 0.3 + np.array([cx, cy])
        rows += [([float(p[0]), float(p[1])], c) for p in pts]
    return spark.createDataFrame(rows, "features array<double>, label long")


def test_catalog_set_get_exists_drop_list_publish(spark):
    cat = ModelCatalog()
    df = _linear_df(spark)
    m = train_linear_regression(df, solver="normal")
    assert cat.is_empty()
    cat.set("lin", m, train_config={"solver": "normal"})
    assert cat.exists("lin") and cat.model_count() == 1
    assert cat.get("lin") is m

    # duplicate names rejected (verifyModelCanBeStored analog)
    with pytest.raises(ValueError, match="already exists"):
        cat.set("lin", m)

    rows = cat.list()
    assert rows == [
        {
            "modelName": "lin",
            "modelType": "linearRegression",
            "published": False,
            "stored": False,
            "train_config": {"solver": "normal"},
        }
    ]
    pub = cat.publish("lin")
    assert pub["published"] is True

    # dropOrThrow vs drop(failIfMissing=false)
    entry = cat.drop("lin")
    assert entry["name"] == "lin" and cat.is_empty()
    with pytest.raises(KeyError):
        cat.drop("lin")
    assert cat.drop("lin", fail_if_missing=False) is None
    with pytest.raises(KeyError):
        cat.get("lin")


def test_catalog_rejects_unsupported_model(spark):
    cat = ModelCatalog()
    with pytest.raises(ValueError, match="unsupported model type"):
        cat.set("nope", object())


def _assert_same_predictions(df, m1, m2, col):
    p1 = sorted(r[col] for r in m1.predict(df).collect())
    p2 = sorted(r[col] for r in m2.predict(df).collect())
    assert p1 == pytest.approx(p2, abs=0)


def test_store_load_roundtrip_all_model_families(spark, tmp_path):
    cat = ModelCatalog(root=str(tmp_path / "models"))
    lin_df, blob_df = _linear_df(spark), _blob_df(spark)

    cat.set("lin", train_linear_regression(lin_df, solver="normal"))
    cat.set(
        "log",
        train_logistic_regression(blob_df, max_epochs=40, learning_rate=0.5),
    )
    cat.set(
        "mlp",
        train_mlp_classifier(
            blob_df, hidden_layer_sizes=(4,), max_epochs=30, learning_rate=0.3,
            random_seed=3,
        ),
    )
    cat.set(
        "rf",
        train_random_forest(
            blob_df, number_of_trees=3, max_depth=3, random_seed=3
        ),
    )
    paths = {name: cat.store(name) for name in ["lin", "log", "mlp", "rf"]}
    assert all(p.endswith(".json") for p in paths.values())
    assert cat.stored_names() == ["lin", "log", "mlp", "rf"]
    assert all(r["stored"] for r in cat.list())

    # load into a FRESH catalog (new process analog) and compare predictions
    cat2 = ModelCatalog(root=str(tmp_path / "models"))
    lin2 = cat2.load("lin")
    _assert_same_predictions(lin_df, cat.get("lin"), lin2, "prediction")
    log2 = cat2.load("log")
    _assert_same_predictions(blob_df, cat.get("log"), log2, "predicted")
    mlp2 = cat2.load("mlp")
    _assert_same_predictions(blob_df, cat.get("mlp"), mlp2, "prediction")
    rf2 = cat2.load("rf")
    _assert_same_predictions(blob_df, cat.get("rf"), rf2, "prediction")
    # tree-table fixup restored exact types (int ids, tuple nodes)
    assert all(isinstance(k, int) for k in rf2.trees)
    assert cat2.list("rf")[0]["stored"] is True


def test_store_load_graphsage_drops_embeddings_keeps_weights(spark, tmp_path):
    from graph_data_science_spark.algorithms.graphsage import (
        graphsage,
        graphsage_train,
    )
    from graph_data_science_spark.graph.build import LinkGraph

    pairs = [(i, j) for i in range(4) for j in range(4) if i != j]
    pairs += [(i, j) for i in range(4, 8) for j in range(4, 8) if i != j]
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )
    feats = spark.createDataFrame(
        [(i, [1.0, 0.0] if i < 4 else [0.0, 1.0]) for i in range(8)],
        "node_id long, features array<double>",
    )
    g = LinkGraph(edges=edges, node_count=8)
    res = graphsage_train(
        g, feats, embedding_dim=4, sample_sizes=[3], epochs=3,
        learning_rate=0.1, search_depth=2, negative_sample_weight=5,
        random_seed=7, tolerance=0.0,
    )
    cat = ModelCatalog(root=str(tmp_path / "models"))
    cat.set("sage", res, train_config={"embedding_dim": 4})
    cat.store("sage")

    cat2 = ModelCatalog(root=str(tmp_path / "models"))
    loaded = cat2.load("sage")
    assert loaded.embeddings is None  # DataFrame field dropped by design
    assert loaded.weights == res.weights  # exact float round-trip
    assert loaded.ran_steps == res.ran_steps

    # stored weights re-run inference identically on the same graph
    e1 = {
        r["node_id"]: list(r["embedding"])
        for r in graphsage(g, feats, res.weights, activation="sigmoid").embeddings.collect()
    }
    e2 = {
        r["node_id"]: list(r["embedding"])
        for r in graphsage(g, feats, loaded.weights, activation="sigmoid").embeddings.collect()
    }
    assert all(
        e1[k] == pytest.approx(e2[k], abs=0) and not any(math.isnan(x) for x in e1[k])
        for k in e1
    )


def test_facade_exposes_model_catalog(spark, tmp_path):
    from graph_data_science_spark.api import Procedures
    from graph_data_science_spark.graph.catalog import GraphCatalog

    cat = GraphCatalog(spark, str(tmp_path / "cat"))
    procs = Procedures(cat)
    df = _linear_df(spark)
    m = train_linear_regression(df, solver="normal")
    procs.models.set("lin", m, train_config={"solver": "normal"})
    assert procs.models.exists("lin")
    path = procs.models.store("lin")
    assert path.startswith(str(tmp_path / "cat"))  # persists beside the graphs
    assert procs.models.list()[0]["modelType"] == "linearRegression"
