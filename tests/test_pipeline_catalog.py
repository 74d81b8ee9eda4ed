"""Pipeline catalog + incremental builder surface (reference
``pipeline/.../PipelineCatalog.java:41``, ``TrainingPipeline.java:95-101``,
procs gds.beta.pipeline.{nodeClassification,linkPrediction}.* and
gds.alpha.pipeline.nodeRegression.*)."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.ml import PipelineCatalog


def _two_clique_graph(spark, k=6):
    """Two k-cliques joined by one bridge edge; clique id is the label."""
    pairs = [(i, j) for i in range(k) for j in range(k) if i != j]
    pairs += [(i, j) for i in range(k, 2 * k) for j in range(k, 2 * k) if i != j]
    pairs += [(0, k), (k, 0)]
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )
    labels = spark.createDataFrame(
        [(i, 0 if i < k else 1) for i in range(2 * k)], "node_id long, label long"
    )
    return LinkGraph(edges=edges, node_count=2 * k), labels


def test_catalog_create_exists_list_drop():
    cat = PipelineCatalog()
    p = cat.create("nodeClassification", "pipe")
    assert cat.exists("pipe") and cat.get("pipe") is p
    with pytest.raises(ValueError, match="already exists"):
        cat.create("nodeClassification", "pipe")
    with pytest.raises(ValueError, match="kind must be"):
        cat.create("nope", "x")

    p.add_node_property("degree", "deg").select_features("deg")
    p.add_logistic_regression(max_epochs=5)
    row = cat.list("pipe")[0]
    assert row["pipelineType"] == "Node classification training pipeline"
    assert row["nodePropertySteps"][0]["algo"] == "degree"
    assert row["featureProperties"] == ["deg"]
    assert row["parameterSpace"] == [{"method": "LogisticRegression", "max_epochs": 5}]

    assert cat.drop("pipe").name == "pipe"
    with pytest.raises(KeyError):
        cat.drop("pipe")
    assert cat.drop("pipe", fail_if_missing=False) is None
    assert cat.list() == []


def test_builder_error_paths(spark):
    g, labels = _two_clique_graph(spark)
    cat = PipelineCatalog()
    p = cat.create("nodeClassification", "p1")
    p.add_node_property("degree", "deg")
    with pytest.raises(ValueError, match="selectFeatures"):
        p.train(g, labels)
    p.select_features("deg")
    with pytest.raises(ValueError, match="parameter space is empty"):
        p.train(g, labels)
    with pytest.raises(KeyError, match="unknown"):
        cat.create("nodeClassification", "p2").add_node_property(
            "noSuchAlgo", "x"
        ).select_features("x").add_logistic_regression().train(g, labels)


def test_node_classification_pipeline_end_to_end(spark):
    g, labels = _two_clique_graph(spark)
    cat = PipelineCatalog()
    p = (
        cat.create("nodeClassification", "clique-cls")
        .add_node_property("fastRP", "emb", embedding_dimension=8, random_seed=3)
        .select_features("emb")
        .configure_split(test_fraction=0.25, validation_folds=2)
        .add_logistic_regression(max_epochs=60, learning_rate=0.5)
    )
    res = p.train(g, labels, seed=7)
    # FastRP separates two cliques; the trained classifier should too.
    preds = {r["node_id"]: r["predicted"] for r in res.predictions.collect()}
    truth = {r["node_id"]: r["label"] for r in labels.collect()}
    acc = sum(preds[n] == truth[n] for n in truth) / len(truth)
    assert acc >= 0.9
    assert res.metrics["accuracy"] >= 0.5  # holdout is tiny; just sane


def test_scalar_and_array_features_splice(spark):
    g, labels = _two_clique_graph(spark)
    cat = PipelineCatalog()
    p = (
        cat.create("nodeClassification", "mix")
        .add_node_property("degree", "deg")
        .add_node_property("fastRP", "emb", embedding_dimension=4, random_seed=3)
        .select_features(["deg", "emb"])
        .add_logistic_regression(max_epochs=10)
    )
    props = p._run_node_property_steps(g)
    feats = p._assemble_features(props, p.selected_features)
    sizes = feats.select(F.size("features").alias("s")).distinct().collect()
    assert [r["s"] for r in sizes] == [5]  # 1 scalar slice + 4 array dims


def test_node_regression_pipeline_recovers_degree(spark):
    g, _ = _two_clique_graph(spark)
    # target == the degree property itself → LinearRegression is exact
    from graph_data_science_spark.algorithms.degree import degree_centrality

    targets = degree_centrality(g).select(
        "node_id", F.col("score").alias("target")
    )
    cat = PipelineCatalog()
    p = (
        cat.create("nodeRegression", "deg-reg")
        .add_node_property("degree", "deg")
        .select_features("deg")
        .configure_split(test_fraction=0.25, validation_folds=2)
        .add_linear_regression(solver="normal")
    )
    res = p.train(g, targets, seed=7)
    assert res.metrics["mean_squared_error"] < 1e-12


def test_link_prediction_pipeline_end_to_end(spark):
    g, _ = _two_clique_graph(spark, k=8)
    cat = PipelineCatalog()
    p = (
        cat.create("linkPrediction", "lp")
        .add_node_property("fastRP", "emb", embedding_dimension=8, random_seed=3)
        .add_feature("hadamard", "emb")
        .configure_split(test_fraction=0.3, negative_sampling_ratio=1.0)
        .add_logistic_regression(max_epochs=40, learning_rate=0.5)
    )
    res = p.train(g, seed=7)
    assert 0.0 <= res.metrics["accuracy"] <= 1.0
    # intra-clique pairs should score higher than cross-clique pairs
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 10), (1, 9), (2, 12)], "src long, dst long"
    )
    scored = {
        (r["src"], r["dst"]): r["probability"] for r in res.predict(pairs).collect()
    }
    intra = (scored[(1, 2)] + scored[(2, 3)] + scored[(9, 10)]) / 3
    inter = (scored[(1, 9)] + scored[(2, 12)]) / 2
    assert intra > inter

    # mixed feature types across steps are rejected
    p2 = (
        cat.create("linkPrediction", "lp2")
        .add_node_property("fastRP", "emb", embedding_dimension=4)
        .add_feature("hadamard", "emb")
        .add_feature("cosine", "emb")
        .add_logistic_regression()
    )
    with pytest.raises(ValueError, match="multiple feature types"):
        p2.train(g)


def test_facade_exposes_pipeline_catalog(spark, tmp_path):
    from graph_data_science_spark.api import Procedures
    from graph_data_science_spark.graph.catalog import GraphCatalog

    procs = Procedures(GraphCatalog(spark, str(tmp_path / "cat")))
    procs.pipelines.create("nodeClassification", "p")
    assert procs.pipelines.exists("p")
    assert procs.pipelines.list()[0]["pipelineName"] == "p"


def test_auto_tuning_random_search_candidates():
    """RandomSearch analog (reference ml/ml-algo/.../automl/RandomSearch.java):
    concrete configs all trial; ranged configs get max_trials samples with
    int-range / uniform / log-scale semantics, deterministic in seed."""
    from graph_data_science_spark.ml.pipeline_catalog import NodeClassificationPipeline

    p = NodeClassificationPipeline("tuned")
    p.add_logistic_regression(penalty=0.5)  # concrete
    p.add_logistic_regression(penalty={"range": [1e-4, 1e2]})  # log-scale double
    p.add_random_forest(max_depth={"range": [2, 10]})  # int range
    p.configure_auto_tuning(max_trials=7)
    cands = p._candidates(seed=13)
    assert len(cands) == 1 + 7  # concrete + maxTrials sampled
    assert cands[0] == {"method": "LogisticRegression", "penalty": 0.5}
    for c in cands[1:]:
        if c["method"] == "LogisticRegression":
            assert 1e-4 <= c["penalty"] <= 1e2 and isinstance(c["penalty"], float)
        else:
            assert c["max_depth"] in range(2, 10) and isinstance(c["max_depth"], int)
    assert cands == p._candidates(seed=13)  # deterministic
    assert cands != p._candidates(seed=14)  # seed moves the samples
    # both tunable methods get picked across trials
    assert len({c["method"] for c in cands[1:]}) == 2


def test_auto_tuning_no_ranges_is_concrete_passthrough():
    from graph_data_science_spark.ml.pipeline_catalog import NodeClassificationPipeline

    p = NodeClassificationPipeline("plain")
    for pen in (0.1, 0.2, 0.3):
        p.add_logistic_regression(penalty=pen)
    p.configure_auto_tuning(max_trials=2)
    # no tunable configs -> all concrete configs trial (maxTrials counts
    # only the random-search trials, per the reference)
    assert [c["penalty"] for c in p._candidates()] == [0.1, 0.2, 0.3]


def test_auto_tuning_end_to_end_train(spark):
    """A ranged penalty must flow through CV selection and train a model."""
    from pyspark.sql import functions as F

    from graph_data_science_spark.graph.build import LinkGraph
    from graph_data_science_spark.ml.pipeline_catalog import PipelineCatalog

    edges = spark.createDataFrame(
        [(i, (i + 1) % 40, 1.0) for i in range(40)], "src long, dst long, weight double"
    )
    g = LinkGraph(edges=edges)
    labels = spark.range(40).select(
        F.col("id").alias("node_id"), (F.col("id") % 2).cast("int").alias("label")
    )
    cat = PipelineCatalog()
    p = cat.create("nodeClassification", "tuned-e2e")
    p.add_node_property("degree", "deg")
    p.select_features(["deg"])
    p.add_logistic_regression(penalty={"range": [1e-3, 1.0]})
    p.configure_auto_tuning(max_trials=2)
    p.configure_split(test_fraction=0.3, validation_folds=2)
    res = p.train(g, labels, seed=7)
    assert res is not None and res.predictions.count() > 0


def test_param_alias_is_method_scoped():
    """penalty maps to logreg's l2 only; MLP and linreg take penalty
    natively and camelCase spellings map per trainer."""
    from graph_data_science_spark.ml.pipelines import _normalize_params

    lr = _normalize_params({"method": "LogisticRegression", "penalty": 0.5, "maxEpochs": 5}, "LogisticRegression")
    assert lr == {"l2": 0.5, "max_epochs": 5}
    mlp = _normalize_params({"method": "MLP", "penalty": 0.1, "hiddenLayerSizes": (8,)}, "MLP")
    assert mlp == {"penalty": 0.1, "hidden_layer_sizes": (8,)}
    rf = _normalize_params({"method": "RandomForest", "numberOfDecisionTrees": 5, "maxDepth": 3}, "RandomForest")
    assert rf == {"number_of_trees": 5, "max_depth": 3}


def test_auto_tuning_degenerate_and_invalid_ranges():
    """[x, x] ranges resolve deterministically to x (the reference's
    random.nextInt(min, max) rejects them outright); a log-scale range
    with max <= 0 raises a clear error instead of NaN."""
    import pytest

    from graph_data_science_spark.ml.pipeline_catalog import NodeClassificationPipeline

    p = NodeClassificationPipeline("deg-ranges")
    p.add_random_forest(max_depth={"range": [5, 5]}, number_of_trees=3)
    p.configure_auto_tuning(max_trials=3)
    cands = p._candidates(seed=1)
    assert all(c["max_depth"] == 5 for c in cands if "max_depth" in c)

    p2 = NodeClassificationPipeline("bad-log-range")
    p2.add_logistic_regression(penalty={"range": [0.0, 0.0]})
    p2.configure_auto_tuning(max_trials=2)
    cands2 = p2._candidates(seed=1)
    assert all(c["penalty"] == 0.0 for c in cands2 if "penalty" in c)

    p3 = NodeClassificationPipeline("neg-log-range")
    p3.add_logistic_regression(penalty={"range": [0.0, -1.0]})
    p3.configure_auto_tuning(max_trials=2)
    with pytest.raises(ValueError, match="log-scale"):
        p3._candidates(seed=1)
