from graph_data_science_spark.ml.encoding import one_hot_encoding
from graph_data_science_spark.ml.splitting import (
    RelationshipSplit,
    fraction_split,
    negative_sample,
    split_relationships,
    stratified_kfold_split,
)
from graph_data_science_spark.ml.metrics import (
    aucpr,
    classification_metrics,
    classification_summary,
    confusion_stats,
    regression_metrics,
)
from graph_data_science_spark.ml.linreg import LinearRegressionModel, train_linear_regression
from graph_data_science_spark.ml.mlp import MLPClassifierModel, train_mlp_classifier
from graph_data_science_spark.ml.randomforest import (
    RandomForestModel,
    out_of_bag_error,
    train_random_forest,
)
from graph_data_science_spark.ml.logreg import LogisticRegressionModel, train_logistic_regression
from graph_data_science_spark.ml.pipelines import (
    NodeRegressionResult,
    node_regression_pipeline,
    LinkPredictionResult,
    NodeClassificationResult,
    link_prediction_pipeline,
    node_classification_pipeline,
)
from graph_data_science_spark.ml.pipeline_catalog import (
    LinkPredictionPipeline,
    NodeClassificationPipeline,
    NodeRegressionPipeline,
    PipelineCatalog,
)

__all__ = [
    "LinkPredictionPipeline",
    "LinkPredictionResult",
    "NodeClassificationPipeline",
    "NodeRegressionPipeline",
    "PipelineCatalog",
    "LogisticRegressionModel",
    "NodeClassificationResult",
    "NodeRegressionResult",
    "node_regression_pipeline",
    "link_prediction_pipeline",
    "node_classification_pipeline",
    "LinearRegressionModel",
    "MLPClassifierModel",
    "RandomForestModel",
    "RelationshipSplit",
    "fraction_split",
    "negative_sample",
    "one_hot_encoding",
    "split_relationships",
    "train_linear_regression",
    "train_mlp_classifier",
    "train_random_forest",
    "aucpr",
    "classification_metrics",
    "classification_summary",
    "confusion_stats",
    "out_of_bag_error",
    "regression_metrics",
    "stratified_kfold_split",
    "train_logistic_regression",
]
