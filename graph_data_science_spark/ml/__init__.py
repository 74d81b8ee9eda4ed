from graph_data_science_spark.ml.encoding import one_hot_encoding
from graph_data_science_spark.ml.splitting import (
    RelationshipSplit,
    fraction_split,
    negative_sample,
    split_relationships,
    stratified_kfold_split,
)
from graph_data_science_spark.ml.logreg import LogisticRegressionModel, train_logistic_regression
from graph_data_science_spark.ml.pipelines import (
    LinkPredictionResult,
    NodeClassificationResult,
    link_prediction_pipeline,
    node_classification_pipeline,
)

__all__ = [
    "LinkPredictionResult",
    "LogisticRegressionModel",
    "NodeClassificationResult",
    "link_prediction_pipeline",
    "node_classification_pipeline",
    "RelationshipSplit",
    "fraction_split",
    "negative_sample",
    "one_hot_encoding",
    "split_relationships",
    "stratified_kfold_split",
    "train_logistic_regression",
]
