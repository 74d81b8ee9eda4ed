"""Named, incrementally-built training pipelines + the pipeline catalog.

The reference builds ML pipelines procedurally — ``gds.beta.pipeline.
nodeClassification.create`` / ``.addNodeProperty`` / ``.selectFeatures`` /
``.configureSplit`` / ``.addLogisticRegression`` … ``.train`` — storing the
growing spec in a process-global ``PipelineCatalog``
(`pipeline/src/main/java/org/neo4j/gds/ml/pipeline/PipelineCatalog.java:41`
set/get/exists/drop/getAll) keyed by pipeline name; the spec itself is a
``TrainingPipeline`` (`pipeline/.../TrainingPipeline.java:95-101`
addNodePropertyStep/addFeatureStep + a trainer parameter space per method).

This module is that builder surface over the one-shot pipeline executors in
:mod:`graph_data_science_spark.ml.pipelines`. ``train`` executes the recorded
node-property steps through the same facade algorithm registry the
``Procedures`` dispatcher uses (each step = one algorithm producing a
``(node_id, score)`` column), assembles the selected properties into a single
``features array<double>`` column exactly like the reference's
``FeaturesFactory`` (scalars become 1-element slices, arrays splice in
order — `ml/ml-algo/src/main/java/org/neo4j/gds/ml/models/FeaturesFactory.java`),
then delegates to the corresponding executor with the accumulated parameter
space as ``model_candidates``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph

_METHOD_BUILDERS = {
    # proc-name suffix → parameter-space method tag understood by
    # pipelines._fit_model / _fit_regressor.
    "logistic_regression": "LogisticRegression",
    "random_forest": "RandomForest",
    "mlp": "MLP",
    "linear_regression": "LinearRegression",
}


class TrainingPipeline:
    """Shared builder state (``TrainingPipeline.java:95-101``)."""

    kind = "abstract"

    def __init__(self, name: str) -> None:
        self.name = name
        self.node_property_steps: list[dict] = []
        self.parameter_space: list[dict] = []
        self.split_config: dict = {"test_fraction": 0.3, "validation_folds": 3}
        self.max_trials: int = 10

    # -- builder steps ----------------------------------------------------
    def add_node_property(self, algo: str, mutate_property: str, **config) -> "TrainingPipeline":
        """``.addNodeProperty(procName, {mutateProperty, ...})``: record an
        algorithm whose (node_id, score) output becomes a node property."""
        self.node_property_steps.append(
            {"algo": algo, "mutate_property": mutate_property, "config": config}
        )
        return self

    def configure_split(self, **config) -> "TrainingPipeline":
        """``.configureSplit``: test_fraction / validation_folds (+
        negative_sampling_ratio for link pipelines)."""
        self.split_config.update(config)
        return self

    def configure_auto_tuning(self, max_trials: int = 10) -> "TrainingPipeline":
        """``.configureAutoTuning({maxTrials})`` (reference
        ``AutoTuningConfig.java``): caps how many RANDOM-SEARCH trials are
        sampled from the tunable (range-valued) configs; default 10.
        Concrete configs always trial, uncounted — the reference's
        ``RandomSearch`` runs ``maxTrials + |concrete|`` total."""
        if max_trials < 1:
            raise ValueError("max_trials must be >= 1")
        self.max_trials = int(max_trials)
        return self

    # params sampled on a log scale, per TunableTrainerConfig.java:49
    # (both the reference's camelCase spelling and our snake_case)
    _LOG_SCALE = {"penalty", "learningRate", "learning_rate", "tolerance"}

    def _candidates(self, seed: int = 42) -> list[dict]:
        """The reference's ``RandomSearch.java`` analog: a trainer config
        value of ``{"range": [min, max]}`` marks the config tunable —
        concrete configs trial first (all of them), then up to
        ``max_trials`` sampled trials, each picking a tunable config
        uniformly and sampling every ranged param (int ranges uniform in
        [min, max); double ranges uniform, log-scale for
        penalty/learningRate/tolerance — ``RandomSearch.sampleDouble``).
        Deterministic in ``seed``."""
        import math
        import random as _random

        def is_range(v):
            return isinstance(v, dict) and set(v) == {"range"}

        concrete = [dict(c) for c in self.parameter_space if not any(is_range(v) for v in c.values())]
        tunable = [c for c in self.parameter_space if any(is_range(v) for v in c.values())]
        if not tunable:
            return concrete
        rng = _random.Random(int(seed))
        out = concrete
        for _ in range(self.max_trials):
            cfg = dict(tunable[rng.randrange(len(tunable))])
            for k, v in list(cfg.items()):
                if not is_range(v):
                    continue
                lo, hi = v["range"]
                if lo == hi:
                    # degenerate range: deterministic (the reference's
                    # random.nextInt(min, max) rejects min >= max outright;
                    # accepting the point value is strictly more useful and
                    # cannot disagree with it on any input it accepts)
                    cfg[k] = lo
                elif isinstance(lo, int) and isinstance(hi, int):
                    # exclusive upper bound — Java nextInt(origin, bound)
                    # parity (RandomSearch.java:96)
                    cfg[k] = rng.randrange(lo, hi)
                elif k in self._LOG_SCALE:
                    if float(hi) <= 0.0:
                        raise ValueError(
                            f"log-scale range for {k!r} needs max > 0, got {v['range']}"
                        )
                    lo_l = math.log(max(float(lo), 1e-20))
                    cfg[k] = math.exp(lo_l + rng.random() * (math.log(float(hi)) - lo_l))
                else:
                    cfg[k] = float(lo) + rng.random() * (float(hi) - float(lo))
            out.append(cfg)
        return out

    def _add_trainer(self, method_key: str, **config) -> "TrainingPipeline":
        self.parameter_space.append({"method": _METHOD_BUILDERS[method_key], **config})
        return self

    def add_logistic_regression(self, **config) -> "TrainingPipeline":
        return self._add_trainer("logistic_regression", **config)

    def add_random_forest(self, **config) -> "TrainingPipeline":
        return self._add_trainer("random_forest", **config)

    def add_mlp(self, **config) -> "TrainingPipeline":
        return self._add_trainer("mlp", **config)

    def add_linear_regression(self, **config) -> "TrainingPipeline":
        return self._add_trainer("linear_regression", **config)

    # -- execution helpers --------------------------------------------------
    def _run_node_property_steps(self, graph: LinkGraph) -> DataFrame:
        """Run each recorded step's algorithm; returns (node_id, <prop>...)
        with one column per step (double or array<double>)."""
        from graph_data_science_spark.api import ALGORITHMS

        out = graph.node_ids()
        for step in self.node_property_steps:
            fn = ALGORITHMS.get(step["algo"])
            if fn is None:
                raise KeyError(
                    f"pipeline step algorithm {step['algo']!r} unknown; "
                    "must be a facade algorithm name"
                )
            res = fn(graph, **step["config"]).select(
                "node_id", F.col("score").alias(step["mutate_property"])
            )
            out = out.join(res, "node_id", "left")
        return out

    @staticmethod
    def _assemble_features(props: DataFrame, selected: list[str]) -> DataFrame:
        """FeaturesFactory analog: splice selected properties (scalars as
        1-element slices, arrays in order) into ``features array<double>``."""
        types = dict(props.dtypes)
        parts = []
        for p in selected:
            if p not in types:
                raise KeyError(f"selected feature property {p!r} not produced by any step")
            col = F.col(p)
            parts.append(
                col if types[p].startswith("array") else F.array(col.cast("double"))
            )
        feats = parts[0] if len(parts) == 1 else F.concat(*parts)
        return props.withColumn("features", feats.cast("array<double>"))

    def to_map(self) -> dict:
        """The ``gds.pipeline.list`` projection of this pipeline's spec."""
        return {
            "pipelineName": self.name,
            "pipelineType": self.kind,
            "nodePropertySteps": [dict(s) for s in self.node_property_steps],
            "splitConfig": dict(self.split_config),
            "parameterSpace": [dict(c) for c in self.parameter_space],
        }


class NodeClassificationPipeline(TrainingPipeline):
    """``gds.beta.pipeline.nodeClassification.*`` analog
    (`NodeClassificationTrainingPipeline.java:33`)."""

    kind = "Node classification training pipeline"

    def __init__(self, name: str) -> None:
        super().__init__(name)
        self.selected_features: list[str] = []

    def select_features(self, properties: list[str] | str) -> "NodeClassificationPipeline":
        self.selected_features.extend(
            [properties] if isinstance(properties, str) else properties
        )
        return self

    def to_map(self) -> dict:
        m = super().to_map()
        m["featureProperties"] = list(self.selected_features)
        return m

    def train(self, graph: LinkGraph, labels: DataFrame, label_col: str = "label", seed: int = 42):
        """``.train(graphName, {targetProperty})``: run steps, assemble
        features, cross-validate the parameter space, return the executor's
        NodeClassificationResult. ``labels``: (node_id, <label_col>)."""
        from graph_data_science_spark.ml.pipelines import node_classification_pipeline

        if not self.selected_features:
            raise ValueError("selectFeatures was never called on this pipeline")
        if not self.parameter_space:
            raise ValueError("parameter space is empty — add at least one trainer config")
        props = self._run_node_property_steps(graph)
        feats = self._assemble_features(props, self.selected_features).join(
            labels.select("node_id", F.col(label_col).alias("label")), "node_id"
        )
        return node_classification_pipeline(
            feats.select("node_id", "features", "label"),
            test_fraction=self.split_config["test_fraction"],
            validation_folds=self.split_config["validation_folds"],
            model_candidates=self._candidates(seed),
            seed=seed,
        )


class NodeRegressionPipeline(NodeClassificationPipeline):
    """``gds.alpha.pipeline.nodeRegression.*`` analog
    (`NodeRegressionTrainingPipeline.java:29`). Same feature plumbing;
    regressor parameter space."""

    kind = "Node regression training pipeline"

    def train(self, graph: LinkGraph, targets: DataFrame, target_col: str = "target", seed: int = 42):
        from graph_data_science_spark.ml.pipelines import node_regression_pipeline

        if not self.selected_features:
            raise ValueError("selectFeatures was never called on this pipeline")
        if not self.parameter_space:
            raise ValueError("parameter space is empty — add at least one trainer config")
        props = self._run_node_property_steps(graph)
        feats = self._assemble_features(props, self.selected_features).join(
            targets.select("node_id", F.col(target_col).alias("target")), "node_id"
        )
        return node_regression_pipeline(
            feats.select("node_id", "features", "target"),
            test_fraction=self.split_config["test_fraction"],
            validation_folds=self.split_config["validation_folds"],
            model_candidates=self._candidates(seed),
            seed=seed,
        )


class LinkPredictionPipeline(TrainingPipeline):
    """``gds.beta.pipeline.linkPrediction.*`` analog
    (`LinkPredictionTrainingPipeline.java:35`): node-property steps feed
    ``addFeature`` link functions (hadamard / l2 / cosine) over a chosen
    embedding property."""

    kind = "Link prediction training pipeline"

    def __init__(self, name: str) -> None:
        super().__init__(name)
        self.feature_steps: list[dict] = []
        self.split_config.setdefault("negative_sampling_ratio", 1.0)

    def add_feature(self, feature_type: str, node_properties: list[str] | str) -> "LinkPredictionPipeline":
        """``.addFeature(featureType, {nodeProperties})``."""
        props = [node_properties] if isinstance(node_properties, str) else node_properties
        self.feature_steps.append({"feature_type": feature_type, "node_properties": props})
        return self

    def to_map(self) -> dict:
        m = super().to_map()
        m["featureSteps"] = [dict(s) for s in self.feature_steps]
        return m

    def train(self, graph: LinkGraph, seed: int = 42):
        """Run steps, build per-node feature arrays from each feature step's
        node properties, delegate to the link-prediction executor. Multiple
        feature steps must share one feature_type (the executor combines
        endpoint arrays with a single link function, as the reference does
        per step — differing types across steps are not expressible there
        and raise)."""
        from graph_data_science_spark.ml.pipelines import link_prediction_pipeline

        if not self.feature_steps:
            raise ValueError("addFeature was never called on this pipeline")
        if not self.parameter_space:
            raise ValueError("parameter space is empty — add at least one trainer config")
        f_types = {s["feature_type"] for s in self.feature_steps}
        if len(f_types) > 1:
            raise ValueError(
                f"feature steps use multiple feature types {sorted(f_types)}; "
                "one link function per pipeline is supported"
            )
        props = self._run_node_property_steps(graph)
        selected = [p for s in self.feature_steps for p in s["node_properties"]]
        node_feats = self._assemble_features(props, selected).select(
            "node_id", "features"
        )
        return link_prediction_pipeline(
            graph,
            node_feats,
            feature_type=next(iter(f_types)),
            negative_sampling_ratio=self.split_config["negative_sampling_ratio"],
            test_fraction=self.split_config["test_fraction"],
            validation_folds=self.split_config["validation_folds"],
            model_candidates=self._candidates(seed),
            seed=seed,
        )


class PipelineCatalog:
    """`PipelineCatalog.java:41` — process-global name → pipeline map with
    the ``gds.pipeline.{list,exists,drop}`` projection."""

    _KINDS = {
        "nodeClassification": NodeClassificationPipeline,
        "nodeRegression": NodeRegressionPipeline,
        "linkPrediction": LinkPredictionPipeline,
    }

    def __init__(self) -> None:
        self._pipelines: dict[str, TrainingPipeline] = {}

    def create(self, kind: str, name: str) -> TrainingPipeline:
        """``gds.beta.pipeline.<kind>.create(name)``."""
        if kind not in self._KINDS:
            raise ValueError(f"kind must be one of {sorted(self._KINDS)}")
        if name in self._pipelines:
            raise ValueError(f"Pipeline with name `{name}` already exists.")
        p = self._KINDS[kind](name)
        self._pipelines[name] = p
        return p

    def get(self, name: str) -> TrainingPipeline:
        if name not in self._pipelines:
            raise KeyError(f"Pipeline with name `{name}` does not exist.")
        return self._pipelines[name]

    def exists(self, name: str) -> bool:
        return name in self._pipelines

    def drop(self, name: str, fail_if_missing: bool = True) -> TrainingPipeline | None:
        p = self._pipelines.pop(name, None)
        if p is None and fail_if_missing:
            raise KeyError(f"Pipeline with name `{name}` does not exist.")
        return p

    def list(self, name: str | None = None) -> list[dict[str, Any]]:
        if name is not None:
            return [self._pipelines[name].to_map()] if name in self._pipelines else []
        return [p.to_map() for _, p in sorted(self._pipelines.items())]
