"""Model catalog: named, persistable trained models.

The reference keeps every trained model (GraphSage, Node2Vec, the pipeline
classifiers/regressors) in a process-global catalog with a procedure surface —
``ModelCatalog`` (`model-catalog-api/src/main/java/org/neo4j/gds/core/model/
ModelCatalog.java:30`: set / get / exists / drop / list / publish / store) and
``gds.model.list`` / ``gds.model.exists`` / ``gds.model.drop``
(`procedures/.../ModelListProc.java` et al.). This module is the Spark-native
analog: the in-memory map is a plain dict keyed by model name, and ``store`` /
``load`` round-trip the model's parameters to a JSON file under the catalog
root — parameters only, never result DataFrames (the reference likewise
persists model *data*, not algorithm output; `ModelCatalog.java:63`
``store(username, modelName, modelDir)``).

Every supported model is a plain dataclass of JSON-representable parameters
(weight matrices as nested float lists, tree tables, class lists), so
serialization is ``dataclasses.asdict`` plus a tiny per-type fixup for NumPy
arrays / int-keyed dicts. DataFrame-valued fields (e.g.
``GraphSageTrainResult.embeddings``) are dropped on store and restored as
``None`` — the model's ``weights`` are sufficient to re-run inference on any
graph, which is the reference's contract too (a stored GraphSage model is its
layer weights; predictions are recomputed per call).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, fields, is_dataclass
from typing import Any

try:  # pragma: no cover - numpy is baked into the environment
    import numpy as np
except ImportError:  # pragma: no cover
    np = None


def _jsonable(v: Any) -> Any:
    """Recursively convert a dataclass field value to JSON-safe form."""
    if np is not None and isinstance(v, np.ndarray):
        return {"__ndarray__": v.tolist()}
    if np is not None and isinstance(v, np.generic):
        return v.item()
    if is_dataclass(v) and not isinstance(v, type):
        return {k: _jsonable(x) for k, x in asdict(v).items()}
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, float) and v != v:  # NaN → JSON null-safe token
        return {"__float__": "nan"}
    return v


def _unjsonable(v: Any) -> Any:
    if isinstance(v, dict):
        if "__ndarray__" in v and len(v) == 1:
            return np.asarray(v["__ndarray__"]) if np is not None else v["__ndarray__"]
        if v.get("__float__") == "nan" and len(v) == 1:
            return float("nan")
        return {k: _unjsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_unjsonable(x) for x in v]
    return v


def _model_registry() -> dict[str, type]:
    """Name → dataclass for every storable model type. Imported lazily so the
    catalog has no import-time dependency on the whole ml/ package."""
    from graph_data_science_spark.algorithms.graphsage import GraphSageTrainResult
    from graph_data_science_spark.ml.linreg import LinearRegressionModel
    from graph_data_science_spark.ml.logreg import LogisticRegressionModel
    from graph_data_science_spark.ml.mlp import MLPClassifierModel
    from graph_data_science_spark.ml.randomforest import RandomForestModel

    return {
        "logisticRegression": LogisticRegressionModel,
        "linearRegression": LinearRegressionModel,
        "mlpClassification": MLPClassifierModel,
        "randomForest": RandomForestModel,
        "graphSage": GraphSageTrainResult,
    }


def _type_of(model: Any) -> str:
    for name, cls in _model_registry().items():
        if type(model) is cls:
            return name
    raise ValueError(
        f"unsupported model type {type(model).__name__}; storable types: "
        f"{sorted(_model_registry())}"
    )


_SKIP_FIELDS = {
    # DataFrame-valued fields: dropped on store, None on load (see module doc).
    "graphSage": {"embeddings"},
}


class ModelCatalog:
    """Single-tenant analog of the reference's ``OpenModelCatalog``.

    ``set`` rejects duplicate names (``verifyModelCanBeStored``,
    `ModelCatalog.java:70`); ``drop`` mirrors ``dropOrThrow`` /
    ``drop`` via ``fail_if_missing``; ``store``/``load`` persist under
    ``root`` (one ``<name>.json`` per model)."""

    def __init__(self, root: str | None = None) -> None:
        self.root = root
        self._models: dict[str, dict] = {}

    # -- in-memory surface (gds.model.* procs) ---------------------------
    def set(self, name: str, model: Any, train_config: dict | None = None) -> None:
        if name in self._models:
            raise ValueError(f"Model with name `{name}` already exists.")
        entry = {
            "name": name,
            "type": _type_of(model),
            "model": model,
            "train_config": dict(train_config or {}),
            "published": False,
            "stored": False,
        }
        self._models[name] = entry

    def get(self, name: str) -> Any:
        if name not in self._models:
            raise KeyError(f"Model with name `{name}` does not exist.")
        return self._models[name]["model"]

    def exists(self, name: str) -> bool:
        return name in self._models

    def drop(self, name: str, fail_if_missing: bool = True) -> dict | None:
        entry = self._models.pop(name, None)
        if entry is None and fail_if_missing:
            raise KeyError(f"Model with name `{name}` does not exist.")
        return entry

    def list(self, name: str | None = None) -> list[dict]:
        """Rows of (modelName, modelType, published, stored, train_config) —
        the ``gds.model.list`` projection, never the weights themselves."""
        entries = [self._models[name]] if name else self._models.values()
        if name and name not in self._models:
            return []
        return [
            {
                "modelName": e["name"],
                "modelType": e["type"],
                "published": e["published"],
                "stored": e["stored"],
                "train_config": dict(e["train_config"]),
            }
            for e in entries
        ]

    def publish(self, name: str) -> dict:
        """Single-tenant analog of ``ModelCatalog.publish``: flips the shared
        flag (there is no other user to share with here)."""
        if name not in self._models:
            raise KeyError(f"Model with name `{name}` does not exist.")
        self._models[name]["published"] = True
        return self.list(name)[0]

    def model_count(self) -> int:
        return len(self._models)

    def is_empty(self) -> bool:
        return not self._models

    # -- durable surface (gds.model.store / ModelCatalog.store) ----------
    def _path(self, name: str) -> str:
        if not self.root:
            raise ValueError("ModelCatalog needs a root directory to store/load")
        return os.path.join(self.root, f"{name}.json")

    def store(self, name: str) -> str:
        if name not in self._models:
            raise KeyError(f"Model with name `{name}` does not exist.")
        entry = self._models[name]
        skip = _SKIP_FIELDS.get(entry["type"], set())
        model = entry["model"]
        params = {
            f.name: _jsonable(getattr(model, f.name))
            for f in fields(model)
            if f.name not in skip
        }
        doc = {
            "name": name,
            "type": entry["type"],
            "train_config": entry["train_config"],
            "published": entry["published"],
            "skipped_fields": sorted(skip),
            "params": params,
        }
        os.makedirs(self.root, exist_ok=True)
        path = self._path(name)
        with open(path, "w") as fh:
            json.dump(doc, fh)
        entry["stored"] = True
        return path

    def load(self, name: str) -> Any:
        """Restore a stored model into the catalog (overwrites any in-memory
        entry of the same name, matching the reference's load-from-disk)."""
        with open(self._path(name)) as fh:
            doc = json.load(fh)
        cls = _model_registry()[doc["type"]]
        params = {k: _unjsonable(v) for k, v in doc["params"].items()}
        for skipped in doc.get("skipped_fields", []):
            params[skipped] = None
        # Per-type fixups where JSON round-tripping loses the exact shape.
        if doc["type"] == "randomForest":
            # JSON stringifies int tree ids and listifies node tuples.
            params["trees"] = {
                int(k): [tuple(node) for node in v] for k, v in params["trees"].items()
            }
        model = cls(**params)
        self._models[name] = {
            "name": name,
            "type": doc["type"],
            "model": model,
            "train_config": doc.get("train_config", {}),
            "published": doc.get("published", False),
            "stored": True,
        }
        return model

    def stored_names(self) -> list[str]:
        if not self.root or not os.path.isdir(self.root):
            return []
        return sorted(
            f[: -len(".json")] for f in os.listdir(self.root) if f.endswith(".json")
        )
