"""Random forest classifier + regressor (reference
``ml/ml-algo/.../models/randomforest/RandomForestClassifierTrainer.java:70-150``,
``RandomForestClassifier.java:52-80``, ``DatasetBootstrapper.java:33-55``,
``decisiontree/DecisionTreeTrainer.java:130-200``, ``Splitter.java:26-110``,
``GiniIndex.java``, ``SplitMeanSquaredError.java``, ``FeatureBagger.java:36-44``).

Semantics mirrored:

- Each tree trains on a bootstrap sample of ⌈n · numberOfSamplesRatio⌉
  rows drawn with replacement (``DatasetBootstrapper``); prediction is
  per-tree class votes → vote-fraction probabilities → argmax
  (``RandomForestClassifier.predictProbabilities:52-62``), or the tree
  mean for regression.
- Trees are CART: best split minimizes the size-weighted child impurity
  (Gini for classification, MSE for regression); recursion stops at
  ``maxDepth`` or groups smaller than ``minSplitSize``; leaves predict the
  majority class / mean. Traversal goes left on ``feature < threshold``
  (``DecisionTreePredictor.predict:20-26``).
- Feature bagging: ⌈maxFeaturesRatio · d⌉ features re-drawn PER SPLIT
  (``FeatureBagger`` is called per ``findBestSplit``).

Distributed re-expression. GDS trains each tree in a thread over shared
arrays. The Spark shape: Poisson-bootstrap the (tree, row) incidence —
each row's multiplicity for tree t is a seeded Poisson(samplesRatio) draw,
the standard distributed approximation of the multinomial bootstrap
(documented deviation; expectation and tree-to-tree independence match) —
then ``applyInPandas`` groups by tree id so each tree's sample lands in
ONE vectorized NumPy CART trainer. Parallelism = numberOfDecisionTrees.
Each tree's sample must fit an executor's Arrow batch — the GDS contract
is the same (its trainSet lives in one JVM); for 100 TB corpora cap
``samples_ratio`` accordingly (n·ratio rows per tree), which is how
subsample forests are run at scale. Prediction broadcasts the forest
(arrays of node rows) and traverses all trees vectorized per Arrow batch.

Split-threshold detail: candidate thresholds are the distinct feature
values; ``left = {x < v}``. GDS's positional splits can separate ties
across children (its threshold is the last left element's value while its
predictor tests ``< value``); the value-consistent form here is what its
own predictor implies (documented deviation).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gini(counts: np.ndarray) -> float:
    tot = counts.sum()
    if tot == 0:
        return 0.0
    p = counts / tot
    return float(1.0 - (p * p).sum())


def _build_tree(
    x: np.ndarray,
    y: np.ndarray,
    w: np.ndarray,
    max_depth: int,
    min_split_size: int,
    min_leaf_size: int,
    max_features: int,
    rng: np.random.Generator,
    n_classes: int,
    regression: bool,
) -> list:
    """NumPy CART over weighted rows (weights = bootstrap multiplicities).
    Returns node rows [(node_id, feature, threshold, left, right, pred)];
    leaf nodes have feature == -1."""
    nodes: list = []

    def leaf_value(idx) -> float:
        ww = w[idx]
        if regression:
            return float(np.average(y[idx], weights=ww))
        counts = np.bincount(y[idx].astype(np.int64), weights=ww, minlength=n_classes)
        return float(np.argmax(counts))  # ties → lowest class, like argmax in GDS

    def impurity_split(idx, f):
        xv = x[idx, f]
        order = np.argsort(xv, kind="stable")
        xs, ys, ws = xv[order], y[idx][order], w[idx][order]
        cum_w = np.cumsum(ws)
        tot_w = cum_w[-1]
        # candidate boundaries: positions where the value changes
        change = np.nonzero(np.diff(xs))[0]  # split between i and i+1
        if len(change) == 0:
            return None
        if regression:
            cy = np.cumsum(ws * ys)
            cyy = np.cumsum(ws * ys * ys)
            lw = cum_w[change]
            rw = tot_w - lw
            lmean = cy[change] / lw
            # size-weighted MSE sum: Σy² − (Σy)²/n per side
            left_err = cyy[change] - cy[change] ** 2 / lw
            right_err = (cyy[-1] - cyy[change]) - (cy[-1] - cy[change]) ** 2 / rw
            scores = left_err + right_err
        else:
            onehot = np.zeros((len(ys), n_classes))
            onehot[np.arange(len(ys)), ys.astype(np.int64)] = 1.0
            cc = np.cumsum(onehot * ws[:, None], axis=0)
            lc = cc[change]
            rc = cc[-1] - lc
            lw = cum_w[change]
            rw = tot_w - lw
            gl = 1.0 - (np.square(lc).sum(axis=1) / np.square(lw))
            gr = 1.0 - (np.square(rc).sum(axis=1) / np.square(rw))
            scores = lw * gl + rw * gr
        # min_leaf_size on weighted counts
        ok = (lw >= min_leaf_size) & (rw >= min_leaf_size)
        if not ok.any():
            return None
        scores = np.where(ok, scores, np.inf)
        best = int(np.argmin(scores))  # ties → smallest threshold
        pos = change[best]
        return float(scores[best]), float(xs[pos + 1]), xs <= xs[pos], order

    def grow(idx, depth) -> int:
        node_id = len(nodes)
        nodes.append(None)
        wsum = w[idx].sum()
        homogeneous = (not regression) and len(np.unique(y[idx])) == 1
        if depth >= max_depth or wsum < min_split_size or homogeneous:
            nodes[node_id] = (node_id, -1, 0.0, -1, -1, leaf_value(idx))
            return node_id
        d = x.shape[1]
        bag = rng.choice(d, size=min(max_features, d), replace=False)
        best = None
        for f in sorted(bag.tolist()):
            res = impurity_split(idx, f)
            if res is None:
                continue
            score, thr, left_mask_sorted, order = res
            if best is None or score < best[0]:
                best = (score, f, thr, left_mask_sorted, order)
        if best is None:
            nodes[node_id] = (node_id, -1, 0.0, -1, -1, leaf_value(idx))
            return node_id
        _, f, thr, left_mask_sorted, order = best
        sub = idx[order]
        left_idx = sub[left_mask_sorted]
        right_idx = sub[~left_mask_sorted]
        li = grow(left_idx, depth + 1)
        ri = grow(right_idx, depth + 1)
        nodes[node_id] = (node_id, int(f), float(thr), li, ri, 0.0)
        return node_id

    grow(np.arange(len(y)), 0)
    return nodes


def _traverse(forest: dict, x: np.ndarray) -> np.ndarray:
    """Vectorized per-tree traversal: (n_rows, n_trees) leaf predictions."""
    n = x.shape[0]
    out = np.zeros((n, len(forest)))
    for t, (tid, nodes) in enumerate(sorted(forest.items())):
        arr = np.array(nodes)  # (node_id, feature, threshold, left, right, pred)
        cur = np.zeros(n, dtype=np.int64)
        active = arr[cur, 1] >= 0
        while active.any():
            feats = arr[cur[active], 1].astype(np.int64)
            thr = arr[cur[active], 2]
            vals = x[active, feats]
            go_left = vals < thr  # DecisionTreePredictor: left on <
            nxt = np.where(go_left, arr[cur[active], 3], arr[cur[active], 4]).astype(np.int64)
            cur[active] = nxt
            active = arr[cur, 1] >= 0
        out[:, t] = arr[cur, 5]
    return out


def _poisson_multiplicity(samples_ratio: float, random_seed: int):
    """Poisson(samples_ratio) bootstrap multiplicity for a (tree, row)
    pair via inverse-CDF on a seeded uniform hash — deterministic on any
    cluster, re-derivable at evaluation time (OOB needs the w == 0 set).
    Expects columns ``tree``, ``x``, ``y``. Tail beyond k = 6 (< 1e-4 at
    λ ≤ 1.5) is clamped to 7."""
    import math

    u = (
        F.pmod(
            F.xxhash64(
                F.lit(int(random_seed)), F.col("tree"), F.col("x").cast("string"), F.col("y")
            ),
            F.lit(1_000_003),
        )
        / F.lit(1_000_003.0)
    )
    lam = float(samples_ratio)
    cdf, acc = [], 0.0
    for k in range(7):
        acc += math.exp(-lam) * lam**k / math.factorial(k)
        cdf.append(acc)
    mult = F.lit(7)
    for k in range(6, -1, -1):
        mult = F.when(u < F.lit(cdf[k]), F.lit(k)).otherwise(mult)
    return mult.cast("double")


@dataclass
class RandomForestModel:
    trees: dict  # tree_id -> list of node tuples
    n_classes: int
    classes: list
    regression: bool

    def predict(self, df: DataFrame, features: str = "features") -> DataFrame:
        import pandas as pd

        forest, classes, regression = self.trees, self.classes, self.regression
        n_classes = self.n_classes
        cols = df.columns
        extra = (
            ", prediction double"
            if regression
            else ", probabilities array<double>, prediction long"
        )
        schema = (
            ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in cols) + extra
        )

        def run(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[features]])
                preds = _traverse(forest, x)
                out = pdf.copy()
                if regression:
                    out["prediction"] = preds.mean(axis=1)
                else:
                    votes = np.zeros((len(pdf), n_classes))
                    for t in range(preds.shape[1]):
                        votes[np.arange(len(pdf)), preds[:, t].astype(np.int64)] += 1
                    probs = votes / preds.shape[1]
                    out["probabilities"] = [r.tolist() for r in probs]
                    out["prediction"] = [int(classes[k]) for k in probs.argmax(axis=1)]
                yield out

        return df.mapInPandas(run, schema)


def train_random_forest(
    df: DataFrame,
    label_col: str = "label",
    feature_col: str = "features",
    number_of_trees: int = 10,
    max_depth: int = 4,
    min_split_size: int = 2,
    min_leaf_size: int = 1,
    max_features_ratio: float | None = None,
    samples_ratio: float = 1.0,
    random_seed: int = 42,
    regression: bool = False,
    dim: int | None = None,
) -> RandomForestModel:
    """Config names follow ``RandomForestTrainerConfig``:
    numberOfDecisionTrees, maxDepth, minSplitSize, minLeafSize,
    maxFeaturesRatio (default 1/√d for classification, 1/3 for regression,
    per GDS docs), numberOfSamplesRatio. ``samples_ratio=0`` disables the
    bootstrap (every tree sees all rows once) — GDS treats 0 the same way."""
    import pandas as pd

    if dim is None:
        dim = len(df.select(feature_col).first()[0])
    if max_features_ratio is None:
        max_features_ratio = (1.0 / np.sqrt(dim)) if not regression else (1.0 / 3.0)
    max_features = max(1, int(np.ceil(max_features_ratio * dim)))

    if regression:
        classes: list = []
        n_classes = 0
        prep = df.select(
            F.col(feature_col).alias("x"), F.col(label_col).cast("double").alias("y")
        )
    else:
        classes = [r[0] for r in df.select(label_col).distinct().orderBy(label_col).collect()]
        idx_map = {c: k for k, c in enumerate(classes)}
        n_classes = len(classes)
        mapping = F.create_map(*[F.lit(v) for kv in idx_map.items() for v in kv])
        prep = df.select(
            F.col(feature_col).alias("x"),
            mapping[F.col(label_col)].cast("double").alias("y"),
        )

    trees = F.explode(F.sequence(F.lit(0), F.lit(number_of_trees - 1))).alias("tree")
    fanned = prep.select("x", "y", trees)
    if samples_ratio > 0:
        fanned = fanned.withColumn(
            "w", _poisson_multiplicity(samples_ratio, random_seed)
        ).filter(F.col("w") > 0)
    else:
        fanned = fanned.withColumn("w", F.lit(1.0))

    nclasses = n_classes
    regr = regression

    def fit(key, pdf):
        tree_id = int(key[0])
        x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["x"]])
        y = pdf["y"].to_numpy(dtype=np.float64)
        w = pdf["w"].to_numpy(dtype=np.float64)
        # per-split feature bag rng, seeded per tree (SplittableRandom.split analog)
        rng = np.random.default_rng((random_seed, tree_id))
        nodes = _build_tree(
            x, y, w, max_depth, min_split_size, min_leaf_size,
            max_features, rng, nclasses, regr,
        )
        return pd.DataFrame(
            [
                {"tree": tree_id, "node": n0, "feature": f, "threshold": t,
                 "left": l, "right": r, "pred": p}
                for (n0, f, t, l, r, p) in nodes
            ]
        )

    node_schema = (
        "tree long, node long, feature long, threshold double, "
        "left long, right long, pred double"
    )
    rows = fanned.groupBy("tree").applyInPandas(fit, node_schema).collect()
    forest: dict = {}
    for r in rows:
        forest.setdefault(int(r["tree"]), []).append(
            (int(r["node"]), int(r["feature"]), float(r["threshold"]),
             int(r["left"]), int(r["right"]), float(r["pred"]))
        )
    for t in forest:
        forest[t] = sorted(forest[t])
    return RandomForestModel(
        trees=forest, n_classes=n_classes, classes=classes, regression=regression
    )


def out_of_bag_error(
    model: RandomForestModel,
    df: DataFrame,
    label_col: str = "label",
    feature_col: str = "features",
    samples_ratio: float = 1.0,
    random_seed: int = 42,
) -> float:
    """OUT_OF_BAG_ERROR (``metrics/classification/OutOfBagError.java:33-80``):
    for each training example, gather class votes from every tree whose
    bootstrap did NOT sample it (multiplicity 0 — re-derived from the same
    seeded Poisson draw the trainer used), take the majority (ties →
    smallest class), and return mistakes / examples-with-any-OOB-vote
    (0 when none, per the reference).

    Distributed shape: one mapInPandas pass scores every row against all
    trees at once (the vectorized ``_traverse``), one explode over the
    w == 0 (row, tree) pairs, two hash aggregations. No driver loop."""
    import pandas as pd

    if model.regression or samples_ratio <= 0:
        raise ValueError("OOB error needs a classification forest with samples_ratio > 0")
    idx_map = {c: k for k, c in enumerate(model.classes)}
    mapping = F.create_map(*[F.lit(v) for kv in idx_map.items() for v in kv])
    rows = df.select(
        F.col(feature_col).alias("x"),
        mapping[F.col(label_col)].cast("double").alias("y"),
    ).withColumn("rid", F.xxhash64(F.col("x").cast("string"), F.col("y")))

    forest = model.trees
    n_trees = len(forest)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["x"]])
            preds = _traverse(forest, x)
            yield pd.DataFrame(
                {"rid": pdf["rid"], "y": pdf["y"], "preds": [r.tolist() for r in preds]}
            )

    scored = (
        rows.dropDuplicates(["rid"])
        .mapInPandas(score, "rid long, y double, preds array<double>")
    )

    oob = (
        rows.dropDuplicates(["rid"])
        .select(
            "rid",
            F.explode(F.sequence(F.lit(0), F.lit(n_trees - 1))).alias("tree"),
            "x",
            "y",
        )
        .withColumn("w", _poisson_multiplicity(samples_ratio, random_seed))
        .filter(F.col("w") == 0)
        .select("rid", "tree")
    )
    votes = (
        oob.join(scored, "rid")
        .select("rid", "y", F.element_at("preds", F.col("tree") + 1).alias("cls"))
        .groupBy("rid", "y", "cls")
        .agg(F.count("*").alias("v"))
    )
    w = Window.partitionBy("rid").orderBy(F.desc("v"), F.asc("cls"))
    top = votes.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") == 1)
    agg = top.agg(
        F.sum((F.col("cls") != F.col("y")).cast("long")).alias("mistakes"),
        F.count("*").alias("n"),
    ).collect()[0]
    return float(agg["mistakes"]) / agg["n"] if agg["n"] else 0.0
