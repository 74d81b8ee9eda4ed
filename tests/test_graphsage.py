"""GraphSage inference (MeanAggregator.java semantics: self-inclusive
mean → W· → activation → final L2 row normalize)."""

import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.graphsage import (
    graphsage,
    identity_weights,
)
from graph_data_science_spark.graph.build import LinkGraph


def _fixture(spark):
    # pair 0—1 (both directions) + isolated node 2
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 1.0)], "src long, dst long, weight double"
    )
    feats = spark.createDataFrame(
        [(0, [4.0, 0.0]), (1, [0.0, 2.0]), (2, [3.0, 3.0])],
        "node_id long, features array<double>",
    )
    return LinkGraph(edges=edges, node_count=3), feats


def test_identity_layer_mean_and_normalize(spark):
    g, feats = _fixture(spark)
    res = graphsage(g, feats, identity_weights(2))
    emb = {r["node_id"]: list(r["embedding"]) for r in res.embeddings.collect()}
    # node 0: mean([4,0],[0,2]) = [2,1]; normalized = [2,1]/sqrt(5)
    s5 = math.sqrt(5.0)
    assert emb[0] == pytest.approx([2 / s5, 1 / s5])
    assert emb[1] == pytest.approx([2 / s5, 1 / s5])
    # isolated node: mean of itself only, then normalized
    s = math.sqrt(18.0)
    assert emb[2] == pytest.approx([3 / s, 3 / s])


def test_weight_matrix_and_relu(spark):
    g, feats = _fixture(spark)
    # W maps [a, b] -> [a - b, 0]: relu clamps negatives, zero row stays.
    W = [[[1.0, -1.0], [0.0, 0.0]]]
    res = graphsage(g, feats, W)
    emb = {r["node_id"]: list(r["embedding"]) for r in res.embeddings.collect()}
    # node 0: mean [2,1] -> [1, 0] -> normalize -> [1, 0]
    assert emb[0] == pytest.approx([1.0, 0.0])
    # node 2: mean [3,3] -> [0, 0] -> zero vector stays zero
    assert emb[2] == pytest.approx([0.0, 0.0])


def test_two_layers_chain(spark):
    g, feats = _fixture(spark)
    res = graphsage(g, feats, identity_weights(2) + identity_weights(2))
    assert res.layers == 2
    emb = {r["node_id"]: list(r["embedding"]) for r in res.embeddings.collect()}
    # layer1 (pre-norm, relu keeps): h0 = h1 = [2,1]; layer2 mean of equal
    # vectors = [2,1] -> normalized equal again.
    s5 = math.sqrt(5.0)
    assert emb[0] == pytest.approx([2 / s5, 1 / s5])


def test_sample_size_deterministic(spark):
    # hub 0 with 6 neighbors; sample 2 — same seed = same result.
    edges = [(0, i, 1.0) for i in range(1, 7)]
    g = LinkGraph(
        edges=spark.createDataFrame(edges, "src long, dst long, weight double"), node_count=7
    )
    feats = spark.createDataFrame(
        [(i, [float(i)]) for i in range(7)], "node_id long, features array<double>"
    )
    r1 = graphsage(g, feats, identity_weights(1), sample_size=2, seed=7)
    r2 = graphsage(g, feats, identity_weights(1), sample_size=2, seed=7)
    e1 = sorted(map(tuple, r1.embeddings.collect()))
    e2 = sorted(map(tuple, r2.embeddings.collect()))
    assert e1 == e2


def test_bad_activation(spark):
    g, feats = _fixture(spark)
    with pytest.raises(ValueError):
        graphsage(g, feats, identity_weights(2), activation="tanh")


def _two_clique_fixture(spark):
    """Two 4-cliques (0-3, 4-7) with opposed features, no inter-edges."""
    pairs = []
    for base in (0, 4):
        for i in range(4):
            for j in range(4):
                if i != j:
                    pairs.append((base + i, base + j, 1.0))
    edges = spark.createDataFrame(pairs, "src long, dst long, weight double")
    feats = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.1 * i] if i < 4 else [0.0, 1.0, 0.1 * i]) for i in range(8)],
        "node_id long, features array<double>",
    )
    from graph_data_science_spark.graph.build import LinkGraph
    return LinkGraph(edges=edges, node_count=8), feats


def test_graphsage_train_learns_and_is_deterministic(spark):
    from graph_data_science_spark.algorithms.graphsage import graphsage_train

    g, feats = _two_clique_fixture(spark)
    res = graphsage_train(
        g, feats, embedding_dim=4, sample_sizes=[3], epochs=8,
        learning_rate=0.1, search_depth=2, negative_sample_weight=5,
        random_seed=7, tolerance=0.0,
    )
    assert res.ran_steps == 8
    assert len(res.losses) == 8
    # the loss improves over training (GraphSageLoss minimized)
    assert min(res.losses[4:]) < res.losses[0]
    emb = {r["node_id"]: list(r["embedding"]) for r in res.embeddings.collect()}
    assert len(emb) == 8 and len(emb[0]) == 4

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        return num / den if den else 0.0

    intra = [cos(emb[i], emb[j]) for i in range(4) for j in range(4) if i < j]
    inter = [cos(emb[i], emb[j]) for i in range(4) for j in range(4, 8)]
    assert sum(intra) / len(intra) > sum(inter) / len(inter)

    # deterministic: identical seed => identical weights bit-for-bit
    res2 = graphsage_train(
        g, feats, embedding_dim=4, sample_sizes=[3], epochs=8,
        learning_rate=0.1, search_depth=2, negative_sample_weight=5,
        random_seed=7, tolerance=0.0,
    )
    assert res2.weights == res.weights
    assert res2.losses == pytest.approx(res.losses)


def test_graphsage_train_two_layers_and_convergence(spark):
    from graph_data_science_spark.algorithms.graphsage import graphsage_train

    g, feats = _two_clique_fixture(spark)
    res = graphsage_train(
        g, feats, embedding_dim=3, sample_sizes=[3, 2], epochs=30,
        learning_rate=0.05, search_depth=1, negative_sample_weight=2,
        random_seed=11, tolerance=0.5,
    )
    # loose tolerance => the |Δloss| early-stop triggers before 30 steps
    assert res.did_converge
    assert res.ran_steps < 30
    assert len(res.weights) == 2
    assert len(res.weights[0]) == 3 and len(res.weights[0][0]) == 3
    assert res.embeddings.count() == 8


def test_graphsage_train_matches_numpy_replay(spark):
    """The portable-RNG trainer must match the independent NumPy
    reimplementation (tools/graphsage_replay.py — hashlib/random/NumPy,
    no Spark) at float precision: every sampling draw bit-equal, losses
    and final weights to 1e-9. This is the float-level twin of the
    graphsage_train_replay oracle row's e6 goldens."""
    import os
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from graphsage_replay import FIXTURE_PARAMS, nation_fixture, replay

    from graph_data_science_spark.algorithms.graphsage import graphsage_train
    from graph_data_science_spark.graph.build import LinkGraph

    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    if not os.path.isdir(sf):
        pytest.skip("testdata not present")
    edges, features = nation_fixture(sf)
    exp = replay(edges, features, **FIXTURE_PARAMS)
    e = spark.createDataFrame([(s, d, 1.0) for s, d in edges], "src long, dst long, weight double")
    f = spark.createDataFrame([(u, v) for u, v in features.items()], "node_id long, features array<double>")
    got = graphsage_train(
        LinkGraph(edges=e, node_count=35), f, rng="portable",
        feature_dim=2, activation="sigmoid", penalty_l2=0.0, **FIXTURE_PARAMS,
    )
    assert got.ran_steps == exp["ran_steps"]
    assert got.did_converge == exp["did_converge"]
    assert got.losses == pytest.approx(exp["losses"], abs=1e-9)
    for k in range(len(got.weights)):
        assert np.allclose(np.array(got.weights[k]), exp["weights"][k], atol=1e-9)
