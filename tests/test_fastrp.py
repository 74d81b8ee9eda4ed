"""FastRP invariants (reference FastRP.java; its fixtures assert structural
invariants + determinism, not golden floats — random vectors differ by RNG,
so parity is at the invariant level: determinism under a fixed seed,
iteration-weight linearity, normalization, neighborhood mixing)."""

import math

import numpy as np
import pytest

from graph_data_science_spark.algorithms.fastrp import fastrp
from graph_data_science_spark.graph.build import from_edge_list

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (1, 4)]


def emb_map(res):
    return {r["node_id"]: np.array(r["embedding"]) for r in res.embeddings.collect()}


def test_fastrp_shape_and_determinism(spark):
    g = from_edge_list(spark, EDGES, node_count=5)
    a = emb_map(fastrp(g, embedding_dimension=16, random_seed=7))
    b = emb_map(fastrp(g, embedding_dimension=16, random_seed=7))
    assert set(a) == set(range(5))
    assert all(v.shape == (16,) for v in a.values())
    for k in a:
        assert np.array_equal(a[k], b[k]), f"node {k} not deterministic"
    c = emb_map(fastrp(g, embedding_dimension=16, random_seed=8))
    assert any(not np.array_equal(a[k], c[k]) for k in a)  # seed matters


def test_fastrp_iteration_weight_linearity(spark):
    # emb = Σ w_i · normalized(cur_i): doubling one weight doubles exactly
    # that term. With weights [0,1] vs [0,2] the whole embedding doubles.
    g = from_edge_list(spark, EDGES, node_count=5)
    a = emb_map(fastrp(g, embedding_dimension=32, iteration_weights=[0.0, 1.0], random_seed=3))
    b = emb_map(fastrp(g, embedding_dimension=32, iteration_weights=[0.0, 2.0], random_seed=3))
    for k in a:
        assert np.allclose(2.0 * a[k], b[k], atol=1e-12)


def test_fastrp_contributions_unit_norm(spark):
    # A single non-zero iteration weight w ⇒ ‖emb(v)‖ ∈ {0, w} (the
    # contribution is L2-normalized before weighting).
    g = from_edge_list(spark, EDGES, node_count=5)
    a = emb_map(fastrp(g, embedding_dimension=64, iteration_weights=[1.0], random_seed=11))
    for k, v in a.items():
        nrm = float(np.linalg.norm(v))
        assert nrm == pytest.approx(1.0, abs=1e-9) or nrm == 0.0


def test_fastrp_isolated_node_zero_without_self_influence(spark):
    g = from_edge_list(spark, [(0, 1)], node_count=3)
    a = emb_map(fastrp(g, embedding_dimension=16, random_seed=5))
    assert np.all(a[2] == 0.0)  # no neighbors, nodeSelfInfluence 0
    b = emb_map(fastrp(g, embedding_dimension=16, random_seed=5, node_self_influence=0.5))
    # With self influence the isolated node keeps its (normalized) init.
    assert float(np.linalg.norm(b[2])) == pytest.approx(0.5, abs=1e-9) or np.all(b[2] == 0.0)


def test_fastrp_init_entry_distribution(spark):
    # Entries of the init vectors take values in {0, ±√3/√d} with ~1/6
    # probability each for ±: check via a 1-iteration self-influence run.
    d = 32
    g = from_edge_list(spark, [], node_count=200)
    res = fastrp(
        g, embedding_dimension=d, iteration_weights=[], node_self_influence=1.0, random_seed=1
    )
    vals = np.concatenate([v for v in emb_map(res).values()])
    nz = vals[vals != 0.0]
    assert 0.15 < len(nz) / len(vals) < 0.52  # ~1/3 nonzero
    # normalized init: entries share magnitude per node; sign split roughly even
    assert 0.3 < (nz > 0).mean() < 0.7
