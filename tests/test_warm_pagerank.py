"""Warm-start (incremental) PageRank: initial_scores residual push.

rank = Σ deltas, so a previous solution folds in as delta_(-1) and the loop
pushes only r0 = b + d·M·prev − prev. The fixpoint is start-independent
(power iteration), so warm scores must equal cold scores; on an unchanged
converged graph the residual is sub-tolerance everywhere and the loop
performs zero productive message rounds.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from graph_data_science_spark.algorithms import pagerank
from graph_data_science_spark.graph.build import LinkGraph


def _graph(spark, edges, n):
    df = spark.createDataFrame(
        [(int(s), int(d), 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    return LinkGraph(edges=df, node_count=n)


def _scores(res):
    return {r["node_id"]: r["score"] for r in res.scores.collect()}


def _rand_edges(rng, n, m):
    es = {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
    return [(s, d) for s, d in es if s != d]


def test_warm_restart_on_unchanged_graph_is_noop(spark):
    rng = random.Random(11)
    n = 80
    g = _graph(spark, _rand_edges(rng, n, 160), n)
    cold = pagerank(g, tolerance=1e-9, max_iterations=100)
    assert cold.did_converge
    warm = pagerank(g, tolerance=1e-6, max_iterations=100, initial_scores=cold.scores)
    assert warm.did_converge
    # the residual is sub-tolerance everywhere: one empty probe round only
    assert warm.updates_run <= 1
    c, w = _scores(cold), _scores(warm)
    assert all(abs(c[k] - w[k]) < 1e-6 for k in c)


def test_warm_start_on_grown_graph_matches_cold_run(spark):
    rng = random.Random(23)
    n = 80
    e1 = _rand_edges(rng, n, 140)
    g1 = _graph(spark, e1, n)
    prev = pagerank(g1, tolerance=1e-10, max_iterations=120)
    # grow: extra edges redistribute mass — some residuals are NEGATIVE
    # (existing out-neighbors of a node that gains out-degree lose share)
    e2 = e1 + [(s, d) for s, d in _rand_edges(rng, n, 40) if (s, d) not in set(e1)]
    g2 = _graph(spark, e2, n)
    cold = pagerank(g2, tolerance=1e-10, max_iterations=120)
    warm = pagerank(g2, tolerance=1e-10, max_iterations=120, initial_scores=prev.scores)
    assert warm.did_converge and cold.did_converge
    c, w = _scores(cold), _scores(warm)
    assert all(abs(c[k] - w[k]) < 1e-6 for k in c)


def test_warm_start_personalized(spark):
    rng = random.Random(5)
    n = 60
    g = _graph(spark, _rand_edges(rng, n, 120), n)
    srcs = [0, 1, 2]
    # cold tighter than warm: the accumulated cold scores sit within
    # tol/(1-d) of the fixpoint, so the warm residual only clears the
    # no-op bar when the warm tolerance is looser than the cold one
    cold = pagerank(g, tolerance=1e-9, max_iterations=120, source_nodes=srcs)
    warm = pagerank(
        g, tolerance=1e-6, max_iterations=120, source_nodes=srcs, initial_scores=cold.scores
    )
    assert warm.updates_run <= 1
    c, w = _scores(cold), _scores(warm)
    assert all(abs(c[k] - w[k]) < 1e-6 for k in c)
