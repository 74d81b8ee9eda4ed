"""Bucketed delta-stepping (reference ``paths/delta/DeltaStepping.java``):
must produce distances identical to Bellman-Ford frontier relaxation for
every Δ, degenerate to it at Δ=∞, and honor the bin discipline."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.algorithms.paths import delta_stepping, shortest_paths  # noqa: E402
from graph_data_science_spark.graph.build import LinkGraph  # noqa: E402


def _rand_graph(spark, n=120, m=500, seed=3):
    import random

    rng = random.Random(seed)
    rows = [
        (rng.randrange(n), rng.randrange(n), float(1 + rng.randrange(9)))
        for _ in range(m)
    ]
    return LinkGraph(edges=spark.createDataFrame(rows, "src long, dst long, weight double"))


def _diff(a, b):
    ad = a.withColumnRenamed("distance", "da")
    bd = b.withColumnRenamed("distance", "db")
    return (
        ad.join(bd, "node_id", "full_outer")
        .filter(
            F.col("da").isNull()
            | F.col("db").isNull()
            | (F.abs(F.col("da") - F.col("db")) > 1e-9)
        )
        .count()
    )


@pytest.mark.parametrize("delta", [0.5, 2.0, 7.0])
def test_delta_matches_bellman_ford(spark, delta):
    g = _rand_graph(spark)
    a = shortest_paths(g, source=0, weighted=True)
    b = delta_stepping(g, source=0, delta=delta, weighted=True)
    assert b.did_converge
    assert _diff(a.distances, b.distances) == 0


def test_huge_delta_degenerates_to_bellman_ford_rounds(spark):
    g = _rand_graph(spark, seed=9)
    a = shortest_paths(g, source=0, weighted=True)
    b = delta_stepping(g, source=0, delta=1e9, weighted=True)
    # one bin == plain frontier relaxation: same round count, same result
    assert b.ran_iterations == a.ran_iterations
    assert _diff(a.distances, b.distances) == 0


def test_chain_bins_processed_in_order(spark):
    # path 0→1→2→3→4 with weight 3; Δ=2 ⇒ every settle lands in a later
    # bin, so rounds ≈ nodes and distances are exact multiples of 3
    rows = [(i, i + 1, 3.0) for i in range(5)]
    g = LinkGraph(edges=spark.createDataFrame(rows, "src long, dst long, weight double"))
    b = delta_stepping(g, source=0, delta=2.0, weighted=True)
    got = {r["node_id"]: r["distance"] for r in b.distances.collect()}
    assert got == {i: 3.0 * i for i in range(6)}


def test_unweighted_mode(spark):
    g = _rand_graph(spark, seed=5)
    a = shortest_paths(g, source=0, weighted=False)
    b = delta_stepping(g, source=0, delta=2.0, weighted=False)
    assert _diff(a.distances, b.distances) == 0


def test_invalid_delta_raises(spark):
    g = _rand_graph(spark)
    with pytest.raises(ValueError):
        delta_stepping(g, source=0, delta=0.0)
