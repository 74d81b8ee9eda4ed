"""Random graph generation (graph/generate.py): reference distribution
semantics (RelationshipDistribution.java) as statistical invariants +
determinism.
"""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.graph.generate import random_graph  # noqa: E402


def test_uniform_exact_degree_and_determinism(spark):
    g = random_graph(spark, node_count=500, average_degree=3, distribution="uniform", seed=1)
    deg = g.edges.groupBy("src").count()
    assert deg.filter(F.col("count") != 3).count() == 0
    assert deg.count() == 500
    # no self loops by default
    assert g.edges.filter(F.col("src") == F.col("dst")).count() == 0
    # deterministic across invocations
    a = sorted(map(tuple, g.edges.select("src", "dst").collect()))
    b = sorted(
        map(
            tuple,
            random_graph(spark, 500, 3, "uniform", seed=1).edges.select("src", "dst").collect(),
        )
    )
    assert a == b


def test_random_gaussian_degree_mean(spark):
    g = random_graph(spark, node_count=2000, average_degree=8, distribution="random", seed=2)
    n_edges = g.edges.count()
    mean_deg = n_edges / 2000
    # N(8, 4) per node, 2000 nodes → sample mean within ~3σ/sqrt(n) of 8
    # (floor-at-0 truncation biases up slightly; wide tolerance)
    assert 7.0 < mean_deg < 9.5


def test_power_law_targets_are_skewed(spark):
    g = random_graph(spark, node_count=2000, average_degree=8, distribution="power_law", seed=3)
    indeg = g.edges.groupBy("dst").count()
    stats = indeg.agg(F.max("count").alias("mx"), F.avg("count").alias("avg")).first()
    # power-law in-degree: the hottest node dwarfs the mean; node 1 (the
    # distribution's minimum) absorbs a large constant fraction
    assert stats["mx"] > 20 * stats["avg"]
    uni = random_graph(spark, 2000, 8, "uniform", seed=3)
    ustats = (
        uni.edges.groupBy("dst")
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
        .first()
    )
    assert stats["mx"] > 3 * ustats["mx"]  # visibly heavier tail than uniform
