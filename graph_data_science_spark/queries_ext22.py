"""Round-4 driver-contract queries (batch 22): bucketed delta-stepping.

``delta_sssp_supply_tree``: the REAL delta-stepping implementation
(``algorithms/paths.py:delta_stepping`` — bin = ⌊dist/Δ⌋, each round
relaxes the globally smallest non-empty bin, per reference
``paths/delta/DeltaStepping.java:52-164``) on the same weighted supply
tree as ``sssp_supply_tree``, Δ = 4.0 so the fixture's distance range
(≤ ~20) spans several bins and the bin scheduler genuinely reorders
work. Distances are a tree invariant, so the oracle is the identical
closed-form SQL as the Bellman-Ford row — which is the point: the
bucket discipline must be result-invisible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.paths import delta_stepping
from graph_data_science_spark.queries_ext import Q_SSSP_SQL, _supply_tree_graph

QUERIES_EXT22: dict = {}
ORACLES_EXT22: dict = {}


def q_delta_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _supply_tree_graph(spark, sf_dir, weighted=True)
    res = delta_stepping(g, source=0, delta=4.0, weighted=True)
    return res.distances.select(
        "node_id", F.col("distance").cast("long").alias("distance")
    )


QUERIES_EXT22["delta_sssp_supply_tree"] = q_delta_sssp
ORACLES_EXT22["delta_sssp_supply_tree"] = Q_SSSP_SQL
