"""Random graph generation: the GDS ``RandomGraphGenerator`` analog
(reference ``core/src/main/java/org/neo4j/gds/beta/generator/
RandomGraphGenerator.java:63``; distributions ``core-api/.../generator/
RelationshipDistribution.java:35,46,59``; draw formulas ``core/.../
statistics/DistributionHelper.java``).

The reference draws from thread-local ``java.util.Random`` (non-portable
by construction); this engine re-expresses the same three distributions
over portable md5-hash uniforms so the generated graph is a pure function
of (node_count, average_degree, distribution, seed) — identical across
runs, partitionings, and engines. Everything is column expressions over
``spark.range`` (one explode, zero UDFs, zero shuffles until the caller
aggregates).

Distribution semantics (mirroring ``RelationshipDistribution``):
- ``uniform``: out-degree = average_degree exactly; targets uniform in
  [0, node_count). Integer-only math — bit-exactly replayable in SQL.
- ``random``: out-degree ~ round(N(average_degree, average_degree/2))
  (Box-Muller over two hash uniforms), floored at 0; targets uniform.
- ``power_law``: out-degree as ``random``; targets power-law in
  [1, node_count-1] with gamma = 1 + 1/average_degree via inverse-CDF
  (``DistributionHelper.powerLawSample``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.datapipe.dedup import portable_hash
from graph_data_science_spark.graph.build import LinkGraph

_HASH_SPACE = float(16**15)


def _u(col: Column, tag: str, seed) -> Column:
    """Deterministic uniform in [0, 1) keyed by (seed, tag, col)."""
    return portable_hash(col.cast("string"), f"{seed}:{tag}") / F.lit(_HASH_SPACE)


def _hash_mod(col: Column, tag: str, seed, n: int) -> Column:
    return portable_hash(col.cast("string"), f"{seed}:{tag}") % n


def random_graph(
    spark: SparkSession,
    node_count: int,
    average_degree: int,
    distribution: str = "uniform",
    seed: int | str = 42,
    allow_self_loops: bool = False,
) -> LinkGraph:
    """Generate a LinkGraph with the reference's degree/target semantics.

    Self-loop draws are remapped to ``(target + 1) % node_count`` when
    ``allow_self_loops`` is false (the reference resamples; a remap keeps
    the op a pure column expression with the same marginal distribution
    over the remaining targets up to one slot).
    """
    if distribution not in ("uniform", "random", "power_law"):
        raise ValueError(f"unknown distribution {distribution!r}")
    nodes = spark.range(node_count).select(F.col("id").alias("src"))

    if distribution == "uniform":
        degree = F.lit(int(average_degree))
    else:
        # Box-Muller: round(g * stdDev + mean % upperBound), floored at 0
        # (DistributionHelper.gaussianSample; negative degrees generate
        # nothing in the reference's fill loop).
        std = average_degree // 2
        u1 = _u(F.col("src"), "g1", seed)
        u2 = _u(F.col("src"), "g2", seed)
        # guard u1=0 (log(0)): the hash uniform can be 0 with prob 16^-15
        g = F.sqrt(-2.0 * F.log(F.greatest(u1, F.lit(1e-18)))) * F.cos(
            2.0 * math.pi * u2
        )
        raw = F.floor(g * std + (average_degree % node_count) + 0.5).cast("long")
        degree = F.greatest(raw, F.lit(0))

    with_deg = nodes.select("src", degree.alias("_deg"))
    slots = with_deg.select(
        "src",
        F.explode(
            F.when(F.col("_deg") > 0, F.sequence(F.lit(0), F.col("_deg") - 1)).otherwise(
                F.array().cast("array<long>")
            )
        ).alias("_j"),
    )
    draw_key = F.concat(F.col("src").cast("string"), F.lit("_"), F.col("_j").cast("string"))

    if distribution == "power_law":
        # inverse-CDF power-law on [1, node_count-1], gamma = 1 + 1/avg
        # (DistributionHelper.powerLawSample): round((((max^(1-γ) −
        # min^(1-γ))·u + min^(1-γ)))^(1/(1-γ)))
        gamma = 1.0 + 1.0 / average_degree
        lo, hi = 1.0, float(node_count - 1)
        max_g = hi ** (1.0 - gamma)
        min_g = lo ** (1.0 - gamma)
        u = portable_hash(draw_key, f"{seed}:t") / F.lit(_HASH_SPACE)
        base = (max_g - min_g) * u + min_g
        dst = F.floor(F.pow(base, 1.0 / (1.0 - gamma)) + 0.5).cast("long")
    else:
        dst = portable_hash(draw_key, f"{seed}:t") % node_count

    edges = slots.select("src", dst.alias("dst"), F.lit(1.0).alias("weight"))
    if not allow_self_loops:
        edges = edges.withColumn(
            "dst",
            F.when(F.col("dst") == F.col("src"), (F.col("dst") + 1) % node_count).otherwise(
                F.col("dst")
            ),
        )
    return LinkGraph(edges=edges, node_count=node_count)
