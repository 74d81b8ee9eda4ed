"""GraphSage embedding generation (mean aggregator, inference).

Reference:
- ``algo/.../embeddings/graphsage/MeanAggregator.java`` —
  ``h_v^k = σ(W_k · MEAN({h_v^{k−1}} ∪ {h_u^{k−1} : u ∈ N(v)}))`` (self
  included in the mean), final ``NormalizeRows`` (L2) —
  ``GraphSageHelper.java:embeddingsComputationGraph``.
- ``GraphSageHelper.subGraphsPerLayer`` — per-layer neighbor sampling of
  ``sampleSize`` neighbors.
- ``GraphSageEmbeddingsGenerator.java`` — applies trained layers to all
  nodes (the *inference* path implemented here).

Spark execution (all joins/aggregates, zero UDFs):
- sampling: deterministic top-``sample_size`` neighbors by
  ``xxhash64(src, dst, seed, layer)`` rank (the reference uses a seeded
  ``NeighborhoodSampler``; a distributed engine needs the stable draw);
- mean: self-unioned neighbor rows → ``posexplode`` features → one
  (node, dim) hash aggregate;
- ``W·x``: the weight matrix as a broadcast (i, j, w) frame —
  explode-join-aggregate, linear in nnz(W), never a per-row Python loop;
- activation relu/sigmoid via ``transform``; final L2 row normalize.

TRAINING is out of scope, stated plainly: ``GraphSageModelTrainer``
optimizes an unsupervised skip-gram-style loss with Adam over sampled
batches — the mini-batch schedule is thread-order-dependent and the
reference itself documents non-reproducibility across runs; this engine
ships the deterministic inference surface (weights supplied by the
caller, e.g. exported from a trained GDS model, or the deterministic
``identity_weights`` for feature smoothing).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph


@dataclass
class GraphSageResult:
    embeddings: DataFrame  # (node_id long, embedding array<double>)
    layers: int


def identity_weights(dim: int) -> list[list[list[float]]]:
    """One layer, W = I — mean-smoothing of the input features."""
    return [[[1.0 if i == j else 0.0 for j in range(dim)] for i in range(dim)]]


def _assemble(df: DataFrame, key: str, j: str, v: str, out: str) -> DataFrame:
    return df.groupBy(key).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col(j).alias("j"), F.col(v).alias("v")))),
            lambda s: s["v"],
        ).alias(out)
    )


def graphsage(
    graph: LinkGraph,
    features: DataFrame,
    weights: list[list[list[float]]],
    activation: str = "relu",
    sample_size: int | None = None,
    seed: int = 42,
) -> GraphSageResult:
    """``features``: (node_id, features array<double>); ``weights``: one
    (out × in) matrix per layer, applied in order. Edges are used as
    given — symmetrize first for the reference's UNDIRECTED projection."""
    if activation not in ("relu", "sigmoid"):
        raise ValueError("activation must be 'relu' or 'sigmoid'")
    act = (
        (lambda c: F.greatest(c, F.lit(0.0)))
        if activation == "relu"
        else (lambda c: F.lit(1.0) / (F.lit(1.0) + F.exp(-c)))
    )
    spark = graph.edges.sparkSession
    h = features.select("node_id", F.col("features").cast("array<double>").alias("emb"))
    for layer_nr, W in enumerate(weights):
        edges = graph.edges.select("src", "dst")
        if sample_size is not None:
            w_rank = Window.partitionBy("src").orderBy(
                F.xxhash64(F.col("src"), F.col("dst"), F.lit(int(seed)), F.lit(layer_nr))
            )
            edges = (
                edges.withColumn("_r", F.row_number().over(w_rank))
                .filter(F.col("_r") <= int(sample_size))
                .drop("_r")
            )
        # {h_v} ∪ {h_u : u ∈ N(v)} — gather neighbor rows onto src, plus self.
        nbr = edges.join(
            h.select(F.col("node_id").alias("dst"), F.col("emb").alias("nemb")), "dst"
        ).select(F.col("src").alias("node_id"), F.col("nemb").alias("emb"))
        pool = h.select("node_id", "emb").unionByName(nbr)
        mean = (
            pool.select("node_id", F.posexplode("emb").alias("j", "v"))
            .groupBy("node_id", "j")
            .agg(F.avg("v").alias("v"))
        )
        # W · mean via a broadcast (i, j, w) frame.
        wrows = [
            (i, j, float(W[i][j]))
            for i in range(len(W))
            for j in range(len(W[0]))
            if W[i][j] != 0.0
        ]
        # keep all-zero output rows addressable so every output dim exists
        present = {i for i, _, _ in wrows}
        wrows += [(i, 0, 0.0) for i in range(len(W)) if i not in present]
        wdf = spark.createDataFrame(wrows, "i int, j int, w double")
        prod = (
            mean.join(F.broadcast(wdf), "j")
            .groupBy("node_id", "i")
            .agg(F.sum(F.col("v") * F.col("w")).alias("v"))
        )
        h = _assemble(prod, "node_id", "i", "v", "emb").select(
            "node_id", F.transform("emb", act).alias("emb")
        )
    norm = F.sqrt(
        F.aggregate(F.col("emb"), F.lit(0.0), lambda s, v: s + v * v)
    )
    out = h.select(
        "node_id",
        F.when(
            norm > 0, F.transform("emb", lambda v: v / norm)
        ).otherwise(F.col("emb")).alias("embedding"),
    )
    return GraphSageResult(embeddings=out, layers=len(weights))
