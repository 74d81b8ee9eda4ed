"""Node2Vec — biased walks + skip-gram with negative sampling
(reference ``algo/.../embeddings/node2vec/Node2Vec.java:39``; walks
``RandomWalk.java``, training ``Node2VecModel.java``).

Reference shape: sample random walks (p/q-biased; p=q=1 ⇒ uniform, the
default), slide a window over each walk emitting (center, context) pairs,
then train two embedding matrices (center + context) by SGD on the
skip-gram negative-sampling objective
``log σ(c·u) + Σ_neg log σ(−c·u_neg)``, negatives drawn from the unigram
distribution.

Spark re-expression — every stage a DataFrame transform, no per-row Python:

- walks: ``random_walks`` (deterministic seeded picks, p=q=1);
- pair generation: walks self-joined on walk_id with ``|Δstep| ≤ window``
  (Catalyst range join on tiny per-walk groups);
- negatives: ``negative_samples`` deterministic hash draws per (pair,
  replica) mapped through the dense-id table — the seeded analog of the
  reference's unigram sampler (uniform here; the 0.75-power skew is a
  quality knob, not a correctness contract);
- training: FULL-BATCH gradient descent — one iteration = join pairs to
  both embedding tables, compute ``(label − σ(c·u))`` per pair
  (``zip_with``/``aggregate`` array expressions), aggregate gradients per
  node with one hash-agg each side, apply the update with ``zip_with``.
  The reference's asynchronous per-thread SGD is a shared-memory trick;
  full-batch GD reaches the same objective deterministically and each
  iteration is two shuffles regardless of cluster size — the honest
  100 TB shape. Embeddings stay ``array<double>`` columns throughout.

Determinism: init and every sample derive from ``xxhash64`` — identical
results under any partitioning/parallelism.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.algorithms.walks import random_walks
from graph_data_science_spark.pregel.superstep import (
    materialize_roundtrip,
    roundtrip_mark,
    roundtrip_release,
)


@dataclass
class Node2VecResult:
    embeddings: DataFrame  # (node_id long, embedding array<double>)
    ran_iterations: int
    n_pairs: int


def _hash_unit(*cols) -> F.Column:
    """Deterministic uniform double in [0, 1) from xxhash64 of cols."""
    m = 1 << 32
    return F.pmod(F.xxhash64(*cols), F.lit(m)).cast("double") / F.lit(float(m))


def _init_embedding(node_col: F.Column, dim: int, seed: int, scale: float) -> F.Column:
    """array<double>: per-(node, lane) seeded uniform in [-scale, scale]."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (_hash_unit(F.lit(seed), node_col, i) * 2.0 - 1.0) * scale,
    )


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def skipgram_pairs(walks: DataFrame, window_size: int = 3) -> DataFrame:
    """(center, context, walk_id, s1) pairs from walk windows: context
    within ``window_size`` steps of the center on the same walk, excluding
    the center itself (reference Node2VecModel window iteration). walk_id +
    step survive so each OCCURRENCE of a pair is distinguishable — the
    negative sampler needs that (identical draws for every repeat of a hot
    pair would concentrate the negative mass on a few nodes)."""
    a = walks.select("walk_id", F.col("step").alias("s1"), F.col("node_id").alias("center"))
    b = walks.select("walk_id", F.col("step").alias("s2"), F.col("node_id").alias("context"))
    return (
        a.join(b, "walk_id")
        .filter(
            (F.col("s1") != F.col("s2"))
            & (F.abs(F.col("s1") - F.col("s2")) <= window_size)
        )
        .select("center", "context", "walk_id", "s1", "s2")
    )


def node2vec(
    graph: LinkGraph,
    embedding_dim: int = 16,
    walk_length: int = 10,
    walks_per_node: int = 4,
    window_size: int = 3,
    negative_samples: int = 2,
    iterations: int = 15,
    learning_rate: float = 0.25,
    random_seed: int = 42,
) -> Node2VecResult:
    """Train node embeddings; returns the CENTER matrix (the reference
    returns its center embeddings too). Defaults are sized for graph-shape
    fixtures; production callers raise dim/walks."""
    spark = graph.edges.sparkSession
    _mark = roundtrip_mark()

    walks = random_walks(
        graph,
        walks_per_node=walks_per_node,
        walk_length=walk_length,
        random_seed=random_seed,
    )
    pairs = skipgram_pairs(walks, window_size)

    # Deterministic negative draws: replica r of pair i picks the node at
    # dense position hash(seed, center, context, r) mod n.
    nodes = graph.node_ids().select(F.col("node_id").alias("node"))
    n = nodes.count()
    # The draw only needs a deterministic bijection node ↔ [0, n) — NOT the
    # lexicographic rank — so reuse the bucketed dense-id map instead of a
    # row_number() over a partition-less window (single-task at O(V)).
    from graph_data_science_spark.graph.ids import dense_ids

    idx = dense_ids(nodes, ["node"]).select("node", F.col("node_id").alias("pos"))
    reps = spark.range(negative_samples).select(F.col("id").alias("_r"))
    # each positive OCCURRENCE draws its own negatives — (walk_id, s1, s2)
    # distinguishes repeats of the same pair, so the negative distribution
    # stays uniform instead of collapsing onto per-pair constants.
    negs = (
        pairs.crossJoin(reps)
        .select(
            "center",
            F.pmod(
                F.xxhash64(
                    F.lit(int(random_seed) + 1),
                    F.col("center"),
                    F.col("walk_id"),
                    F.col("s1"),
                    F.col("s2"),
                    F.col("_r"),
                ),
                F.lit(n),
            ).alias("pos"),
        )
        .join(idx, "pos")
        .filter(F.col("node") != F.col("center"))
        .select("center", F.col("node").alias("context"), F.lit(0.0).alias("label"))
    )
    samples = materialize_roundtrip(
        pairs.select("center", "context", F.lit(1.0).alias("label")).union(negs),
        tag="n2v_samples",
    )
    n_pairs = samples.count()

    scale = 0.5 / embedding_dim
    center = materialize_roundtrip(
        nodes.select(
            "node", _init_embedding(F.col("node"), embedding_dim, random_seed + 2, scale).alias("emb")
        ),
        tag="n2v_c",
        keep_last=2,
    )
    context = materialize_roundtrip(
        nodes.select(
            "node", _init_embedding(F.col("node"), embedding_dim, random_seed + 3, scale).alias("emb")
        ),
        tag="n2v_u",
        keep_last=2,
    )

    it = 0
    for it in range(1, iterations + 1):
        # 1/t learning-rate decay: full-batch GD with a constant rate
        # oscillates around the optimum; decay converges it (the
        # reference's SGD linearly anneals its rate too,
        # Node2VecModel.java progress-based learningRateAlpha).
        lr_t = float(learning_rate) / (1.0 + 0.15 * (it - 1))
        scored = (
            samples.join(
                center.select(F.col("node").alias("center"), F.col("emb").alias("c")), "center"
            )
            .join(
                context.select(F.col("node").alias("context"), F.col("emb").alias("u")), "context"
            )
            .withColumn("sig", 1.0 / (1.0 + F.exp(-_dot(F.col("c"), F.col("u")))))
            .withColumn("coef", F.col("label") - F.col("sig"))
        )
        # grad wrt center c: Σ coef · u ; wrt context u: Σ coef · c —
        # elementwise array sums via explode-free aggregate over zip_with:
        # aggregate per lane using posexplode keeps the shuffle narrow.
        gc = (
            scored.select("center", F.posexplode(F.col("u")).alias("i", "v"), F.col("coef"))
            .groupBy("center", "i")
            .agg(F.sum(F.col("v") * F.col("coef")).alias("g"))
            .groupBy("center")
            .agg(F.array_sort(F.collect_list(F.struct("i", "g"))).alias("gs"))
            .select("center", F.transform(F.col("gs"), lambda s: s["g"]).alias("grad"))
        )
        gu = (
            scored.select("context", F.posexplode(F.col("c")).alias("i", "v"), F.col("coef"))
            .groupBy("context", "i")
            .agg(F.sum(F.col("v") * F.col("coef")).alias("g"))
            .groupBy("context")
            .agg(F.array_sort(F.collect_list(F.struct("i", "g"))).alias("gs"))
            .select("context", F.transform(F.col("gs"), lambda s: s["g"]).alias("grad"))
        )
        lr = F.lit(lr_t)
        center = materialize_roundtrip(
            center.join(gc, center["node"] == gc["center"], "left")
            .select(
                "node",
                F.when(
                    F.col("grad").isNotNull(),
                    F.zip_with(F.col("emb"), F.col("grad"), lambda e, g: e + lr * g),
                )
                .otherwise(F.col("emb"))
                .alias("emb"),
            ),
            tag="n2v_c",
            keep_last=2,
        )
        context = materialize_roundtrip(
            context.join(gu, context["node"] == gu["context"], "left")
            .select(
                "node",
                F.when(
                    F.col("grad").isNotNull(),
                    F.zip_with(F.col("emb"), F.col("grad"), lambda e, g: e + lr * g),
                )
                .otherwise(F.col("emb"))
                .alias("emb"),
            ),
            tag="n2v_u",
            keep_last=2,
        )

    out = materialize_roundtrip(
        center.select(F.col("node").alias("node_id"), F.col("emb").alias("embedding")),
        tag="n2v_out",
    )
    roundtrip_release(_mark, keep=[out])
    return Node2VecResult(embeddings=out, ran_iterations=it, n_pairs=n_pairs)
