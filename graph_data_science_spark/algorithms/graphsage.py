"""GraphSage embedding generation (mean aggregator) — inference AND training.

Reference:
- ``algo/.../embeddings/graphsage/MeanAggregator.java`` —
  ``h_v^k = σ(W_k · MEAN({h_v^{k−1}} ∪ {h_u^{k−1} : u ∈ N(v)}))`` (self
  included in the mean), final ``NormalizeRows`` (L2) —
  ``GraphSageHelper.java:embeddingsComputationGraph``.
- ``GraphSageHelper.subGraphsPerLayer`` — per-layer neighbor sampling of
  ``sampleSize`` neighbors.
- ``GraphSageEmbeddingsGenerator.java`` — applies trained layers to all
  nodes (the *inference* path).
- ``GraphSageModelTrainer.java:62`` + ``GraphSageLoss.java:35`` +
  ``BatchSampler.java:51`` — unsupervised training: per batch node u, one
  positive p (endpoint of a random walk of depth uniform in
  [1, searchDepth]) and one negative n (degree^0.75-weighted draw), loss
  ``mean_u[ −log σ(z_u·z_p) − Q·log σ(−z_u·z_n) ]`` with
  Q = negativeSampleWeight, optimized with Adam.

Spark execution (all joins/aggregates, zero UDFs):
- sampling: deterministic top-``sample_size`` neighbors by
  ``xxhash64(src, dst, seed, layer)`` rank (the reference uses a seeded
  ``NeighborhoodSampler``; a distributed engine needs the stable draw);
- mean: self-unioned neighbor rows → ``posexplode`` features → one
  (node, dim) hash aggregate;
- ``W·x``: the weight matrix as a broadcast (i, j, w) frame —
  explode-join-aggregate, linear in nnz(W), never a per-row Python loop;
- activation relu/sigmoid via ``transform``; final L2 row normalize.

TRAINING (``graphsage_train``) is the deterministic synchronous-batch
variant of the reference trainer: every Adam step is full-batch (all
nodes), samples draw from portable seeded hashes, and the backward pass
is the mirror of the forward — δW via an outer-product explode-aggregate,
the mean-pool gradient a REVERSE-edge SpMV (the transpose of the forward
gather), the weight matrices (dim² scalars) updated driver-side with
Adam. The reference's concurrent mini-batch schedule is thread-order
dependent (its own runs are documented non-reproducible); synchronous
full-batch GD over the same loss is the distributed-reproducible
re-expression, same deviation family as Node2Vec (``node2vec.py``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.graph.ranks import ordered_cumsum


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


# --------------------------------------------------------------------------
# Training (GraphSageModelTrainer analog)
# --------------------------------------------------------------------------


@dataclass
class GraphSageTrainResult:
    weights: list  # list[list[list[float]]] — one (out × in) matrix per layer
    embeddings: DataFrame  # final-model embeddings for all nodes
    losses: list  # per-step mean loss (GraphSageLoss.apply analog)
    ran_steps: int
    did_converge: bool


def _matvec_lit(col, W: list) -> F.Column:
    """W·x with W a Python (out × in) matrix literal — one zip_with dot
    product per output dim, whole-stage-codegen friendly."""
    return F.array(
        *[
            F.aggregate(
                F.zip_with(
                    col,
                    F.array(*[F.lit(float(x)) for x in row]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda s, v: s + v,
            )
            for row in W
        ]
    )


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _sum_arrays(df: DataFrame, key: str, col: str, dim: int, out: str) -> DataFrame:
    """Elementwise array-sum aggregate (dim is small and known)."""
    return df.groupBy(key).agg(
        F.array(*[F.sum(F.col(col)[i]) for i in range(dim)]).alias(out)
    )


def _transpose(W: list) -> list:
    return [[W[i][j] for i in range(len(W))] for j in range(len(W[0]))]


def _xavier_weights(rng, n_out: int, n_in: int) -> list:
    bound = (6.0 / (n_in + n_out)) ** 0.5
    return [[rng.uniform(-bound, bound) for _ in range(n_in)] for _ in range(n_out)]


def _portable_hash64(*cols) -> F.Column:
    """md5-based 60-bit draw, identical in any engine (and in
    ``hashlib``): int(md5(':'-joined decimal strings)[:15], 16)."""
    payload = F.concat_ws(":", *[c.cast("string") for c in cols])
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def _sampled_layer_edges(
    edges: DataFrame, sample_size, seed: int, layer: int, rng: str = "xxhash"
) -> DataFrame:
    e = edges.select("src", "dst")
    if sample_size is None:
        return e
    h = (
        _portable_hash64(F.col("src"), F.col("dst"), F.lit(int(seed)), F.lit(int(layer)))
        if rng == "portable"
        else F.xxhash64("src", "dst", F.lit(int(seed)), F.lit(int(layer)))
    )
    w = Window.partitionBy("src").orderBy(h)
    return e.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= int(sample_size)
    ).drop("_r")


def graphsage_train(
    graph: LinkGraph,
    features: DataFrame,
    embedding_dim: int = 16,
    sample_sizes: list | None = None,
    activation: str = "sigmoid",
    epochs: int = 10,
    learning_rate: float = 0.1,
    tolerance: float = 1e-4,
    search_depth: int = 5,
    negative_sample_weight: int = 20,
    penalty_l2: float = 0.0,
    random_seed: int = 42,
    feature_dim: int | None = None,
    rng: str = "xxhash",
) -> GraphSageTrainResult:
    """Unsupervised GraphSage training (reference
    ``GraphSageModelTrainer.java:62``; loss ``GraphSageLoss.java:35``;
    sampling ``BatchSampler.java:51``; defaults from
    ``GraphSageTrainConfig.java``: sigmoid, sampleSizes [25, 10],
    lr 0.1, tolerance 1e-4, searchDepth 5, negativeSampleWeight 20).

    Per Adam step (``epochs`` steps, early stop when |Δloss| < tolerance):

    1. positives: per node u, the endpoint of a seeded random walk of
       depth uniform in [1, search_depth] (hash-ranked neighbor draw per
       step — ``BatchSampler.neighborBatch``; a stuck node keeps its
       current position, like the reference's degree-0 termination);
    2. negatives: one node per u, drawn ∝ degree^0.75
       (``DEGREE_SMOOTHING_FACTOR``) via a deterministic inverse-CDF
       bucket join over the cumulative weight table — exact distribution,
       one equi-join, no range scan;
    3. forward pass for ALL nodes, keeping each layer's pooled mean m_k
       and pre-activation (needed by backprop);
    4. backward: δz from the pair losses; through the L2 row-normalize
       (δa = (δz − z(z·δz))/‖a‖); per layer, δW_k = Σ_u δpre_k(u)⊗m_k(u)
       (outer-product explode + one hash aggregate) and the mean-pool
       gradient flows to layer k−1 as a REVERSE-edge SpMV (self term +
       transpose gather), the exact mirror of the forward pool;
    5. Adam update of the (small, driver-held) weight matrices; the next
       step's plan reads only (features, edges, new W literals) — no
       cross-step lineage growth, nothing to checkpoint.

    Deviation from the reference, stated: synchronous full-batch steps
    instead of concurrent mini-batches (see module docstring).

    ``rng``: 'xxhash' (default, cheapest JVM hash) or 'portable'
    (md5-based draws reproducible in plain ``hashlib`` — used by the
    ``graphsage_train_replay`` oracle row, whose goldens come from the
    independent NumPy reimplementation in ``tools/graphsage_replay.py``).
    """
    import numpy as np

    import random as _random

    if activation not in ("relu", "sigmoid"):
        raise ValueError("activation must be 'relu' or 'sigmoid'")
    if sample_sizes is None:
        sample_sizes = [25, 10]
    n_layers = len(sample_sizes)
    spark = graph.edges.sparkSession
    seed = int(random_seed)
    Q = float(negative_sample_weight)

    # feature_dim=None probes the first row (one extra tiny job); callers
    # that know the width pass it, mirroring datapipe/ann.py's explicit dim
    feat_dim = (
        int(feature_dim)
        if feature_dim is not None
        else len(
            features.select(F.col("features").cast("array<double>").alias("f")).first()["f"]
        )
    )
    h0 = features.select(
        F.col("node_id").cast("long").alias("node_id"),
        F.col("features").cast("array<double>").alias("emb"),
    ).persist()
    n_nodes = h0.count()

    edges = graph.edges.select("src", "dst").persist()
    edges.count()

    # degree^0.75 inverse-CDF table for negative sampling: node v covers
    # [cum_lo, cum_hi) of the total weight mass; a draw r ∈ [0, total)
    # lands in exactly one interval. Equi-joinable form: intervals are
    # exploded to the integer buckets they overlap (bucket width =
    # total / n_buckets, expected ~2 rows per node), draws bucketize to
    # the same grid — bucket equi-join + containment filter, exact.
    deg = edges.groupBy(F.col("src").alias("node_id")).agg(F.count("*").alias("deg"))
    wtab = (
        h0.select("node_id")
        .join(deg, "node_id", "left")
        .select("node_id", F.pow(F.coalesce(F.col("deg"), F.lit(0)).cast("double"), F.lit(0.75)).alias("w"))
    )
    total_w = wtab.agg(F.sum("w").alias("t")).collect()[0]["t"]
    if not total_w:
        raise ValueError("graphsage_train: graph has no edges — no positive pairs to learn from")
    n_buckets = max(64, min(int(n_nodes), 65536))
    bucket_w = float(total_w) / n_buckets
    # two-level order-preserving cumsum (graph/ranks.py): per-bucket
    # running sums + driver prefix of bucket totals — not a partition-less
    # window, which would single-task O(V) rows every training call
    cum = (
        ordered_cumsum(wtab, ["node_id"], "w", cum_col="cum_hi", n_buckets=None, n_rows=n_nodes)
        .withColumn("cum_lo", F.col("cum_hi") - F.col("w"))
        .filter(F.col("w") > 0)
    )
    neg_table = cum.select(
        "node_id", "cum_lo", "cum_hi",
        F.explode(
            F.sequence(
                F.floor(F.col("cum_lo") / F.lit(bucket_w)).cast("long"),
                F.least(
                    F.floor(F.col("cum_hi") / F.lit(bucket_w)).cast("long"),
                    F.lit(int(n_buckets) - 1),
                ),
            )
        ).alias("bucket"),
    ).persist()
    neg_table.count()

    init_rng = _random.Random(seed)  # NOT `rng` — that's the hash-mode param
    dims = [feat_dim] + [int(embedding_dim)] * n_layers
    weights = [_xavier_weights(init_rng, dims[k + 1], dims[k]) for k in range(n_layers)]

    # Adam state per layer (driver-side; matrices are dim² scalars).
    adam_m = [np.zeros((dims[k + 1], dims[k])) for k in range(n_layers)]
    adam_v = [np.zeros((dims[k + 1], dims[k])) for k in range(n_layers)]
    beta1, beta2, eps = 0.9, 0.999, 1e-8

    act = (
        (lambda c: F.greatest(c, F.lit(0.0)))
        if activation == "relu"
        else (lambda c: F.lit(1.0) / (F.lit(1.0) + F.exp(-c)))
    )

    layer_edges = [
        _sampled_layer_edges(edges, sample_sizes[k], seed, k, rng=rng).persist()
        for k in range(n_layers)
    ]
    pool_cnt = [
        le.groupBy(F.col("src").alias("node_id")).agg((F.count("*") + 1).alias("cnt"))
        for le in layer_edges
    ]

    losses: list = []
    did_converge = False
    final_z = None
    step = 0
    for step in range(1, int(epochs) + 1):
        # ---- sample positives: seeded random walk, per-u depth ---------
        if rng == "portable":
            depth_h = _portable_hash64(F.col("node_id"), F.lit(seed), F.lit(step), F.lit("d"))
        else:
            depth_h = F.xxhash64("node_id", F.lit(seed), F.lit(step), F.lit("d"))
        depth_u = h0.select(
            "node_id",
            (F.pmod(depth_h, F.lit(search_depth)) + 1).alias("_depth"),
        )
        cur = depth_u.select("node_id", F.col("node_id").alias("cur"), "_depth")
        for walk_step in range(1, int(search_depth) + 1):
            if rng == "portable":
                walk_h = _portable_hash64(
                    F.col("node_id"), F.col("dst"), F.lit(seed), F.lit(step), F.lit(walk_step)
                )
            else:
                walk_h = F.xxhash64("node_id", "dst", F.lit(seed), F.lit(step), F.lit(walk_step))
            w_draw = Window.partitionBy("node_id").orderBy(walk_h)
            nxt = (
                cur.filter(F.col("_depth") >= walk_step)
                .join(edges.select(F.col("src").alias("cur"), "dst"), "cur")
                .withColumn("_r", F.row_number().over(w_draw))
                .filter(F.col("_r") == 1)
                .select("node_id", F.col("dst").alias("_next"))
            )
            cur = (
                cur.join(nxt, "node_id", "left")
                .select(
                    "node_id",
                    F.coalesce(
                        F.when(F.col("_depth") >= walk_step, F.col("_next")), F.col("cur")
                    ).alias("cur"),
                    "_depth",
                )
            )
        positives = cur.select("node_id", F.col("cur").alias("pos"))

        # ---- sample negatives: degree^0.75 inverse-CDF equi-join -------
        if rng == "portable":
            neg_u = _portable_hash64(
                F.col("node_id"), F.lit(seed), F.lit(step), F.lit("n")
            ) / F.lit(float(16**15))
        else:
            neg_u = F.pmod(
                F.xxhash64("node_id", F.lit(seed), F.lit(step), F.lit("n")), F.lit(1 << 40)
            ) / F.lit(float(1 << 40))
        draws = h0.select(
            "node_id",
            (neg_u * F.lit(float(total_w))).alias("r"),
        ).withColumn("bucket", F.least(F.floor(F.col("r") / F.lit(bucket_w)).cast("long"), F.lit(int(n_buckets) - 1)))
        negatives = (
            draws.alias("d")
            .join(neg_table.alias("t"), "bucket")
            .filter((F.col("d.r") >= F.col("t.cum_lo")) & (F.col("d.r") < F.col("t.cum_hi")))
            .select(F.col("d.node_id").alias("node_id"), F.col("t.node_id").alias("neg"))
        )

        # ---- forward (keep per-layer intermediates) ---------------------
        h = h0
        inter = []  # (m_k frame, pre/act frame) per layer
        for k in range(n_layers):
            dim_in, dim_out = dims[k], dims[k + 1]
            nbr = layer_edges[k].join(
                h.select(F.col("node_id").alias("dst"), F.col("emb").alias("nemb")), "dst"
            ).select(F.col("src").alias("node_id"), F.col("nemb").alias("emb"))
            pool = h.select("node_id", "emb").unionByName(nbr)
            m = (
                pool.select("node_id", F.posexplode("emb").alias("j", "v"))
                .groupBy("node_id", "j")
                .agg(F.avg("v").alias("v"))
            )
            m = _assemble(m, "node_id", "j", "v", "m").persist()
            pre = m.select("node_id", "m", _matvec_lit(F.col("m"), weights[k]).alias("pre"))
            hk = pre.select(
                "node_id", "m", "pre", F.transform("pre", act).alias("emb")
            ).persist()
            inter.append(hk)
            h = hk.select("node_id", "emb")

        out_dim = dims[-1]
        a_norm = F.sqrt(_dot(F.col("emb"), F.col("emb")))
        z = inter[-1].select(
            "node_id",
            F.col("emb").alias("a"),
            a_norm.alias("r_norm"),
            F.when(a_norm > 0, F.transform("emb", lambda v: v / a_norm))
            .otherwise(F.col("emb"))
            .alias("z"),
        ).persist()

        # ---- loss + δz ---------------------------------------------------
        pairs = positives.select("node_id", F.col("pos").alias("other"), F.lit(True).alias("is_pos")).unionByName(
            negatives.select("node_id", F.col("neg").alias("other"), F.lit(False).alias("is_pos"))
        )
        scored = (
            pairs.join(z.select(F.col("node_id"), F.col("z").alias("zu")), "node_id")
            .join(z.select(F.col("node_id").alias("other"), F.col("z").alias("zv")), "other")
            .withColumn("s", _dot(F.col("zu"), F.col("zv")))
            .withColumn(
                "coeff",
                F.when(F.col("is_pos"), -F.lit(1.0) / (F.lit(1.0) + F.exp(F.col("s"))))
                .otherwise(F.lit(Q) / (F.lit(1.0) + F.exp(-F.col("s"))))
                / F.lit(float(n_nodes)),
            )
            .withColumn(
                "pair_loss",
                F.when(F.col("is_pos"), -F.log(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s")))))
                .otherwise(-F.lit(Q) * F.log(F.lit(1.0) / (F.lit(1.0) + F.exp(F.col("s"))))),
            )
            .persist()
        )
        loss = (scored.agg(F.sum("pair_loss").alias("l")).collect()[0]["l"] or 0.0) / n_nodes
        losses.append(float(loss))

        dz_contrib = scored.select(
            "node_id", F.transform("zv", lambda v: v * F.col("coeff")).alias("g")
        ).unionByName(
            scored.select(
                F.col("other").alias("node_id"),
                F.transform("zu", lambda v: v * F.col("coeff")).alias("g"),
            )
        )
        dz = _sum_arrays(dz_contrib, "node_id", "g", out_dim, "dz")

        # ---- backward ----------------------------------------------------
        # through L2 normalize: δa = (δz − z(z·δz)) / r  (0 when r = 0)
        dh = (
            dz.join(z, "node_id")
            .select(
                "node_id",
                F.when(
                    F.col("r_norm") > 0,
                    F.zip_with(
                        F.col("dz"),
                        F.transform("z", lambda v: v * _dot(F.col("z"), F.col("dz"))),
                        lambda g, c: (g - c) / F.col("r_norm"),
                    ),
                )
                .otherwise(F.transform("dz", lambda v: v * F.lit(0.0)))
                .alias("dh"),
            )
        )

        grads = [None] * n_layers
        for k in range(n_layers - 1, -1, -1):
            dim_in, dim_out = dims[k], dims[k + 1]
            layer = inter[k]
            if activation == "relu":
                act_grad = F.zip_with(
                    F.col("dh"), F.col("pre"), lambda g, p: F.when(p > 0, g).otherwise(F.lit(0.0))
                )
            else:
                act_grad = F.zip_with(F.col("dh"), F.col("emb"), lambda g, hkv: g * hkv * (1.0 - hkv))
            dpre = (
                dh.join(layer.select("node_id", "m", "pre", "emb"), "node_id")
                .select("node_id", "m", act_grad.alias("dpre"))
                .persist()
            )
            # δW_k[i][j] = Σ_u dpre_i · m_j — outer product, one aggregate
            flat = dpre.select(
                F.posexplode(
                    F.flatten(
                        F.transform(
                            "dpre", lambda di: F.transform("m", lambda mj: di * mj)
                        )
                    )
                ).alias("idx", "v")
            )
            gsum = {r["idx"]: r["s"] for r in flat.groupBy("idx").agg(F.sum("v").alias("s")).collect()}
            grads[k] = np.array(
                [[gsum.get(i * dim_in + j, 0.0) for j in range(dim_in)] for i in range(dim_out)]
            )
            if k > 0:
                # δm = W^T δpre, then mean-pool backprop to layer k−1:
                # self term δm(u)/cnt(u) + reverse gather Σ_{u: v∈N(u)} δm(u)/cnt(u)
                dm = dpre.select(
                    "node_id", _matvec_lit(F.col("dpre"), _transpose(weights[k])).alias("dm")
                ).join(pool_cnt[k].select("node_id", "cnt"), "node_id", "left").select(
                    "node_id",
                    F.transform("dm", lambda v: v / F.coalesce(F.col("cnt"), F.lit(1)).cast("double")).alias("dmn"),
                )
                rev = layer_edges[k].join(
                    dm.select(F.col("node_id").alias("src"), F.col("dmn")), "src"
                ).select(F.col("dst").alias("node_id"), F.col("dmn").alias("g"))
                dh = _sum_arrays(
                    dm.select("node_id", F.col("dmn").alias("g")).unionByName(rev),
                    "node_id", "g", dims[k], "dh",
                )
            dpre.unpersist()

        # ---- Adam update (driver-side; dim² scalars per layer) ----------
        for k in range(n_layers):
            g = grads[k] + penalty_l2 * np.array(weights[k])
            adam_m[k] = beta1 * adam_m[k] + (1 - beta1) * g
            adam_v[k] = beta2 * adam_v[k] + (1 - beta2) * g * g
            mhat = adam_m[k] / (1 - beta1**step)
            vhat = adam_v[k] / (1 - beta2**step)
            weights[k] = (
                np.array(weights[k]) - learning_rate * mhat / (np.sqrt(vhat) + eps)
            ).tolist()

        final_z = z.select("node_id", F.col("z").alias("embedding"))
        for fr in inter:
            fr.unpersist()
        scored.unpersist()
        if len(losses) >= 2 and abs(losses[-1] - losses[-2]) < tolerance:
            did_converge = True
            break

    # final-model embeddings (weights moved after the last backward pass)
    result = graphsage(
        graph, features.select("node_id", "features"), weights,
        activation=activation, sample_size=None, seed=seed,
    )
    for le in layer_edges:
        le.unpersist()
    h0.unpersist()
    edges.unpersist()
    neg_table.unpersist()
    return GraphSageTrainResult(
        weights=weights,
        embeddings=result.embeddings,
        losses=losses,
        ran_steps=step,
        did_converge=did_converge,
    )
