"""FastRP node embeddings (reference ``algo/.../embeddings/fastrp/FastRP.java:55``).

Reference semantics (propertyRatio = 0 — topology-only, like the default):

- init (:232-268 InitRandomVectorTask): per node, a very sparse random
  vector with entries ``±(deg^normalizationStrength)·√3/√d`` each with
  probability 1/6, else 0 (SPARSITY = 3, ENTRY_PROBABILITY = 1/6), seeded
  per node id;
- per iteration i (:296-344 PropagateEmbeddingsTask): ``cur(v) =
  (1/deg(v)) Σ_{v→t} prev(t)·w``, and the *final* embedding accumulates
  the L2-normalized cur: ``emb(v) += iterationWeights[i] · cur(v)/‖cur(v)‖``
  — note prev for the NEXT iteration is the degree-averaged cur
  *without* the L2 normalization (the norm applies only to the
  contribution, FastRP.java:336-341);
- defaults: iterationWeights [0.0, 1.0, 1.0], normalizationStrength 0,
  nodeSelfInfluence 0 (FastRPBaseConfig.java).

Spark re-expression:

- the random init is a pure column expression — entry (node, i) derives
  from ``xxhash64(seed, node, i) mod 6`` (deterministic on any cluster, no
  RNG state to coordinate; the reference's per-node reseed serves the same
  goal);
- propagation pulls over *reversed* edges (cur(v) sums v's out-neighbors)
  with ``1/deg(v)`` folded into the cached edge weight, so each iteration
  is ONE Arrow/CSR array-SpMV (``spmv_messages_arrays`` — vector state is
  exactly what the SQL path can't express without a d× explode) + one
  column-level zip_with to fold into the accumulator;
- everything per-row-Python-free: the kernel is whole-batch NumPy, the
  fold is Catalyst higher-order functions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.pregel.spmv import build_blocks, spmv_messages_arrays
from graph_data_science_spark.pregel.superstep import free_checkpointed

SPARSITY = 3
ENTRY_PROBABILITY_DENOM = 6  # P(+v) = P(−v) = 1/6


@dataclass
class FastRPResult:
    embeddings: DataFrame  # (node_id long, embedding array<double>)
    ran_iterations: int


def fastrp(
    graph: LinkGraph,
    embedding_dimension: int = 64,
    iteration_weights: list[float] | None = None,
    normalization_strength: float = 0.0,
    node_self_influence: float = 0.0,
    weighted: bool = False,
    random_seed: int = 42,
    num_blocks: int | None = None,
    rng: str = "xxhash",
) -> FastRPResult:
    """``rng``: 'xxhash' (default — cheapest JVM hash, for production scale)
    or 'portable' (md5-based, bit-reproducible in any SQL engine — the
    dedup ``portable_hash`` contract — used by the DuckDB oracle)."""
    if iteration_weights is None:
        iteration_weights = [0.0, 1.0, 1.0]
    spark = graph.edges.sparkSession
    n = graph.with_node_count()
    d = int(embedding_dimension)

    # Out-degree (unweighted relationship count — graph.degree analog).
    out_deg = graph.edges.groupBy("src").agg(F.count("*").alias("deg"))

    # Reversed edges with 1/deg(receiver) (and the relationship weight when
    # weighted) folded in: message (t → v) carries prev(t) · w(v→t)/deg(v).
    e = graph.edges if weighted else graph.edges.select("src", "dst", F.lit(1.0).alias("weight"))
    rev = (
        e.join(out_deg, "src")
        .select(
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
            (F.col("weight") / F.col("deg")).alias("norm_w"),
        )
    )
    blocked = build_blocks(rev, n, num_blocks=num_blocks)

    # Sparse random init vectors, scaled by deg^normalizationStrength.
    nodes = graph.node_ids().select(F.col("node_id").alias("node"))
    deg_j = out_deg.select(F.col("src").alias("node"), "deg")
    base_val = (SPARSITY ** 0.5) / (d ** 0.5)
    scaling = F.when(
        F.coalesce(F.col("deg"), F.lit(0)) == 0, F.lit(1.0)
    ).otherwise(F.pow(F.col("deg").cast("double"), F.lit(float(normalization_strength))))
    if rng == "portable":
        # md5('<seed>:<node>:<i>') first 15 hex digits as int64, mod 6 —
        # identical in DuckDB: ('0x'||substr(md5(...),1,15))::BIGINT % 6.
        def bucket(i):
            payload = F.concat_ws(
                ":", F.lit(str(int(random_seed))), F.col("node").cast("string"), i.cast("string")
            )
            h = F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")
            return F.pmod(h, F.lit(ENTRY_PROBABILITY_DENOM))
    else:
        bucket = lambda i: F.pmod(  # noqa: E731
            F.xxhash64(F.lit(int(random_seed)), F.col("node"), i), F.lit(ENTRY_PROBABILITY_DENOM)
        )
    rand_vec = F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda i: F.when(bucket(i) == 0, F.col("_ev"))
        .when(bucket(i) == 1, -F.col("_ev"))
        .otherwise(F.lit(0.0)),
    )
    l2 = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))  # noqa: E731

    init = (
        nodes.join(deg_j, "node", "left")
        .withColumn("_ev", scaling * F.lit(base_val))
        .select("node", rand_vec.alias("prev"))
    )
    if node_self_influence != 0.0:
        safe = F.when(l2(F.col("prev")) < F.lit(1e-32), F.lit(1.0)).otherwise(l2(F.col("prev")))
        emb0 = F.transform(F.col("prev"), lambda x: x * F.lit(float(node_self_influence)) / safe)
    else:
        emb0 = F.transform(F.col("prev"), lambda x: x * F.lit(0.0))
    state = init.select("node", "prev", emb0.alias("emb")).localCheckpoint(eager=True)

    for it, w_i in enumerate(iteration_weights):
        msgs = spmv_messages_arrays(blocked, state.select("node", F.col("prev").alias("vec")))
        zero = F.expr(f"array_repeat(cast(0.0 as double), {d})")
        cur = F.coalesce(F.col("vec"), zero)
        inv_norm = F.when(l2(cur) > 0, F.lit(1.0) / l2(cur)).otherwise(F.lit(1.0))
        new_state = (
            state.join(msgs, state["node"] == msgs["dst"], "left")
            .select(
                "node",
                cur.alias("prev"),
                F.zip_with(
                    F.col("emb"), cur, lambda a, b: a + F.lit(float(w_i)) * inv_norm * b
                ).alias("emb"),
            )
        )
        prev_state = state
        state = new_state.localCheckpoint(eager=True)
        free_checkpointed(prev_state)

    blocked.unpersist()
    return FastRPResult(
        embeddings=state.select(F.col("node").alias("node_id"), F.col("emb").alias("embedding")),
        ran_iterations=len(iteration_weights),
    )
