"""K-Nearest Neighbors by node property — NN-descent
(reference ``algo/.../similarity/knn/Knn.java:39``).

GDS's NN-descent: start from random neighbor lists, then repeatedly join
each node's neighbors-of-neighbors (and reverse neighbors) as candidates,
keep the top-k by similarity, stop when the update rate falls below
``deltaThreshold`` (Knn.java loop; neighbor-join NeighborList semantics).
The result is approximate; quality grows per iteration.

Spark re-expression:
- init: k deterministic pseudo-random partners per node — partner r of
  node i is the node at position ``xxhash64(seed, i, r) mod n`` of the
  dense-id table (the seeded-uniform analog of the reference's
  SplittableRandom sampling, reproducible on any cluster);
- one NN-descent round = one self-join of the current (a, b) list on the
  shared endpoint (local join), one union with reversals, one distinct,
  one similarity scan, one top-k window — all Catalyst;
- convergence: changed-pair count rides the round as a join-count.

Similarity: cosine over ``array<double|float>`` (the reference's default
for float-array properties).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.graph.ids import dense_ids
from graph_data_science_spark.pregel.superstep import materialize_roundtrip


@dataclass
class KnnResult:
    neighbors: DataFrame  # (node1 long, node2 long, similarity double, rank int)
    ran_iterations: int
    did_converge: bool


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def knn(
    nodes: DataFrame,
    k: int = 5,
    id_col: str = "node_id",
    vec_col: str = "embedding",
    max_iterations: int = 10,
    delta_threshold: float = 0.001,
    random_seed: int = 42,
    explore: int = 0,
    min_iterations: int = 0,
) -> KnnResult:
    """``explore``: fresh seeded-random candidate partners per node per
    iteration (the reference's randomJoins/sampling analog,
    Knn.java) — escapes the local optima a pure neighbor-of-neighbor
    closure can plateau at; 0 keeps the classic closure only.
    ``min_iterations``: don't declare convergence before this many rounds —
    with exploration on, a single quiet round only means THIS round's
    random draws found nothing, not that the search is exhausted."""
    df = nodes.select(
        F.col(id_col).cast("long").alias("node_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).persist()
    n = df.count()
    spark = df.sparkSession

    # Dense positions for seeded-uniform partner sampling.
    idx = dense_ids(df.select("node_id").withColumnRenamed("node_id", "orig"), ["orig"]).select(
        F.col("node_id").alias("pos"), F.col("orig")
    ).persist()
    idx.count()

    reps = spark.range(k).select(F.col("id").alias("_r"))
    init = (
        df.select("node_id").crossJoin(reps)
        .select(
            "node_id",
            F.pmod(F.xxhash64(F.lit(int(random_seed)), F.col("node_id"), F.col("_r")), F.lit(n)).alias("pos"),
        )
        .join(idx, "pos")
        .filter(F.col("orig") != F.col("node_id"))
        .select(F.col("node_id").alias("a"), F.col("orig").alias("b"))
        .distinct()
    )

    va = df.select(F.col("node_id").alias("a"), F.col("vec").alias("va"))
    vb = df.select(F.col("node_id").alias("b"), F.col("vec").alias("vb"))

    def topk(pairs: DataFrame) -> DataFrame:
        scored = (
            pairs.join(va, "a").join(vb, "b")
            .select("a", "b", _cosine(F.col("va"), F.col("vb")).alias("similarity"))
        )
        w = Window.partitionBy("a").orderBy(F.desc("similarity"), F.asc("b"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("a", "b", "similarity", "rank")
        )

    # Round-trip per round: the candidate generation references `cur` three
    # times (forward, reverse, wedge join) — see
    # pregel.superstep.materialize_roundtrip for why plain persist unrolls
    # the analyzer tree exponentially across rounds.
    cur = materialize_roundtrip(topk(init), tag="knn", keep_last=2)
    converged = False
    it = 0
    for it in range(1, max_iterations + 1):
        nbr = cur.select("a", "b")
        rev = nbr.select(F.col("b").alias("a"), F.col("a").alias("b"))
        undirected = nbr.union(rev)
        # neighbors-of-neighbors through the shared endpoint (local join).
        non = (
            undirected.select(F.col("a").alias("x"), F.col("b").alias("via"))
            .join(undirected.select(F.col("a").alias("via"), F.col("b").alias("y")), "via")
            .filter(F.col("x") != F.col("y"))
            .select(F.col("x").alias("a"), F.col("y").alias("b"))
        )
        cand = nbr.union(rev.filter(F.col("a") != F.col("b"))).union(non)
        if explore > 0:
            fresh = (
                df.select("node_id").crossJoin(
                    spark.range(explore).select(F.col("id").alias("_x"))
                )
                .select(
                    F.col("node_id").alias("a"),
                    F.pmod(
                        F.xxhash64(F.lit(int(random_seed) + 7), F.col("node_id"), F.col("_x"), F.lit(it)),
                        F.lit(n),
                    ).alias("pos"),
                )
                .join(idx, "pos")
                .filter(F.col("orig") != F.col("a"))
                .select("a", F.col("orig").alias("b"))
            )
            cand = cand.union(fresh)
        cand = cand.distinct()
        new = materialize_roundtrip(topk(cand), tag="knn", keep_last=2)
        changed = (
            new.select("a", "b")
            .join(cur.select("a", "b"), ["a", "b"], "left_anti")
            .count()
        )
        cur = new
        if it >= min_iterations and changed <= delta_threshold * n * k:
            converged = True
            break

    df.unpersist()
    idx.unpersist()
    return KnnResult(
        neighbors=cur.select(F.col("a").alias("node1"), F.col("b").alias("node2"), "similarity", "rank"),
        ran_iterations=it,
        did_converge=converged,
    )
