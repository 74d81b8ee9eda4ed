"""K-Means over an array node property (reference ``algo/.../kmeans/Kmeans.java:41``).

Lloyd's algorithm: assign each node to the nearest (Euclidean) centroid,
recompute centroids as cluster means, stop when fewer than
``delta_threshold · nodeCount`` nodes switch or ``max_iterations`` hit —
the same stopper as ``KmeansIterationStopper.java``. The reference samples
initial centroids uniformly/kmeans++ from a seeded SplittableRandom; a
shuffle engine needs cluster-size-independent determinism, so init picks
the k nodes with the smallest ``xxhash64(seed, node_id)`` (an unbiased
seeded sample with a total order any cluster reproduces; explicit
``seed_centroids`` overrides it, the ``seedCentroids`` config analog).

Spark shape: centroids are k·d doubles — driver-side literals. Assignment
is ONE scan with the distance argmin unrolled as a column expression
(whole-stage codegen, no shuffle); the recompute is one groupBy over k
groups. Per iteration: one shuffle, one tiny collect.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class KmeansResult:
    assignments: DataFrame  # (node_id long, community int, distance double)
    centroids: list  # list[list[float]]
    ran_iterations: int
    did_converge: bool


def _dist_sq(vec_col, centroid: list) -> F.Column:
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans(
    nodes: DataFrame,
    k: int = 4,
    id_col: str = "node_id",
    vec_col: str = "embedding",
    max_iterations: int = 10,
    delta_threshold: float = 0.05,
    random_seed: int = 42,
    seed_centroids: list | None = None,
) -> KmeansResult:
    df = nodes.select(
        F.col(id_col).cast("long").alias("node_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).persist()
    n = df.count()
    if k >= n:
        # Degenerate k >= n: every node is its own cluster. Communities must
        # be DENSE 0..n-1 indices aligned with the returned centroid list —
        # downstream consumers (ivf_topk) join community against
        # range(len(centroids)), so raw node ids would silently never match.
        from pyspark.sql import Window

        w = Window.orderBy("node_id")
        out = df.select(
            "node_id",
            (F.row_number().over(w) - 1).cast("int").alias("community"),
            F.lit(0.0).alias("distance"),
        )
        cents = [list(r["vec"]) for r in df.orderBy("node_id").collect()]
        df.unpersist()
        return KmeansResult(out, cents, 0, True)

    if seed_centroids is not None:
        centroids = [list(map(float, c)) for c in seed_centroids]
    else:
        rows = (
            df.select("vec", F.xxhash64(F.lit(int(random_seed)), F.col("node_id")).alias("_h"))
            .orderBy("_h")
            .limit(k)
            .collect()
        )
        centroids = [list(r["vec"]) for r in rows]

    assignments = None
    converged = False
    it = 0
    prev = None
    for it in range(1, max_iterations + 1):
        dists = [(j, _dist_sq(F.col("vec"), c)) for j, c in enumerate(centroids)]
        best = F.lit(0)
        best_d = dists[0][1]
        for j, dcol in dists[1:]:
            cond = dcol < best_d
            best = F.when(cond, F.lit(j)).otherwise(best)
            best_d = F.when(cond, dcol).otherwise(best_d)
        assignments = df.select(
            "node_id", "vec", best.cast("int").alias("community"), F.sqrt(best_d).alias("distance")
        ).persist()
        stats = (
            assignments.groupBy("community")
            .agg(
                F.count("*").alias("cnt"),
                *[F.sum(F.element_at("vec", i + 1)).alias(f"s{i}") for i in range(len(centroids[0]))],
            )
            .collect()
        )
        new_centroids = list(centroids)
        for r in stats:
            j = r["community"]
            new_centroids[j] = [r[f"s{i}"] / r["cnt"] for i in range(len(centroids[0]))]
        if prev is not None:
            moved = (
                assignments.select("node_id", "community")
                .join(prev.select("node_id", F.col("community").alias("_pc")), "node_id")
                .filter(F.col("community") != F.col("_pc"))
                .count()
            )
            if moved <= delta_threshold * n:
                converged = True
                centroids = new_centroids
                prev.unpersist()
                break
            prev.unpersist()
        prev = assignments
        centroids = new_centroids

    df.unpersist()
    return KmeansResult(
        assignments=assignments.select("node_id", "community", "distance"),
        centroids=centroids,
        ran_iterations=it,
        did_converge=converged,
    )
