"""Approximate-nearest-neighbor search over embedding columns.

- ``cosine_topk``: exact brute-force baseline. The query side is small and
  broadcast; the dot product is a JVM-side ``zip_with``/``aggregate``
  expression (whole-stage codegen, no Python), top-k via a per-query window.
  Cost: |queries| × |corpus| — the correctness oracle, not the scale path.
- ``lsh_cosine_topk``: random-hyperplane LSH. Deterministic signed
  projections (seeded NumPy planes evaluated as literal expressions) bucket
  the corpus; search touches only colliding buckets (multi-probe via
  Hamming-adjacent buckets optional). Cost: corpus scan + per-bucket
  brute force — the 100 TB path, where buckets are also the natural
  partitioning key so each ``applyInPandas`` group fits in memory.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query: (query_id, neighbor_id, rank, sim).

    Self-matches (same id) are excluded. Vectors are cast to double so the
    arithmetic is reproducible against a float64 SQL oracle.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    sim = (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("sim")
    scored = pairs.select("query_id", "neighbor_id", sim)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def hyperplane_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): sign pattern of seeded random hyperplane projections.
    Planes are driver-generated literals → pure JVM expression evaluation."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for p_i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(v, plane_col) >= 0, F.lit(1 << p_i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return df.select(F.col(id_col), v.alias(vec_col), bucket.alias("bucket"))


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: brute force restricted to same-bucket collisions.

    Recall < 1 by design; callers wanting guarantees use multi-probe or the
    exact path. Returns (query_id, neighbor_id, rank, sim).
    """
    dim = _dim_of(corpus, vec_col, dim)
    cb = hyperplane_buckets(corpus, dim, n_planes, seed, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket"
    )
    qb = hyperplane_buckets(queries, dim, n_planes, seed, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    pairs = cb.join(F.broadcast(qb), "bucket").filter(F.col("neighbor_id") != F.col("query_id"))
    sim = (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("sim")
    scored = pairs.select("query_id", "neighbor_id", sim)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, sim ≥ threshold) via
    hyperplane-LSH bucketing: candidate pairs collide in the signature
    bucket (near-identical directions almost always share every sign bit),
    verified with the exact cosine. Never all-pairs — the 100 TB shape for
    corpus-level near-dup removal over an embedding column."""
    b = hyperplane_buckets(corpus, _dim_of(corpus, vec_col, dim), n_planes, seed, id_col, vec_col)
    la = b.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "bucket")
    lb = b.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "bucket")
    pairs = la.join(lb, "bucket").filter(F.col("a") < F.col("b"))
    sim = (_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))).alias("sim")
    return pairs.select("a", "b", sim).filter(F.col("sim") >= threshold)


def _dim_of(df: DataFrame, vec_col: str, dim: int | None = None) -> int:
    """Embedding dimensionality. Spark array columns don't carry a length in
    the schema, so when the caller doesn't pass ``dim`` this falls back to
    reading one row — an extra job, and impossible on an empty corpus. Pass
    ``dim`` explicitly in pipelines (it is a property of the embedding
    model, known statically)."""
    if dim is not None:
        return int(dim)
    head = df.select(vec_col).head(1)
    if not head or head[0][0] is None:
        raise ValueError(
            f"cannot infer embedding dimension from an empty corpus; pass dim= explicitly"
        )
    return len(head[0][0])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: k-means-partitioned inverted file. Train
    centroids on the corpus (kmeans module), assign every vector to its
    nearest centroid, search each query only in the ``n_probe`` nearest
    cells — the classic scale path (cost ≈ corpus/n_clusters · n_probe per
    query instead of the full corpus). Returns (query_id, neighbor_id,
    rank, sim) like the exact path; recall < 1 by construction."""
    from graph_data_science_spark.algorithms.kmeans import kmeans

    km = kmeans(
        corpus, k=n_clusters, id_col=id_col, vec_col=vec_col, max_iterations=5, random_seed=seed
    )
    cells = km.assignments.select(F.col("node_id").alias(id_col), F.col("community").alias("cell"))
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    ).join(cells.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id")

    # Rank each query's distance to every centroid via ONE broadcast cross
    # join against a k-row centroid table (was: an n_clusters-way union of
    # per-centroid literal plans — fine at 16 cells, a 4k-branch plan at
    # IVF-4096), keep the n_probe nearest as probe cells.
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    cent_df = corpus.sparkSession.createDataFrame(
        [(j, [float(x) for x in c]) for j, c in enumerate(km.centroids)],
        "cell int, cvec array<double>",
    )
    d = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probes = qv.crossJoin(F.broadcast(cent_df)).select("query_id", "qv", "cell", d.alias("_d"))
    w = Window.partitionBy("query_id").orderBy(F.asc("_d"), F.asc("cell"))
    probed = (
        probes.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "qv", "cell")
    )

    pairs = cv.join(F.broadcast(probed), "cell").filter(F.col("neighbor_id") != F.col("query_id"))
    sim = (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias("sim")
    scored = pairs.select("query_id", "neighbor_id", sim)
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
