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

from graph_data_science_spark.functions import combined_similarity, knn_similarity
from graph_data_science_spark.graph.ids import dense_ids
from graph_data_science_spark.pregel.superstep import materialize_roundtrip


@dataclass
class KnnResult:
    neighbors: DataFrame  # (node1 long, node2 long, similarity double, rank int)
    ran_iterations: int
    did_converge: bool
    # Populated only when track_filtered is given: per-source top-k over the
    # target-filtered candidate stream (FilteredKnn's TargetNodeFiltering).
    filtered_neighbors: DataFrame | None = None


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
    track_filtered: tuple | None = None,
    metric: str = "cosine",
    properties: list | None = None,
) -> KnnResult:
    """``explore``: fresh seeded-random candidate partners per node per
    iteration (the reference's randomJoins/sampling analog,
    Knn.java) — escapes the local optima a pure neighbor-of-neighbor
    closure can plateau at; 0 keeps the classic closure only.
    ``min_iterations``: don't declare convergence before this many rounds —
    with exploration on, a single quiet round only means THIS round's
    random draws found nothing, not that the search is exhausted.

    ``track_filtered``: optional ``(source_ids, target_ids, seed_pairs)``
    — id frames (col ``node_id``) + optional pre-scored (a, b) seed pairs.
    Every candidate pair SCORED during the descent whose source/target
    pass the filters also feeds a separate per-source filtered top-k
    (the reference's TargetNodeFiltering side-channel,
    ``similarity/filteredknn/ExistingTargetNodeFiltering.java``); the
    accumulated lists come back as ``filtered_neighbors``.

    ``metric``: similarity over ``vec_col`` — ``"cosine"`` (raw cosine,
    zero-norm → 0; this engine's historical default — ranking-identical to
    the reference's (cos+1)/2 since the map is monotone), or any
    reference-exact KNN metric from :mod:`graph_data_science_spark.functions`:
    ``"gds-cosine"`` ((cos+1)/2, ``metrics/Cosine.java:28-39``),
    ``"euclidean"`` (1/(1+dist), ``Euclidean.java:28-40``), ``"pearson"``
    ((r+1)/2, ``Pearson.java:26-44``), ``"jaccard"``/``"overlap"``
    (id arrays), ``"absdiff"`` (scalar, 1/(1+|Δ|)).

    ``properties``: list of ``(column, metric)`` for multi-property KNN —
    the mean of the per-property safe similarities
    (``metrics/CombinedSimilarityComputer.java:40-46``). Overrides
    ``vec_col``/``metric``."""
    props = properties if properties is not None else [(vec_col, metric)]

    def _cast_for(m: str) -> str:
        if m in ("jaccard", "overlap"):
            return "array<long>"
        if m == "absdiff":
            return "double"
        return "array<double>"

    df = nodes.select(
        F.col(id_col).cast("long").alias("node_id"),
        *[F.col(c).cast(_cast_for(m)).alias(f"p{i}") for i, (c, m) in enumerate(props)],
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

    va = df.select(
        F.col("node_id").alias("a"), *[F.col(f"p{i}").alias(f"pa{i}") for i in range(len(props))]
    )
    vb = df.select(
        F.col("node_id").alias("b"), *[F.col(f"p{i}").alias(f"pb{i}") for i in range(len(props))]
    )

    def _sim_expr():
        terms = [
            (F.col(f"pa{i}"), F.col(f"pb{i}"), "cosine" if m == "gds-cosine" else m)
            for i, (_, m) in enumerate(props)
        ]
        if len(terms) == 1 and props[0][1] == "cosine":
            return _cosine(terms[0][0], terms[0][1])
        if len(terms) == 1:
            return knn_similarity(*terms[0])
        return combined_similarity(terms)

    def score(pairs: DataFrame) -> DataFrame:
        return (
            pairs.join(va, "a").join(vb, "b")
            .select("a", "b", _sim_expr().alias("similarity"))
        )

    def rankk(scored: DataFrame) -> DataFrame:
        w = Window.partitionBy("a").orderBy(F.desc("similarity"), F.asc("b"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("a", "b", "similarity", "rank")
        )

    def topk(pairs: DataFrame) -> DataFrame:
        return rankk(score(pairs))

    acc = None
    if track_filtered is not None:
        f_src, f_tgt, seed_pairs = track_filtered
        f_src = f_src.select(F.col(f_src.columns[0]).cast("long").alias("a"))
        f_tgt = f_tgt.select(F.col(f_tgt.columns[0]).cast("long").alias("b"))

        def facc(scored: DataFrame, prev: DataFrame | None) -> DataFrame:
            # The explicit select matters: a USING semi join moves its key
            # column FIRST, so after the join on "b" the frame reads
            # (b, a, similarity) — and union is positional.
            flt = (
                scored.join(f_src, "a", "semi")
                .join(f_tgt, "b", "semi")
                .select("a", "b", "similarity")
            )
            if prev is not None:
                flt = prev.select("a", "b", "similarity").union(flt)
            dedup = flt.groupBy("a", "b").agg(F.max("similarity").alias("similarity"))
            return rankk(dedup)

        if seed_pairs is not None:
            acc = materialize_roundtrip(
                facc(score(seed_pairs.select("a", "b")), None), tag="knnf", keep_last=2
            )

    # Round-trip per round: the candidate generation references `cur` three
    # times (forward, reverse, wedge join) — see
    # pregel.superstep.materialize_roundtrip for why plain persist unrolls
    # the analyzer tree exponentially across rounds.
    if track_filtered is not None:
        init_sc = materialize_roundtrip(score(init), tag="knns", keep_last=1)
        cur = materialize_roundtrip(rankk(init_sc), tag="knn", keep_last=2)
        acc = materialize_roundtrip(facc(init_sc, acc), tag="knnf", keep_last=2)
    else:
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
        if track_filtered is not None:
            sc = materialize_roundtrip(score(cand), tag="knns", keep_last=1)
            new = materialize_roundtrip(rankk(sc), tag="knn", keep_last=2)
            acc = materialize_roundtrip(facc(sc, acc), tag="knnf", keep_last=2)
        else:
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
        filtered_neighbors=(
            None
            if acc is None
            else acc.select(
                F.col("a").alias("node1"), F.col("b").alias("node2"), "similarity", "rank"
            )
        ),
    )


@dataclass
class FilteredKnnResult:
    neighbors: DataFrame  # (node1, node2, similarity, rank) — filtered
    ran_iterations: int
    did_converge: bool
    seeded_optimally: bool


def filtered_knn(
    nodes: DataFrame,
    k: int = 5,
    id_col: str = "node_id",
    vec_col: str = "embedding",
    source_filter=None,
    target_filter=None,
    similarity_cutoff: float = 0.0,
    seeding: bool = False,
    **knn_kwargs,
) -> FilteredKnnResult:
    """Filtered KNN (reference ``similarity/filteredknn/FilteredKnn.java:48``):
    ordinary NN-descent KNN, but the result only contains pairs whose
    source passes ``source_filter`` and whose neighbor passes
    ``target_filter`` (Column predicates over the node frame; None = all).

    Mirrors the reference's two paths:

    - ``seeding=True`` and ``|targets| <= k``: seeding alone provably
      fills every filtered list (``seededOptimally``,
      ``FilteredKnn.compute()``) — the descent is skipped entirely and the
      result is the EXACT scoring of sources x targets (a broadcast cross
      join; |targets| <= k makes the target side tiny by definition).
    - otherwise: run the full NN-descent and accumulate every scored
      candidate that passes the filters into per-source top-k lists
      (``TargetNodeFiltering``); with ``seeding``, each source's list is
      pre-seeded with k deterministic pseudo-random targets
      (``createWithDefaultSeeding``).

    ``similarity_cutoff``: drop result pairs below it
    (``FilteredKnnBaseConfig.similarityCutoff``).
    """
    base = nodes.select(
        F.col(id_col).cast("long").alias("node_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    src_ids = (base if source_filter is None else base.filter(source_filter)).select("node_id")
    tgt = base if target_filter is None else base.filter(target_filter)
    tgt_ids = tgt.select("node_id")

    if seeding:
        n_targets = tgt_ids.count()
        if n_targets <= k:
            # seededOptimally: exact by construction.
            sv = base.join(src_ids, "node_id", "semi").select(
                F.col("node_id").alias("node1"), F.col("vec").alias("va")
            )
            tv = tgt.select(F.col("node_id").alias("node2"), F.col("vec").alias("vb"))
            scored = (
                sv.crossJoin(F.broadcast(tv))
                .filter(F.col("node1") != F.col("node2"))
                .select("node1", "node2", _cosine(F.col("va"), F.col("vb")).alias("similarity"))
            )
            w = Window.partitionBy("node1").orderBy(F.desc("similarity"), F.asc("node2"))
            out = (
                scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("node1", "node2", "similarity", "rank")
            )
            if similarity_cutoff > 0:  # Knn.java:174 — only applied when > 0
                out = out.filter(F.col("similarity") >= similarity_cutoff)
            return FilteredKnnResult(out, 0, True, True)

    seed_pairs = None
    if seeding:
        # k deterministic pseudo-random target partners per source, the
        # seeded analog of the reference's uniform target seeding.
        from graph_data_science_spark.graph.ids import dense_ids as _dense

        seed = int(knn_kwargs.get("random_seed", 42))
        tidx = _dense(tgt_ids.withColumnRenamed("node_id", "orig"), ["orig"]).select(
            F.col("node_id").alias("pos"), "orig"
        )
        n_targets = tgt_ids.count()
        reps = nodes.sparkSession.range(k).select(F.col("id").alias("_r"))
        seed_pairs = (
            src_ids.crossJoin(reps)
            .select(
                F.col("node_id").alias("a"),
                F.pmod(
                    F.xxhash64(F.lit(seed + 13), F.col("node_id"), F.col("_r")),
                    F.lit(n_targets),
                ).alias("pos"),
            )
            .join(tidx, "pos")
            .filter(F.col("orig") != F.col("a"))
            .select("a", F.col("orig").alias("b"))
            .distinct()
        )

    res = knn(
        base,
        k=k,
        id_col="node_id",
        vec_col="vec",
        track_filtered=(src_ids, tgt_ids, seed_pairs),
        **knn_kwargs,
    )
    out = res.filtered_neighbors
    if similarity_cutoff > 0:  # Knn.java:174 — only applied when > 0
        out = out.filter(F.col("similarity") >= similarity_cutoff)
    return FilteredKnnResult(out, res.ran_iterations, res.did_converge, False)
