"""HashGNN — hash-based binary message passing
(reference ``algo/.../embeddings/hashgnn/HashGNN.java:47``; per-draw kernel
``MinHashTask.java:119-166``, hash construction ``HashTask.java``).

Reference semantics per iteration, per draw k (``embeddingDensity`` draws):

- each node v takes the argmin of ``selfHash_k`` over its previous feature
  set (MinHashTask.java:133);
- every neighbor u contributes ONE feature — the argmin of ``preHash_k``
  over u's previous features — into v's neighbor vector (:137-155);
- the argmin of ``nbrAggHash_k`` over that neighbor vector competes with
  the self argmin; the NEIGHBOR wins only on strictly smaller hash
  (:158-159, self wins ties), and the winning feature is set in v's new
  embedding (:160-163);
- after ``iterations`` rounds the binary feature sets are the embedding
  (optional densification is a separate projection, out of scope here).
  ``neighborInfluence`` scales the neighbor hashes' win probability
  (HashTask.java scaledNeighborInfluence).

Spark re-expression: feature sets live EXPLODED as (node, feat) rows —
the natural shuffle-engine layout for set-valued state (bitsets are a
shared-memory optimization). One draw = three hash-argmin aggregations and
one edge join, all Catalyst ``min(struct(hash, feat))`` hash-aggregates;
one iteration = ``embeddingDensity`` draws unioned + distinct. Input
features default to the identity feature (feat = node id), the
deterministic stand-in for GenerateFeaturesTask's random sparse features.

Determinism: hashes are ``xxhash64`` (default) or the md5-derived portable
hash (``rng="portable"``) that replays bit-identically in ANSI SQL — the
latter makes every draw oracle-checkable in DuckDB.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.pregel.superstep import (
    materialize_roundtrip,
    roundtrip_mark,
    roundtrip_release,
)


@dataclass
class HashGNNResult:
    # (node_id long, features array<long>) — sorted set-bit indices of the
    # binary embedding (EmbeddingsToNodePropertyValues.fromBinary analog).
    embeddings: DataFrame
    ran_iterations: int


def _hash_col(rng: str, seed: int, role: str, iteration: int, draw: int, feat_col) -> F.Column:
    if rng == "portable":
        payload = F.concat_ws(
            ":",
            F.lit(str(int(seed))),
            F.lit(role),
            F.lit(str(iteration)),
            F.lit(str(draw)),
            feat_col.cast("string"),
        )
        return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")
    return F.xxhash64(F.lit(int(seed)), F.lit(role), F.lit(iteration), F.lit(draw), feat_col)


def hashgnn(
    graph: LinkGraph,
    iterations: int = 2,
    embedding_density: int = 4,
    neighbor_influence: float = 1.0,
    features: DataFrame | None = None,
    random_seed: int = 42,
    rng: str = "xxhash",
) -> HashGNNResult:
    """``features``: optional (node_id, feat long) rows of initial binary
    features; defaults to the identity feature per node. Self wins hash
    ties, matching MinHashTask.java:159's strict ``<`` comparison."""
    spark = graph.edges.sparkSession
    _mark = roundtrip_mark()
    edges = materialize_roundtrip(
        graph.edges.select("src", "dst").distinct(), tag="hgnn_e"
    )
    nodes = graph.node_ids().select(F.col("node_id").alias("node"))
    if features is not None:
        prev = features.select(
            F.col(features.columns[0]).alias("node"), F.col(features.columns[1]).alias("feat")
        )
    else:
        prev = nodes.select("node", F.col("node").alias("feat"))
    prev = materialize_roundtrip(prev, tag="hgnn", keep_last=2)

    def argmin(df: DataFrame, key: str, hcol, out_h: str, out_f: str) -> DataFrame:
        """Per-key (min hash, its feature); hash ties break to the smaller
        feature (deterministic stand-in for the reference's first-seen)."""
        return (
            df.groupBy(key)
            .agg(F.min(F.struct(hcol.alias("h"), F.col("feat").alias("f"))).alias("m"))
            .select(key, F.col("m.h").alias(out_h), F.col("m.f").alias(out_f))
        )

    it = 0
    for it in range(1, iterations + 1):
        per_draw = []
        for k in range(embedding_density):
            self_min = argmin(
                prev, "node", _hash_col(rng, random_seed, "self", it, k, F.col("feat")), "sh", "sf"
            )
            pre_min = argmin(
                prev, "node", _hash_col(rng, random_seed, "pre", it, k, F.col("feat")), "ph", "pf"
            )
            # v aggregates its OUT-neighbors' argmins — reference parity:
            # MinHashTask's forEachRelationship(v) hashes the TARGET's
            # previous embedding (:141-144).
            nbr_vec = (
                edges.join(pre_min.withColumnRenamed("node", "dst"), "dst")
                .select(F.col("src").alias("node"), F.col("pf").alias("feat"))
                .distinct()
            )
            nbr_hash = _hash_col(rng, random_seed, "nbr", it, k, F.col("feat"))
            if neighbor_influence != 1.0:
                nbr_hash = (nbr_hash.cast("double") / F.lit(float(neighbor_influence)))
            nbr_min = argmin(nbr_vec, "node", nbr_hash, "nh", "nf")
            winner = (
                self_min.join(nbr_min, "node", "full_outer")
                .select(
                    "node",
                    F.when(
                        F.col("nh").isNotNull()
                        & (F.col("sh").isNull() | (F.col("nh") < F.col("sh"))),
                        F.col("nf"),
                    )
                    .otherwise(F.col("sf"))
                    .alias("feat"),
                )
                .filter(F.col("feat").isNotNull())
            )
            per_draw.append(winner)
        cur = per_draw[0]
        for w in per_draw[1:]:
            cur = cur.union(w)
        prev = materialize_roundtrip(cur.distinct(), tag="hgnn", keep_last=2)

    out = materialize_roundtrip(
        nodes.join(prev, "node", "left")
        .groupBy("node")
        .agg(
            F.array_sort(
                F.filter(F.collect_list("feat"), lambda x: x.isNotNull())
            ).alias("features")
        )
        .select(F.col("node").alias("node_id"), "features"),
        tag="hgnn_out",
    )
    roundtrip_release(_mark, keep=[out])
    return HashGNNResult(embeddings=out, ran_iterations=it)
