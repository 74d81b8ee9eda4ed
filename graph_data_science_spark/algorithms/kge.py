"""Knowledge-graph-embedding link prediction (KGE predict).

Reference: ``algo/src/main/java/org/neo4j/gds/algorithms/machinelearning/
TopKMapComputer.java:40`` with the two scorers
``DoubleEuclideanDistanceLinkScorer.java`` (TransE: score =
``||h + r - t||_2``, LOWER is better) and ``DoubleDistMultLinkScorer.java``
(DistMult: score = ``sum(h * r * t)``, HIGHER is better). Candidate links
are every (source, target) pair from the two node filters with ``s != t``
and no existing edge between them (``TopKMapComputer.isCandidateLink``);
each source keeps its ``topK`` best-scoring targets.

Spark re-expression — the reference's workload is literally
``|sources| x |targets|`` scored pairs (``estimateWorkload``), so the plan
is the honest distributed form of that product:

- the relationship-type embedding is a broadcast array literal, so
  ``h + r`` / ``h * r`` folds into whole-stage codegen;
- sources x targets is a cross join with the SOURCE side broadcast
  (KGE predict is "a handful of query heads against the full node table"
  — the source filter is the small side by construction; pass
  ``broadcast_sources=False`` when it isn't and let AQE pick);
- the existing-edge exclusion is a broadcast-able left-anti join on
  (src, dst);
- scores are pure column expressions over ``zip_with`` — no UDF, no
  per-row Python;
- top-k per source is a rank window, which Spark 3.5+/4.x executes with
  a map-side WindowGroupLimit (partial top-k before the shuffle), so the
  shuffled volume is O(|sources| * k), not O(|sources| * |targets|).

Ties break toward the smaller target id (deterministic across cluster
sizes; the reference's TopKMap insertion order is thread-dependent, so a
fixed tiebreak is the portable strengthening of its contract).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger("spark_link_graph.kge")


@dataclass
class KgePredictResult:
    predictions: DataFrame  # (source long, target long, score double, rank int)


def _transe_score(hr, t):
    # ||(h + r) - t||_2 ; hr is the precombined h+r array (init() analog).
    return F.sqrt(
        F.aggregate(
            F.zip_with(hr, t, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _distmult_score(hr, t):
    # sum((h * r) * t) ; hr is the precombined h*r array.
    return F.aggregate(
        F.zip_with(hr, t, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )


def kge_predict(
    embeddings: DataFrame,
    relationship_type_embedding: list,
    score_function: str = "transe",
    top_k: int = 10,
    id_col: str = "node_id",
    vec_col: str = "embedding",
    source_filter=None,
    target_filter=None,
    existing_edges: DataFrame | None = None,
    broadcast_sources: bool | None = None,
    broadcast_row_limit: int = 1_000_000,
) -> KgePredictResult:
    """Score candidate (source, target) links with a trained KGE model.

    ``source_filter`` / ``target_filter``: pyspark Column predicates over
    the embedding frame (the BitSet node-filter analog); None = all nodes.
    ``existing_edges``: optional (src, dst) frame — pairs already linked
    are not candidates, matching ``isCandidateLink``.
    ``score_function``: 'transe' (lower = better) or 'distmult'
    (higher = better) — the reference's ``higherIsBetter`` rule.

    ``broadcast_sources=None`` (default) counts the filtered source side
    and broadcasts it only when it has ≤ ``broadcast_row_limit`` rows —
    the documented "few query heads vs the node table" shape. A caller
    passing a large source set degrades to a shuffled cross join instead
    of broadcast-OOMing the driver. True/False force the choice (True
    skips the count; the caller asserts smallness).
    """
    sf = score_function.lower()
    if sf not in ("transe", "distmult"):
        raise ValueError(f"unknown score_function {score_function!r}")
    rel = F.array(*[F.lit(float(x)) for x in relationship_type_embedding])

    base = embeddings.select(
        F.col(id_col).cast("long").alias("node_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    src = base if source_filter is None else base.filter(source_filter)
    tgt = base if target_filter is None else base.filter(target_filter)

    # Precombine h (+|*) r once per source — the scorer's init() analog;
    # the per-pair kernel then touches only two arrays.
    combine = (lambda h, r: h + r) if sf == "transe" else (lambda h, r: h * r)
    src = src.select(
        F.col("node_id").alias("source"),
        F.zip_with(F.col("vec"), rel, combine).alias("hr"),
    )
    if broadcast_sources is None:
        n_src = src.count()
        broadcast_sources = n_src <= int(broadcast_row_limit)
        if not broadcast_sources:
            log.info(
                "kge_predict: source side has %d rows (> %d) — skipping the "
                "source broadcast; the pair join shuffles instead",
                n_src, int(broadcast_row_limit),
            )
    if broadcast_sources:
        src = F.broadcast(src)
    tgt = tgt.select(F.col("node_id").alias("target"), F.col("vec").alias("tvec"))

    pairs = src.crossJoin(tgt).filter(F.col("source") != F.col("target"))
    if existing_edges is not None:
        ex = existing_edges.select(
            F.col(existing_edges.columns[0]).cast("long").alias("source"),
            F.col(existing_edges.columns[1]).cast("long").alias("target"),
        )
        pairs = pairs.join(F.broadcast(ex), ["source", "target"], "left_anti")

    scorer = _transe_score if sf == "transe" else _distmult_score
    scored = pairs.select(
        "source", "target", scorer(F.col("hr"), F.col("tvec")).alias("score")
    ).filter(~F.isnan(F.col("score")))

    order = (
        [F.asc("score"), F.asc("target")]
        if sf == "transe"
        else [F.desc("score"), F.asc("target")]
    )
    w = Window.partitionBy("source").orderBy(*order)
    preds = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(top_k))
        .select("source", "target", "score", "rank")
    )
    return KgePredictResult(predictions=preds)
