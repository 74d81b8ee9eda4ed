"""Memory/shuffle estimates for the datapipe operators.

The algorithm registry's ``Procedures.estimate()`` (the analog of the
reference's per-algo ``MemoryEstimateDefinition``s, e.g.
``algo/.../pagerank/PageRankMemoryEstimateDefinition.java``) predicts
state and shuffle volume from |V|/|E| before running anything. The
100 TB datapipe operators (dedup, ANN, packing) deserve the same
spill-not-abort prediction, but their driver is CORPUS size, not graph
size — so their models are row-width × row-count formulas keyed by the
op's own knobs (hash count, band count, embedding dim, …), with the
fan-out stages (shingle explode, LSH bucket join) modeled explicitly,
since those — not the input scan — are what actually spill.

Estimates are intentionally coarse upper-shapes (like the reference's
``MemoryRange``): the point is to predict ORDER and which stage
dominates, so a deployment sizes shuffle partitions / breaks the corpus
into waves before the job runs, instead of discovering the explode
factor at hour three.
"""

from __future__ import annotations

from typing import Any

# per-op state/shuffle models: functions of (n_rows, cfg) returning bytes
_B_ID = 8  # doc/vec id
_B_DIGEST = 16  # md5-derived digest/bucket key


def _shingles(cfg) -> int:
    # expected shingles per document ≈ token count (k-shingles overlap)
    return int(cfg.get("avg_doc_tokens", 200))


def _estimators() -> dict[str, Any]:
    return {
        "dedup_exact": lambda n, cfg: {
            "state": n * (_B_ID + _B_DIGEST),
            "shuffle": n * (_B_ID + _B_DIGEST),
            "dominant": "digest groupBy (one shuffle of the id+digest pairs)",
        },
        "minhash_signatures": lambda n, cfg: {
            "state": n * (_B_ID + 8 * int(cfg.get("num_hashes", 64))),
            "shuffle": n * _shingles(cfg) * (_B_ID + _B_DIGEST),
            "dominant": "shingle explode → per-doc min-agg (map-side combinable)",
        },
        "lsh_candidate_pairs": lambda n, cfg: {
            "state": n * (_B_ID + 8 * int(cfg.get("num_hashes", 64))),
            "shuffle": n * int(cfg.get("bands", 16)) * (_B_ID + _B_DIGEST)
            + _pairs_upper(n, cfg) * (2 * _B_ID),
            "dominant": "band bucket join; pair volume scales with bucket "
            "load factor (near_dup_rate)",
        },
        "dedup_clusters": lambda n, cfg: {
            # LSH pairs + WCC over pair PARTICIPANTS only (not the corpus)
            "state": 2 * _pairs_upper(n, cfg) * (2 * _B_ID) + n * _B_ID,
            "shuffle": n * int(cfg.get("bands", 16)) * (_B_ID + _B_DIGEST)
            + 4 * _pairs_upper(n, cfg) * (2 * _B_ID),
            "dominant": "LSH band join + pointer-doubling WCC over pair "
            "participants; corpus touched by one final left join",
        },
        "contamination_docs": lambda n, cfg: {
            "state": n * _B_ID,
            "shuffle": (n + int(cfg.get("eval_rows", n // 100 or 1)))
            * _shingles(cfg) * _B_DIGEST,
            "dominant": "shingle semi-join (map-side combinable)",
        },
        "ann_cosine_topk": lambda n, cfg: {
            "state": int(cfg.get("n_queries", 100)) * (8 * int(cfg.get("dim", 64)) + _B_ID),
            "shuffle": n * int(cfg.get("top_k", 10)) * 24,
            "dominant": "broadcast query side × corpus scan; per-partition "
            "top-k then one finishing window",
        },
        "lsh_cosine_topk": lambda n, cfg: {
            "state": n * (_B_ID + int(cfg.get("n_planes", 16)) // 8 + 1),
            "shuffle": n * (_B_ID + _B_DIGEST)
            + _pairs_upper(n, cfg) * (2 * _B_ID + 8),
            "dominant": "hyperplane bucket join (never all-pairs); bucket "
            "skew is the knob to watch",
        },
        "pack_sequences": lambda n, cfg: {
            "state": n * (_B_ID + 8 + 8 + 4),  # id, n_tokens, cum, bucket
            "shuffle": n * (_B_ID + 8 + 8),
            "dominant": "one hash-bucket shuffle + per-bucket running sum",
        },
    }


def _pairs_upper(n: int, cfg) -> int:
    """Upper-shape for LSH candidate pairs: every document meets
    ``near_dup_rate`` × bucket-mates; default models a mostly-unique
    corpus with small clusters."""
    rate = float(cfg.get("near_dup_rate", 0.01))
    per_doc = max(1.0, rate * max(1, int(cfg.get("avg_bucket_size", 8))))
    return int(n * per_doc)


def estimate_datapipe(op: str, row_count: int, **config) -> dict[str, Any]:
    """Predict state/shuffle bytes for a datapipe op over ``row_count``
    corpus rows. Returns the same shape as ``Procedures.estimate()``;
    raises KeyError for unknown ops (mirroring the algo registry)."""
    est = _estimators().get(op)
    if est is None:
        raise KeyError(
            f"unknown datapipe op {op!r}; known: {sorted(_estimators())}"
        )
    n = int(row_count)
    model = est(n, config)
    state_b, shuffle_b = int(model["state"]), int(model["shuffle"])
    return {
        "operator": op,
        "rowCount": n,
        "bytesMin": state_b,
        "bytesMax": state_b + shuffle_b,
        "requiredMemory": f"[{state_b // 1_000_000} MB ... {(state_b + shuffle_b) // 1_000_000} MB]",
        "predictedStateMb": round(state_b / 1e6, 2),
        "predictedShuffleMb": round(shuffle_b / 1e6, 2),
        "dominantStage": model["dominant"],
        "note": "shuffle engine spills instead of aborting; use this to "
        "size shuffle partitions / corpus waves, not as a hard guard",
    }
