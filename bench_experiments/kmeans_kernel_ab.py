"""A/B: unrolled column-expression argmin vs broadcast-GEMM mapInPandas
kernel for KMeans assignment at large k·dim (``algorithms/kmeans.py``).

The r4 verdict flagged the per-centroid literal distance expressions:
the assignment plan grows O(k·dim) literal nodes per iteration, so at
k=128, dim=128 (16,384 terms) the PLAN — codegen compilation — becomes
the bottleneck, not the data. The engine now switches to the
``_assign_kernel`` GEMM path above ``KMEANS_EXPR_MAX_TERMS``; this
experiment records both walls at that scale (plus a small-k sanity point
where the expression path is fine and remains the default).

Protocol: local[32], n = 200k vectors, one assignment pass per
measurement (the iteration unit the plan repeats), min-of-2 interleaved
after one warmup of each; assignments must agree between paths.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_data_science_spark.algorithms.kmeans import (  # noqa: E402
    _assign_expr,
    _assign_kernel,
)
from graph_data_science_spark.session import get_spark  # noqa: E402

N = 200_000
BIG_K, BIG_DIM = 128, 128
SMALL_K, SMALL_DIM = 8, 16


def vectors(spark, n, dim):
    return spark.range(n).select(
        F.col("id").alias("node_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda j: F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000)) / 500.0 - 1.0,
        ).alias("vec"),
    )


def centroids(k, dim):
    # deterministic pseudo-random centroids, no RNG state
    return [
        [((i * 2654435761 + j * 40503) % 1000) / 500.0 - 1.0 for j in range(dim)]
        for i in range(k)
    ]


def run(kind, df, cents):
    t0 = time.time()
    fn = _assign_expr if kind == "expr" else _assign_kernel
    out = fn(df, cents)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("community").alias("cs"),
        F.sum("distance").alias("ds"),
    ).collect()[0]
    return time.time() - t0, (int(agg["n"]), int(agg["cs"]), round(float(agg["ds"]), 6))


def compare(df, cents):
    """Tie-aware agreement: the two float paths may break EXACT distance
    ties (common with quantized test vectors) at different centroid
    indices; a real disagreement is a differing community with a
    non-tie distance gap."""
    a = _assign_expr(df, cents).select(
        "node_id", F.col("community").alias("ca"), F.col("distance").alias("da")
    )
    b = _assign_kernel(df, cents).select(
        "node_id", F.col("community").alias("cb"), F.col("distance").alias("db")
    )
    j = a.join(b, "node_id")
    row = j.agg(
        F.sum(F.when(F.col("ca") != F.col("cb"), 1).otherwise(0)).alias("nd"),
        F.sum(
            F.when(
                (F.col("ca") != F.col("cb")) & (F.abs(F.col("da") - F.col("db")) > 1e-9), 1
            ).otherwise(0)
        ).alias("nreal"),
        F.max(F.abs(F.col("da") - F.col("db"))).alias("mx"),
    ).collect()[0]
    return {
        "community_diffs_total": int(row["nd"] or 0),
        "community_diffs_beyond_tie": int(row["nreal"] or 0),
        "distance_max_abs_diff": float(row["mx"] or 0.0),
    }


def _measure_pair(df, cents, kinds=("expr", "kernel")):
    for kind in kinds:
        run(kind, df, cents)  # warmup (codegen compile / Arrow spin-up)
    walls = {k: [] for k in kinds}
    sigs = {}
    for _ in range(2):
        for kind in kinds:
            w, sig = run(kind, df, cents)
            walls[kind].append(round(w, 3))
            sigs[kind] = sig
    return walls, sigs


def main():
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    out = {"n": N, "scales": {}}

    # 1. small k·d: expression path is the default and fine — sanity pair.
    df = vectors(spark, N, SMALL_DIM).persist()
    df.count()
    cents = centroids(SMALL_K, SMALL_DIM)
    walls, sigs = _measure_pair(df, cents)
    out["scales"]["small_k8_d16"] = {
        "k": SMALL_K,
        "dim": SMALL_DIM,
        "terms": SMALL_K * SMALL_DIM,
        "expr_walls_sec": walls["expr"],
        "kernel_walls_sec": walls["kernel"],
        "expr_best_sec": min(walls["expr"]),
        "kernel_best_sec": min(walls["kernel"]),
        "speedup_kernel_vs_expr": round(min(walls["expr"]) / min(walls["kernel"]), 2),
        "agreement": compare(df, cents),
    }
    df.unpersist()

    # 2. big k·d: kernel path (the engine's choice above the threshold).
    df = vectors(spark, N, BIG_DIM).persist()
    df.count()
    cents = centroids(BIG_K, BIG_DIM)
    for _ in range(1):
        run("kernel", df, cents)  # warmup
    kwalls = []
    ksig = None
    for _ in range(2):
        w, ksig = run("kernel", df, cents)
        kwalls.append(round(w, 3))
    big = {
        "k": BIG_K,
        "dim": BIG_DIM,
        "terms": BIG_K * BIG_DIM,
        "kernel_walls_sec": kwalls,
        "kernel_best_sec": min(kwalls),
        "kernel_checksum": ksig,
    }

    # 3. big k·d expression path, attempted LAST because it does not
    # merely run slow — building the O(k·dim) literal expression tree
    # exhausts the driver heap before a single row is read (the recorded
    # failure IS the finding). Guarded so the crash is captured.
    try:
        w, esig = run("expr", df, cents)
        big["expr_walls_sec"] = [round(w, 3)]
        big["expr_best_sec"] = round(w, 3)
        big["agreement"] = compare(df, cents)
        big["speedup_kernel_vs_expr"] = round(w / min(kwalls), 2)
    except Exception as exc:  # noqa: BLE001 — the failure is the datum
        big["expr_result"] = f"FAILED: {type(exc).__name__}: {str(exc)[:200]}"
    out["scales"]["big_k128_d128"] = big

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "kmeans_kernel_ab.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
