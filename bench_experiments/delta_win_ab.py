"""Delta-stepping vs frontier Bellman-Ford: the win case, measured.

SURVEY §2.B records the bench-fixture A/B where plain frontier relaxation
wins on rounds (low-diameter graphs). This experiment measures the
OPPOSITE regime — the one delta-stepping exists for (reference
``paths/delta/DeltaStepping.java:52``): a graph where eager frontier
relaxation cascades corrections through a high-fan-out node, so the
settled-bucket discipline saves a data-proportional amount of shuffle.

Construction (ids: 0=source, 1..K chain, K+1 hub, K+2.. leaves):
- cheap chain 0 -> 1 -> ... -> K, weight EPS each;
- every chain node i >= 1 links to the hub with weight W - i — each
  Bellman-Ford round IMPROVES the hub's tentative distance, so BF
  re-relaxes all D hub out-edges every round (~K*D candidate rows);
- the hub fans out to D leaves, weight 1 each.

Delta-stepping processes bins smallest-first: the hub's candidates sit in
bins ~(W-K)/delta while the chain settles in bin 0, so the hub relaxes
its D out-edges exactly ONCE, after its distance is final (~D rows).
Both algorithms must return identical distances (checked exactly).

Protocol: local[32], min-of-2 walls per algorithm, candidate-row counts
accumulated per round via Observation on the relax join.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_data_science_spark.session import get_spark  # noqa: E402
from graph_data_science_spark.graph.build import LinkGraph  # noqa: E402
from graph_data_science_spark.algorithms.paths import (  # noqa: E402
    delta_stepping,
    shortest_paths,
)

K = 24          # chain length = BF correction rounds for the hub
D = 500_000     # hub fan-out: re-relaxed K times by BF, once by delta
W = 1000.0      # hub edge base weight (keeps hub bins above the chain's)
EPS = 0.01      # chain edge weight
DELTA = 8.0


def build_graph(spark):
    hub = K + 1
    chain = spark.range(K).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"), F.lit(EPS).alias("weight")
    )
    to_hub = spark.range(1, K + 1).select(
        F.col("id").alias("src"),
        F.lit(hub).alias("dst"),
        (F.lit(W) - F.col("id").cast("double")).alias("weight"),
    )
    fan = spark.range(D).select(
        F.lit(hub).alias("src"),
        (F.col("id") + hub + 1).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    edges = chain.union(to_hub).union(fan)
    vertices = spark.range(hub + 1 + D).select(F.col("id").alias("node_id"))
    return LinkGraph(edges=edges, vertices=vertices)


def run(algo, graph):
    t0 = time.time()
    if algo == "delta":
        res = delta_stepping(graph, source=0, delta=DELTA)
    else:
        res = shortest_paths(graph, source=0)
    n_rows = res.distances.filter(F.col("distance").isNotNull()).count()
    wall = time.time() - t0
    return wall, res.ran_iterations, n_rows, res.distances


def main():
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    # protocol parameter under its own key — out[algo] below writes
    # per-algorithm results under "bf"/"delta", which must not clobber it
    out = {"K": K, "D": D, "W": W, "EPS": EPS, "delta_param": DELTA}
    graph = build_graph(spark)
    graph.edges.persist().count()

    # one unmeasured warmup (JVM + Arrow), then interleaved min-of-2 so
    # neither algorithm gets the cold attempt
    run("bf", graph)
    results = {"bf": {"walls_sec": []}, "delta": {"walls_sec": []}}
    for _ in range(2):
        for algo in ("bf", "delta"):
            wall, it, n, dists = run(algo, graph)
            results[algo]["walls_sec"].append(round(wall, 3))
            results[algo]["rounds"] = it
    for algo, r in results.items():
        r["best_wall_sec"] = min(r["walls_sec"])
        out[algo] = r

    # exact distance equality between the two algorithms
    d1 = run("bf", build_graph(spark))[3].select(
        F.col("node_id"), F.col("distance").alias("d1")
    )
    d2 = run("delta", build_graph(spark))[3].select(
        F.col("node_id"), F.col("distance").alias("d2")
    )
    mismatch = (
        d1.join(d2, "node_id", "full_outer")
        .filter(
            ~(F.col("d1").eqNullSafe(F.col("d2")))
            & (F.abs(F.col("d1") - F.col("d2")) > 1e-9)
        )
        .count()
    )
    out["distance_mismatches"] = mismatch
    out["speedup"] = round(out["bf"]["best_wall_sec"] / out["delta"]["best_wall_sec"], 3)
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__), "delta_win_ab.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
