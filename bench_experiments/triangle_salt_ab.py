"""A/B: hot-key salted vs unsalted wedge join in triangle counting.

The r5 standalone suite measured triangle_count's 1×4→4×4 strong-scaling
at 0.555 and the decomposition pointed at a join-key straggler: on a
power-law graph the rank-1 hub is the `hi` endpoint of a large fraction
of oriented edges, so the adj_v attach join ships all those rows to ONE
task (AQE's skew split never engages — its 256 MB byte threshold is far
above a relative straggler at these row widths). The fix replicates the
HOT keys' adjacency rows across TRIANGLE_SALTS salts and spreads their
fact rows by a hash of the other endpoint (`triangles.py`).

Protocol: local[16] (the parallelism level where the straggler dominates
— at 4 cores it overlaps other work), power-law 1.25M nodes avg deg 8
(the suite's triangle input), interleaved min-of-2 after one warmup,
identical global counts required.
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.graph.generate import random_graph  # noqa: E402
from graph_data_science_spark.session import get_spark  # noqa: E402

mod = importlib.import_module("graph_data_science_spark.algorithms.triangles")

PL_NODES = 1_250_000
PL_DEG = 8


def run():
    t0 = time.monotonic()
    r = mod.triangle_count(GRAPH)
    return round(time.monotonic() - t0, 2), int(r.global_count)


def main():
    global GRAPH
    spark = get_spark(master="local[16]", shuffle_partitions=64)
    GRAPH = random_graph(spark, PL_NODES, PL_DEG, distribution="power_law", seed=7)
    GRAPH.edges.persist().count()
    default_thr = mod.TRIANGLE_HOT_IN_DEGREE
    run()  # warmup (codegen + first-shuffle)
    walls = {"unsalted": [], "salted": []}
    tri = {}
    for _ in range(2):
        for kind in ("unsalted", "salted"):
            mod.TRIANGLE_HOT_IN_DEGREE = 10**18 if kind == "unsalted" else default_thr
            w, t = run()
            walls[kind].append(w)
            tri[kind] = t
    mod.TRIANGLE_HOT_IN_DEGREE = default_thr
    out = {
        "graph": f"power_law {PL_NODES} nodes avg deg {PL_DEG} (suite input)",
        "parallelism": "local[16], shuffle_partitions 64",
        "unsalted_walls_sec": walls["unsalted"],
        "salted_walls_sec": walls["salted"],
        "unsalted_best_sec": min(walls["unsalted"]),
        "salted_best_sec": min(walls["salted"]),
        "speedup": round(min(walls["unsalted"]) / min(walls["salted"]), 2),
        "triangles_equal": tri["unsalted"] == tri["salted"],
        "global_triangles": tri["salted"],
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "triangle_salt_ab.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
