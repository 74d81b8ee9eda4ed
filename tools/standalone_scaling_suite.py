"""Multi-executor N vs 4N scaling for the non-PageRank shuffle shapes.

``standalone_scaling.py`` evidences the north rule's ≥0.8 efficiency bar
on the flagship PageRank superstep; its 0.976 is PageRank-only. This
suite runs the three other north-star operators — each with a DIFFERENT
shuffle shape — under the identical standalone-cluster protocol
(1 executor JVM × 4 cores vs 4 executor JVMs × 4 cores, separate
heaps/GC, process-to-process shuffle, tmpfs local dirs, same input at
both levels = strong scaling):

- **wcc_star** (contracting edge set): chains graph, the shuffled edge
  set shrinks each round;
- **triangle_count** (array_intersect wedge fan-out): power-law graph,
  degree-skewed;
- **node_similarity** (pinned-parallelism pair join): deterministic
  bipartite graph, top-k finishing window.

Per level each op gets a 1/16-size warmup (codegen + Arrow spin-up),
then ``ATTEMPTS`` measured full-size runs; best wall per op is recorded.
Efficiency(op) = wall_A / (4 · wall_B). Writes
``STANDALONE_SCALING_suite.json`` at the repo root.

Usage:
    python tools/standalone_scaling_suite.py          # orchestrate
    python tools/standalone_scaling_suite.py --level N OUT   # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from standalone_scaling import (  # noqa: E402
    CORES_PER_EXEC,
    EXEC_MEM,
    MASTER_URL,
    start_cluster,
    stop_cluster,
)

N_CONV = int(os.environ.get("SUITE_NCONV", 1_000_000))       # ×8 turns → 7M chain edges
PL_NODES = int(os.environ.get("SUITE_PL_NODES", 1_250_000))  # ×8 avg deg → ~10M edges
NS_SRC = int(os.environ.get("SUITE_NS_SRC", 400_000))        # bipartite sources
NS_DST = int(os.environ.get("SUITE_NS_DST", 40_000))         # bipartite targets
NS_DEG = 8
ATTEMPTS = int(os.environ.get("SUITE_ATTEMPTS", 2))


def _graphs(spark, scale: float = 1.0):
    from pyspark.sql import functions as F

    from graph_data_science_spark.graph.build import LinkGraph
    from graph_data_science_spark.graph.generate import random_graph
    from graph_data_science_spark.transcripts import closed_form_link_graph

    chains = closed_form_link_graph(
        spark, max(1000, int(N_CONV * scale)), turns_per_conv=8, n_tools=0,
        tool_every=10**9, cycle=False,
    )
    pl = random_graph(spark, max(1000, int(PL_NODES * scale)), NS_DEG,
                      distribution="power_law", seed=7)
    n_src = max(1000, int(NS_SRC * scale))
    bip = (
        spark.range(n_src)
        .select(
            F.col("id").alias("src"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(NS_DEG - 1)),
                    lambda j: F.lit(n_src)
                    + F.pmod(F.xxhash64(F.col("id"), j), F.lit(NS_DST)),
                )
            ).alias("dst"),
        )
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )
    ns_graph = LinkGraph(edges=bip, node_count=n_src + NS_DST)
    return chains, pl, ns_graph


def _selected_ops() -> set:
    raw = os.environ.get("SUITE_OPS", "wcc_star,triangle_count,node_similarity")
    return {s.strip() for s in raw.split(",") if s.strip()}


def _run_ops(spark, scale: float) -> dict:
    from graph_data_science_spark.algorithms.similarity import node_similarity
    from graph_data_science_spark.algorithms.triangles import triangle_count
    from graph_data_science_spark.algorithms.wcc import wcc_star

    ops = _selected_ops()
    chains, pl, ns_graph = _graphs(spark, scale)
    out = {}

    if "wcc_star" in ops:
        t0 = time.monotonic()
        res = wcc_star(chains)
        n_comp = res.components.select("component").distinct().count()
        out["wcc_star"] = {
            "wall_sec": round(time.monotonic() - t0, 2),
            "edges": chains.relationship_count(),
            "components": n_comp,
            "rounds": res.ran_iterations,
        }

    if "triangle_count" in ops:
        t0 = time.monotonic()
        tc = triangle_count(pl)
        out["triangle_count"] = {
            "wall_sec": round(time.monotonic() - t0, 2),
            "edges": pl.relationship_count(),
            "global_triangles": int(tc.global_count),
        }

    if "node_similarity" in ops:
        t0 = time.monotonic()
        sim = node_similarity(ns_graph, metric="jaccard", top_k=10)
        n_rows = sim.count()  # the action — MUST run before the wall is read
        out["node_similarity"] = {
            "wall_sec": round(time.monotonic() - t0, 2),
            "edges": ns_graph.relationship_count(),
            "rows": n_rows,
        }
    return out


def run_level(n_execs: int, out_json: str) -> None:
    from graph_data_science_spark.session import get_spark

    total_cores = n_execs * CORES_PER_EXEC
    spark = get_spark(
        app_name=f"standalone-suite-{n_execs}x{CORES_PER_EXEC}",
        master=MASTER_URL,
        shuffle_partitions=4 * total_cores,
        extra_conf={
            "spark.cores.max": str(total_cores),
            "spark.executor.cores": str(CORES_PER_EXEC),
            "spark.executor.memory": EXEC_MEM,
            "spark.executor.extraJavaOptions": (
                f"-Xms{EXEC_MEM} -XX:+AlwaysPreTouch -XX:G1HeapRegionSize=32m "
                "-XX:MaxGCPauseMillis=200 -XX:+ParallelRefProcEnabled"
            ),
            "spark.default.parallelism": str(4 * total_cores),
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.locality.wait": "0s",
            "spark.reducer.maxSizeInFlight": "96m",
            "spark.shuffle.file.buffer": "1m",
        },
    )
    for _ in range(24):
        if os.getloadavg()[0] < 2.0:
            break
        time.sleep(5)
    _run_ops(spark, scale=1.0 / 16)  # warmup: codegen, Arrow, executor spin-up
    best: dict = {}
    for _ in range(ATTEMPTS):
        r = _run_ops(spark, scale=1.0)
        for op, rec in r.items():
            if op not in best or rec["wall_sec"] < best[op]["wall_sec"]:
                best[op] = rec
    with open(out_json, "w") as fh:
        json.dump({"ops": best, "loadavg": [round(x, 2) for x in os.getloadavg()]}, fh)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--level":
        run_level(int(sys.argv[2]), sys.argv[3])
        return

    start_cluster()
    try:
        levels: dict = {}
        for n_execs in (1, 4):
            out = f"/tmp/standalone_suite_{n_execs}.json"
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--level", str(n_execs), out],
                check=True,
                cwd=ROOT,
            )
            with open(out) as fh:
                levels[str(n_execs)] = json.load(fh)
        out_name = os.environ.get("SUITE_OUT", "STANDALONE_SCALING_suite.json")
        record = {
            "protocol": (
                "Spark standalone master + 1 worker on this host; level A = 1 "
                "executor JVM x 4 cores, level B = 4 executor JVMs x 4 cores "
                "(separate heaps/GC, process shuffle, tmpfs local dirs, "
                "locality.wait=0); same inputs at both levels (strong "
                "scaling); per level: 1/16-size warmup then best of "
                f"{ATTEMPTS} full-size runs per op"
            ),
            "inputs": {
                "wcc_star": f"{N_CONV:,} conv x 8-turn reply chains",
                "triangle_count": f"power-law {PL_NODES:,} nodes avg deg {NS_DEG}",
                "node_similarity": f"bipartite {NS_SRC:,} x {NS_DST:,}, deg {NS_DEG}, topK 10",
            },
            "levels": levels,
            "efficiency_1x4_to_4x4": {},
        }
        for op in sorted(_selected_ops()):
            wa = levels["1"]["ops"][op]["wall_sec"]
            wb = levels["4"]["ops"][op]["wall_sec"]
            record["efficiency_1x4_to_4x4"][op] = round(wa / (4.0 * wb), 3)
        with open(os.path.join(ROOT, out_name), "w") as fh:
            json.dump(record, fh, indent=1)
        print(json.dumps(record))
    finally:
        stop_cluster()


if __name__ == "__main__":
    main()
