"""Per-superstep FIXED-cost floor decomposition.

Every recorded protocol shows a per-superstep cost that does not shrink
with data or executors: the 20M-edge standalone runs fit w + c with
c ~= 0.82 s/superstep (BASELINE.md "Why 80M edges"), and the sf0.1
headline supersteps (775k edges) sit at 0.5-0.7 s where the pure compute
is tens of ms. This script measures the floor directly and splits it:

  A. pagerank on a TINY graph (10k edges) at the bench conf
     (local[32], 32 shuffle partitions) — superstep walls ARE the floor.
  B. same with shuffle_partitions=4 — if the floor drops, it's
     task-count (scheduling/launch) bound; if not, it's per-JOB bound
     (Py4J round-trips, Catalyst analysis, DAG submission, commit).
  C. reference micro-ops on an equally tiny frame: one groupBy job, one
     localCheckpoint(eager), one Observation read — the commit path's
     building blocks, timed standalone.

Usage:  python bench_experiments/fixed_cost_floor.py [out_json]
Writes fixed_cost_floor.json next to this file by default.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_CONV = 1_000  # 10k edges — compute is negligible, walls = overhead
ROUNDS = 16  # supersteps per setting (tol=0 cycle graph: constant work)
WARMUP = 4


def floor_run(spark, label: str, out: dict) -> None:
    from graph_data_science_spark.algorithms.pagerank import pagerank
    from graph_data_science_spark.transcripts import closed_form_link_graph

    g = closed_form_link_graph(spark, N_CONV, cycle=True)
    res = pagerank(g, tolerance=0.0, max_iterations=ROUNDS + 1)
    walls = res.superstep_walls[WARMUP:]
    out[label] = {
        "edges": g.relationship_count(),
        "superstep_walls": [round(w, 4) for w in res.superstep_walls],
        "median_superstep_sec": round(statistics.median(walls), 4),
    }


def micro_ops(spark, out: dict) -> None:
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    df = spark.range(10_000).select(
        F.col("id").alias("node"), (F.col("id") % 97).cast("double").alias("delta")
    )
    base = df.localCheckpoint(eager=True)  # fixed small input, lineage-free

    def timed(fn, n=8):
        ws = []
        for _ in range(n):
            t0 = time.monotonic()
            fn()
            ws.append(time.monotonic() - t0)
        return round(statistics.median(ws), 4)

    # one shuffle job (the message aggregation shape), collect-to-driver count
    out["micro_groupby_count_sec"] = timed(
        lambda: base.groupBy("node").agg(F.sum("delta")).count()
    )
    # localCheckpoint(eager) of the aggregated frame — the commit step
    out["micro_localcheckpoint_sec"] = timed(
        lambda: base.groupBy("node")
        .agg(F.sum("delta").alias("delta"))
        .localCheckpoint(eager=True)
    )

    def obs_job():
        ob = Observation()
        d = base.groupBy("node").agg(F.sum("delta").alias("delta")).observe(
            ob, F.sum("delta").alias("s")
        )
        d.localCheckpoint(eager=True)
        ob.get

    # the FULL commit shape: agg + observe + eager localCheckpoint + obs read
    out["micro_commit_shape_sec"] = timed(obs_job)
    # pure driver/Py4J floor: an action with no shuffle at all
    out["micro_noop_count_sec"] = timed(lambda: base.count())


def main() -> None:
    from graph_data_science_spark.session import get_spark

    out_json = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixed_cost_floor.json"
    )
    results: dict = {"loadavg_start": [round(x, 2) for x in os.getloadavg()]}

    spark = get_spark(app_name="fixed-cost-floor", master="local[32]", shuffle_partitions=32)
    floor_run(spark, "tiny_local32_parts32", results)
    micro_ops(spark, results)
    spark.stop()

    spark = get_spark(app_name="fixed-cost-floor-4", master="local[32]", shuffle_partitions=4)
    floor_run(spark, "tiny_local32_parts4", results)
    spark.stop()

    results["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(out_json, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
