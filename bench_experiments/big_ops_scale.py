"""Large-scale operator sweep: WCC (star), Label Propagation, Triangle
Count at ~20M edges — 25x the sf0.1 bench inputs.

The bench suite proves the operators at sf0.1 (~150k-775k edges); the
scaling protocol proves the PageRank superstep path at 20M/80M/100M
edges. This experiment closes the gap for the OTHER north-star
operators: run each on a deterministic ~20M-edge graph at local[32] and
record wall + a correctness invariant, so "would this hold at 25x the
bench" is a recorded measurement, not an extrapolation.

Graphs:
- chains: closed-form transcript reply chains (2.5M conversations x 8
  turns -> 17.5M edges, 2.5M components of 8 nodes). WCC must return
  exactly n_conversations components, each rooted at the chain head
  (min id) -- a full correctness check at scale, not just a row count.
- power_law: reference-semantics random graph (2.5M nodes, avg degree 8
  -> 20M edges, heavy-tailed degrees) for triangle counting under
  realistic degree skew.

Usage: spark-submit --driver-memory 36g bench_experiments/big_ops_scale.py
(or plain python; session defaults apply).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_data_science_spark.session import get_spark
from graph_data_science_spark.transcripts import closed_form_link_graph
from graph_data_science_spark.graph.generate import random_graph
from graph_data_science_spark.algorithms.wcc import wcc_star
from graph_data_science_spark.algorithms.labelprop import label_propagation
from graph_data_science_spark.algorithms.triangles import triangle_count

N_CONV = int(os.environ.get("BIG_OPS_CONV", "2500000"))
TURNS = 8
PL_NODES = int(os.environ.get("BIG_OPS_PL_NODES", "2500000"))
PL_DEG = 8

spark = get_spark(
    app_name="big-ops-scale",
    master="local[32]",
    shuffle_partitions=128,
    extra_conf={"spark.default.parallelism": "128"},
)

out = {}

# --- chains graph: reply chains only (tool_every > n_turns => no tool edges)
chains = closed_form_link_graph(
    spark, N_CONV, turns_per_conv=TURNS, n_tools=0, tool_every=10**9, cycle=False
)
n_edges = chains.relationship_count()
out["chains_edges"] = n_edges

t0 = time.monotonic()
res = wcc_star(chains)
comp = res.components.persist()
n_rows = comp.count()
wall = time.monotonic() - t0
# correctness at scale: every turn's component is its chain head (min id)
bad = comp.filter(
    F.col("component") != F.col("node_id") - F.pmod(F.col("node_id"), F.lit(TURNS))
).count()
n_comp = comp.select("component").distinct().count()
comp.unpersist()
out["wcc_star"] = {
    "wall_sec": round(wall, 2),
    "rows": n_rows,
    "components": n_comp,
    "expected_components": N_CONV,
    "wrong_assignments": bad,
    "rounds": res.ran_iterations,
    "edges_per_sec": round(n_edges / wall, 1),
}
print("wcc_star", out["wcc_star"], flush=True)

t0 = time.monotonic()
lp = label_propagation(chains, max_iterations=5)
lp_rows = lp.labels.count()
wall = time.monotonic() - t0
out["label_propagation"] = {
    "wall_sec": round(wall, 2),
    "rows": lp_rows,
    "iterations": lp.ran_iterations,
    "converged": lp.did_converge,
    "edge_iters_per_sec": round(n_edges * lp.ran_iterations / wall, 1)
    if lp.ran_iterations
    else None,
}
print("label_propagation", out["label_propagation"], flush=True)

# --- power-law graph: triangle counting under degree skew
pl = random_graph(spark, PL_NODES, PL_DEG, distribution="power_law", seed=7)
pl_edges = pl.relationship_count()
out["power_law_edges"] = pl_edges

t0 = time.monotonic()
tc = triangle_count(pl)
total = tc.global_count
wall = time.monotonic() - t0
out["triangle_count"] = {
    "wall_sec": round(wall, 2),
    "global_triangles": int(total),
    "edges_per_sec": round(pl_edges / wall, 1),
}
print("triangle_count", out["triangle_count"], flush=True)

print(json.dumps(out))
spark.stop()
