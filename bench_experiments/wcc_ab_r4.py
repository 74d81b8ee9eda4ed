"""A/B the three WCC paths on the bench graph (order chains, sf0.1).

Round-4 item 3: wcc_order_chains (label-prop + pointer doubling default)
was the slowest suite query in r3 (14.3 s driver / BENCH artifacts); the
star-contraction and Afforest paths are oracle-gated to the identical
fixpoint. Measure all three, min-of-2, and promote the winner to the
procedure default used by q_wcc.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from graph_data_science_spark.session import get_spark
from graph_data_science_spark.queries import _order_chain_graph
from graph_data_science_spark.algorithms.wcc import wcc, wcc_star, wcc_sampled

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark(master="local[32]", shuffle_partitions=32)

variants = {"wcc_labelprop": wcc, "wcc_star": wcc_star, "wcc_sampled": wcc_sampled}
out = {}
for name, fn in variants.items():
    times = []
    for attempt in range(2):
        g = _order_chain_graph(spark, sf_dir)
        t0 = time.monotonic()
        n = fn(g).components.count()
        times.append(round(time.monotonic() - t0, 3))
    out[name] = {"attempts": times, "min": min(times), "rows": n}
    print(name, out[name], flush=True)
print(json.dumps(out))
spark.stop()
