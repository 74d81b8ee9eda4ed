"""A/B: ordered_rank (bucketed two-level) vs naive global-window
row_number at 50M rows, local[32] — the r4 'no partition-less windows'
work quantified. The naive plan funnels all 50M rows through ONE task
("Moving all data to a single partition"); the bucketed plan keeps
per-task work at ~rows/n_buckets."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from graph_data_science_spark.graph.ranks import ordered_rank
from graph_data_science_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
spark = get_spark(master="local[32]", shuffle_partitions=32)
df = spark.range(N).select(((F.col("id") * 2654435761) % (N * 13)).alias("k")).persist()
df.count()

out = {"rows": N}
for name, build in [
    ("bucketed", lambda: ordered_rank(df, ["k"], rank_col="_r", n_buckets=256)),
    ("naive_global_window", lambda: df.withColumn(
        "_r", F.row_number().over(Window.orderBy("k")) - 1)),
]:
    walls = []
    for _ in range(2):
        t0 = time.monotonic()
        build().write.mode("overwrite").format("noop").save()
        walls.append(round(time.monotonic() - t0, 2))
    out[name] = {"walls_sec": walls, "min": min(walls)}
    print(name, out[name], flush=True)
out["speedup"] = round(out["naive_global_window"]["min"] / out["bucketed"]["min"], 2)
print(json.dumps(out))
with open("/root/repo/bench_experiments/ranks_scale_ab.json", "w") as f:
    json.dump(out, f, indent=1)
spark.stop()
