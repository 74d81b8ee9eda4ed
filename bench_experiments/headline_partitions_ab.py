"""A/B: headline PageRank superstep wall vs shuffle-partition count.

The scaling protocol (bench.py:scaling_run) sizes shuffle partitions at
4x cores so task waves pipeline; the headline session uses cores (=32,
one wave). This experiment runs the identical headline PageRank at sf0.1
under both settings in separate spark-submit processes (JIT isolation).

Usage: python bench_experiments/headline_partitions_ab.py <parts> <out.json>
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    parts = int(sys.argv[1])
    out = sys.argv[2]
    from graph_data_science_spark.session import get_spark

    spark = get_spark(
        app_name=f"headline-ab-{parts}",
        master="local[32]",
        shuffle_partitions=parts,
        extra_conf={"spark.default.parallelism": str(parts)},
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, REPO)
    import bench

    work = f"/tmp/headline_ab_{parts}"
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    edges_path, node_count, n_edges = bench._build_graph_parquet(spark, 0.1, work)
    walls = []
    for _ in range(2):
        res, w = bench._run_pagerank(spark, edges_path, node_count, 100, 1e-6)
        walls.append(round(w, 3))
    with open(out, "w") as fh:
        json.dump(
            {
                "parts": parts,
                "walls": walls,
                "min_wall": min(walls),
                "edges": n_edges,
                "supersteps": res.ran_iterations,
                "throughput": round(n_edges * res.ran_iterations / min(walls), 1),
            },
            fh,
        )
    spark.stop()


if __name__ == "__main__":
    main()
