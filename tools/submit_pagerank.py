"""spark-submit entry point: PageRank over a transcript-derived link graph.

The north rule's deployment mechanism — the engine ships as a plain Python
package delivered to every executor with ``--py-files``:

    python tools/package_pyfiles.py /tmp/gds_spark.zip
    spark-submit --master <cluster> --py-files /tmp/gds_spark.zip \
        tools/submit_pagerank.py --n-conv 100000 --out /data/scores \
        [--transcripts <parquet/Iceberg path>] [--tolerance 1e-6] \
        [--max-iterations 50] [--checkpoint-dir <dir>]

Run the SAME command at two cluster sizes (N and 4N executors) for the
scaling criterion; on the sandbox ``--master local[N]`` is the analog
(`bench.py` automates that protocol). The script takes its master from
spark-submit — it never hardcodes one — and prints a single
``SUBMIT-OK ...`` line with superstep count and convergence for the
calling harness.

Output: ``--out`` parquet with (conv_id, turn_idx, node_id, score) — the
score joined back onto the stable (conv_id, turn_idx) turn key, the same
join-back the per-turn text-equality invariant rides on.
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--transcripts", help="existing transcript parquet path (default: synthesize)")
    p.add_argument("--n-conv", type=int, default=1000, help="conversations to synthesize")
    p.add_argument("--out", required=True, help="output parquet for per-turn scores")
    p.add_argument("--tolerance", type=float, default=1e-6)
    p.add_argument("--max-iterations", type=int, default=50)
    p.add_argument("--checkpoint-dir", help="superstep checkpoint dir (resume support)")
    args = p.parse_args()

    # master/deploy config comes from spark-submit, not from this script
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("gds-spark-pagerank").getOrCreate()

    from graph_data_science_spark.algorithms.pagerank import pagerank
    from graph_data_science_spark.transcripts import derive_link_graph, synthesize_transcripts

    transcripts = (
        spark.read.parquet(args.transcripts)
        if args.transcripts
        else synthesize_transcripts(spark, args.n_conv, seed=42)
    )
    tg = derive_link_graph(transcripts)
    res = pagerank(
        tg.graph,
        tolerance=args.tolerance,
        max_iterations=args.max_iterations,
        checkpoint_dir=args.checkpoint_dir,
    )
    res.scores.join(tg.turn_ids, "node_id").select(
        "conv_id", "turn_idx", "node_id", "score"
    ).write.mode("overwrite").parquet(args.out)
    print(f"SUBMIT-OK supersteps={res.ran_iterations} converged={res.did_converge}")
    spark.stop()


if __name__ == "__main__":
    main()
