"""REAL multi-executor N vs 4N scaling evidence on one host.

BASELINE.md's analysis attributes the poor 8→32 *thread*-scaling to the
single-JVM harness (shared-heap GC stops all worker threads, task-wave
barriers, one shuffle service), not to the engine: a real cluster adds
executor *processes*. This script tests exactly that claim on this box by
running a Spark standalone master + one worker and measuring the identical
constant-work PageRank at

- level A: 1 executor JVM × 4 cores
- level B: 4 executor JVMs × 4 cores (separate heaps, separate GC,
  process-to-process netty shuffle)

Total busy cores stay ≤ 17 of 32 at level B, so both levels run with the
clean-occupancy headroom the thread-scaling series only has up to 8 cores.
Efficiency = throughput(B) / (4 × throughput(A)); the north rule's bar is
≥ 0.8. Usage:

    python tools/standalone_scaling.py            # orchestrates everything
    python tools/standalone_scaling.py --level N_EXECS OUT_JSON   # internal

Writes STANDALONE_SCALING.json at the repo root and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_URL = "spark://127.0.0.1:7077"
CORES_PER_EXEC = 4
EXEC_MEM = "10g"  # 2.5 g/core — heap-per-core constant across levels
# Constant-work cycle graph size: 10 edges per conversation. Default 8M
# conversations = 80M edges. The earlier 20M-edge runs (kept as
# STANDALONE_SCALING_20M_*.json) showed a ~0.8s per-superstep FIXED cost
# (driver/scheduler round-trips, job setup) — at the 4x4 level that was ~29%
# of a 2.9s superstep, so strong-scaling efficiency was bounded by overhead,
# not by the engine: solving (w + c = 8.98, w/4 + c = 2.86) from those runs
# gives scalable work w = 8.16s and fixed c = 0.82s per superstep. 4x the
# work shrinks the fixed fraction to ~9% and measures the engine instead of
# the scheduler. Same input at BOTH levels (strong scaling), per the north
# rule.
N_CONV = int(os.environ.get("SPARK_GRAFT_SCALING_NCONV", 8_000_000))
WARMUP, MEASURED = 3, 4
ATTEMPTS = 2  # min-of-2, same noise-floor protocol as bench.py

_DAEMON_ENV = {
    **os.environ,
    "SPARK_LOG_DIR": "/tmp/spark-standalone/logs",
    "SPARK_PID_DIR": "/tmp/spark-standalone/pids",
    "SPARK_MASTER_HOST": "127.0.0.1",
    "SPARK_LOCAL_IP": "127.0.0.1",
    # The worker overrides spark.local.dir for its executors via
    # SPARK_LOCAL_DIRS; without this, executor shuffle files land on the
    # slow virtio /tmp instead of the tmpfs the engine's own sessions use
    # (see session.py — /tmp writeback caused 3s→56s superstep variance).
    "SPARK_LOCAL_DIRS": "/dev/shm/spark-local",
}


def _cpu_fields() -> list:
    with open("/proc/stat") as fh:
        return [int(x) for x in fh.readline().split()[1:]]


def _breakdown(before: list, after: list) -> dict:
    d = [a - b for a, b in zip(after, before)]
    d += [0] * (8 - len(d))
    total = sum(d) or 1
    return {
        "user_frac": round((d[0] + d[1]) / total, 4),
        "system_frac": round((d[2] + d[5] + d[6]) / total, 4),
        "idle_frac": round(d[3] / total, 4),
        "steal_frac": round(d[7] / total, 4),
        "busy_cores": round((os.cpu_count() or 1) * (1 - d[3] / total), 2),
    }


def _sbin(script: str, *args: str) -> None:
    subprocess.run(
        [os.path.join(SPARK_HOME, "sbin", script), *args],
        env=_DAEMON_ENV,
        check=True,
        capture_output=True,
        text=True,
    )


def start_cluster() -> None:
    os.makedirs("/tmp/spark-standalone/logs", exist_ok=True)
    _sbin("start-master.sh", "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8081")
    time.sleep(3)
    # One worker advertising 16 cores / 44g: level B's 4 executors × 4
    # cores × 10g fit; the standalone scheduler spawns one executor JVM
    # per spark.executor.cores slice up to spark.cores.max.
    _sbin(
        "start-worker.sh",
        MASTER_URL,
        "--cores", "16",
        "--memory", "44g",
        "--webui-port", "8082",
    )
    time.sleep(3)


def stop_cluster() -> None:
    for script in ("stop-worker.sh", "stop-master.sh"):
        try:
            _sbin(script)
        except subprocess.CalledProcessError:
            pass


def run_level(n_execs: int, out_json: str) -> None:
    from graph_data_science_spark.algorithms.pagerank import pagerank
    from graph_data_science_spark.session import get_spark
    from graph_data_science_spark.transcripts import closed_form_link_graph

    total_cores = n_execs * CORES_PER_EXEC
    spark = get_spark(
        app_name=f"standalone-scaling-{n_execs}x{CORES_PER_EXEC}",
        master=MASTER_URL,
        shuffle_partitions=4 * total_cores,
        extra_conf={
            "spark.cores.max": str(total_cores),
            "spark.executor.cores": str(CORES_PER_EXEC),
            "spark.executor.memory": EXEC_MEM,
            # get_spark sizes -Xms to the DRIVER heap (16g default), which
            # exceeds the 10g executor heap and makes executor JVMs fail at
            # launch (Xms > Xmx) — override with executor-sized options.
            "spark.executor.extraJavaOptions": (
                f"-Xms{EXEC_MEM} -XX:+AlwaysPreTouch -XX:G1HeapRegionSize=32m "
                "-XX:MaxGCPauseMillis=200 -XX:+ParallelRefProcEnabled"
            ),
            "spark.default.parallelism": str(4 * total_cores),
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            # A/B knob: loopback shuffle pays lz4 + serde CPU for zero
            # network saved; a real cluster pays it to save real NIC bytes.
            # Measured: compression OFF is slower at both levels
            # (STANDALONE_SCALING_nocompress.json) — stays on.
            **(
                {
                    "spark.shuffle.compress": "false",
                    "spark.shuffle.spill.compress": "false",
                }
                if os.environ.get("SPARK_GRAFT_NO_SHUFFLE_COMPRESS")
                else {}
            ),
            # Delay-scheduling off + bigger fetch/write buffers (default ON;
            # SPARK_GRAFT_SCALEOUT_UNTUNED=1 restores Spark defaults for A/B).
            # With the edge cache spread across executors, locality.wait=3s
            # (default) idles whole executors behind a straggler that holds
            # the cached block they "prefer"; 0 lets any free core steal the
            # task and read the block remotely. Measured on the 4x4 level:
            # 4.88s -> 3.34s median superstep (+46% throughput).
            **(
                {}
                if os.environ.get("SPARK_GRAFT_SCALEOUT_UNTUNED")
                else {
                    "spark.locality.wait": "0s",
                    "spark.reducer.maxSizeInFlight": "96m",
                    "spark.shuffle.file.buffer": "1m",
                }
            ),
            # Executors run NO Python (the superstep message path is pure
            # Catalyst SQL), but ship the package anyway so any Arrow-path
            # kernel a future caller uses resolves on executors too.
            "spark.submit.pyFiles": os.path.join("/tmp/spark_graft_bench", "gds_spark.zip")
            if os.path.exists("/tmp/spark_graft_bench/gds_spark.zip")
            else "",
        },
    )
    g = closed_form_link_graph(spark, N_CONV, cycle=True)
    n_edges = g.relationship_count()
    execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
    for _ in range(24):
        if os.getloadavg()[0] < 2.0:
            break
        time.sleep(5)
    before = _cpu_fields()
    res = pagerank(g, tolerance=0.0, max_iterations=WARMUP + MEASURED + 1)
    after = _cpu_fields()
    med = statistics.median(res.superstep_walls[WARMUP:])
    with open(out_json, "w") as fh:
        json.dump(
            {
                "executors_registered": execs,
                "executor_cores": CORES_PER_EXEC,
                "edges": n_edges,
                "superstep_walls": res.superstep_walls,
                "median_superstep_sec": med,
                "throughput_edges_per_sec_per_superstep": n_edges / med,
                "cpu_breakdown": _breakdown(before, after),
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            },
            fh,
        )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--level":
        run_level(int(sys.argv[2]), sys.argv[3])
        return

    start_cluster()
    try:
        results: dict[str, dict] = {}
        attempts: dict[str, list] = {}
        for n_execs in (1, 4):
            best = None
            walls = []
            for attempt in range(ATTEMPTS):
                out = f"/tmp/standalone_scaling_{n_execs}_{attempt}.json"
                subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--level", str(n_execs), out],
                    check=True,
                    cwd=ROOT,
                )
                with open(out) as fh:
                    r = json.load(fh)
                walls.append(round(r["median_superstep_sec"], 3))
                if best is None or r["median_superstep_sec"] < best["median_superstep_sec"]:
                    best = r
            results[str(n_execs)] = best
            attempts[str(n_execs)] = walls
        t1 = results["1"]["throughput_edges_per_sec_per_superstep"]
        t4 = results["4"]["throughput_edges_per_sec_per_superstep"]
        record = {
            "protocol": (
                "Spark standalone master + 1 worker on this host; level A = 1 "
                "executor JVM x 4 cores, level B = 4 executor JVMs x 4 cores "
                "(separate heaps/GC, process shuffle); constant-work "
                f"{results['1']['edges']:,}-edge "
                "cycle graph, 3 warmup + 4 measured supersteps, median, "
                "min-of-2 runs per level; executor local dirs on tmpfs "
                "(SPARK_LOCAL_DIRS), locality.wait=0, 96m/1m fetch/write "
                "buffers, shuffle compression on"
            ),
            "levels": results,
            "attempt_medians_sec": attempts,
            "efficiency_1x4_to_4x4": round(t4 / (4 * t1), 3),
        }
        with open(os.path.join(ROOT, "STANDALONE_SCALING.json"), "w") as fh:
            json.dump(record, fh, indent=1)
        print(json.dumps(record))
    finally:
        stop_cluster()


if __name__ == "__main__":
    main()
