"""Host memory-bandwidth proxy for the scaling analysis in BASELINE.md.

The north rule's two-cluster-size criterion (N -> 4N executors, efficiency
>= 0.8) assumes 4N executors bring 4x the hardware: 4x memory channels, 4x
shuffle disks, 4x NICs. This sandbox runs every "executor" on ONE host, so
the only resource that actually multiplies is cores — the memory bus is
shared. This probe measures how far *pure memcpy* (no Spark, no JVM, no
Python overhead in the timed loop: `numpy.copyto` is a single C memmove)
scales from 4 to 16 concurrent workers on this box. If memcpy itself cannot
scale 4x, no memory-bound job (PageRank message passing is one: each
superstep streams the edge list and shuffle buffers through RAM) can.

Protocol: each worker owns a private 256 MiB source + destination buffer
(far beyond LLC) and runs `numpy.copyto(dst, src)` in a loop for a fixed
wall-time window; traffic per pass is counted as 2 x buffer (read + write
— write-allocate makes real traffic higher, so the reported GB/s is a
lower bound, but the *ratio* between worker counts is what matters).
Workers are separate processes (separate GILs, like executor JVMs).

Writes MEMBW_PROBE.json at the repo root:
    {"levels": {"1": GBps, "4": GBps, "16": GBps},
     "efficiency_4_to_16": ratio}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

BUF_MIB = 256
WINDOW_SEC = 6.0
LEVELS = (1, 4, 16)


def _worker(window: float, out_q) -> None:
    import numpy as np

    n = BUF_MIB * 1024 * 1024 // 8
    src = np.arange(n, dtype=np.float64)  # touch every page before timing
    dst = np.empty_like(src)
    np.copyto(dst, src)  # warm
    passes = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < window:
        np.copyto(dst, src)
        passes += 1
    elapsed = time.perf_counter() - t0
    out_q.put((passes, elapsed))


def run_level(workers: int) -> float:
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(WINDOW_SEC, q)) for _ in range(workers)]
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    gbps = sum(
        passes * 2 * BUF_MIB / 1024 / elapsed for passes, elapsed in results
    )
    return round(gbps, 2)


def main() -> None:
    levels = {}
    for w in LEVELS:
        # settle between levels so one level's tail doesn't pollute the next
        time.sleep(2)
        levels[str(w)] = run_level(w)
    record = {
        "protocol": (
            f"per-worker private {BUF_MIB} MiB numpy.copyto loop, "
            f"{WINDOW_SEC:.0f}s window, separate processes; GB/s counts "
            "2x buffer per pass (read+write, lower bound)"
        ),
        "levels_aggregate_gbps": levels,
        "efficiency_4_to_16": round(levels["16"] / (4 * levels["4"]), 3),
        "loadavg_at_end": [round(x, 2) for x in os.getloadavg()],
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "MEMBW_PROBE.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
