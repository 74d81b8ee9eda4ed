"""Superstep loop with durable checkpoint / resume / per-partition metrics.

GDS's ``Pregel.run()`` loop (reference ``pregel/.../Pregel.java:204-242``)
has convergence detection and cancellation but **no** checkpoint/restart —
a killed job restarts from scratch. This engine adds durability, the core
novel requirement of the north rule:

- After every superstep the vertex-state DataFrame is written to the
  checkpoint store (parquet here; on a cluster the same layout maps 1:1 to
  an Iceberg table partitioned by ``superstep`` — each commit below is one
  snapshot append; no Iceberg runtime jar ships in this sandbox).
- A ``metrics`` table receives one row **per physical partition** of the
  committed state (superstep, partition, rows, wall_ms, lineage fingerprint
  of the input edge table, plus algorithm counters) — the durable analog of
  GDS's hierarchical progress tasks
  (``progress-tracking/.../tasks/Task.java``), queryable while the job runs.
- A ``_COMMITTED`` marker makes the superstep atomic: resume scans for the
  highest committed superstep and reloads that state; everything after is
  recomputed. Writing state each superstep also truncates plan lineage, so
  per-superstep plans stay flat (no O(iterations) plan growth).

In-memory mode (``checkpoint_dir=None``) uses ``localCheckpoint`` — same
lineage truncation, no durability — for tests and tight benchmark loops.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = (
    "algo string, superstep int, partition int, rows long, wall_ms double, "
    "lineage string, counters string"
)


def free_checkpointed(df: DataFrame) -> None:
    """Actually release a ``localCheckpoint``-ed DataFrame's storage.

    ``DataFrame.unpersist()`` is a no-op for these frames — the checkpointed
    RDD is persisted at the RDD level and never registered in the
    CacheManager, so the DataFrame-level call frees nothing and an in-memory
    superstep loop accumulates executor storage unboundedly. The LogicalRDD
    plan node exposes the underlying RDD; unpersist that directly.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        try:
            df.unpersist()
        except Exception:
            pass


class SuperstepLoop:
    """Checkpointed driver loop shared by all iterative algorithms."""

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        checkpoint_dir: str | None = None,
        checkpoint_interval: int = 1,
        lineage: str = "",
        auto_free_prev: bool = True,
    ) -> None:
        """``auto_free_prev``: in memory mode, release the previous
        superstep's localCheckpointed state when the next one commits
        (safe when the algorithm only ever reads the latest state — WCC,
        LPA, eigenvector). Algorithms that retain older committed frames
        (pagerank's delta fold) pass False and free frames themselves via
        ``free_checkpointed`` once folded."""
        self.spark = spark
        self.name = name
        self.dir = os.path.join(checkpoint_dir, name) if checkpoint_dir else None
        self.checkpoint_interval = max(1, checkpoint_interval)
        self.lineage = lineage
        self.auto_free_prev = auto_free_prev
        self._prev_cached: DataFrame | None = None
        self.memory_metrics: list[dict] = []

    # -- paths -----------------------------------------------------------
    def _state_path(self, superstep: int) -> str:
        return os.path.join(self.dir, f"state_{superstep:05d}")

    def _marker(self, superstep: int) -> str:
        return os.path.join(self._state_path(superstep), "_COMMITTED")

    def _metrics_path(self) -> str:
        return os.path.join(self.dir, "metrics")

    # -- resume ----------------------------------------------------------
    def last_committed(self) -> int | None:
        if not self.dir or not os.path.isdir(self.dir):
            return None
        done = [
            int(d.split("_")[1])
            for d in os.listdir(self.dir)
            if d.startswith("state_") and os.path.exists(self._marker(int(d.split("_")[1])))
        ]
        return max(done) if done else None

    def resume(self) -> tuple[DataFrame, int] | None:
        """(state, superstep) of the last committed superstep, or None.

        The committed marker records the lineage fingerprint of the edge
        table the checkpoint was built from; a stale checkpoint dir left by
        a *different* graph (or parameter set encoded into the lineage)
        must not be silently adopted — that would resume into wrong final
        results. Mismatch raises instead.
        """
        last = self.last_committed()
        if last is None:
            return None
        try:
            with open(self._marker(last)) as fh:
                marker = json.loads(fh.read() or "{}")
        except Exception:
            marker = {}
        committed_lineage = marker.get("lineage", "")
        if committed_lineage != self.lineage:
            raise ValueError(
                f"checkpoint dir {self.dir!r} was committed for a different "
                f"input (lineage {committed_lineage!r} != current "
                f"{self.lineage!r}); clear the directory or pass the "
                "matching input to resume"
            )
        return self.spark.read.parquet(self._state_path(last)), last

    # -- commit ----------------------------------------------------------
    def commit(
        self,
        state: DataFrame,
        superstep: int,
        counters: dict | None = None,
        observation=None,
    ) -> DataFrame:
        """Persist state for this superstep; return the re-rooted DataFrame.

        Durable mode writes parquet + per-partition metrics + marker.
        Memory mode localCheckpoints (lineage truncation) and keeps metrics
        in-process. Either way the returned DataFrame has flat lineage.

        ``observation``: a pyspark Observation whose metrics were attached to
        ``state`` via ``df.observe`` — its values (e.g. active-vertex count)
        are collected from the SAME job that materializes the state, so
        convergence checks cost no extra Spark job. Values are merged into
        the metrics counters.
        """
        t0 = time.monotonic()
        durable = self.dir is not None and superstep % self.checkpoint_interval == 0
        if durable:
            path = self._state_path(superstep)
            state.write.mode("overwrite").parquet(path)
            out = self.spark.read.parquet(path)
        else:
            out = state.localCheckpoint(eager=True)
            if self.auto_free_prev and self._prev_cached is not None:
                free_checkpointed(self._prev_cached)
            self._prev_cached = out
        wall_ms = (time.monotonic() - t0) * 1000.0
        if observation is not None:
            merged = dict(counters or {})
            merged.update({k: v for k, v in observation.get.items()})
            counters = merged

        # Per-partition lineage/metrics rows are the durable observability
        # contract; in memory mode we skip the extra scan and record one row.
        if durable:
            part_rows = (
                out.groupBy(F.spark_partition_id().alias("partition"))
                .agg(F.count("*").alias("rows"))
                .collect()
            )
        else:
            part_rows = []
        counters_json = json.dumps(counters or {}, sort_keys=True)
        rows = [
            {
                "algo": self.name,
                "superstep": superstep,
                "partition": int(r["partition"]),
                "rows": int(r["rows"]),
                "wall_ms": wall_ms,
                "lineage": self.lineage,
                "counters": counters_json,
            }
            for r in part_rows
        ] or [
            {
                "algo": self.name,
                "superstep": superstep,
                "partition": -1,
                "rows": 0,
                "wall_ms": wall_ms,
                "lineage": self.lineage,
                "counters": counters_json,
            }
        ]
        if durable:
            self.spark.createDataFrame(rows, METRICS_SCHEMA).coalesce(1).write.mode("append").parquet(
                self._metrics_path()
            )
            with open(self._marker(superstep), "w") as fh:
                fh.write(json.dumps({"superstep": superstep, "lineage": self.lineage}))
        else:
            self.memory_metrics.extend(rows)
        return out

    def metrics(self) -> DataFrame:
        if self.dir and os.path.isdir(self._metrics_path()):
            return self.spark.read.parquet(self._metrics_path())
        return self.spark.createDataFrame(self.memory_metrics or [], METRICS_SCHEMA)


_ROUNDTRIP_BASE: str | None = None
_ROUNDTRIP_SEQ = 0


def materialize_roundtrip(df: DataFrame, tag: str = "state") -> DataFrame:
    """Materialize a loop-state frame via a parquet round-trip.

    Why not localCheckpoint or persist? Loops whose per-round plan
    references the previous state MULTIPLE times (Louvain's gain scoring,
    SCC's trim/capture, K1-coloring's validation) hit two different Spark 4
    pathologies:

    - ``localCheckpoint`` rewrites the new LogicalRDD's statistics from the
      *origin plan's* stats (ExistingRDD.rewriteStatsAndConstraints), so
      size estimates compound as ``S_r = S_{r-1}^k`` — BigIntegers whose
      digit count grows exponentially with rounds; the driver ends up
      burning minutes per round inside BigInteger.multiply during stats
      estimation (observed on the Louvain inner loop).
    - ``persist()`` keeps stats concrete but doesn't truncate lineage, and
      the analyzer walks the logical plan as a TREE — k references per
      round unroll into a k^rounds-node walk (observed: minutes inside
      the analyzer's transformUp).

    A parquet write + read is the one primitive that truncates lineage AND
    yields a fresh relation with real file statistics. Files go to a
    session temp dir (tmpfs when available — the same device the shuffle
    already uses) and are left for process exit; durable-loop callers use
    SuperstepLoop's checkpoint_dir instead, which has the same effect.
    """
    global _ROUNDTRIP_BASE, _ROUNDTRIP_SEQ
    if _ROUNDTRIP_BASE is None:
        import tempfile

        parent = "/dev/shm" if os.path.isdir("/dev/shm") else None
        _ROUNDTRIP_BASE = tempfile.mkdtemp(prefix="spark_graft_rt_", dir=parent)
    _ROUNDTRIP_SEQ += 1
    path = os.path.join(_ROUNDTRIP_BASE, f"{tag}_{_ROUNDTRIP_SEQ:06d}")
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def edge_lineage(edges: DataFrame) -> str:
    """Cheap stable fingerprint of the input edge table for lineage rows."""
    try:
        files = edges.inputFiles()
        return json.dumps(sorted(files)[:64])
    except Exception:
        return "inline"
