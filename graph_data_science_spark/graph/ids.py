"""Deterministic dense node-id mapping (the GDS ``IdMap`` analog).

GDS maps original node ids to a dense ``[0, nodeCount)`` space so algorithms
can index flat arrays (reference: ``core-api/.../api/IdMap.java:35`` —
``toOriginalNodeId``/``toMappedNodeId``; built by
``core/.../loading/ArrayIdMapBuilder.java``). We need the same property so
CSR blocks can address per-block NumPy arrays by ``node_id - block_base``.

A naive ``row_number() OVER (ORDER BY key)`` is a single-partition window —
a driver-sized bottleneck at 10^12 rows. ``repartitionByRange`` is parallel
but **samples** the data to pick boundaries, and the sampled boundaries can
differ between the two actions this algorithm needs — which silently yields
out-of-range/duplicate ids (observed at 3.5M keys). Instead: a hash-bucket
two-phase rank, a pure function of the key set:

1. bucket every key by ``xxhash64(key) mod P`` (deterministic, no sampling);
2. count keys per bucket (tiny collect: P longs), prefix-sum on the driver;
3. rank within each bucket with a window partitioned by the bucket id
   (P-way parallel) ordered by the natural key, add the bucket offset.

The mapping is a stable bijection key → [0, n): same input ⇒ same ids, on
any cluster size. The global order interleaves buckets (it is *not* the
lexicographic rank) — callers needing an order-preserving rank build it from
structure they control (see triangles.py for a degree-ordered example).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 256  # fixed so ids don't depend on cluster parallelism


def dense_ids(df: DataFrame, key_cols: list[str], num_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Return ``df.select(key_cols).distinct()`` + a dense ``node_id`` column
    in [0, n) — a deterministic bijection of the key set."""
    keys = df.select(*key_cols).distinct()
    with_pid = keys.withColumn(
        "_pid", F.pmod(F.xxhash64(*key_cols), F.lit(num_buckets)).cast("int")
    )

    # Tiny collect: one row per bucket.
    counts = {r["_pid"]: r["cnt"] for r in with_pid.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    offset_col = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(offsets)]),
            F.array(*[F.lit(offsets[p]) for p in sorted(offsets)]),
        ),
        F.col("_pid"),
    ) if offsets else F.lit(0)

    w = Window.partitionBy("_pid").orderBy(*key_cols)
    return (
        with_pid.withColumn("_rank", F.row_number().over(w) - F.lit(1))
        .withColumn("node_id", (F.col("_rank") + offset_col).cast("long"))
        .drop("_pid", "_rank")
    )
