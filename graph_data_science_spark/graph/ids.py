"""Deterministic dense node-id mapping (the GDS ``IdMap`` analog).

GDS maps original node ids to a dense ``[0, nodeCount)`` space so algorithms
can index flat arrays (reference: ``core-api/.../api/IdMap.java:35`` —
``toOriginalNodeId``/``toMappedNodeId``; built by
``core/.../loading/ArrayIdMapBuilder.java``). We need the same property so
CSR blocks can address per-block NumPy arrays by ``node_id - block_base``.

A naive ``row_number() OVER (ORDER BY key)`` is a single-partition window —
a driver-sized bottleneck at 10^12 rows. Instead we do a two-phase
distributed rank, which is fully parallel and deterministic:

1. range-repartition + sort rows by the natural key (a real distributed
   sort; Spark's range partitioner keeps key ranges disjoint per partition);
2. count rows per partition (tiny collect, one long per partition), compute
   exclusive prefix offsets on the driver;
3. rank within each partition with a window PARTITIONED by the physical
   partition id (parallel, no global shuffle) and add the offset.

The result is a bijection key → node_id identical to the global sort rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_ids(df: DataFrame, key_cols: list[str], num_partitions: int | None = None) -> DataFrame:
    """Return ``df.select(key_cols).distinct()`` + a dense ``node_id`` column.

    node_id is the 0-based rank of the key in lexicographic order — stable
    across runs and parallelism levels (pure function of the key set).
    """
    keys = df.select(*key_cols).distinct()
    if num_partitions is None:
        num_partitions = keys.sparkSession.sparkContext.defaultParallelism
    ordered = keys.repartitionByRange(num_partitions, *key_cols).sortWithinPartitions(*key_cols)
    with_pid = ordered.withColumn("_pid", F.spark_partition_id())

    # Tiny collect: one row per partition.
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
