"""Seeded, reproducible corpus sampling for training-data pipelines.

Down-sampling a 100 TB corpus is a single linear scan when the keep/drop
decision is a pure function of the row: every operator here derives a
uniform draw from a portable md5 hash of the document id (replayable in
any SQL engine — the DuckDB oracle recomputes every draw), so reruns,
resumes, and cross-engine verification all see the identical sample. No
``rand()`` anywhere: Spark's per-partition RNG draws depend on partition
layout and would break both determinism under repartitioning and the
oracle.

Scale shapes:
- ``weighted_sample``: zero-shuffle single scan (rate is a column
  expression over the row's own quality signals).
- ``stratified_sample_to_target``: one tiny groupBy on the stratum column
  (|strata| rows) + a broadcast join of the per-stratum rates — the corpus
  itself is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.datapipe.dedup import portable_hash

# portable_hash keeps 15 hex digits = 60 bits; map to [0, 1).
_HASH_SPACE = float(16**15)


def seeded_uniform(id_col: Column, seed: int | str) -> Column:
    """Deterministic u ~ U[0,1) per id: md5(seed:id) high bits / 16^15.

    Replayable in DuckDB as ``conv(substring(md5(...), 1, 15), 16, 10) /
    16^15`` — the same portable hash the MinHash/SimHash family uses.
    """
    return portable_hash(id_col.cast("string"), seed) / F.lit(_HASH_SPACE)


def weighted_sample(
    df: DataFrame,
    rate: Column,
    seed: int | str = "sample",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row with probability ``rate`` (a column expression in
    [0, 1], e.g. a quality-bucket CASE over the row's own signals):
    importance/quality-weighted corpus down-sampling.

    keep ⇔ u(id) < rate — one scan, zero shuffle, fully JVM-side.
    """
    u = seeded_uniform(F.col(id_col), seed)
    return df.filter(u < rate)


def stratified_sample_to_target(
    df: DataFrame,
    stratum_col: str,
    targets: dict[str, float],
    seed: int | str = "mix",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rebalance the corpus toward a target mix over ``stratum_col``
    (e.g. source/domain/language proportions for a training run).

    Per-stratum keep rate = min(1, (target_s / actual_s) · min_ratio)
    where actual_s is the stratum's observed share and min_ratio =
    min over strata of actual_s / target_s — i.e. the largest subsample
    that achieves the target proportions exactly in expectation without
    up-sampling any stratum. Strata absent from ``targets`` are dropped.

    One |strata|-row aggregate + broadcast join; the corpus is scanned
    once and never shuffled.
    """
    spark = df.sparkSession
    shares = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    tgt = spark.createDataFrame(
        [(k, float(v)) for k, v in targets.items()], f"{stratum_col} string, _target double"
    )
    total = F.sum("_n").over(Window.partitionBy())
    rates = (
        shares.join(F.broadcast(tgt), stratum_col, "inner")
        .withColumn("_share", F.col("_n") / total)
        .withColumn("_ratio", F.col("_share") / F.col("_target"))
    )
    min_ratio = rates.agg(F.min("_ratio")).first()[0]
    rates = rates.select(
        stratum_col,
        F.least(F.lit(1.0), F.lit(float(min_ratio)) / F.col("_ratio")).alias("_rate"),
    )
    u = seeded_uniform(F.col(id_col), seed)
    return (
        df.join(F.broadcast(rates), stratum_col, "inner")
        .filter(u < F.col("_rate"))
        .drop("_rate")
    )
