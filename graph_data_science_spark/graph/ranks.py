"""Distributed order-preserving rank / cumulative sum.

Several reference contracts are defined over a GLOBAL order — the
k-fold splitter's round-robin pointer over (class, position)
(``ml/ml-algo/.../splitting/StratifiedKFoldSplitter.java:76-110``), the
fraction splitter's "first ⌊n·f⌋ ids in caller order"
(``FractionSplitter.java:33-49``), the negative sampler's dense
position→id draw table (``RandomNegativeSampler.java:43-110``), and
GraphSage's degree^0.75 inverse-CDF (``GraphSageHelper.java``
degreeWeightedSampler). The naive Spark expression of each is
``row_number()/sum() OVER (ORDER BY …)`` with no partitioning — which
Spark executes by moving EVERY row through one task ("Moving all data to
a single partition"): correct at test scale, a guaranteed straggler at
100 TB.

The distributed equivalent used here is a two-level rank, the same shape
``graph/ids.py`` (hash-bucketed dense ids) and ``datapipe/packing.py``
(bucketed packing) already use — except these contracts need the rank to
be ORDER-PRESERVING, so the buckets must be *ranges* of the leading
order column rather than hash buckets:

1. compute a monotone numeric image of the leading order column
   (numerics/timestamps cast; strings via their 7-byte big-endian
   prefix — monotone under Spark's unsigned-bytewise string ordering);
2. equi-width ``width_bucket`` over the observed [min, max] — a pure
   O(1)-per-row function of the VALUE (no sampling, no
   ``repartitionByRange`` — its sampled boundaries can differ between
   the multiple actions a caller runs, which is exactly the
   nondeterminism ``graph/ids.py`` documents);
3. count (or sum) per bucket — a tiny collect of ≤ n_buckets rows —
   prefix-summed on the driver into per-bucket offsets;
4. one window per bucket (``partitionBy(bucket)``), ordered by the full
   order-column list, plus the bucket's offset.

Rows with equal leading values land in the same bucket (the bucket is a
function of the value), so the within-bucket window sees every tie group
whole and the concatenation of buckets IS the global order. Value skew
can unbalance buckets (equi-width, not equi-depth) — that costs balance,
never correctness, and the bucket count is a knob.

The result is bit-identical to the single-partition window, so the
DuckDB oracles (which replay these contracts with plain ``OVER (ORDER
BY …)``) are unaffected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    NumericType,
    StringType,
    TimestampType,
)

DEFAULT_BUCKETS = 256


def _monotone_key(df: DataFrame, col: str) -> tuple[Column, bool]:
    """A double-valued column that is monotone non-decreasing in the
    ordering of ``col`` (ties may collapse; order never inverts). Returns
    (expr, is_float) — is_float callers use to route NaN to the last
    bucket (Spark orders NaN greatest)."""
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, StringType):
        # 7-byte big-endian prefix: monotone under unsigned-bytewise
        # (UTF8String) comparison; zero-padded so shorter strings rank
        # by their bytes, not their length. 14 hex digits < 2^56 — exact
        # in a double.
        padded = F.substring(F.concat(c.cast("binary"), F.lit(bytearray(8))), 1, 7)
        return F.conv(F.hex(padded), 16, 10).cast("double"), False
    if isinstance(dt, (TimestampType, DateType, BooleanType, NumericType)):
        if isinstance(dt, DateType):
            c = c.cast("timestamp")
        return c.cast("double"), str(dt.simpleString()) in ("float", "double")
    raise TypeError(f"ordered_rank: unsupported leading order column type {dt}")


def _bucketed(
    df: DataFrame,
    order_cols: list[str],
    partition_cols: tuple[str, ...],
    n_buckets: int,
) -> DataFrame:
    """Annotate ``df`` with a ``_rk_bucket`` int column: an
    order-monotone range bucket of the leading order column."""
    key, is_float = _monotone_key(df, order_cols[0])
    stats = df.agg(
        F.min(key).alias("lo"), F.max(key).alias("hi")
    ).collect()[0]
    lo, hi = stats["lo"], stats["hi"]
    if lo is None or hi is None or lo == hi:
        # empty, all-null, or single-valued leading column: one bucket
        bucket = F.lit(1)
    else:
        # width_bucket(x, lo, hi, n) ∈ [1, n] for x ∈ [lo, hi); x == hi
        # falls in n+1 — fold it back. Nulls (ordered first) → 0; NaN
        # (ordered last) → n+2.
        bucket = F.least(
            F.width_bucket(key, F.lit(float(lo)), F.lit(float(hi)), F.lit(n_buckets)),
            F.lit(n_buckets),
        )
    bucket = F.coalesce(bucket, F.lit(0))
    if is_float:
        bucket = F.when(F.isnan(F.col(order_cols[0])), F.lit(n_buckets + 2)).otherwise(bucket)
    return df.withColumn("_rk_bucket", bucket.cast("int"))


def _py_str(v) -> str:
    """Match Spark's CAST(x AS STRING) for the types partition columns
    take (booleans differ: Python 'True' vs Spark 'true')."""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _offsets_map(rows, partition_cols, value_field) -> Column:
    """Driver-side prefix sum of per-(partition, bucket) totals → a map
    literal keyed by 'part-vals␟bucket'. ≤ |partition groups| × n_buckets
    entries — tiny by construction (callers keep partition_cols
    low-cardinality; the buckets are the scale axis)."""
    keys, vals = [], []
    acc_by_part: dict = {}
    for r in sorted(
        rows, key=lambda r: (tuple(_py_str(r[c]) for c in partition_cols), r["_rk_bucket"])
    ):
        part = tuple(_py_str(r[c]) for c in partition_cols)
        acc = acc_by_part.get(part, 0)
        keys.append("\x1f".join(part + (str(r["_rk_bucket"]),)))
        vals.append(acc)
        acc_by_part[part] = acc + r[value_field]
    if not keys:
        return F.lit(0)
    return F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(k) for k in keys]), F.array(*[F.lit(v) for v in vals])
        ),
        F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in partition_cols], F.col("_rk_bucket").cast("string")
        ),
    )


def ordered_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "_rank",
    partition_cols: tuple[str, ...] = (),
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """``df`` + ``rank_col`` = 0-based ``row_number() OVER (PARTITION BY
    partition_cols ORDER BY order_cols) - 1``, computed without a global
    single-partition window. ``partition_cols`` (if any) must be
    low-cardinality — per-(partition, bucket) counts are collected to the
    driver. Bit-identical to the naive window."""
    b = _bucketed(df, order_cols, partition_cols, n_buckets)
    counts = (
        b.groupBy(*partition_cols, "_rk_bucket").agg(F.count("*").alias("_n")).collect()
    )
    offset = _offsets_map(counts, partition_cols, "_n")
    w = Window.partitionBy(*partition_cols, "_rk_bucket").orderBy(*order_cols)
    return (
        b.withColumn(rank_col, (F.row_number().over(w) - 1 + offset).cast("long"))
        .drop("_rk_bucket")
    )


def ordered_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    cum_col: str = "_cum",
    partition_cols: tuple[str, ...] = (),
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """``df`` + ``cum_col`` = inclusive ``sum(value_col) OVER (PARTITION BY
    partition_cols ORDER BY order_cols ROWS UNBOUNDED PRECEDING)``,
    two-level: per-bucket running sum + driver prefix of per-bucket
    totals. Floating-point note: addition is reassociated across buckets,
    so the result matches the naive window up to fp rounding (exact for
    integral value columns)."""
    b = _bucketed(df, order_cols, partition_cols, n_buckets)
    totals = (
        b.groupBy(*partition_cols, "_rk_bucket")
        .agg(F.sum(F.col(value_col)).alias("_t"))
        .collect()
    )
    offset = _offsets_map(totals, partition_cols, "_t")
    w = (
        Window.partitionBy(*partition_cols, "_rk_bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        b.withColumn(cum_col, F.sum(F.col(value_col)).over(w) + offset)
        .drop("_rk_bucket")
    )
