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

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    NumericType,
    StringType,
    TimestampType,
)

from graph_data_science_spark.graph.ids import bucket_count_for

DEFAULT_BUCKETS = 256

# Above this many (partition, bucket) offset entries, the driver-built map
# LITERAL becomes a plan-bloating expression (10^12 rows → 2^19 buckets →
# a 500k-entry literal); switch to a broadcast equi-join against a tiny
# offsets DataFrame instead.
_MAP_LITERAL_MAX = 8192

# Depth-mode boundary cap: the quantile boundaries become a literal array
# scanned per row, so O(n_buckets) per-row cost — capped, unlike the O(1)
# width mode which scales to 2^19 buckets.
_DEPTH_MAX_BOUNDARIES = 1024


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
    bucket_mode: str = "width",
) -> DataFrame:
    """Annotate ``df`` with a ``_rk_bucket`` int column: an
    order-monotone range bucket of the leading order column.

    ``bucket_mode='width'`` (default): equi-width ``width_bucket`` over
    the observed [min, max] — deterministic, O(1) per row, but
    value-skewed distributions can unbalance buckets. ``'depth'``:
    sampled-quantile boundaries (``approxQuantile``, computed ONCE and
    captured as literals, so every later action sees the same
    boundaries) — balanced buckets under adversarial skew at the cost of
    an O(n_buckets) per-row literal-array scan, so the boundary count is
    capped at {cap}. Either mode assigns equal keys the same bucket
    (bucket is a pure function of the VALUE), so ranks are bit-identical
    between modes.""".format(cap=_DEPTH_MAX_BOUNDARIES)
    if bucket_mode not in ("width", "depth"):
        raise ValueError(f"bucket_mode must be 'width' or 'depth', got {bucket_mode!r}")
    key, is_float = _monotone_key(df, order_cols[0])
    # NaN and ±Infinity route to their own edge buckets below, so exclude
    # them from the [lo, hi] range: F.max over a float column returns NaN
    # when any NaN is present, and an infinite bound makes every
    # width_bucket width infinite — either way every row collapses into
    # ONE bucket, the single-task straggler this module exists to prevent.
    _pinf, _ninf = F.lit(float("inf")), F.lit(float("-inf"))
    range_key = (
        F.when(~F.isnan(key) & (key != _pinf) & (key != _ninf), key) if is_float else key
    )
    stats = df.agg(
        F.min(range_key).alias("lo"), F.max(range_key).alias("hi")
    ).collect()[0]
    lo, hi = stats["lo"], stats["hi"]
    if lo is None or hi is None or lo == hi:
        # empty, all-null, or single-valued leading column: one bucket
        bucket = F.lit(1)
    elif bucket_mode == "depth":
        nb = min(int(n_buckets), _DEPTH_MAX_BOUNDARIES)
        probs = [i / nb for i in range(1, nb)]
        kdf = df.select(range_key.alias("_rk_k")).filter(F.col("_rk_k").isNotNull())
        bounds = sorted(set(kdf.approxQuantile("_rk_k", probs, 0.001))) if probs else []
        if not bounds:
            bucket = F.lit(1)
        else:
            # bucket = 1 + #boundaries strictly below the key: equal keys
            # share a bucket, order is monotone in the key.
            barr = F.array(*[F.lit(float(x)) for x in bounds])
            bucket = F.lit(1) + F.size(F.filter(barr, lambda x: x < key))
    else:
        # width_bucket(x, lo, hi, n) ∈ [1, n] for x ∈ [lo, hi); x == hi
        # falls in n+1 — fold it back. NOT F.least(wb, n): least SKIPS
        # nulls, so a NULL key would map to bucket n (mid-sequence) instead
        # of propagating to the coalesce below. Nulls (ordered first) → 0;
        # NaN (ordered last) → n+2.
        # Spark's width_bucket computes numBucket·(x − lo) in its
        # numerator, which overflows (→ garbage buckets / one-bucket
        # collapse) when finite keys span a large part of the double
        # range. Rescale key and bounds by a power of two sized in log
        # space so span · n_buckets stays below 2^1020 — division by 2^k
        # is monotone (ties may collapse to subnormals, order never
        # inverts), so bucket boundaries move but ranks are unaffected.
        flo, fhi = float(lo), float(hi)
        half_span = fhi / 2.0 - flo / 2.0  # always finite for finite bounds
        shift = 0
        if half_span > 0:
            excess = math.log2(half_span) + 1.0 + math.log2(float(n_buckets)) - 1020.0
            if excess > 0:
                shift = int(math.ceil(excess))
        if shift:
            s = math.ldexp(1.0, shift)
            wb = F.width_bucket(
                key / F.lit(s), F.lit(flo / s), F.lit(fhi / s), F.lit(n_buckets)
            )
        else:
            wb = F.width_bucket(key, F.lit(flo), F.lit(fhi), F.lit(n_buckets))
        bucket = F.when(wb > F.lit(n_buckets), F.lit(n_buckets)).otherwise(wb)
    bucket = F.coalesce(bucket, F.lit(0))
    if is_float:
        # Edge buckets in global order: NULL (0, nulls-first) ≤ -Inf (0 —
        # shares the null bucket; the within-bucket window orders nulls
        # before -Inf) < finite [1, n] < +Inf (n+1) < NaN (n+2, Spark
        # orders NaN greatest). NULL is routed explicitly because the
        # degenerate lo==hi/all-null branch above assigns bucket 1, which
        # would rank NULLs after a -Inf row.
        c0 = F.col(order_cols[0])
        bucket = (
            F.when(F.isnan(c0), F.lit(n_buckets + 2))
            .when(c0 == _pinf, F.lit(n_buckets + 1))
            .when(c0.isNull() | (c0 == _ninf), F.lit(0))
            .otherwise(bucket)
        )
    return df.withColumn("_rk_bucket", bucket.cast("int"))


def _part_key(v):
    """Hashable driver-side grouping key for a partition value (groups NaN
    with NaN, the way Spark's grouping does)."""
    if isinstance(v, float) and v != v:
        return "\x00NaN"
    return v


def _prefix_offsets(rows, partition_cols, value_fields) -> list[tuple]:
    """Driver-side prefix sum of per-(partition, bucket) totals. Returns
    [(part_values_tuple, bucket, off_1, ..., off_k)] — ≤ |partition
    groups| × n_buckets entries, one offset per ``value_fields`` entry.
    Partition values stay RAW (typed) — they are re-attached with a
    null-safe typed join, never via stringified keys (Python and Spark
    disagree on string spellings for floats/booleans, and concat_ws-style
    keys conflate NULL/empty partitions)."""
    if isinstance(value_fields, str):
        value_fields = [value_fields]
    out, acc_by_part = [], {}
    for r in sorted(rows, key=lambda r: r["_rk_bucket"]):
        part = tuple(r[c] for c in partition_cols)
        pk = tuple(_part_key(v) for v in part)
        accs = acc_by_part.get(pk, [0] * len(value_fields))
        out.append((part, int(r["_rk_bucket"]), *accs))
        acc_by_part[pk] = [a + (r[f] or 0) for a, f in zip(accs, value_fields)]
    return out


def _with_offset(
    b: DataFrame, offsets: list[tuple], partition_cols, off_cols: tuple[str, ...] = ("_rk_off",)
) -> DataFrame:
    """Attach offset column(s) to the bucket-annotated frame.

    No partition columns: a bucket-keyed map literal (broadcast equi-join
    on the bucket above _MAP_LITERAL_MAX entries — 10^12-row inputs
    produce too many buckets for a literal plan node). With partition
    columns: ALWAYS a null-safe broadcast join on the actual typed
    columns — no stringification, so NULL / empty-string / NaN partition
    values and float-vs-Python spelling differences cannot mis-key the
    lookup. ``offsets`` rows are (part_values_tuple, bucket, off_1, ...,
    off_k) aligned with ``off_cols``; an offset column is typed double iff
    any of its values is fractional (fp cumsum totals)."""
    if not offsets:
        for oc in off_cols:
            b = b.withColumn(oc, F.lit(0))
        return b
    is_double = [
        any(isinstance(row[2 + i], float) for row in offsets) for i in range(len(off_cols))
    ]

    def _off_vals(row):
        return tuple(
            float(row[2 + i]) if is_double[i] else int(row[2 + i]) for i in range(len(off_cols))
        )

    spark = b.sparkSession
    if not partition_cols:
        if len(offsets) <= _MAP_LITERAL_MAX:
            for i, oc in enumerate(off_cols):
                vals = [
                    float(row[2 + i]) if is_double[i] else int(row[2 + i]) for row in offsets
                ]
                lookup = F.element_at(
                    F.map_from_arrays(
                        F.array(*[F.lit(int(row[1])) for row in offsets]),
                        F.array(*[F.lit(v) for v in vals]),
                    ),
                    F.col("_rk_bucket"),
                )
                b = b.withColumn(oc, lookup)
            return b
        off_fields = ", ".join(
            f"`{oc}` " + ("double" if is_double[i] else "long") for i, oc in enumerate(off_cols)
        )
        odf = spark.createDataFrame(
            [(int(row[1]), *_off_vals(row)) for row in offsets],
            f"_rk_bucket int, {off_fields}",
        )
        return b.join(F.broadcast(odf), ["_rk_bucket"], "left")
    # Partition columns: typed null-safe broadcast join. The offsets frame
    # reuses the parent frame's column types for the partition values.
    from pyspark.sql.types import IntegerType, StructField, StructType
    from pyspark.sql.types import DoubleType, LongType

    part_fields = [
        StructField(f"_rk_pc{i}", b.schema[c].dataType, True)
        for i, c in enumerate(partition_cols)
    ]
    schema = StructType(
        part_fields
        + [StructField("_rk_bkt", IntegerType(), False)]
        + [
            StructField(oc, DoubleType() if is_double[i] else LongType(), False)
            for i, oc in enumerate(off_cols)
        ]
    )
    odf = spark.createDataFrame(
        [(*row[0], int(row[1]), *_off_vals(row)) for row in offsets], schema
    )
    cond = b["_rk_bucket"] == odf["_rk_bkt"]
    for i, c in enumerate(partition_cols):
        cond = cond & b[c].eqNullSafe(odf[f"_rk_pc{i}"])
    joined = b.join(F.broadcast(odf), cond, "left")
    return joined.drop("_rk_bkt", *[f"_rk_pc{i}" for i in range(len(partition_cols))])


def _resolve_buckets(df: DataFrame, n_buckets: int | None, n_rows: int | None) -> int:
    """``n_buckets=None`` sizes buckets from the row count so per-bucket
    single-task sorts stay ~2M rows at ANY scale (`ids.bucket_count_for`;
    10^12 rows → 2^19 buckets — never a fixed small constant). Pass
    ``n_rows`` when the caller already knows it to skip the count()."""
    if n_buckets is not None:
        return int(n_buckets)
    if n_rows is None:
        n_rows = df.count()
    return bucket_count_for(int(n_rows))


def ordered_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "_rank",
    partition_cols: tuple[str, ...] = (),
    n_buckets: int | None = DEFAULT_BUCKETS,
    n_rows: int | None = None,
    bucket_mode: str = "width",
) -> DataFrame:
    """``df`` + ``rank_col`` = 0-based ``row_number() OVER (PARTITION BY
    partition_cols ORDER BY order_cols) - 1``, computed without a global
    single-partition window. ``partition_cols`` (if any) must be
    low-cardinality — per-(partition, bucket) counts are collected to the
    driver. Bit-identical to the naive window. ``n_buckets=None`` derives
    the bucket count from the row count (see ``_resolve_buckets``)."""
    n_buckets = _resolve_buckets(df, n_buckets, n_rows)
    b = _bucketed(df, order_cols, partition_cols, n_buckets, bucket_mode)
    counts = (
        b.groupBy(*partition_cols, "_rk_bucket").agg(F.count("*").alias("_n")).collect()
    )
    b = _with_offset(b, _prefix_offsets(counts, partition_cols, "_n"), partition_cols)
    w = Window.partitionBy(*partition_cols, "_rk_bucket").orderBy(*order_cols)
    return (
        b.withColumn(rank_col, (F.row_number().over(w) - 1 + F.col("_rk_off")).cast("long"))
        .drop("_rk_bucket", "_rk_off")
    )


def ordered_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    cum_col: str = "_cum",
    partition_cols: tuple[str, ...] = (),
    n_buckets: int | None = DEFAULT_BUCKETS,
    n_rows: int | None = None,
    bucket_mode: str = "width",
) -> DataFrame:
    """``df`` + ``cum_col`` = inclusive ``sum(value_col) OVER (PARTITION BY
    partition_cols ORDER BY order_cols ROWS UNBOUNDED PRECEDING)``,
    two-level: per-bucket running sum + driver prefix of per-bucket
    totals. Floating-point note: addition is reassociated across buckets,
    so the result matches the naive window up to fp rounding (exact for
    integral value columns)."""
    return ordered_scan(
        df,
        order_cols,
        {value_col: cum_col},
        partition_cols=partition_cols,
        n_buckets=n_buckets,
        n_rows=n_rows,
        bucket_mode=bucket_mode,
    )


def ordered_scan(
    df: DataFrame,
    order_cols: list[str],
    cumsums: dict[str, str],
    rank_col: str | None = None,
    partition_cols: tuple[str, ...] = (),
    n_buckets: int | None = DEFAULT_BUCKETS,
    n_rows: int | None = None,
    bucket_mode: str = "width",
) -> DataFrame:
    """Several inclusive running sums (``cumsums``: value column → output
    column) and optionally a 0-based ``rank_col`` over the SAME global
    order, in ONE bucket pass (one tiny driver collect of per-bucket
    totals, one per-bucket window). The k-cumsum generalization of
    :func:`ordered_cumsum` — bit-identical to k naive global windows plus
    ``row_number() - 1`` (fp caveat of ordered_cumsum applies)."""
    n_buckets = _resolve_buckets(df, n_buckets, n_rows)
    b = _bucketed(df, order_cols, partition_cols, n_buckets, bucket_mode)
    value_cols = list(cumsums)
    aggs = [F.sum(F.col(vc)).alias(f"_t{i}") for i, vc in enumerate(value_cols)]
    if rank_col is not None:
        aggs.append(F.count("*").alias("_tn"))
    totals = b.groupBy(*partition_cols, "_rk_bucket").agg(*aggs).collect()
    fields = [f"_t{i}" for i in range(len(value_cols))] + (
        ["_tn"] if rank_col is not None else []
    )
    off_cols = tuple(f"_rk_off{i}" for i in range(len(fields)))
    b = _with_offset(b, _prefix_offsets(totals, partition_cols, fields), partition_cols, off_cols)
    w = Window.partitionBy(*partition_cols, "_rk_bucket").orderBy(*order_cols)
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    for i, vc in enumerate(value_cols):
        b = b.withColumn(cumsums[vc], F.sum(F.col(vc)).over(wsum) + F.col(off_cols[i]))
    if rank_col is not None:
        b = b.withColumn(
            rank_col, (F.row_number().over(w) - 1 + F.col(off_cols[len(value_cols)])).cast("long")
        )
    return b.drop("_rk_bucket", *off_cols)
