"""ScaleProperties: the GDS numeric scaler family as two-pass DataFrame ops
(reference ``algo-common/src/main/java/org/neo4j/gds/scaling/*.java``,
applied by ``algo/.../scaleproperties/ScaleProperties.java:53``).

Scalers: minmax, max, mean, log, center, stdscore, l1norm, l2norm, none.
Pass 1 computes the needed statistics (one Catalyst aggregate); pass 2 is a
pure column expression — no UDFs, no extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALERS = ("minmax", "max", "mean", "log", "center", "stdscore", "l1norm", "l2norm", "none")


def scale_properties(df: DataFrame, cols: list[str], scaler: str = "minmax", suffix: str = "_scaled") -> DataFrame:
    """Adds ``<col><suffix>`` per input column, scaled per the GDS scaler.

    Degenerate statistics (zero range/norm/std) scale to 0.0, matching the
    reference's divide-by-zero guards.
    """
    if scaler not in SCALERS:
        raise ValueError(f"unknown scaler {scaler!r}; choose from {SCALERS}")
    if scaler == "none":
        out = df
        for c in cols:
            out = out.withColumn(c + suffix, F.col(c).cast("double"))
        return out
    if scaler == "log":
        out = df
        for c in cols:
            out = out.withColumn(c + suffix, F.log(F.col(c).cast("double")))
        return out

    aggs = []
    for c in cols:
        col = F.col(c).cast("double")
        aggs += [
            F.min(col).alias(f"_min_{c}"),
            F.max(col).alias(f"_max_{c}"),
            F.avg(col).alias(f"_avg_{c}"),
            F.stddev_pop(col).alias(f"_std_{c}"),
            F.sum(F.abs(col)).alias(f"_l1_{c}"),
            F.sqrt(F.sum(col * col)).alias(f"_l2_{c}"),
            F.max(F.abs(col)).alias(f"_absmax_{c}"),
        ]
    stats = df.agg(*aggs).collect()[0]

    out = df
    for c in cols:
        col = F.col(c).cast("double")
        mn, mx = stats[f"_min_{c}"], stats[f"_max_{c}"]
        avg, std = stats[f"_avg_{c}"], stats[f"_std_{c}"]
        l1, l2, absmax = stats[f"_l1_{c}"], stats[f"_l2_{c}"], stats[f"_absmax_{c}"]
        if scaler == "minmax":
            expr = F.lit(0.0) if mx == mn else (col - F.lit(mn)) / F.lit(mx - mn)
        elif scaler == "max":
            expr = F.lit(0.0) if not absmax else col / F.lit(absmax)
        elif scaler == "mean":
            expr = F.lit(0.0) if mx == mn else (col - F.lit(avg)) / F.lit(mx - mn)
        elif scaler == "center":
            expr = col - F.lit(avg)
        elif scaler == "stdscore":
            expr = F.lit(0.0) if not std else (col - F.lit(avg)) / F.lit(std)
        elif scaler == "l1norm":
            expr = F.lit(0.0) if not l1 else col / F.lit(l1)
        else:  # l2norm
            expr = F.lit(0.0) if not l2 else col / F.lit(l2)
        out = out.withColumn(c + suffix, expr)
    return out
