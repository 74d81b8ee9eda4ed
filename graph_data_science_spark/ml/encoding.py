"""One-hot encoding function (reference
``alpha/alpha-proc/.../functions/OneHotEncodingFunc.java:33-52``,
``gds.alpha.ml.oneHotEncoding``).

Returns, for each row, a list aligned with ``available`` where position i is
1 if ``available[i]`` ∈ ``selected`` else 0. Null semantics match the
reference: null ``available`` → empty list; null ``selected`` → all zeros.
Pure column expression (``transform`` + ``array_contains``) — JVM-side,
whole-stage codegen, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def one_hot_encoding(available: Column, selected: Column) -> Column:
    """Array<long> column: 1/0 per available value by membership in selected."""
    encoded = F.transform(
        available,
        lambda v: F.when(
            selected.isNull(), F.lit(0).cast("long")
        ).otherwise(F.coalesce(F.array_contains(selected, v).cast("long"), F.lit(0))),
    )
    return F.when(available.isNull(), F.array().cast("array<long>")).otherwise(encoded)
