"""Vector similarity user functions (reference
``proc/common/src/main/java/org/neo4j/gds/functions/SimilaritiesFunc.java:40-118``
— the ``gds.similarity.*`` Cypher function family) plus the KNN per-property
similarity metric expressions
(``algo/.../similarity/knn/metrics/{Cosine,Euclidean,Pearson,Jaccard,
Overlap,LongPropertySimilarityComputer,DoublePropertySimilarityComputer}.java``).

Everything here is a pure Catalyst column expression — JVM-side, whole-stage
codegen, zero UDFs, zero shuffles. ``F.zip_with`` / ``F.aggregate`` /
``F.transform`` keep the per-element arithmetic inside Tungsten, so a scan
computing these over a 100 TB pairs table is bandwidth-bound, not
Python-bound.

Semantics mirrored exactly:

- ``gds.similarity.cosine`` (``Intersections.cosine:164-180``): no
  zero-vector guard — a zero norm yields NaN, as in the reference.
- ``gds.similarity.pearson`` (``Intersections.pearson:137-162``): NaN → 0.
- ``gds.similarity.euclideanDistance`` / ``euclidean``
  (``SimilaritiesFunc.java:77-97``): √Σδ² and 1/(1+distance).
- ``gds.similarity.jaccard`` (``SimilaritiesFunc.jaccard:155-189``):
  MULTISET jaccard — duplicates count, intersection = Σ_v min(count₁(v),
  count₂(v)), union = |v1|+|v2|−intersection, empty∪empty → 1, null
  elements dropped, null vector → 0.
- ``gds.similarity.overlap`` (``SimilaritiesFunc.java:99-118``): DISTINCT
  intersection over min(multiset sizes) — sizes taken after null-element
  removal but before dedup, exactly as the reference's
  ``vector1.removeIf`` + ``HashSet`` does.
- cosine/pearson/euclidean length validation
  (``SimilaritiesFunc.validateLength:130-135``): vectors must be non-empty
  and the same size; ``validate=False`` skips the check (then semantics
  follow zip_with's null-padding).

KNN metric variants (0..1-normalized, min-length truncation per
``Cosine.java:28-39`` / ``Euclidean.java:28-40`` / ``Pearson.java:26-44``):
``knn_similarity`` with metric ∈ {cosine, euclidean, pearson} for numeric
arrays, {jaccard, overlap} for id arrays (``Jaccard.metric`` /
``Overlap.metric``), and scalar columns → 1/(1+|a−b|)
(``LongPropertySimilarityComputer.java:36-40``,
``DoublePropertySimilarityComputer.java:36-40``). ``combined_similarity``
averages the NaN-guarded per-property scores
(``CombinedSimilarityComputer.java:40-46`` + ``safeSimilarity``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _dot(a: Column, b: Column) -> Column:
    return _sum(F.zip_with(a, b, lambda x, y: x * y))


def _validated(v1: Column, v2: Column, expr: Column, validate: bool) -> Column:
    """Reference ``validateLength``: throw unless same-size and non-empty."""
    if not validate:
        return expr
    ok = (F.size(v1) == F.size(v2)) & (F.size(v1) > 0)
    guard = F.assert_true(ok, F.lit("Vectors must be non-empty and of the same size"))
    return F.when(guard.isNull(), expr)


def cosine(v1: Column, v2: Column, validate: bool = True) -> Column:
    """``gds.similarity.cosine`` — raw cosine, NaN on a zero norm (Java's
    0/0; Spark's ANSI mode would error, so the zero-denominator case is
    branched to a literal NaN — when the norm product is 0 the dot product
    is necessarily 0 too)."""
    denom = F.sqrt(
        _sum(F.transform(v1, lambda x: x * x)) * _sum(F.transform(v2, lambda x: x * x))
    )
    expr = F.when(denom == 0.0, F.lit(float("nan"))).otherwise(_dot(v1, v2) / denom)
    return _validated(v1, v2, expr, validate)


def pearson(v1: Column, v2: Column, validate: bool = True) -> Column:
    """``gds.similarity.pearson`` — sample-mean-centered cosine; NaN → 0."""
    n = F.size(v1).cast("double")
    m1 = _sum(v1) / n
    m2 = _sum(v2) / n
    d1 = F.transform(v1, lambda x: x - m1)
    d2 = F.transform(v2, lambda x: x - m2)
    denom = F.sqrt(_sum(F.transform(d1, lambda x: x * x)) * _sum(F.transform(d2, lambda x: x * x)))
    r = F.when(denom == 0.0, F.lit(0.0)).otherwise(_dot(d1, d2) / denom)
    return _validated(v1, v2, F.nanvl(r, F.lit(0.0)), validate)


def euclidean_distance(v1: Column, v2: Column, validate: bool = True) -> Column:
    """``gds.similarity.euclideanDistance`` — √Σ(x−y)²."""
    expr = F.sqrt(_sum(F.zip_with(v1, v2, lambda x, y: (x - y) * (x - y))))
    return _validated(v1, v2, expr, validate)


def euclidean(v1: Column, v2: Column, validate: bool = True) -> Column:
    """``gds.similarity.euclidean`` — 1 / (1 + euclideanDistance)."""
    return 1.0 / (1.0 + euclidean_distance(v1, v2, validate))


def jaccard(v1: Column, v2: Column) -> Column:
    """``gds.similarity.jaccard`` — multiset jaccard with duplicate support."""
    c1 = F.filter(v1, lambda x: x.isNotNull())
    c2 = F.filter(v2, lambda x: x.isNotNull())
    inter = F.aggregate(
        F.array_distinct(c1),
        F.lit(0).cast("long"),
        lambda acc, v: acc
        + F.least(
            F.size(F.filter(c1, lambda x: x == v)),
            F.size(F.filter(c2, lambda x: x == v)),
        ).cast("long"),
    )
    union = F.size(c1) + F.size(c2) - inter
    sim = F.when(union == 0, F.lit(1.0)).otherwise(inter.cast("double") / union)
    return F.when(v1.isNull() | v2.isNull(), F.lit(0.0)).otherwise(sim)


def overlap(v1: Column, v2: Column) -> Column:
    """``gds.similarity.overlap`` — |set₁ ∩ set₂| / min(|v1|, |v2|)."""
    c1 = F.filter(v1, lambda x: x.isNotNull())
    c2 = F.filter(v2, lambda x: x.isNotNull())
    inter = F.size(F.array_intersect(c1, c2))
    denom = F.least(F.size(c1), F.size(c2))
    sim = F.when(denom == 0, F.lit(0.0)).otherwise(inter.cast("double") / denom)
    return F.when(v1.isNull() | v2.isNull(), F.lit(0.0)).otherwise(sim)


# --------------------------------------------------------------------------
# KNN per-property similarity metrics (0..1-normalized)
# --------------------------------------------------------------------------


def _truncated(a: Column, b: Column) -> tuple[Column, Column]:
    """Reference array metrics compare over min(len(a), len(b))."""
    n = F.least(F.size(a), F.size(b))
    return F.slice(a, F.lit(1), n), F.slice(b, F.lit(1), n)


def knn_similarity(a: Column, b: Column, metric: str = "cosine") -> Column:
    """One property's KNN similarity (see module doc for the file:line map).

    Array metrics: ``cosine`` → (raw+1)/2, ``euclidean`` → 1/(1+dist),
    ``pearson`` → (r+1)/2, ``jaccard``/``overlap`` → distinct-set forms
    over id arrays. Scalar metric: ``absdiff`` → 1/(1+|a−b|). All NaN-safe
    via ``safeSimilarity`` (non-finite → 0)."""
    if metric == "absdiff":
        return 1.0 / (1.0 + F.abs(a - b))
    ta, tb = _truncated(a, b)
    if metric == "cosine":
        denom = F.sqrt(
            _sum(F.transform(ta, lambda x: x * x)) * _sum(F.transform(tb, lambda x: x * x))
        )
        # zero norm → NaN in Java → safeSimilarity clamps to 0
        return F.when(denom == 0.0, F.lit(0.0)).otherwise(
            F.nanvl((_dot(ta, tb) / denom + 1.0) / 2.0, F.lit(0.0))
        )
    if metric == "euclidean":
        return 1.0 / (1.0 + F.sqrt(_sum(F.zip_with(ta, tb, lambda x, y: (x - y) * (x - y)))))
    if metric == "pearson":
        n = F.size(ta).cast("double")
        m1 = _sum(ta) / n
        m2 = _sum(tb) / n
        d1 = F.transform(ta, lambda x: x - m1)
        d2 = F.transform(tb, lambda x: x - m2)
        denom = F.sqrt(
            _sum(F.transform(d1, lambda x: x * x)) * _sum(F.transform(d2, lambda x: x * x))
        )
        return F.when(denom == 0.0, F.lit(0.0)).otherwise(
            F.nanvl((_dot(d1, d2) / denom + 1.0) / 2.0, F.lit(0.0))
        )
    if metric == "jaccard":
        inter = F.size(F.array_intersect(a, b)).cast("double")
        union = (F.size(a) + F.size(b)).cast("double") - inter
        return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)
    if metric == "overlap":
        inter = F.size(F.array_intersect(a, b)).cast("double")
        denom = F.least(F.size(a), F.size(b)).cast("double")
        return F.when(denom == 0, F.lit(0.0)).otherwise(inter / denom)
    raise ValueError(f"unknown knn metric {metric!r}")


def combined_similarity(pairs: list[tuple[Column, Column, str]]) -> Column:
    """Mean of per-property KNN similarities
    (``CombinedSimilarityComputer.similarity:40-46``); each addend is
    already safe (non-finite → 0) per ``SimilarityComputer.safeSimilarity``."""
    if not pairs:
        raise ValueError("combined_similarity needs at least one property")
    total = None
    for a, b, metric in pairs:
        s = knn_similarity(a, b, metric)
        total = s if total is None else total + s
    return total / F.lit(float(len(pairs)))


# -- gds.util.* / gds.version (reference
# proc/common/src/main/java/org/neo4j/gds/functions/AsNodeFunc.java,
# open-packaging/.../NodePropertyFunc.java, IsFiniteFunc.java,
# OneHotEncodingFunc.java lives in ml/encoding; version in VersionFunc) ----

def nan() -> Column:
    """gds.util.NaN (``IsFiniteFunc.java`` companion constants)."""
    return F.lit(float("nan"))


def infinity() -> Column:
    """gds.util.infinity."""
    return F.lit(float("inf"))


def is_finite(c: Column) -> Column:
    """gds.util.isFinite: false for NaN and ±Infinity, as
    ``Double.isFinite`` (nulls propagate as null, matching the Cypher
    function's null contract)."""
    return ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))


def is_infinite(c: Column) -> Column:
    """gds.util.isInfinite."""
    return ~F.isnan(c) & (F.abs(c) == F.lit(float("inf")))


def as_nodes(result, vertices, node_col: str = "node_id"):
    """gds.util.asNode/asNodes analog (``AsNodeFunc.java:38``): re-attach
    the full vertex rows to an algorithm result — a broadcast-friendly
    join from result ids back to the vertex table (the reference resolves
    ids against the transaction store; here the vertex DataFrame IS the
    store)."""
    return result.join(vertices, result[node_col] == vertices["node_id"], "left").drop(
        vertices["node_id"]
    )


def node_property(graph, node_id: int, prop: str):
    """gds.util.nodeProperty analog (``NodePropertyFunc.java:43``): one
    node's property value from a catalogued graph. Driver-side scalar by
    contract (the Cypher function returns a single value)."""
    if graph.vertices is None or prop not in graph.vertices.columns:
        raise KeyError(f"node property {prop!r} not found on graph")
    row = graph.vertices.filter(F.col("node_id") == node_id).select(prop).first()
    if row is None:
        raise KeyError(f"node {node_id} not found")
    return row[prop]


def version() -> str:
    """gds.version analog."""
    from graph_data_science_spark import __version__

    return __version__
