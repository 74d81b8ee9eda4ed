"""Edge-table graph model: the engine's GraphStore analog.

A graph is just two DataFrames:

    vertices(node_id long, ...properties)
    edges(src long, dst long, weight double)

Node ids must be non-negative longs bounded by ``node_count`` (dense ids —
see ``graph.ids`` — are the canonical way to get them; density is not
required, only boundedness, so ad-hoc graphs over existing integer keys work
too).

Orientation and parallel-edge handling mirror GDS projection semantics:

- Orientation NATURAL / REVERSE / UNDIRECTED
  (reference ``graph-projection-api/.../Orientation.java:27-46``): reverse is
  a column swap; undirected stores each edge in both directions.
- Parallel-edge aggregation SINGLE / SUM / MIN / MAX / COUNT
  (reference ``graph-projection-api/.../core/Aggregation.java:31-100``,
  applied at load in ``core/.../loading/AdjacencyPreAggregation.java``):
  a plain Catalyst hash aggregate here.
- Degrees, incl. the weighted rule "sum only strictly-positive weights"
  (reference ``algo/.../degree/DegreeCentrality.java:131-136``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NATURAL = "natural"
REVERSE = "reverse"
UNDIRECTED = "undirected"


@dataclass
class LinkGraph:
    """Named edge-table graph (GDS ``GraphStore``/``Graph`` analog)."""

    edges: DataFrame  # (src long, dst long, weight double)
    vertices: DataFrame | None = None  # (node_id long, ...props); optional
    node_count: int | None = None
    _rel_count: int | None = field(default=None, repr=False)

    def with_node_count(self) -> int:
        if self.node_count is None:
            if self.vertices is not None:
                self.node_count = int(
                    self.vertices.agg(F.max("node_id").alias("m")).collect()[0]["m"] or -1
                ) + 1
            else:
                row = self.edges.agg(
                    F.greatest(F.max("src"), F.max("dst")).alias("m")
                ).collect()[0]
                self.node_count = int(row["m"] if row["m"] is not None else -1) + 1
        return self.node_count

    def relationship_count(self) -> int:
        # Graph.relationshipCount() analog (reference core-api Graph.java:46).
        if self._rel_count is None:
            self._rel_count = self.edges.count()
        return self._rel_count

    def node_ids(self) -> DataFrame:
        """All node ids as a DataFrame(node_id): vertices if given, else the
        dense range [0, node_count) (covers isolated nodes), else edge endpoints."""
        if self.vertices is not None:
            return self.vertices.select("node_id")
        if self.node_count is not None:
            return self.edges.sparkSession.range(self.node_count).select(
                F.col("id").alias("node_id")
            )
        return (
            self.edges.select(F.col("src").alias("node_id"))
            .union(self.edges.select(F.col("dst").alias("node_id")))
            .distinct()
        )


def from_edge_list(
    spark: SparkSession,
    pairs: list[tuple],
    node_count: int | None = None,
    orientation: str = NATURAL,
) -> LinkGraph:
    """Build a LinkGraph from in-memory (src, dst[, weight]) tuples (test fixtures)."""
    rows = [(int(p[0]), int(p[1]), float(p[2]) if len(p) > 2 else 1.0) for p in pairs]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    if orientation == REVERSE:
        edges = reverse_edges(edges)
    elif orientation == UNDIRECTED:
        edges = to_undirected(edges)
    if node_count is None and rows:
        node_count = max(max(r[0] for r in rows), max(r[1] for r in rows)) + 1
    return LinkGraph(edges=edges, node_count=node_count)


def reverse_edges(edges: DataFrame) -> DataFrame:
    """REVERSE orientation: swap src/dst (reference Orientation.java:36)."""
    return edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), *[c for c in edges.columns if c not in ("src", "dst")]
    )


def to_undirected(edges: DataFrame) -> DataFrame:
    """UNDIRECTED orientation: each edge stored in both directions
    (reference Orientation.java:41-46; ToUndirected.java:50)."""
    return edges.union(reverse_edges(edges).select(*edges.columns))


_AGGS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "single": F.first,
}


def aggregate_parallel_edges(edges: DataFrame, agg: str = "single") -> DataFrame:
    """Collapse parallel edges per (src, dst) with a GDS Aggregation policy
    (reference Aggregation.java:31-100). 'none' keeps parallels."""
    if agg == "none":
        return edges
    fn = _AGGS[agg]
    return edges.groupBy("src", "dst").agg(fn("weight").cast("double").alias("weight"))


def degrees(
    edges: DataFrame,
    orientation: str = NATURAL,
    weighted: bool = False,
) -> DataFrame:
    """Per-node degree DataFrame (node_id, degree).

    Weighted degree sums only strictly-positive weights, matching
    DegreeCentrality.java:131-136. NATURAL counts out-edges (groupBy src),
    REVERSE in-edges, UNDIRECTED both.
    """
    if orientation == UNDIRECTED:
        e = to_undirected(edges)
        key = "src"
    elif orientation == REVERSE:
        e, key = edges, "dst"
    else:
        e, key = edges, "src"
    if weighted:
        agg = F.sum(F.when(F.col("weight") > 0, F.col("weight")).otherwise(F.lit(0.0))).alias("degree")
    else:
        agg = F.count("*").cast("double").alias("degree")
    return e.groupBy(F.col(key).alias("node_id")).agg(agg)
