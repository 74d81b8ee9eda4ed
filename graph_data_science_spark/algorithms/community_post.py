"""Community-result post-processing — the ``CommunityCompanion`` analog.

Every GDS community procedure (WCC, Louvain, Leiden, Label Propagation,
ModularityOptimization, SCC, K-1 Coloring, SLLPA, KMeans) accepts two
result-shaping options that are applied AFTER the algorithm, in the
procedure layer (reference
``algo/src/main/java/org/neo4j/gds/algorithms/community/CommunityCompanion.java:100-111``):

- ``minCommunitySize`` — nodes whose community has fewer members are
  dropped from the stream/write (``CommunitySizeFilter`` marks them
  ``Long.MIN_VALUE`` = "do not write", ``CommunityCompanion.java:145-186``).
  The filter runs FIRST (``CommunityCompanion.java:86-88``).
- ``consecutiveIds`` — community ids are remapped to a dense ``0..k-1``
  space in order of first appearance over ascending node id
  (``ConsecutiveLongNodePropertyValues.java:46-59``: a single scan over
  nodes 0..n assigns ``++nextConsecutiveId`` the first time each raw id
  is seen; filtered nodes are skipped). First appearance over ascending
  node id ≡ rank of the community's minimum surviving node id.

Spark re-expression: the size filter is one ``groupBy(community).count``
+ a broadcast-friendly semi-join; the consecutive mapping is a k-row
frame (one row per community: its min node id) ranked by a window. The
mapping frame is one row per community — the same O(k) working set the
reference holds in its driver-side ``HugeLongLongMap`` — so the
single-partition rank sort is at parity with the reference's sequential
scan, not a new bottleneck (k ≪ |V|; communities at 100 TB are bounded
by the label space, not the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def community_postprocess(
    result: DataFrame,
    community_col: str = "community",
    node_col: str = "node_id",
    min_community_size: int | None = None,
    consecutive_ids: bool = False,
) -> DataFrame:
    """Apply the reference's community post-processing options to a
    per-node assignment frame, preserving column names and order.

    ``min_community_size`` drops whole communities below the size bar
    (never partial ones — sizes are computed before filtering), then
    ``consecutive_ids`` densifies the surviving ids in first-appearance
    (min surviving node id) order, exactly the reference's composition
    order (``CommunityCompanion.java:86-97``).
    """
    out_cols = result.columns
    df = result
    if min_community_size is not None and min_community_size > 1:
        keep = (
            df.groupBy(community_col)
            .agg(F.count(F.lit(1)).alias("_sz"))
            .filter(F.col("_sz") >= int(min_community_size))
            .select(community_col)
        )
        df = df.join(keep, community_col, "left_semi")
    if consecutive_ids:
        # k-row mapping frame: community -> its first (min) surviving node.
        # k degenerates to ~|V| singleton communities, so the consecutive
        # rank is the bucketed order-preserving one (graph/ranks.py), not a
        # partition-less window.
        from graph_data_science_spark.graph.ranks import ordered_rank

        mapping = df.groupBy(community_col).agg(F.min(node_col).alias("_first"))
        mapping = ordered_rank(
            mapping, ["_first", community_col], rank_col="_consecutive", n_buckets=None
        ).select(community_col, F.col("_consecutive").cast("long").alias("_consecutive"))
        # No broadcast hint: k is usually tiny (AQE picks broadcast at
        # runtime from the observed agg size) but degenerates to ~|V|
        # singleton communities, where a forced broadcast would OOM and
        # a shuffle join is the right plan.
        df = (
            df.withColumnRenamed(community_col, "_raw")
            .join(mapping.withColumnRenamed(community_col, "_raw"), "_raw")
            .withColumn(community_col, F.col("_consecutive"))
            .select(*out_cols)
        )
    return df.select(*out_cols)
