"""Round-4 registry extension: catalog-roundtrip oracle.

The graph catalog (``graph/catalog.py`` — reference
``core/src/main/java/org/neo4j/gds/core/loading/GraphStoreCatalog.java:50``
plus the ``proc/catalog`` procedures) was the one §2 surface with no
driver-oracle row (pytest-gated only). This query runs the catalog's
project → filter → get lifecycle end-to-end — persisted parquet +
manifest, the ``gds.graph.filter`` expression path with its IdMap
rebuild (redensify), and the ``original_id`` mapping back — and lands on
a deterministic per-node degree table the DuckDB oracle reproduces
closed-form. Any lost/duplicated edge or broken id remap anywhere in the
catalog roundtrip shows up as a hash mismatch.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.graph.catalog import GraphCatalog
from graph_data_science_spark.queries import _supply_web_graph
from graph_data_science_spark.queries_ext3 import Q_SUBGRAPH_SQL

QUERIES_EXT23: dict = {}
ORACLES_EXT23: dict = {}


def q_catalog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.graph.project → gds.graph.filter → catalog get → degree.

    The filter keeps customer/order nodes (``node_id >= 2000``) of the
    supply web; ``GraphCatalog.filter`` redensifies, so surviving ids are
    remapped to [0, n) and the output maps back through the persisted
    ``original_id`` column. The result is the same degree table as the
    in-memory ``subgraph_filter_degree`` row — which is the point: the
    catalog's persist/reload cycle must be result-invisible.
    """
    cat = GraphCatalog(spark, tempfile.mkdtemp(prefix="gds_cat_rt_"))
    cat.project("web", _supply_web_graph(spark, sf_dir))
    if not cat.exists("web") or [m["name"] for m in cat.list()] != ["web"]:
        raise AssertionError("catalog project/list/exists roundtrip broken")
    cat.filter("web", "orders_only", node_filter="node_id >= 2000")
    sub = cat.get("orders_only")
    deg = sub.edges.groupBy("src").agg(F.count("*").alias("degree"))
    out = (
        sub.vertices.join(deg, sub.vertices["node_id"] == deg["src"], "left")
        .select(
            F.col("original_id").alias("node_id"),
            F.coalesce(F.col("degree"), F.lit(0)).alias("degree"),
        )
    )
    if not cat.drop("web") or cat.exists("web"):
        raise AssertionError("catalog drop broken")
    return out


QUERIES_EXT23["catalog_roundtrip_degree"] = q_catalog_roundtrip
# Identical closed form as subgraph_filter_degree — the catalog
# persist/filter/reload cycle must not change a single row.
ORACLES_EXT23["catalog_roundtrip_degree"] = Q_SUBGRAPH_SQL
