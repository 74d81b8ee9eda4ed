"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: engine PageRank over the supply-web link graph
derived from sf0.001, joined back to nation/region names.
``queries()`` / ``oracle_sql()`` — the operator registry + DuckDB oracles
(see ``graph_data_science_spark/queries.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graph_data_science_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: PageRank the supply web
    (orders → customers → nations → regions), return named nation/region
    centralities."""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    scores = Q.q_pagerank(spark, sf_dir)  # (node_id, rank_e5) for nation+region nodes
    nation = Q._t(spark, sf_dir, "nation").select(
        (10 + F.col("n_nationkey")).cast("long").alias("node_id"),
        F.col("n_name").alias("name"),
        F.lit("nation").alias("kind"),
    )
    region = Q._t(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("node_id"),
        F.col("r_name").alias("name"),
        F.lit("region").alias("kind"),
    )
    names = nation.union(region)
    return scores.join(names, "node_id").orderBy(F.desc("rank_e5")).select(
        "kind", "name", (F.col("rank_e5") / 1e5).alias("pagerank")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
