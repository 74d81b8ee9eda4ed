"""Round-3 driver-contract queries (batch 12): the ML splitting family.

- ``split_relationships_supply``: ``gds.graph.relationships.split``
  (``ml/ml-algo/.../splitting/SplitRelationships.java:61-95`` +
  ``DirectedEdgeSplitter.java:55-88`` +
  ``negativeSampling/RandomNegativeSampler.java:43-110``) over the supply
  tree — holdout positives (label 1), best-effort negative samples
  (label 0) and the remaining graph (label −1) in one frame; the seeded
  md5 rank and the per-source negative budgets replay bit-for-bit in SQL.
- ``fraction_split_customers``: ``FractionSplitter.split:42-49`` — prefix
  split in seeded-hash order.
- ``stratified_kfold_customers``: ``StratifiedKFoldSplitter.splits:76-110``
  — the carried round-robin pointer over (class, position) order is
  exactly ``(row_number − 1) mod k``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.ml.splitting import (
    fraction_split,
    split_relationships,
    stratified_kfold_split,
)
from graph_data_science_spark.queries import _t
from graph_data_science_spark.queries_ext import _supply_tree_graph

_SPLIT_SEED = 5
_HOLDOUT = 0.2


def q_split_relationships(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _supply_tree_graph(spark, sf_dir, weighted=False)
    res = split_relationships(
        g, holdout_fraction=_HOLDOUT, negative_sampling_ratio=1.0, random_seed=_SPLIT_SEED
    )
    return res.selected.union(
        res.remaining.select("src", "dst", F.lit(-1.0).alias("label"))
    )


# Spark's concat_ws(':', seed, a, b) == 'seed:a:b'
def _md5_ws_sql(seed, *exprs: str) -> str:
    joined = " || ':' || ".join([f"'{seed}'"] + [f"CAST({e} AS VARCHAR)" for e in exprs])
    return f"(('0x' || substr(md5({joined}), 1, 15))::BIGINT)"


_SUPPLY_EDGES = """
        SELECT CAST(n_regionkey AS BIGINT) AS src, CAST(10 + n_nationkey AS BIGINT) AS dst FROM nation
        UNION ALL SELECT 10 + c_nationkey, 2000 + c_custkey FROM customer
        UNION ALL SELECT 10 + s_nationkey, 50 + s_suppkey FROM supplier
        UNION ALL SELECT 2000 + o_custkey, 100000 + o_orderkey FROM orders
"""

_SUPPLY_NODES = """
        SELECT CAST(r_regionkey AS BIGINT) AS node_id FROM region
        UNION ALL SELECT 10 + n_nationkey FROM nation
        UNION ALL SELECT 50 + s_suppkey FROM supplier
        UNION ALL SELECT 2000 + c_custkey FROM customer
        UNION ALL SELECT 100000 + o_orderkey FROM orders
"""

Q_SPLIT_SQL = f"""
    WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({_SUPPLY_EDGES})),
    ranked AS (
        SELECT src, dst,
               ROW_NUMBER() OVER (ORDER BY {_md5_ws_sql(_SPLIT_SEED, "src", "dst")}, src, dst) AS r,
               COUNT(*) OVER () AS cnt
        FROM e
    ),
    sel AS (SELECT src, dst, CAST(FLOOR(cnt * {_HOLDOUT}) AS BIGINT) AS nsel FROM ranked
            WHERE r <= CAST(FLOOR(cnt * {_HOLDOUT}) AS BIGINT)),
    rem AS (SELECT src, dst FROM ranked WHERE r > CAST(FLOOR(cnt * {_HOLDOUT}) AS BIGINT)),
    nodes AS MATERIALIZED (SELECT DISTINCT node_id FROM ({_SUPPLY_NODES})),
    nstats AS (SELECT COUNT(*) AS n FROM nodes),
    posmap AS (SELECT node_id AS dst, ROW_NUMBER() OVER (ORDER BY node_id) - 1 AS pos FROM nodes),
    degs AS (SELECT src AS node_id, COUNT(*) AS deg FROM e GROUP BY src),
    srcs AS (
        SELECT n.node_id, COALESCE(d.deg, 0) AS deg,
               ROW_NUMBER() OVER (ORDER BY n.node_id) AS sr,
               COUNT(*) OVER () AS scount
        FROM nodes n LEFT JOIN degs d ON d.node_id = n.node_id
    ),
    need AS (SELECT (SELECT CAST(FLOOR(COUNT(*) * {_HOLDOUT}) AS BIGINT) FROM e) AS need),
    budgets AS (
        SELECT node_id AS src, sr,
               LEAST(need // scount + CASE WHEN sr <= need % scount THEN 1 ELSE 0 END,
                     (SELECT n FROM nstats) - 1 - deg) AS budget
        FROM srcs, need
    ),
    draws AS (
        SELECT b.src, t.i,
               {_md5_ws_sql(_SPLIT_SEED, "b.src", "t.i")} % (SELECT n FROM nstats) AS pos
        FROM budgets b, UNNEST(range(0, b.budget)) AS t(i)
        WHERE b.budget > 0
    ),
    negs AS (
        SELECT d.src, p.dst
        FROM draws d JOIN posmap p ON p.pos = d.pos
        WHERE d.src <> p.dst
          AND NOT EXISTS (SELECT 1 FROM e WHERE e.src = d.src AND e.dst = p.dst)
    )
    SELECT src, dst, 1.0 AS label FROM sel
    UNION ALL SELECT src, dst, 0.0 FROM negs
    UNION ALL SELECT src, dst, -1.0 FROM rem
"""


def q_fraction_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("node_id")
    )
    shuffled = cust.withColumn(
        "h",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("7"), F.col("node_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long"),
    )
    train, test = fraction_split(shuffled, train_fraction=0.75, order_col="h")
    return train.select("node_id", F.lit("train").alias("part")).union(
        test.select("node_id", F.lit("test").alias("part"))
    )


Q_FRACTION_SQL = f"""
    WITH c AS (
        SELECT CAST(c_custkey AS BIGINT) AS node_id,
               {_md5_ws_sql(7, "c_custkey")} AS h
        FROM customer
    ),
    ranked AS (
        SELECT node_id,
               ROW_NUMBER() OVER (ORDER BY h, node_id) AS r,
               COUNT(*) OVER () AS cnt
        FROM c
    )
    SELECT node_id,
           CASE WHEN r <= CAST(FLOOR(cnt * 0.75) AS BIGINT) THEN 'train' ELSE 'test' END AS part
    FROM ranked
"""


def q_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("node_id"),
        F.col("c_nationkey").cast("long").alias("target"),
    )
    shuffled = cust.withColumn(
        "h",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("11"), F.col("node_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long"),
    )
    return stratified_kfold_split(shuffled, k=5, target_col="target", order_col="h").select(
        "node_id", "target", "fold"
    )


Q_KFOLD_SQL = f"""
    WITH c AS (
        SELECT CAST(c_custkey AS BIGINT) AS node_id,
               CAST(c_nationkey AS BIGINT) AS target,
               {_md5_ws_sql(11, "c_custkey")} AS h
        FROM customer
    )
    SELECT node_id, target,
           CAST((ROW_NUMBER() OVER (ORDER BY target, h, node_id) - 1) % 5 AS INT) AS fold
    FROM c
"""


QUERIES_EXT12 = {
    "split_relationships_supply": q_split_relationships,
    "fraction_split_customers": q_fraction_split,
    "stratified_kfold_customers": q_stratified_kfold,
}

ORACLES_EXT12 = {
    "split_relationships_supply": Q_SPLIT_SQL,
    "fraction_split_customers": Q_FRACTION_SQL,
    "stratified_kfold_customers": Q_KFOLD_SQL,
}
