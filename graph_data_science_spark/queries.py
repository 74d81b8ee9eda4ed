"""Driver-contract query registry: Spark implementations + DuckDB oracles.

Each entry runs a SURVEY.md §2 operator over the sf-dir parquet tables
(graph operators run the *engine* on edge tables derived from those tables;
data-pipeline operators run the datapipe modules on documents/embeddings).
The paired ANSI-SQL oracle reproduces the same result in DuckDB — integer
results exactly, floating results after explicit rounding (both sides).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.degree import degree_centrality
from graph_data_science_spark.algorithms.labelprop import label_propagation
from graph_data_science_spark.algorithms.pagerank import pagerank
from graph_data_science_spark.algorithms.similarity import node_similarity
from graph_data_science_spark.algorithms.triangles import triangle_count
from graph_data_science_spark.algorithms.wcc import wcc, wcc_star
from graph_data_science_spark.datapipe.ann import cosine_topk
from graph_data_science_spark.datapipe.dedup import (
    exact_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from graph_data_science_spark.datapipe.textstats import STOPWORDS, document_fingerprint, text_features
from graph_data_science_spark.graph.build import LinkGraph


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


_PHASE = 0.3183098861837907  # 1/π: shifts bin edges off the decimal grid


def _e(col, scale: int):
    """Floor-scaled fixed-point BIGINT for cross-engine float comparison.

    Spark's ROUND(double) rounds the shortest *decimal string* (HALF_UP on
    BigDecimal.valueOf) while DuckDB rounds the binary value — they disagree
    on half-way points. floor(x · 10^k + 1/π) is a pure binary-double op,
    identical in both engines; the irrational phase keeps values that are
    exact decimal multiples (common in rank arithmetic) away from bin edges,
    so ~1e-12 sum-order differences can't flip the bucket.
    """
    return F.floor(col * F.lit(float(10**scale)) + F.lit(_PHASE)).cast("long")


# --------------------------------------------------------------------------
# Graph derivations shared by Spark + SQL sides.
# Node id scheme for the supply web (disjoint ranges):
#   region r_regionkey [0,5) · nation 10+n_nationkey [10,35)
#   supplier 50+s_suppkey · customer 2000+c_custkey · order 100000+o_orderkey
# Ranges stay disjoint through sf0.1 with >5x margin (suppliers ≤1,050,
# custkeys ≤15,000 → ids ≤17,000, orderkeys ≤600,000 → ids ≤700,000). The
# earlier 1000/10000 bases collided at sf0.1 (supplier∩customer by 50 ids,
# customer∩order by 6,000) — both sides then ran the same MERGED graph, but
# the unrolled SQL oracles keep duplicate node rows per colliding id while
# the engine folds them, so values diverged. Keep every base mirrored
# EXACTLY between the Spark builders and the SQL oracle text.
# --------------------------------------------------------------------------

SUPPLY_EDGES_SQL = """
    SELECT 100000 + o_orderkey AS src, 2000 + o_custkey AS dst FROM orders
    UNION ALL SELECT 2000 + c_custkey, 10 + c_nationkey FROM customer
    UNION ALL SELECT 50 + s_suppkey, 10 + s_nationkey FROM supplier
    UNION ALL SELECT 10 + n_nationkey, n_regionkey FROM nation
"""

SUPPLY_NODES_SQL = """
    SELECT r_regionkey AS node_id FROM region
    UNION ALL SELECT 10 + n_nationkey FROM nation
    UNION ALL SELECT 50 + s_suppkey FROM supplier
    UNION ALL SELECT 2000 + c_custkey FROM customer
    UNION ALL SELECT 100000 + o_orderkey FROM orders
"""


def _supply_web_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    edges = (
        orders.select((100000 + F.col("o_orderkey")).alias("src"), (2000 + F.col("o_custkey")).alias("dst"))
        .union(customer.select(2000 + F.col("c_custkey"), 10 + F.col("c_nationkey")))
        .union(supplier.select(50 + F.col("s_suppkey"), 10 + F.col("s_nationkey")))
        .union(nation.select(10 + F.col("n_nationkey"), F.col("n_regionkey")))
        .select(F.col("src").cast("long"), F.col("dst").cast("long"), F.lit(1.0).alias("weight"))
    )
    vertices = (
        _t(spark, sf_dir, "region").select(F.col("r_regionkey").cast("long").alias("node_id"))
        .union(nation.select((10 + F.col("n_nationkey")).cast("long")))
        .union(supplier.select((50 + F.col("s_suppkey")).cast("long")))
        .union(customer.select((2000 + F.col("c_custkey")).cast("long")))
        .union(orders.select((100000 + F.col("o_orderkey")).cast("long")))
    )
    max_id = edges.agg(F.greatest(F.max("src"), F.max("dst")).alias("m")).collect()[0]["m"]
    return LinkGraph(edges=edges, vertices=vertices, node_count=int(max_id) + 1)


ORDER_CHAIN_EDGES_SQL = """
    SELECT o_orderkey AS src, nxt AS dst FROM (
        SELECT o_orderkey,
               LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS nxt
        FROM orders) x WHERE nxt IS NOT NULL
"""


def _order_chain_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    edges = (
        orders.withColumn("nxt", F.lead("o_orderkey").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            F.col("o_orderkey").cast("long").alias("src"),
            F.col("nxt").cast("long").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    vertices = orders.select(F.col("o_orderkey").cast("long").alias("node_id"))
    max_id = orders.agg(F.max("o_orderkey").alias("m")).collect()[0]["m"]
    return LinkGraph(edges=edges, vertices=vertices, node_count=int(max_id) + 1)


COPART_EDGES_SQL = """
    SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
    FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
"""


def _copart_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.withColumnRenamed("l_partkey", "pk2")
    edges = (
        li.join(l2, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("pk2"))
        .select(
            F.col("l_partkey").cast("long").alias("src"),
            F.col("pk2").cast("long").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    max_id = li.agg(F.max("l_partkey").alias("m")).collect()[0]["m"]
    return LinkGraph(edges=edges, node_count=int(max_id) + 1)


CUSTPART_EDGES_SQL = """
    SELECT DISTINCT o_custkey AS src, l_partkey AS dst
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def _custpart_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            F.col("l_partkey").cast("long").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    max_id = edges.agg(F.greatest(F.max("src"), F.max("dst")).alias("m")).collect()[0]["m"]
    return LinkGraph(edges=edges, node_count=int(max_id) + 1)


# --------------------------------------------------------------------------
# PageRank oracle: unrolled delta-push iterations in pure SQL.
# --------------------------------------------------------------------------

def _pagerank_unrolled_sql(
    edges_sql: str, nodes_sql: str, updates: int, damping: float = 0.85
) -> str:
    """CTE chain replicating the engine's delta-push PageRank for a fixed
    number of update rounds (tolerance 0)."""
    # MATERIALIZED: every s{i} is referenced twice by s{i+1}; without
    # materialization the CTE tree expands 2^updates-fold.
    ctes = [
        f"e AS MATERIALIZED ({edges_sql})",
        f"n AS MATERIALIZED ({nodes_sql})",
        "deg AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS d FROM e GROUP BY src)",
        f"s0 AS MATERIALIZED (SELECT node_id, CAST({1 - damping} AS DOUBLE) AS rank, "
        f"CAST({1 - damping} AS DOUBLE) AS delta FROM n)",
    ]
    for i in range(1, updates + 1):
        p = i - 1
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT s.node_id, s.rank + {damping} * COALESCE(m.msg, 0) AS rank, "
            f"{damping} * COALESCE(m.msg, 0) AS delta FROM s{p} s LEFT JOIN ("
            f"SELECT e.dst, SUM(x.delta / deg.d) AS msg FROM s{p} x "
            f"JOIN e ON e.src = x.node_id JOIN deg ON deg.node_id = x.node_id "
            f"GROUP BY e.dst) m ON m.dst = s.node_id)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node_id, rank FROM s{updates}"


# --------------------------------------------------------------------------
# Label propagation oracle: unrolled two-wave iterations in pure SQL.
# --------------------------------------------------------------------------

def _lpa_unrolled_sql(edges_sql: str, nodes_sql: str, iterations: int) -> str:
    ctes = [
        f"e AS MATERIALIZED ({edges_sql})",
        f"nn AS MATERIALIZED ({nodes_sql})",
        "l0 AS MATERIALIZED (SELECT node_id, node_id AS label FROM nn)",
    ]
    step = 0
    for _ in range(iterations):
        for parity in (0, 1):
            prev, step = step, step + 1
            ctes.append(
                f"l{step} AS MATERIALIZED (SELECT n.node_id, CASE WHEN w.new_label IS NOT NULL "
                f"THEN w.new_label ELSE n.label END AS label FROM l{prev} n LEFT JOIN ("
                f"SELECT src AS node_id, cand AS new_label FROM ("
                f"SELECT e.src, l.label AS cand, "
                f"ROW_NUMBER() OVER (PARTITION BY e.src ORDER BY SUM(e.w) DESC, l.label ASC) AS rn "
                f"FROM e JOIN l{prev} l ON e.dst = l.node_id WHERE e.src % 2 = {parity} "
                f"GROUP BY e.src, l.label) x WHERE rn = 1) w ON w.node_id = n.node_id)"
            )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node_id, label FROM l{step}"


LPA_BIPARTITE_EDGES_SQL = """
    SELECT 2000 + c_custkey AS src, 10 + c_nationkey AS dst, 1.0 AS w FROM customer
    UNION ALL SELECT 10 + c_nationkey, 2000 + c_custkey, 1.0 FROM customer
    UNION ALL SELECT 50 + s_suppkey, 10 + s_nationkey, 1.0 FROM supplier
    UNION ALL SELECT 10 + s_nationkey, 50 + s_suppkey, 1.0 FROM supplier
"""

LPA_BIPARTITE_NODES_SQL = """
    SELECT 10 + n_nationkey AS node_id FROM nation
    UNION ALL SELECT 50 + s_suppkey FROM supplier
    UNION ALL SELECT 2000 + c_custkey FROM customer
"""


def _lpa_bipartite_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    cn = customer.select(
        (2000 + F.col("c_custkey")).cast("long").alias("src"),
        (10 + F.col("c_nationkey")).cast("long").alias("dst"),
    )
    sn = supplier.select(
        (50 + F.col("s_suppkey")).cast("long").alias("src"),
        (10 + F.col("s_nationkey")).cast("long").alias("dst"),
    )
    fwd = cn.union(sn)
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).withColumn(
        "weight", F.lit(1.0)
    )
    vertices = (
        nation.select((10 + F.col("n_nationkey")).cast("long").alias("node_id"))
        .union(supplier.select((50 + F.col("s_suppkey")).cast("long")))
        .union(customer.select((2000 + F.col("c_custkey")).cast("long")))
    )
    max_id = vertices.agg(F.max("node_id").alias("m")).collect()[0]["m"]
    return LinkGraph(edges=edges, vertices=vertices, node_count=int(max_id) + 1)


# --------------------------------------------------------------------------
# The registry.
# --------------------------------------------------------------------------

def q_degree_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine degree centrality over the order→customer graph; customers only."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    edges = orders.select(
        (2000 + F.col("o_custkey")).cast("long").alias("src"),
        (100000 + F.col("o_orderkey")).cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    vertices = customer.select((2000 + F.col("c_custkey")).cast("long").alias("node_id")).union(
        orders.select((100000 + F.col("o_orderkey")).cast("long"))
    )
    g = LinkGraph(edges=edges, vertices=vertices)
    return (
        degree_centrality(g, orientation="natural")
        .filter(F.col("node_id") < 100000)
        .select((F.col("node_id") - 2000).alias("c_custkey"), F.col("score").alias("n_orders"))
    )


Q_DEGREE_SQL = """
    SELECT c_custkey, CAST(COUNT(o_orderkey) AS DOUBLE) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
"""


def q_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine WCC over per-customer order chains → component = min orderkey.

    Runs the procedure default path: star contraction (r4 A/B winner on
    this graph — 6 rounds vs label-prop's 17; the chain mins sit at
    random chain positions, so min-label propagation moves them ~1 hop
    per round while contraction collapses chains logarithmically). The
    label-prop path stays bench+oracle-covered via wcc_seeded_chains."""
    g = _order_chain_graph(spark, sf_dir)
    return wcc_star(g).components.select("node_id", "component")


Q_WCC_SQL = """
    SELECT CAST(o_orderkey AS BIGINT) AS node_id,
           CAST(MIN(o_orderkey) OVER (PARTITION BY o_custkey) AS BIGINT) AS component
    FROM orders
"""


def q_wcc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same component fixpoint via alternating large-star/small-star
    contraction (`wcc_star`, the contracting-edge-set scale path) — must
    bit-match the min-label-propagation oracle."""
    g = _order_chain_graph(spark, sf_dir)
    return wcc_star(g).components.select("node_id", "component")


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine PageRank (d=0.85, 12 GDS supersteps = 11 updates) on the supply
    web; nation + region nodes reported, rounded for float-hash stability."""
    g = _supply_web_graph(spark, sf_dir)
    res = pagerank(g, damping=0.85, tolerance=0.0, max_iterations=12)
    return (
        res.scores.filter(F.col("node_id") < 50)
        .select("node_id", _e(F.col("score"), 5).alias("rank_e5"))
    )


Q_PAGERANK_SQL = (
    _pagerank_unrolled_sql(SUPPLY_EDGES_SQL, SUPPLY_NODES_SQL, updates=11).replace(
        f"\nSELECT node_id, rank FROM s11",
        "\nSELECT CAST(node_id AS BIGINT) AS node_id, "
        "CAST(FLOOR(rank * 1e5 + 0.3183098861837907) AS BIGINT) AS rank_e5 FROM s11 WHERE node_id < 50",
    )
)


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine triangle count over the co-ordered-parts graph (nodes with ≥1)."""
    g = _copart_graph(spark, sf_dir)
    res = triangle_count(g)
    return res.per_node.filter(F.col("triangles") > 0).select(
        F.col("node_id").alias("p_partkey"), "triangles"
    )


Q_TRIANGLE_SQL = f"""
    WITH e AS MATERIALIZED ({COPART_EDGES_SQL}),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    corners AS (
        SELECT x AS p FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
    )
    SELECT CAST(p AS BIGINT) AS p_partkey, COUNT(*) AS triangles FROM corners GROUP BY p
"""


def q_node_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine Jaccard node similarity (top-5) over customer→part baskets."""
    g = _custpart_graph(spark, sf_dir)
    return node_similarity(g, metric="jaccard", top_k=5).select(
        "node1", "node2", "rank", _e(F.col("similarity"), 6).alias("sim_e6")
    )


Q_NODESIM_SQL = f"""
    WITH e AS ({CUSTPART_EDGES_SQL}),
    sz AS (SELECT src, COUNT(*) AS sz FROM e GROUP BY src),
    inter AS (
        SELECT a.src AS n1, b.src AS n2, COUNT(*) AS c
        FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
        GROUP BY a.src, b.src
    ),
    half AS (
        SELECT n1, n2, CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS similarity
        FROM inter JOIN sz sa ON sa.src = n1 JOIN sz sb ON sb.src = n2
    ),
    sym AS (SELECT n1, n2, similarity FROM half
            UNION ALL SELECT n2, n1, similarity FROM half),
    ranked AS (
        SELECT n1, n2, similarity,
               ROW_NUMBER() OVER (PARTITION BY n1 ORDER BY similarity DESC, n2 ASC) AS rank
        FROM sym
    )
    SELECT CAST(n1 AS BIGINT) AS node1, CAST(n2 AS BIGINT) AS node2,
           CAST(rank AS INT) AS rank, CAST(FLOOR(similarity * 1e6 + 0.3183098861837907) AS BIGINT) AS sim_e6
    FROM ranked WHERE rank <= 5
"""


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine two-wave LPA, 3 iterations, on the customer/supplier↔nation
    bipartite graph."""
    g = _lpa_bipartite_graph(spark, sf_dir)
    return label_propagation(g, max_iterations=3, mode="sync").labels.select("node_id", "label")


Q_LPA_SQL = (
    "WITH base AS ("
    + _lpa_unrolled_sql(LPA_BIPARTITE_EDGES_SQL, LPA_BIPARTITE_NODES_SQL, iterations=3)
    + ") SELECT CAST(node_id AS BIGINT) AS node_id, CAST(label AS BIGINT) AS label FROM base"
)


# --------------------------------------------------------------------------
# Relational operator demos (scan/filter/agg/join/window — SURVEY.md §2.A).
# --------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _e(F.sum("l_quantity"), 2).alias("sum_qty_c"),
            _e(F.sum("l_extendedprice"), 2).alias("sum_base_price_c"),
            _e(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price_c"),
            _e(F.avg("l_discount"), 6).alias("avg_disc_e6"),
            F.count("*").alias("count_order"),
        )
    )


Q_PRICING_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(FLOOR(SUM(l_quantity) * 1e2 + 0.3183098861837907) AS BIGINT) AS sum_qty_c,
           CAST(FLOOR(SUM(l_extendedprice) * 1e2 + 0.3183098861837907) AS BIGINT) AS sum_base_price_c,
           CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 1e2 + 0.3183098861837907) AS BIGINT) AS sum_disc_price_c,
           CAST(FLOOR(AVG(l_discount) * 1e6 + 0.3183098861837907) AS BIGINT) AS avg_disc_e6,
           COUNT(*) AS count_order
    FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", _e(F.col("o_totalprice"), 2).alias("totalprice_c"), "rn")
    )


Q_TOP_ORDERS_SQL = """
    SELECT o_custkey, o_orderkey, CAST(FLOOR(o_totalprice * 1e2 + 0.3183098861837907) AS BIGINT) AS totalprice_c,
           CAST(rn AS INT) AS rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders) x
    WHERE rn <= 3
"""


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(nation, customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(_e(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue_c"))
    )


Q_REVENUE_SQL = """
    SELECT n_name, CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 1e2 + 0.3183098861837907) AS BIGINT) AS revenue_c
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
"""


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) — batch analog of the streaming
    session-window operator."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    brk = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        ev.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), _e(F.sum("value"), 2).alias("session_value_c"))
    )


Q_SESSIONS_SQL = """
    WITH g AS (
        SELECT user_id, value, ts,
               CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS brk,
               event_id
        FROM events
    ), s AS (
        SELECT user_id, value,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
        FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events, CAST(FLOOR(SUM(value) * 1e2 + 0.3183098861837907) AS BIGINT) AS session_value_c
    FROM s GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# Training-data pipeline queries (documents / embeddings tables).
# --------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(_t(spark, sf_dir, "documents"))


Q_DEDUP_SQL = """
    WITH k AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
               FROM documents)
    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY h) AS rep_id FROM k
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return document_fingerprint(_t(spark, sf_dir, "documents")).select("doc_id", "fingerprint")


Q_FINGERPRINT_SQL = """
    SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents
"""


def q_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_features(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        "n_tokens",
        _e(F.col("punct_ratio"), 8).alias("punct_ratio_e8"),
        _e(F.col("stopword_ratio"), 8).alias("stopword_ratio_e8"),
        _e(F.col("mean_token_len"), 8).alias("mean_token_len_e8"),
        _e(F.col("quality"), 8).alias("quality_e8"),
        "lang_pred",
    )


_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

Q_TEXT_FEATURES_SQL = f"""
    WITH t AS (
        SELECT doc_id, text,
               CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks,
               len(text) AS n_chars
        FROM documents
    ), m AS (
        SELECT doc_id, n_chars, len(toks) AS n_tokens,
               CAST(n_chars - len(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
                   / GREATEST(n_chars, 1) AS punct_ratio,
               CAST(len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) AS DOUBLE)
                   / GREATEST(len(toks), 1) AS stopword_ratio,
               CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE)
                   / GREATEST(len(toks), 1) AS mean_token_len,
               CAST(len(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE)
                   / GREATEST(n_chars, 1) AS latin_ratio
        FROM t
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           CAST(FLOOR(punct_ratio * 1e8 + 0.3183098861837907) AS BIGINT) AS punct_ratio_e8,
           CAST(FLOOR(stopword_ratio * 1e8 + 0.3183098861837907) AS BIGINT) AS stopword_ratio_e8,
           CAST(FLOOR(mean_token_len * 1e8 + 0.3183098861837907) AS BIGINT) AS mean_token_len_e8,
           CAST(FLOOR((0.4 * LEAST(n_tokens / 100.0, 1.0)
                 + 0.3 * (1.0 - punct_ratio)
                 + 0.3 * LEAST(mean_token_len / 8.0, 1.0)) * 1e8 + 0.3183098861837907) AS BIGINT) AS quality_e8,
           CASE WHEN latin_ratio >= 0.9 THEN 'en' ELSE 'unk' END AS lang_pred
    FROM m
"""

# Portable shingle SQL shared by the jaccard/minhash oracles.
_SHINGLES_SQL = """
    sh AS MATERIALIZED (
        SELECT DISTINCT doc_id,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents WHERE len(trim(text)) > 0) d,
             UNNEST(range(1, GREATEST(len(toks) - 1, 1))) AS u(i)
    )
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.1).select(
        "a", "b", _e(F.col("jaccard"), 6).alias("jaccard_e6")
    )


Q_NGRAM_JACCARD_SQL = f"""
    WITH {_SHINGLES_SQL},
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
        FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id
    )
    SELECT a, b, CAST(FLOOR(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) * 1e6 + 0.3183098861837907) AS BIGINT) AS jaccard_e6
    FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
    WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.1
"""


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(_t(spark, sf_dir, "documents"), num_perm=8)


def _portable_hash_sql(expr: str, seed) -> str:
    return f"(('0x' || substr(md5('{seed}:' || {expr}), 1, 15))::BIGINT)"


def _minhash_perm_sql(j: int) -> str:
    """Permutation j over the single-digest double-hash family: the md5
    digest split into two 52-bit ints b1, b2; h_j = b1 + j*b2 (mirrors
    ``datapipe/dedup.py:minhash_signatures``)."""
    b1 = "(('0x' || substr(md5(shingle), 1, 13))::BIGINT)"
    b2 = "(('0x' || substr(md5(shingle), 14, 13))::BIGINT)"
    return f"({b1} + {j} * {b2})"


Q_MINHASH_SQL = (
    f"WITH {_SHINGLES_SQL}, sig AS (SELECT doc_id, "
    + ", ".join(f"MIN({_minhash_perm_sql(j)}) AS h{j}" for j in range(8))
    + " FROM sh GROUP BY doc_id) SELECT d.doc_id, "
    + ", ".join(f"COALESCE(sig.h{j}, -1) AS h{j}" for j in range(8))
    + " FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN sig ON sig.doc_id = d.doc_id"
)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(_t(spark, sf_dir, "documents"), bits=32)


_SIMHASH_BITS_SQL = ", ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}" for b in range(32)
)
_SIMHASH_ASSEMBLE_SQL = " + ".join(
    f"CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END" for b in range(32)
)

Q_SIMHASH_SQL = f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS tok
        FROM documents WHERE len(trim(text)) > 0
    ), hashed AS (
        SELECT doc_id, {_portable_hash_sql('tok', 'simhash')} AS h FROM toks
    ), bits AS (
        SELECT doc_id, {_SIMHASH_BITS_SQL} FROM hashed GROUP BY doc_id
    ), sig AS (
        SELECT doc_id, {_SIMHASH_ASSEMBLE_SQL} AS simhash FROM bits
    )
    SELECT d.doc_id, COALESCE(sig.simhash, 0) AS simhash
    FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN sig ON sig.doc_id = d.doc_id
"""


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return cosine_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id", "rank", _e(F.col("sim"), 4).alias("sim_e4")
    )


Q_ANN_SQL = """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
    qe AS MATERIALIZED (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM q, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
    ce AS MATERIALIZED (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
    nrm AS (SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM ce GROUP BY vec_id),
    dots AS (
        SELECT qe.vec_id AS query_id, ce.vec_id AS neighbor_id, SUM(qe.x * ce.x) AS dot
        FROM qe JOIN ce ON qe.i = ce.i AND qe.vec_id <> ce.vec_id
        GROUP BY qe.vec_id, ce.vec_id
    ),
    sims AS (
        SELECT query_id, neighbor_id, dot / (nq.nrm * nc.nrm) AS sim
        FROM dots JOIN nrm nq ON nq.vec_id = query_id JOIN nrm nc ON nc.vec_id = neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM sims
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           CAST(FLOOR(sim * 1e4 + 0.3183098861837907) AS BIGINT) AS sim_e4
    FROM ranked WHERE rank <= 5
"""


QUERIES = {
    "degree_centrality": q_degree_centrality,
    "wcc_order_chains": q_wcc,
    "wcc_star_order_chains": q_wcc_star,
    "pagerank_supply_web": q_pagerank,
    "triangle_count_coparts": q_triangle_count,
    "node_similarity_jaccard": q_node_similarity,
    "label_propagation_bipartite": q_label_propagation,
    "pricing_summary": q_pricing_summary,
    "top_orders_per_customer": q_top_orders_per_customer,
    "revenue_by_nation": q_revenue_by_nation,
    "event_sessions": q_event_sessions,
    "dedup_exact": q_dedup_exact,
    "doc_fingerprint": q_fingerprint,
    "text_features": q_text_features,
    "ngram_jaccard_pairs": q_ngram_jaccard,
    "minhash_signatures": q_minhash_signatures,
    "simhash_docs": q_simhash,
    "ann_cosine_topk": q_ann_cosine_topk,
}

def _merge_ext() -> None:
    """Fold in the round-2 registries (queries_ext, queries_ext2) — kept in
    their own modules so each file stays reviewable; imported lazily to
    avoid a cycle."""
    from graph_data_science_spark import (
        queries_ext,
        queries_ext2,
        queries_ext3,
        queries_ext4,
        queries_ext5,
        queries_ext6,
        queries_ext7,
        queries_ext8,
        queries_ext9,
        queries_ext10,
        queries_ext11,
        queries_ext12,
        queries_ext13,
        queries_ext14,
        queries_ext15,
        queries_ext16,
        queries_ext17,
        queries_ext18,
        queries_ext19,
        queries_ext20,
        queries_ext21,
        queries_ext22,
        queries_ext23,
        queries_ext24,
    )

    for mod, qname, oname in (
        (queries_ext, "QUERIES_EXT", "ORACLES_EXT"),
        (queries_ext2, "QUERIES_EXT2", "ORACLES_EXT2"),
        (queries_ext3, "QUERIES_EXT3", "ORACLES_EXT3"),
        (queries_ext4, "QUERIES_EXT4", "ORACLES_EXT4"),
        (queries_ext5, "QUERIES_EXT5", "ORACLES_EXT5"),
        (queries_ext6, "QUERIES_EXT6", "ORACLES_EXT6"),
        (queries_ext7, "QUERIES_EXT7", "ORACLES_EXT7"),
        (queries_ext8, "QUERIES_EXT8", "ORACLES_EXT8"),
        (queries_ext9, "QUERIES_EXT9", "ORACLES_EXT9"),
        (queries_ext10, "QUERIES_EXT10", "ORACLES_EXT10"),
        (queries_ext11, "QUERIES_EXT11", "ORACLES_EXT11"),
        (queries_ext12, "QUERIES_EXT12", "ORACLES_EXT12"),
        (queries_ext13, "QUERIES_EXT13", "ORACLES_EXT13"),
        (queries_ext14, "QUERIES_EXT14", "ORACLES_EXT14"),
        (queries_ext15, "QUERIES_EXT15", "ORACLES_EXT15"),
        (queries_ext16, "QUERIES_EXT16", "ORACLES_EXT16"),
        (queries_ext17, "QUERIES_EXT17", "ORACLES_EXT17"),
        (queries_ext18, "QUERIES_EXT18", "ORACLES_EXT18"),
        (queries_ext19, "QUERIES_EXT19", "ORACLES_EXT19"),
        (queries_ext20, "QUERIES_EXT20", "ORACLES_EXT20"),
        (queries_ext21, "QUERIES_EXT21", "ORACLES_EXT21"),
        (queries_ext22, "QUERIES_EXT22", "ORACLES_EXT22"),
        (queries_ext23, "QUERIES_EXT23", "ORACLES_EXT23"),
        (queries_ext24, "QUERIES_EXT24", "ORACLES_EXT24"),
    ):
        # When an ext module is imported FIRST (tools/tests), it imports this
        # module, whose end-of-module merge then sees the ext module only
        # partially initialized — skip it; the direct importer has the
        # registries it asked for, and any path through __spark_entry__
        # imports this module first and merges everything.
        q = getattr(mod, qname, None)
        o = getattr(mod, oname, None)
        if q is not None:
            QUERIES.update(q)
        if o is not None:
            ORACLES.update(o)


ORACLES = {
    "degree_centrality": Q_DEGREE_SQL,
    "wcc_order_chains": Q_WCC_SQL,
    "wcc_star_order_chains": Q_WCC_SQL,
    "pagerank_supply_web": Q_PAGERANK_SQL,
    "triangle_count_coparts": Q_TRIANGLE_SQL,
    "node_similarity_jaccard": Q_NODESIM_SQL,
    "label_propagation_bipartite": Q_LPA_SQL,
    "pricing_summary": Q_PRICING_SQL,
    "top_orders_per_customer": Q_TOP_ORDERS_SQL,
    "revenue_by_nation": Q_REVENUE_SQL,
    "event_sessions": Q_SESSIONS_SQL,
    "dedup_exact": Q_DEDUP_SQL,
    "doc_fingerprint": Q_FINGERPRINT_SQL,
    "text_features": Q_TEXT_FEATURES_SQL,
    "ngram_jaccard_pairs": Q_NGRAM_JACCARD_SQL,
    "minhash_signatures": Q_MINHASH_SQL,
    "simhash_docs": Q_SIMHASH_SQL,
    "ann_cosine_topk": Q_ANN_SQL,
}

_merge_ext()
