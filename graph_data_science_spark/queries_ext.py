"""Round-2 driver-contract queries: the previously-unverified operators
(ArticleRank, Eigenvector, HITS, LCC, toposort, conductance, modularity,
scalers, overlap similarity, LSH pairs/ANN) plus the new algorithm families
(SSSP/BFS, Louvain, K-core, seeded WCC, FastRP), each with a DuckDB oracle.

Merged into ``queries.QUERIES`` / ``queries.ORACLES``; same float-bucketing
contract (``queries._e``) and portable-hash contract as the base registry.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.fastrp import fastrp
from graph_data_science_spark.algorithms.hits import hits
from graph_data_science_spark.algorithms.louvain import louvain
from graph_data_science_spark.algorithms.misc import conductance, k_core, modularity, topological_sort
from graph_data_science_spark.algorithms.pagerank import article_rank, eigenvector
from graph_data_science_spark.algorithms.paths import bfs_levels, shortest_paths
from graph_data_science_spark.algorithms.scaling import scale_properties
from graph_data_science_spark.algorithms.similarity import node_similarity
from graph_data_science_spark.algorithms.triangles import local_clustering_coefficient
from graph_data_science_spark.algorithms.wcc import wcc
from graph_data_science_spark.datapipe.ann import lsh_cosine_topk
from graph_data_science_spark.datapipe.dedup import lsh_candidate_pairs
from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.queries import (
    COPART_EDGES_SQL,
    CUSTPART_EDGES_SQL,
    SUPPLY_EDGES_SQL,
    SUPPLY_NODES_SQL,
    _copart_graph,
    _custpart_graph,
    _e,
    _order_chain_graph,
    _minhash_perm_sql,
    _supply_web_graph,
    _t,
)

_PHASE_SQL = "0.3183098861837907"


def _floor_e(expr: str, scale: int) -> str:
    return f"CAST(FLOOR(({expr}) * 1e{scale} + {_PHASE_SQL}) AS BIGINT)"


# --------------------------------------------------------------------------
# ArticleRank (unrolled SQL oracle with the GDS degree+avgDegree denominator)
# --------------------------------------------------------------------------

def q_article_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _supply_web_graph(spark, sf_dir)
    res = article_rank(g, damping=0.85, tolerance=0.0, max_iterations=12)
    return res.scores.filter(F.col("node_id") < 50).select(
        "node_id", _e(F.col("score"), 6).alias("rank_e6")
    )


def _article_rank_unrolled_sql(edges_sql: str, nodes_sql: str, updates: int, damping: float = 0.85) -> str:
    ctes = [
        f"e AS MATERIALIZED ({edges_sql})",
        f"n AS MATERIALIZED ({nodes_sql})",
        # avgDegree = relationshipCount / nodeCount (DegreeFunctions.java:82-91)
        "ad AS MATERIALIZED (SELECT CAST((SELECT COUNT(*) FROM e) AS DOUBLE)"
        " / (SELECT COUNT(*) FROM n) AS a)",
        "deg AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS d FROM e GROUP BY src)",
        f"s0 AS MATERIALIZED (SELECT node_id, CAST({1 - damping} AS DOUBLE) AS rank, "
        f"CAST({1 - damping} AS DOUBLE) AS delta FROM n)",
    ]
    for i in range(1, updates + 1):
        p = i - 1
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT s.node_id, s.rank + {damping} * COALESCE(m.msg, 0) AS rank, "
            f"{damping} * COALESCE(m.msg, 0) AS delta FROM s{p} s LEFT JOIN ("
            f"SELECT e.dst, SUM(x.delta / (deg.d + (SELECT a FROM ad))) AS msg FROM s{p} x "
            f"JOIN e ON e.src = x.node_id JOIN deg ON deg.node_id = x.node_id "
            f"GROUP BY e.dst) m ON m.dst = s.node_id)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node_id, rank FROM s{updates}"


Q_ARTICLE_RANK_SQL = _article_rank_unrolled_sql(SUPPLY_EDGES_SQL, SUPPLY_NODES_SQL, updates=11).replace(
    "\nSELECT node_id, rank FROM s11",
    "\nSELECT CAST(node_id AS BIGINT) AS node_id, "
    + _floor_e("rank", 6)
    + " AS rank_e6 FROM s11 WHERE node_id < 50",
)


# --------------------------------------------------------------------------
# Eigenvector (A+I power iteration, raw-value messages, L2 masterCompute)
# --------------------------------------------------------------------------

def q_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _supply_web_graph(spark, sf_dir)
    res = eigenvector(g, tolerance=0.0, max_iterations=8)
    return res.scores.filter(F.col("node_id") < 50).select(
        "node_id", _e(F.col("score"), 6).alias("score_e6")
    )


def _eigenvector_unrolled_sql(edges_sql: str, nodes_sql: str, supersteps: int) -> str:
    """Replicates EigenvectorComputation.java: y_t = y_{t-1}/‖y_{t-1}‖ +
    A^T·y_{t-1} (messages carry the pre-normalization value), final score
    = y_k/‖y_k‖."""
    ctes = [
        f"e AS MATERIALIZED ({edges_sql})",
        f"n AS MATERIALIZED ({nodes_sql})",
        "s0 AS MATERIALIZED (SELECT node_id, 1.0 / (SELECT COUNT(*) FROM n) AS y FROM n)",
    ]
    for i in range(1, supersteps):
        p = i - 1
        ctes.append(f"l{p} AS MATERIALIZED (SELECT SQRT(SUM(y * y)) AS l2 FROM s{p})")
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT s.node_id, "
            f"s.y / (SELECT l2 FROM l{p}) + COALESCE(m.msg, 0) AS y "
            f"FROM s{p} s LEFT JOIN (SELECT e.dst, SUM(x.y) AS msg FROM s{p} x "
            f"JOIN e ON e.src = x.node_id GROUP BY e.dst) m ON m.dst = s.node_id)"
        )
    last = supersteps - 1
    ctes.append(f"lf AS MATERIALIZED (SELECT SQRT(SUM(y * y)) AS l2 FROM s{last})")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node_id, y / (SELECT l2 FROM lf) AS score FROM s{last}"
    )


Q_EIGENVECTOR_SQL = _eigenvector_unrolled_sql(SUPPLY_EDGES_SQL, SUPPLY_NODES_SQL, supersteps=8).replace(
    "\nSELECT node_id, y / (SELECT l2 FROM lf) AS score FROM s7",
    "\nSELECT CAST(node_id AS BIGINT) AS node_id, "
    + _floor_e("y / (SELECT l2 FROM lf)", 6)
    + " AS score_e6 FROM s7 WHERE node_id < 50",
)


# --------------------------------------------------------------------------
# HITS (classic alternating L2-normalized iteration, HitsTest pseudo-code)
# --------------------------------------------------------------------------

def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _supply_web_graph(spark, sf_dir)
    res = hits(g, hits_iterations=4)
    return res.scores.filter(F.col("node_id") < 50).select(
        "node_id", _e(F.col("auth"), 6).alias("auth_e6"), _e(F.col("hub"), 6).alias("hub_e6")
    )


def _hits_unrolled_sql(edges_sql: str, nodes_sql: str, iterations: int) -> str:
    ctes = [
        f"e AS MATERIALIZED ({edges_sql})",
        f"n AS MATERIALIZED ({nodes_sql})",
        "h0 AS MATERIALIZED (SELECT node_id, CAST(1.0 AS DOUBLE) AS hub FROM n)",
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        ctes.append(
            f"ar{i} AS MATERIALIZED (SELECT n.node_id, COALESCE(m.s, 0) AS auth FROM n "
            f"LEFT JOIN (SELECT e.dst, SUM(h.hub) AS s FROM h{p} h JOIN e ON e.src = h.node_id "
            f"GROUP BY e.dst) m ON m.dst = n.node_id)"
        )
        ctes.append(f"an{i} AS MATERIALIZED (SELECT SQRT(SUM(auth * auth)) AS l2 FROM ar{i})")
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT node_id, auth / (SELECT l2 FROM an{i}) AS auth FROM ar{i})"
        )
        ctes.append(
            f"hr{i} AS MATERIALIZED (SELECT n.node_id, COALESCE(m.s, 0) AS hub FROM n "
            f"LEFT JOIN (SELECT e.src, SUM(a.auth) AS s FROM a{i} a JOIN e ON e.dst = a.node_id "
            f"GROUP BY e.src) m ON m.src = n.node_id)"
        )
        ctes.append(f"hn{i} AS MATERIALIZED (SELECT SQRT(SUM(hub * hub)) AS l2 FROM hr{i})")
        ctes.append(
            f"h{i} AS MATERIALIZED (SELECT node_id, hub / (SELECT l2 FROM hn{i}) AS hub FROM hr{i})"
        )
    k = iterations
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT a{k}.node_id, a{k}.auth, h{k}.hub FROM a{k} JOIN h{k} ON a{k}.node_id = h{k}.node_id"
    )


Q_HITS_SQL = _hits_unrolled_sql(SUPPLY_EDGES_SQL, SUPPLY_NODES_SQL, iterations=4).replace(
    "\nSELECT a4.node_id, a4.auth, h4.hub FROM a4 JOIN h4 ON a4.node_id = h4.node_id",
    "\nSELECT CAST(a4.node_id AS BIGINT) AS node_id, "
    + _floor_e("a4.auth", 6)
    + " AS auth_e6, "
    + _floor_e("h4.hub", 6)
    + " AS hub_e6 FROM a4 JOIN h4 ON a4.node_id = h4.node_id WHERE a4.node_id < 50",
)


# --------------------------------------------------------------------------
# Local clustering coefficient over the co-part graph
# --------------------------------------------------------------------------

def q_lcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _copart_graph(spark, sf_dir)
    lcc = local_clustering_coefficient(g)
    endpoints = (
        g.edges.select(F.col("src").alias("node_id"))
        .union(g.edges.select(F.col("dst").alias("node_id")))
        .distinct()
    )
    return lcc.join(endpoints, "node_id", "left_semi").select(
        F.col("node_id").alias("p_partkey"), _e(F.col("lcc"), 8).alias("lcc_e8")
    )


Q_LCC_SQL = f"""
    WITH e AS MATERIALIZED ({COPART_EDGES_SQL}),
    deg AS (
        SELECT p, COUNT(*) AS d FROM (
            SELECT a AS p FROM e UNION ALL SELECT b FROM e) x GROUP BY p
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    corners AS (
        SELECT x AS p FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
    ),
    t AS (SELECT p, COUNT(*) AS t FROM corners GROUP BY p)
    SELECT CAST(deg.p AS BIGINT) AS p_partkey,
           {_floor_e("CASE WHEN deg.d >= 2 THEN 2.0 * COALESCE(t.t, 0) / (deg.d * (deg.d - 1)) ELSE 0.0 END", 8)} AS lcc_e8
    FROM deg LEFT JOIN t ON t.p = deg.p
"""


# --------------------------------------------------------------------------
# Topological sort over per-customer order chains (levels = chain position)
# --------------------------------------------------------------------------

def q_toposort(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _order_chain_graph(spark, sf_dir)
    res = topological_sort(g)
    assert res.is_dag
    return res.order.select(F.col("node_id").alias("o_orderkey"), F.col("level").cast("int").alias("level"))


Q_TOPOSORT_SQL = """
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) - 1 AS INT) AS level
    FROM orders
"""


# --------------------------------------------------------------------------
# Conductance + modularity over the supply web with region/hash communities
# --------------------------------------------------------------------------

_SUPPLY_ASSIGN_SQL = """
    SELECT r_regionkey AS node_id, r_regionkey AS community FROM region
    UNION ALL SELECT 10 + n_nationkey, n_regionkey FROM nation
    UNION ALL SELECT 50 + s_suppkey, n_regionkey FROM supplier JOIN nation ON n_nationkey = s_nationkey
    UNION ALL SELECT 2000 + c_custkey, n_regionkey FROM customer JOIN nation ON n_nationkey = c_nationkey
    UNION ALL SELECT 100000 + o_orderkey, o_orderkey % 5 FROM orders
"""


def _supply_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        region.select(F.col("r_regionkey").cast("long").alias("node_id"), F.col("r_regionkey").cast("long").alias("community"))
        .union(nation.select((10 + F.col("n_nationkey")).cast("long"), F.col("n_regionkey").cast("long")))
        .union(
            supplier.join(nation, supplier["s_nationkey"] == nation["n_nationkey"]).select(
                (50 + F.col("s_suppkey")).cast("long"), F.col("n_regionkey").cast("long")
            )
        )
        .union(
            customer.join(nation, customer["c_nationkey"] == nation["n_nationkey"]).select(
                (2000 + F.col("c_custkey")).cast("long"), F.col("n_regionkey").cast("long")
            )
        )
        .union(orders.select((100000 + F.col("o_orderkey")).cast("long"), (F.col("o_orderkey") % 5).cast("long")))
    )


def q_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _supply_web_graph(spark, sf_dir)
    assign = _supply_assignment(spark, sf_dir)
    return conductance(g, assign).select(
        "community", _e(F.col("conductance"), 8).alias("conductance_e8")
    )


Q_CONDUCTANCE_SQL = f"""
    WITH e0 AS MATERIALIZED ({SUPPLY_EDGES_SQL}),
    und AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    a AS MATERIALIZED ({_SUPPLY_ASSIGN_SQL}),
    j AS MATERIALIZED (
        SELECT sa.community AS c_src, da.community AS c_dst
        FROM und JOIN a sa ON sa.node_id = und.src JOIN a da ON da.node_id = und.dst
    ),
    tot AS (SELECT COUNT(*) AS t FROM j),
    per AS (
        SELECT c_src AS community, COUNT(*) AS volume,
               SUM(CASE WHEN c_src <> c_dst THEN 1 ELSE 0 END) AS boundary
        FROM j GROUP BY c_src
    )
    SELECT CAST(community AS BIGINT) AS community,
           {_floor_e("CASE WHEN LEAST(volume, (SELECT t FROM tot) - volume) > 0 THEN CAST(boundary AS DOUBLE) / LEAST(volume, (SELECT t FROM tot) - volume) ELSE 0.0 END", 8)} AS conductance_e8
    FROM per
"""


def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _supply_web_graph(spark, sf_dir)
    assign = _supply_assignment(spark, sf_dir)
    q = modularity(g, assign)
    bucket = int(np.floor(q * 1e8 + 0.3183098861837907))
    return spark.createDataFrame([(bucket,)], "q_e8 long")


Q_MODULARITY_SQL = f"""
    WITH e0 AS MATERIALIZED ({SUPPLY_EDGES_SQL}),
    und AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    a AS MATERIALIZED ({_SUPPLY_ASSIGN_SQL}),
    j AS MATERIALIZED (
        SELECT sa.community AS c_src, da.community AS c_dst
        FROM und JOIN a sa ON sa.node_id = und.src JOIN a da ON da.node_id = und.dst
    ),
    m2 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM j),
    intra AS (
        SELECT c_src, COUNT(*) AS e2 FROM j WHERE c_src = c_dst GROUP BY c_src
    ),
    degs AS (SELECT c_src, COUNT(*) AS deg FROM j GROUP BY c_src)
    SELECT {_floor_e("SUM(COALESCE(intra.e2, 0) / (SELECT t FROM m2) - (degs.deg / (SELECT t FROM m2)) * (degs.deg / (SELECT t FROM m2)))", 8)} AS q_e8
    FROM degs LEFT JOIN intra ON intra.c_src = degs.c_src
"""


# --------------------------------------------------------------------------
# ScaleProperties over customer account balances
# --------------------------------------------------------------------------

def q_scale_properties(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", F.col("c_acctbal").cast("double"))
    mm = scale_properties(cust, ["c_acctbal"], "minmax", suffix="_mm")
    st = scale_properties(mm, ["c_acctbal"], "stdscore", suffix="_st")
    l2 = scale_properties(st, ["c_acctbal"], "l2norm", suffix="_l2")
    return l2.select(
        "c_custkey",
        _e(F.col("c_acctbal_mm"), 8).alias("minmax_e8"),
        _e(F.col("c_acctbal_st"), 6).alias("stdscore_e6"),
        _e(F.col("c_acctbal_l2"), 6).alias("l2norm_e6"),
    )


Q_SCALE_SQL = f"""
    WITH s AS (
        SELECT MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx,
               AVG(c_acctbal) AS av, STDDEV_POP(c_acctbal) AS sd,
               SQRT(SUM(c_acctbal * c_acctbal)) AS l2
        FROM customer
    )
    SELECT c_custkey,
           {_floor_e("CASE WHEN s.mx = s.mn THEN 0.0 ELSE (c_acctbal - s.mn) / (s.mx - s.mn) END", 8)} AS minmax_e8,
           {_floor_e("CASE WHEN s.sd = 0 THEN 0.0 ELSE (c_acctbal - s.av) / s.sd END", 6)} AS stdscore_e6,
           {_floor_e("CASE WHEN s.l2 = 0 THEN 0.0 ELSE c_acctbal / s.l2 END", 6)} AS l2norm_e6
    FROM customer, s
"""


# --------------------------------------------------------------------------
# NodeSimilarity overlap metric
# --------------------------------------------------------------------------

def q_node_similarity_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _custpart_graph(spark, sf_dir)
    return node_similarity(g, metric="overlap", top_k=5).select(
        "node1", "node2", "rank", _e(F.col("similarity"), 6).alias("sim_e6")
    )


Q_NODESIM_OVERLAP_SQL = f"""
    WITH e AS ({CUSTPART_EDGES_SQL}),
    sz AS (SELECT src, COUNT(*) AS sz FROM e GROUP BY src),
    inter AS (
        SELECT a.src AS n1, b.src AS n2, COUNT(*) AS c
        FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
        GROUP BY a.src, b.src
    ),
    half AS (
        SELECT n1, n2, CAST(c AS DOUBLE) / LEAST(sa.sz, sb.sz) AS similarity
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
           CAST(rank AS INT) AS rank, {_floor_e("similarity", 6)} AS sim_e6
    FROM ranked WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# MinHash-LSH candidate pairs (full banding replicated in SQL)
# --------------------------------------------------------------------------

def q_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_candidate_pairs(
        _t(spark, sf_dir, "documents"), num_perm=8, bands=4, threshold=0.1
    ).select("a", "b", _e(F.col("jaccard"), 6).alias("jaccard_e6"))


_LSH_SHINGLES_SQL = """
    sh AS MATERIALIZED (
        SELECT DISTINCT doc_id,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents WHERE len(trim(text)) > 0) d,
             UNNEST(range(1, GREATEST(len(toks) - 1, 1))) AS u(i)
        WHERE len(toks) >= 3
    )
"""

_LSH_SIG_SQL = (
    "sig AS MATERIALIZED (SELECT d.doc_id, "
    + ", ".join(
        f"COALESCE(s.h{j}, -1) AS h{j}" for j in range(8)
    )
    + " FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN (SELECT doc_id, "
    + ", ".join(f"MIN({_minhash_perm_sql(j)}) AS h{j}" for j in range(8))
    + " FROM sh GROUP BY doc_id) s ON s.doc_id = d.doc_id)"
)

_LSH_BANDS_SQL = (
    "banded AS MATERIALIZED ("
    + " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, CAST(h{2*b} AS VARCHAR) || '_' || CAST(h{2*b+1} AS VARCHAR) AS bucket FROM sig"
        for b in range(4)
    )
    + ")"
)

Q_LSH_PAIRS_SQL = f"""
    WITH {_LSH_SHINGLES_SQL},
    {_LSH_SIG_SQL},
    {_LSH_BANDS_SQL},
    cand AS MATERIALIZED (
        SELECT DISTINCT la.doc_id AS a, lb.doc_id AS b
        FROM banded la JOIN banded lb ON la.band = lb.band AND la.bucket = lb.bucket
        WHERE la.doc_id < lb.doc_id
    ),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
        FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        JOIN cand ON cand.a = x.doc_id AND cand.b = y.doc_id
        GROUP BY x.doc_id, y.doc_id
    )
    SELECT a, b, {_floor_e("CAST(c AS DOUBLE) / (sa.sz + sb.sz - c)", 6)} AS jaccard_e6
    FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
    WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.1
"""


# --------------------------------------------------------------------------
# Hyperplane-LSH ANN (plane literals shared by both engines)
# --------------------------------------------------------------------------

_ANN_DIM = 64
_ANN_PLANES = np.random.default_rng(42).standard_normal((8, _ANN_DIM))


def q_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return lsh_cosine_topk(emb, queries, k=5, n_planes=8, seed=42).select(
        "query_id", "neighbor_id", "rank", _e(F.col("sim"), 4).alias("sim_e4")
    )


def _plane_dot_sql(plane) -> str:
    return " + ".join(f"CAST(embedding[{i + 1}] AS DOUBLE) * ({x!r})" for i, x in enumerate(plane))


_ANN_BUCKET_SQL = " + ".join(
    f"CASE WHEN ({_plane_dot_sql(_ANN_PLANES[p])}) >= 0 THEN {1 << p} ELSE 0 END"
    for p in range(8)
)

Q_LSH_COSINE_SQL = f"""
    WITH b AS MATERIALIZED (
        SELECT vec_id, embedding, {_ANN_BUCKET_SQL} AS bucket FROM embeddings
    ),
    qe AS MATERIALIZED (SELECT vec_id, bucket, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM b, UNNEST(range(1, len(embedding) + 1)) AS t(i) WHERE vec_id < 20),
    ce AS MATERIALIZED (SELECT vec_id, bucket, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM b, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
    nrm AS (SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM ce GROUP BY vec_id),
    dots AS (
        SELECT qe.vec_id AS query_id, ce.vec_id AS neighbor_id, SUM(qe.x * ce.x) AS dot
        FROM qe JOIN ce ON qe.i = ce.i AND qe.bucket = ce.bucket AND qe.vec_id <> ce.vec_id
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
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, {_floor_e("sim", 4)} AS sim_e4
    FROM ranked WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# BFS levels + weighted SSSP over the reversed supply tree (root: region 0)
# --------------------------------------------------------------------------

def _supply_tree_graph(spark: SparkSession, sf_dir: str, weighted: bool) -> LinkGraph:
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    if weighted:
        wn = (1.0 + F.col("n_nationkey") % 3).cast("double")
        wc = (1.0 + F.col("c_custkey") % 7).cast("double")
        ws = (1.0 + F.col("s_suppkey") % 5).cast("double")
        wo = (1.0 + F.col("o_orderkey") % 11).cast("double")
    else:
        wn = wc = ws = wo = F.lit(1.0)
    edges = (
        nation.select(F.col("n_regionkey").cast("long").alias("src"), (10 + F.col("n_nationkey")).cast("long").alias("dst"), wn.alias("weight"))
        .union(customer.select((10 + F.col("c_nationkey")).cast("long"), (2000 + F.col("c_custkey")).cast("long"), wc))
        .union(supplier.select((10 + F.col("s_nationkey")).cast("long"), (50 + F.col("s_suppkey")).cast("long"), ws))
        .union(orders.select((2000 + F.col("o_custkey")).cast("long"), (100000 + F.col("o_orderkey")).cast("long"), wo))
    )
    region = _t(spark, sf_dir, "region")
    vertices = (
        region.select(F.col("r_regionkey").cast("long").alias("node_id"))
        .union(nation.select((10 + F.col("n_nationkey")).cast("long")))
        .union(supplier.select((50 + F.col("s_suppkey")).cast("long")))
        .union(customer.select((2000 + F.col("c_custkey")).cast("long")))
        .union(orders.select((100000 + F.col("o_orderkey")).cast("long")))
    )
    max_id = edges.agg(F.greatest(F.max("src"), F.max("dst")).alias("m")).collect()[0]["m"]
    return LinkGraph(edges=edges, vertices=vertices, node_count=int(max_id) + 1)


def q_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _supply_tree_graph(spark, sf_dir, weighted=False)
    return bfs_levels(g, source=0).select("node_id", "level")


Q_BFS_SQL = """
    SELECT CAST(0 AS BIGINT) AS node_id, CAST(0 AS BIGINT) AS level
    UNION ALL SELECT 10 + n_nationkey, 1 FROM nation WHERE n_regionkey = 0
    UNION ALL SELECT 50 + s_suppkey, 2 FROM supplier JOIN nation ON n_nationkey = s_nationkey WHERE n_regionkey = 0
    UNION ALL SELECT 2000 + c_custkey, 2 FROM customer JOIN nation ON n_nationkey = c_nationkey WHERE n_regionkey = 0
    UNION ALL SELECT 100000 + o_orderkey, 3
      FROM orders JOIN customer ON c_custkey = o_custkey JOIN nation ON n_nationkey = c_nationkey
      WHERE n_regionkey = 0
"""


def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _supply_tree_graph(spark, sf_dir, weighted=True)
    res = shortest_paths(g, source=0, weighted=True)
    return res.distances.select("node_id", F.col("distance").cast("long").alias("distance"))


Q_SSSP_SQL = """
    SELECT CAST(0 AS BIGINT) AS node_id, CAST(0 AS BIGINT) AS distance
    UNION ALL SELECT 10 + n_nationkey, 1 + n_nationkey % 3 FROM nation WHERE n_regionkey = 0
    UNION ALL SELECT 50 + s_suppkey, (1 + n_nationkey % 3) + (1 + s_suppkey % 5)
      FROM supplier JOIN nation ON n_nationkey = s_nationkey WHERE n_regionkey = 0
    UNION ALL SELECT 2000 + c_custkey, (1 + n_nationkey % 3) + (1 + c_custkey % 7)
      FROM customer JOIN nation ON n_nationkey = c_nationkey WHERE n_regionkey = 0
    UNION ALL SELECT 100000 + o_orderkey, (1 + n_nationkey % 3) + (1 + c_custkey % 7) + (1 + o_orderkey % 11)
      FROM orders JOIN customer ON c_custkey = o_custkey JOIN nation ON n_nationkey = c_nationkey
      WHERE n_regionkey = 0
"""


# --------------------------------------------------------------------------
# K-core over nation cliques + customer pendants
# --------------------------------------------------------------------------

def _nation_clique_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    a = nation.select(F.col("n_nationkey").alias("ka"), F.col("n_regionkey").alias("r"))
    b = nation.select(F.col("n_nationkey").alias("kb"), F.col("n_regionkey").alias("r"))
    return (
        a.join(b, "r")
        .filter(F.col("ka") < F.col("kb"))
        .select(
            (10 + F.col("ka")).cast("long").alias("src"),
            (10 + F.col("kb")).cast("long").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    pend = customer.select(
        (2000 + F.col("c_custkey")).cast("long").alias("src"),
        (10 + F.col("c_nationkey")).cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    edges = _nation_clique_edges(spark, sf_dir).union(pend)
    vertices = nation.select((10 + F.col("n_nationkey")).cast("long").alias("node_id")).union(
        customer.select((2000 + F.col("c_custkey")).cast("long"))
    )
    g = LinkGraph(edges=edges, vertices=vertices)
    return k_core(g).cores.select("node_id", F.col("core").cast("int").alias("core"))


Q_KCORE_SQL = """
    WITH rs AS (SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey)
    SELECT CAST(10 + n_nationkey AS BIGINT) AS node_id,
           CAST(rs.n - 1 AS INT) AS core
    FROM nation JOIN rs ON rs.n_regionkey = nation.n_regionkey
    UNION ALL
    SELECT CAST(2000 + c_custkey AS BIGINT), 1 FROM customer
"""


# --------------------------------------------------------------------------
# Louvain over disconnected nation cliques (optimum = the cliques)
# --------------------------------------------------------------------------

def q_louvain(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    edges = _nation_clique_edges(spark, sf_dir)
    vertices = nation.select((10 + F.col("n_nationkey")).cast("long").alias("node_id"))
    g = LinkGraph(edges=edges, vertices=vertices)
    res = louvain(g)
    canon = res.communities.groupBy("community").agg(F.min("node_id").alias("canon"))
    return (
        res.communities.join(canon, "community")
        .select("node_id", F.col("canon").alias("community"))
    )


Q_LOUVAIN_SQL = """
    SELECT CAST(10 + n_nationkey AS BIGINT) AS node_id,
           CAST(10 + MIN(n_nationkey) OVER (PARTITION BY n_regionkey) AS BIGINT) AS community
    FROM nation
"""


# --------------------------------------------------------------------------
# Seeded WCC over order chains
# --------------------------------------------------------------------------

def q_wcc_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _order_chain_graph(spark, sf_dir)
    orders = _t(spark, sf_dir, "orders")
    seeds = (
        orders.filter(F.col("o_custkey") % 10 == 0)
        .select(F.col("o_orderkey").cast("long").alias("node_id"), F.col("o_custkey").cast("long").alias("seed"))
    )
    return wcc(g, seeds=seeds).components.select("node_id", "component")


Q_WCC_SEEDED_SQL = """
    WITH ms AS (SELECT COALESCE(MAX(o_custkey), -1) AS m FROM orders WHERE o_custkey % 10 = 0)
    SELECT CAST(o_orderkey AS BIGINT) AS node_id,
           CAST(CASE WHEN o_custkey % 10 = 0 THEN o_custkey
                ELSE (SELECT m FROM ms) + 1 + MIN(o_orderkey) OVER (PARTITION BY o_custkey)
           END AS BIGINT) AS component
    FROM orders
"""


# --------------------------------------------------------------------------
# FastRP embeddings over the undirected nation cliques (portable RNG so the
# whole pipeline — init + 3 propagation rounds — replays in DuckDB)
# --------------------------------------------------------------------------

_FRP_D = 8
_FRP_SEED = 7


def q_fastrp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.graph.build import to_undirected

    nation = _t(spark, sf_dir, "nation")
    edges = to_undirected(_nation_clique_edges(spark, sf_dir))
    vertices = nation.select((10 + F.col("n_nationkey")).cast("long").alias("node_id"))
    g = LinkGraph(edges=edges, vertices=vertices, node_count=35)
    res = fastrp(g, embedding_dimension=_FRP_D, random_seed=_FRP_SEED, rng="portable")
    return res.embeddings.select(
        "node_id", F.posexplode("embedding").alias("dim", "val")
    ).select("node_id", "dim", _e(F.col("val"), 6).alias("val_e6"))


def _frp_bucket_sql(node_expr: str, i_expr: str) -> str:
    h = f"(('0x' || substr(md5('{_FRP_SEED}' || ':' || CAST({node_expr} AS VARCHAR) || ':' || CAST({i_expr} AS VARCHAR)), 1, 15))::BIGINT)"
    return f"({h} % 6)"


_FRP_VAL = "(sqrt(3.0) / sqrt(8.0))"

Q_FASTRP_SQL = f"""
    WITH n AS MATERIALIZED (SELECT 10 + n_nationkey AS node_id, n_regionkey FROM nation),
    e AS MATERIALIZED (
        SELECT a.node_id AS src, b.node_id AS dst
        FROM n a JOIN n b ON a.n_regionkey = b.n_regionkey AND a.node_id <> b.node_id
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    dims AS (SELECT UNNEST(range(0, {_FRP_D})) AS i),
    init AS MATERIALIZED (
        SELECT n.node_id, dims.i,
               CASE {_frp_bucket_sql('n.node_id', 'dims.i')}
                    WHEN 0 THEN {_FRP_VAL} WHEN 1 THEN -{_FRP_VAL} ELSE 0.0 END AS v
        FROM n, dims
    ),
    cur1 AS MATERIALIZED (
        SELECT e.src AS node_id, p.i, SUM(p.v) / ANY_VALUE(deg.d) AS v
        FROM e JOIN init p ON p.node_id = e.dst JOIN deg ON deg.src = e.src
        GROUP BY e.src, p.i
    ),
    cur2 AS MATERIALIZED (
        SELECT e.src AS node_id, p.i, SUM(p.v) / ANY_VALUE(deg.d) AS v
        FROM e JOIN cur1 p ON p.node_id = e.dst JOIN deg ON deg.src = e.src
        GROUP BY e.src, p.i
    ),
    n2 AS (SELECT node_id, SQRT(SUM(v * v)) AS l2 FROM cur2 GROUP BY node_id),
    cur3 AS MATERIALIZED (
        SELECT e.src AS node_id, p.i, SUM(p.v) / ANY_VALUE(deg.d) AS v
        FROM e JOIN cur2 p ON p.node_id = e.dst JOIN deg ON deg.src = e.src
        GROUP BY e.src, p.i
    ),
    n3 AS (SELECT node_id, SQRT(SUM(v * v)) AS l2 FROM cur3 GROUP BY node_id),
    emb AS (
        SELECT c2.node_id, c2.i,
               c2.v / (CASE WHEN n2.l2 > 0 THEN n2.l2 ELSE 1.0 END)
             + c3.v / (CASE WHEN n3.l2 > 0 THEN n3.l2 ELSE 1.0 END) AS v
        FROM cur2 c2
        JOIN n2 ON n2.node_id = c2.node_id
        JOIN cur3 c3 ON c3.node_id = c2.node_id AND c3.i = c2.i
        JOIN n3 ON n3.node_id = c2.node_id
    )
    SELECT CAST(node_id AS BIGINT) AS node_id, CAST(i AS INT) AS dim,
           {_floor_e("v", 6)} AS val_e6
    FROM emb
"""


QUERIES_EXT = {
    "article_rank_supply_web": q_article_rank,
    "eigenvector_supply_web": q_eigenvector,
    "hits_supply_web": q_hits,
    "lcc_coparts": q_lcc,
    "toposort_order_chains": q_toposort,
    "conductance_supply_communities": q_conductance,
    "modularity_supply_communities": q_modularity,
    "scale_customer_acctbal": q_scale_properties,
    "node_similarity_overlap": q_node_similarity_overlap,
    "lsh_candidate_pairs": q_lsh_pairs,
    "lsh_cosine_topk": q_lsh_cosine,
    "bfs_supply_tree": q_bfs,
    "sssp_supply_tree": q_sssp,
    "kcore_nation_cliques": q_kcore,
    "louvain_nation_cliques": q_louvain,
    "wcc_seeded_chains": q_wcc_seeded,
    "fastrp_nation_cliques": q_fastrp,
}

ORACLES_EXT = {
    "article_rank_supply_web": Q_ARTICLE_RANK_SQL,
    "eigenvector_supply_web": Q_EIGENVECTOR_SQL,
    "hits_supply_web": Q_HITS_SQL,
    "lcc_coparts": Q_LCC_SQL,
    "toposort_order_chains": Q_TOPOSORT_SQL,
    "conductance_supply_communities": Q_CONDUCTANCE_SQL,
    "modularity_supply_communities": Q_MODULARITY_SQL,
    "scale_customer_acctbal": Q_SCALE_SQL,
    "node_similarity_overlap": Q_NODESIM_OVERLAP_SQL,
    "lsh_candidate_pairs": Q_LSH_PAIRS_SQL,
    "lsh_cosine_topk": Q_LSH_COSINE_SQL,
    "bfs_supply_tree": Q_BFS_SQL,
    "sssp_supply_tree": Q_SSSP_SQL,
    "kcore_nation_cliques": Q_KCORE_SQL,
    "louvain_nation_cliques": Q_LOUVAIN_SQL,
    "wcc_seeded_chains": Q_WCC_SEEDED_SQL,
    "fastrp_nation_cliques": Q_FASTRP_SQL,
}
