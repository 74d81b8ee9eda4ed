"""Round-2 driver-contract queries, batch 3: betweenness (exact Brandes on
the supply tree — closed-form oracle ancestors×descendants), triangle
listing, subgraph filter, filtered node similarity, embedding near-dup,
single-level modularity optimization; IVF ANN ships rows-only (its cells
depend on k-means float centroids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.betweenness import betweenness
from graph_data_science_spark.algorithms.louvain import modularity_optimization
from graph_data_science_spark.algorithms.similarity import filtered_node_similarity
from graph_data_science_spark.algorithms.triangles import triangle_listing
from graph_data_science_spark.datapipe.ann import embedding_near_dup_pairs, ivf_topk
from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.graph.subgraph import subgraph_filter
from graph_data_science_spark.queries import (
    COPART_EDGES_SQL,
    Q_ANN_SQL as Q_ANN_ORACLE_SQL,
    CUSTPART_EDGES_SQL,
    _copart_graph,
    _custpart_graph,
    _e,
    _supply_web_graph,
    _t,
)
from graph_data_science_spark.queries_ext import (
    _ANN_PLANES,
    _floor_e,
    _nation_clique_edges,
    _plane_dot_sql,
    _supply_tree_graph,
)

# 4-plane bucket: NumPy fills standard_normal((8, 64)) row-major, so the
# first 4 rows equal an independent standard_normal((4, 64)) draw with the
# same seed — the engine's n_planes=4 planes.
_ANN_BUCKET4_SQL = " + ".join(
    f"CASE WHEN ({_plane_dot_sql(_ANN_PLANES[p])}) >= 0 THEN {1 << p} ELSE 0 END"
    for p in range(4)
)


# --------------------------------------------------------------------------
# Betweenness on the supply tree: every s→t path is unique (σ ≡ 1), so
# bc(v) = ancestors(v) × descendants(v) — exact closed form for the oracle.
# --------------------------------------------------------------------------

def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The oracle is the exact closed form, so pin exactness past the
    # auto-sampling guard (at sf0.1 the tree has 166k vertices > the 100k
    # default limit, but exact MSBFS is cheap here: the tree is depth-3 and
    # almost all sources are leaves, so total pair rows stay ~O(V)). The
    # guard's auto-sample behavior is exercised by betweenness_sampled and
    # tests/test_dijkstra_guards.py.
    g = _supply_tree_graph(spark, sf_dir, weighted=False)
    return betweenness(g, exact_source_limit=1_000_000).select(
        "node_id", F.col("score").cast("long").alias("score")
    )


Q_BETWEENNESS_SQL = """
    WITH ord_per_cust AS (SELECT o_custkey, COUNT(*) AS n_ord FROM orders GROUP BY o_custkey),
    nat_desc AS (
        SELECT n_nationkey,
               (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey)
             + (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey)
             + COALESCE((SELECT SUM(n_ord) FROM ord_per_cust JOIN customer ON c_custkey = o_custkey
                         WHERE c_nationkey = n_nationkey), 0) AS descendants
        FROM nation
    )
    SELECT CAST(r_regionkey AS BIGINT) AS node_id, CAST(0 AS BIGINT) AS score FROM region
    UNION ALL
    SELECT CAST(10 + n_nationkey AS BIGINT), CAST(1 * descendants AS BIGINT) FROM nat_desc
    UNION ALL
    SELECT CAST(50 + s_suppkey AS BIGINT), 0 FROM supplier
    UNION ALL
    SELECT CAST(2000 + c_custkey AS BIGINT), CAST(2 * COALESCE(n_ord, 0) AS BIGINT)
    FROM customer LEFT JOIN ord_per_cust ON o_custkey = c_custkey
    UNION ALL
    SELECT CAST(100000 + o_orderkey AS BIGINT), 0 FROM orders
"""


# --------------------------------------------------------------------------
# Triangle listing over the co-part graph
# --------------------------------------------------------------------------

def q_triangle_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _copart_graph(spark, sf_dir)
    return triangle_listing(g)


Q_TRIANGLE_LISTING_SQL = f"""
    WITH e AS MATERIALIZED ({COPART_EDGES_SQL})
    SELECT CAST(e1.a AS BIGINT) AS a, CAST(e1.b AS BIGINT) AS b, CAST(e2.b AS BIGINT) AS c
    FROM e e1 JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
"""


# --------------------------------------------------------------------------
# Subgraph filter: keep only customer/order nodes of the supply web, then
# report surviving out-degrees (the filter-then-re-aggregate lifecycle)
# --------------------------------------------------------------------------

def q_subgraph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _supply_web_graph(spark, sf_dir)
    sub = subgraph_filter(g, node_filter="node_id >= 2000")
    deg = sub.edges.groupBy("src").agg(F.count("*").alias("degree"))
    return (
        sub.vertices.join(deg, sub.vertices["node_id"] == deg["src"], "left")
        .select("node_id", F.coalesce(F.col("degree"), F.lit(0)).alias("degree"))
    )


Q_SUBGRAPH_SQL = """
    SELECT CAST(2000 + c_custkey AS BIGINT) AS node_id, CAST(0 AS BIGINT) AS degree FROM customer
    UNION ALL
    SELECT CAST(100000 + o_orderkey AS BIGINT), 1 FROM orders
"""


# --------------------------------------------------------------------------
# Filtered NodeSimilarity: even customers rank only odd customers
# --------------------------------------------------------------------------

def q_filtered_nodesim(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _custpart_graph(spark, sf_dir)
    customer = _t(spark, sf_dir, "customer")
    srcs = customer.filter(F.col("c_custkey") % 2 == 0).select(F.col("c_custkey").cast("long"))
    tgts = customer.filter(F.col("c_custkey") % 2 == 1).select(F.col("c_custkey").cast("long"))
    return filtered_node_similarity(g, source_nodes=srcs, target_nodes=tgts, top_k=5).select(
        "node1", "node2", "rank", _e(F.col("similarity"), 6).alias("sim_e6")
    )


Q_FILTERED_NODESIM_SQL = f"""
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
    flt AS (SELECT n1, n2, similarity FROM sym WHERE n1 % 2 = 0 AND n2 % 2 = 1),
    ranked AS (
        SELECT n1, n2, similarity,
               ROW_NUMBER() OVER (PARTITION BY n1 ORDER BY similarity DESC, n2 ASC) AS rank
        FROM flt
    )
    SELECT CAST(n1 AS BIGINT) AS node1, CAST(n2 AS BIGINT) AS node2,
           CAST(rank AS INT) AS rank, {_floor_e("similarity", 6)} AS sim_e6
    FROM ranked WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# Embedding-cosine near-duplicates (hyperplane-bucketed, exact verify)
# --------------------------------------------------------------------------

def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 4 planes / threshold 0.35: the synthetic embeddings top out at cosine
    # ~0.51, so this is the setting that actually exercises the
    # bucket-join + verify pipeline with non-empty output.
    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.35, n_planes=4, seed=42).select(
        "a", "b", _e(F.col("sim"), 4).alias("sim_e4")
    )


Q_EMBEDDING_NEAR_DUP_SQL = f"""
    WITH b AS MATERIALIZED (
        SELECT vec_id, embedding, {_ANN_BUCKET4_SQL} AS bucket FROM embeddings
    ),
    ve AS MATERIALIZED (SELECT vec_id, bucket, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM b, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
    nrm AS (SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM ve GROUP BY vec_id),
    dots AS (
        SELECT va.vec_id AS a, vb.vec_id AS b, SUM(va.x * vb.x) AS dot
        FROM ve va JOIN ve vb ON va.i = vb.i AND va.bucket = vb.bucket AND va.vec_id < vb.vec_id
        GROUP BY va.vec_id, vb.vec_id
    ),
    sims AS (
        SELECT a, b, dot / (na.nrm * nb.nrm) AS sim
        FROM dots JOIN nrm na ON na.vec_id = a JOIN nrm nb ON nb.vec_id = b
    )
    SELECT a, b, {_floor_e("sim", 4)} AS sim_e4 FROM sims WHERE sim >= 0.35
"""


# --------------------------------------------------------------------------
# Single-level modularity optimization on the nation cliques
# --------------------------------------------------------------------------

def q_modularity_optimization(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    edges = _nation_clique_edges(spark, sf_dir)
    vertices = nation.select((10 + F.col("n_nationkey")).cast("long").alias("node_id"))
    g = LinkGraph(edges=edges, vertices=vertices)
    res = modularity_optimization(g)
    canon = res.communities.groupBy("community").agg(F.min("node_id").alias("canon"))
    return res.communities.join(canon, "community").select(
        "node_id", F.col("canon").alias("community")
    )


Q_MODOPT_SQL = """
    SELECT CAST(10 + n_nationkey AS BIGINT) AS node_id,
           CAST(10 + MIN(n_nationkey) OVER (PARTITION BY n_regionkey) AS BIGINT) AS community
    FROM nation
"""


# --------------------------------------------------------------------------
# IVF ANN, exhaustive probing: with n_probe == n_clusters every cell is
# searched, so the result MUST bit-match the brute-force oracle — this
# gates the whole cell-assignment + probe plumbing (a lost or duplicated
# vector anywhere shows up immediately). Partial-probe recall is asserted
# separately in tests.
# --------------------------------------------------------------------------

def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return ivf_topk(emb, queries, k=5, n_clusters=8, n_probe=8, seed=11).select(
        "query_id", "neighbor_id", "rank", _e(F.col("sim"), 4).alias("sim_e4")
    )


QUERIES_EXT3 = {
    "betweenness_supply_tree": q_betweenness,
    "triangle_listing_coparts": q_triangle_listing,
    "subgraph_filter_degree": q_subgraph_degree,
    "filtered_node_similarity": q_filtered_nodesim,
    "embedding_near_dup": q_embedding_near_dup,
    "modularity_opt_nation_cliques": q_modularity_optimization,
    "ivf_cosine_topk": q_ivf_topk,
}

ORACLES_EXT3 = {
    "betweenness_supply_tree": Q_BETWEENNESS_SQL,
    "triangle_listing_coparts": Q_TRIANGLE_LISTING_SQL,
    "subgraph_filter_degree": Q_SUBGRAPH_SQL,
    "filtered_node_similarity": Q_FILTERED_NODESIM_SQL,
    "embedding_near_dup": Q_EMBEDDING_NEAR_DUP_SQL,
    "modularity_opt_nation_cliques": Q_MODOPT_SQL,
    # ivf_cosine_topk probes every cell (n_probe == n_clusters), so the
    # exact-ANN oracle applies verbatim (same query set, same k).
    "ivf_cosine_topk": Q_ANN_ORACLE_SQL,
}


# --------------------------------------------------------------------------
# Leiden on the nation cliques (optimum = the cliques; connectivity is the
# guarantee under test elsewhere)
# --------------------------------------------------------------------------

def q_leiden(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.algorithms.louvain import leiden

    nation = _t(spark, sf_dir, "nation")
    edges = _nation_clique_edges(spark, sf_dir)
    vertices = nation.select((10 + F.col("n_nationkey")).cast("long").alias("node_id"))
    g = LinkGraph(edges=edges, vertices=vertices)
    res = leiden(g)
    canon = res.communities.groupBy("community").agg(F.min("node_id").alias("canon"))
    return res.communities.join(canon, "community").select(
        "node_id", F.col("canon").alias("community")
    )


Q_LEIDEN_SQL = """
    SELECT CAST(10 + n_nationkey AS BIGINT) AS node_id,
           CAST(10 + MIN(n_nationkey) OVER (PARTITION BY n_regionkey) AS BIGINT) AS community
    FROM nation
"""


# --------------------------------------------------------------------------
# Indirect exposure over the weighted supply tree from sanctioned region 0
# (a tree: every reached node has a unique parent, so exposure, hop, parent
# and root all have closed forms)
# --------------------------------------------------------------------------

def q_indirect_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.algorithms.exposure import indirect_exposure

    g = _supply_tree_graph(spark, sf_dir, weighted=True)
    sanc = spark.createDataFrame([(0,)], "node_id long")
    return indirect_exposure(g, sanc).select(
        "node_id", _e(F.col("exposure"), 8).alias("exposure_e8"), "hop", "parent", "root"
    )


Q_INDIRECT_EXPOSURE_SQL = """
    WITH wn AS (SELECT n_nationkey, n_regionkey, CAST(1 + n_nationkey % 3 AS DOUBLE) AS w FROM nation),
    wc AS (SELECT c_custkey, c_nationkey, CAST(1 + c_custkey % 7 AS DOUBLE) AS w FROM customer),
    ws AS (SELECT s_suppkey, s_nationkey, CAST(1 + s_suppkey % 5 AS DOUBLE) AS w FROM supplier),
    wo AS (SELECT o_orderkey, o_custkey, CAST(1 + o_orderkey % 11 AS DOUBLE) AS w FROM orders),
    nat_tot AS (
        SELECT wn.n_nationkey, wn.n_regionkey, wn.w,
               wn.w + COALESCE((SELECT SUM(w) FROM wc WHERE c_nationkey = wn.n_nationkey), 0)
                    + COALESCE((SELECT SUM(w) FROM ws WHERE s_nationkey = wn.n_nationkey), 0) AS total
        FROM wn
    ),
    cust_tot AS (
        SELECT wc.c_custkey, wc.c_nationkey, wc.w,
               wc.w + COALESCE((SELECT SUM(w) FROM wo WHERE o_custkey = wc.c_custkey), 0) AS total
        FROM wc
    ),
    nat_exp AS (
        SELECT n_nationkey, w / total AS exposure FROM nat_tot WHERE n_regionkey = 0
    ),
    cust_exp AS (
        SELECT ct.c_custkey, ct.c_nationkey, ne.exposure * ct.w / ct.total AS exposure
        FROM cust_tot ct JOIN nat_exp ne ON ne.n_nationkey = ct.c_nationkey
    )
    SELECT CAST(0 AS BIGINT) AS node_id,
           CAST(FLOOR(1.0 * 1e8 + 0.3183098861837907) AS BIGINT) AS exposure_e8,
           CAST(0 AS INT) AS hop, CAST(0 AS BIGINT) AS parent, CAST(0 AS BIGINT) AS root
    UNION ALL
    SELECT CAST(r_regionkey AS BIGINT), CAST(FLOOR(0.0 * 1e8 + 0.3183098861837907) AS BIGINT),
           NULL, NULL, NULL
    FROM region WHERE r_regionkey <> 0
    UNION ALL
    SELECT CAST(10 + nt.n_nationkey AS BIGINT),
           CAST(FLOOR(CASE WHEN nt.n_regionkey = 0 THEN nt.w / nt.total ELSE 0.0 END * 1e8 + 0.3183098861837907) AS BIGINT),
           CASE WHEN nt.n_regionkey = 0 THEN 1 ELSE NULL END,
           CASE WHEN nt.n_regionkey = 0 THEN 0 ELSE NULL END,
           CASE WHEN nt.n_regionkey = 0 THEN 0 ELSE NULL END
    FROM nat_tot nt
    UNION ALL
    SELECT CAST(50 + ws.s_suppkey AS BIGINT),
           CAST(FLOOR(COALESCE(ne.exposure * ws.w / ws.w, 0.0) * 1e8 + 0.3183098861837907) AS BIGINT),
           CASE WHEN ne.n_nationkey IS NOT NULL THEN 2 ELSE NULL END,
           CASE WHEN ne.n_nationkey IS NOT NULL THEN CAST(10 + ws.s_nationkey AS BIGINT) ELSE NULL END,
           CASE WHEN ne.n_nationkey IS NOT NULL THEN 0 ELSE NULL END
    FROM ws LEFT JOIN nat_exp ne ON ne.n_nationkey = ws.s_nationkey
    UNION ALL
    SELECT CAST(2000 + ct.c_custkey AS BIGINT),
           CAST(FLOOR(COALESCE(ce.exposure, 0.0) * 1e8 + 0.3183098861837907) AS BIGINT),
           CASE WHEN ce.c_custkey IS NOT NULL THEN 2 ELSE NULL END,
           CASE WHEN ce.c_custkey IS NOT NULL THEN CAST(10 + ct.c_nationkey AS BIGINT) ELSE NULL END,
           CASE WHEN ce.c_custkey IS NOT NULL THEN 0 ELSE NULL END
    FROM cust_tot ct LEFT JOIN cust_exp ce ON ce.c_custkey = ct.c_custkey
    UNION ALL
    SELECT CAST(100000 + wo.o_orderkey AS BIGINT),
           CAST(FLOOR(COALESCE(ce.exposure * wo.w / wo.w, 0.0) * 1e8 + 0.3183098861837907) AS BIGINT),
           CASE WHEN ce.c_custkey IS NOT NULL THEN 3 ELSE NULL END,
           CASE WHEN ce.c_custkey IS NOT NULL THEN CAST(2000 + wo.o_custkey AS BIGINT) ELSE NULL END,
           CASE WHEN ce.c_custkey IS NOT NULL THEN 0 ELSE NULL END
    FROM wo LEFT JOIN cust_exp ce ON ce.c_custkey = wo.o_custkey
"""

QUERIES_EXT3["leiden_nation_cliques"] = q_leiden
QUERIES_EXT3["indirect_exposure_supply_tree"] = q_indirect_exposure
ORACLES_EXT3["leiden_nation_cliques"] = Q_LEIDEN_SQL
ORACLES_EXT3["indirect_exposure_supply_tree"] = Q_INDIRECT_EXPOSURE_SQL
