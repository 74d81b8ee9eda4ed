"""Round-2 driver-contract queries, batch 2: closeness/harmonic (MSBFS),
CollapsePath, deterministic random walks, KMeans; KNN and SLLPA ship as
rows-only entries (NN-descent is approximate by construction and SLLPA's
per-edge draws use the JVM hash — both documented).

Merged into ``queries.QUERIES`` / ``queries.ORACLES`` like queries_ext.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.centrality_extra import closeness, harmonic_centrality
from graph_data_science_spark.algorithms.kmeans import kmeans
from graph_data_science_spark.algorithms.knn import knn
from graph_data_science_spark.algorithms.sllpa import speaker_listener_lpa
from graph_data_science_spark.algorithms.walks import collapse_path, random_walks
from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.queries import _e, _t
from graph_data_science_spark.queries_ext import _floor_e, _supply_tree_graph

# --------------------------------------------------------------------------
# Closeness + harmonic over the undirected customer↔nation star forest:
# every nation is a hub of its customers, components are disconnected per
# nation, so exact distances are joinable in SQL (1 to the hub, 2 between
# siblings).
# --------------------------------------------------------------------------


def _cust_nation_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    fwd = customer.select(
        (2000 + F.col("c_custkey")).cast("long").alias("src"),
        (10 + F.col("c_nationkey")).cast("long").alias("dst"),
    )
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).withColumn(
        "weight", F.lit(1.0)
    )
    vertices = nation.select((10 + F.col("n_nationkey")).cast("long").alias("node_id")).union(
        customer.select((2000 + F.col("c_custkey")).cast("long"))
    )
    return LinkGraph(edges=edges, vertices=vertices)


_CN_STATS_SQL = """
    nstat AS MATERIALIZED (
        SELECT n_nationkey, COUNT(c_custkey) AS nc
        FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_nationkey
    ),
    total AS (SELECT (SELECT COUNT(*) FROM nation) + (SELECT COUNT(*) FROM customer) AS n)
"""


def q_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _cust_nation_graph(spark, sf_dir)
    plain = closeness(g).withColumnRenamed("score", "c")
    wf = closeness(g, wasserman_faust=True).withColumnRenamed("score", "wf")
    return plain.join(wf, "node_id").select(
        "node_id", _e(F.col("c"), 8).alias("closeness_e8"), _e(F.col("wf"), 8).alias("wf_e8")
    )


Q_CLOSENESS_SQL = f"""
    WITH {_CN_STATS_SQL}
    SELECT CAST(10 + n_nationkey AS BIGINT) AS node_id,
           {_floor_e("CASE WHEN nc > 0 THEN 1.0 ELSE 0.0 END", 8)} AS closeness_e8,
           {_floor_e("CASE WHEN nc > 0 THEN CAST(nc AS DOUBLE) / ((SELECT n FROM total) - 1) ELSE 0.0 END", 8)} AS wf_e8
    FROM nstat
    UNION ALL
    SELECT CAST(2000 + c_custkey AS BIGINT),
           {_floor_e("CAST(nc AS DOUBLE) / (1 + 2 * (nc - 1))", 8)},
           {_floor_e("(CAST(nc AS DOUBLE) / (1 + 2 * (nc - 1))) * (CAST(nc AS DOUBLE) / ((SELECT n FROM total) - 1))", 8)}
    FROM customer JOIN nstat ON n_nationkey = c_nationkey
"""


def q_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _cust_nation_graph(spark, sf_dir)
    return harmonic_centrality(g).select("node_id", _e(F.col("score"), 8).alias("harmonic_e8"))


Q_HARMONIC_SQL = f"""
    WITH {_CN_STATS_SQL}
    SELECT CAST(10 + n_nationkey AS BIGINT) AS node_id,
           {_floor_e("CAST(nc AS DOUBLE) / ((SELECT n FROM total) - 1)", 8)} AS harmonic_e8
    FROM nstat
    UNION ALL
    SELECT CAST(2000 + c_custkey AS BIGINT),
           {_floor_e("(1.0 + (nc - 1) / 2.0) / ((SELECT n FROM total) - 1)", 8)}
    FROM customer JOIN nstat ON n_nationkey = c_nationkey
"""


# --------------------------------------------------------------------------
# CollapsePath: orders→customers + customers→nations ⇒ orders→nations
# --------------------------------------------------------------------------

def q_collapse_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    oc = orders.select(
        (100000 + F.col("o_orderkey")).cast("long").alias("src"),
        (2000 + F.col("o_custkey")).cast("long").alias("dst"),
    )
    cn = customer.select(
        (2000 + F.col("c_custkey")).cast("long").alias("src"),
        (10 + F.col("c_nationkey")).cast("long").alias("dst"),
    )
    return collapse_path([oc, cn]).select(
        F.col("src").alias("order_node"), F.col("dst").alias("nation_node")
    )


Q_COLLAPSE_SQL = """
    SELECT DISTINCT CAST(100000 + o_orderkey AS BIGINT) AS order_node,
           CAST(10 + c_nationkey AS BIGINT) AS nation_node
    FROM orders JOIN customer ON c_custkey = o_custkey
"""


# --------------------------------------------------------------------------
# Deterministic random walks over the supply tree (portable RNG, so the
# pick sequence replays exactly in SQL)
# --------------------------------------------------------------------------

_WALK_SEED = 9
_WALK_LEN = 3


def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _supply_tree_graph(spark, sf_dir, weighted=False)
    nation = _t(spark, sf_dir, "nation")
    starts = nation.select((10 + F.col("n_nationkey")).cast("long").alias("node_id"))
    return random_walks(
        g,
        walks_per_node=1,
        walk_length=_WALK_LEN,
        random_seed=_WALK_SEED,
        start_nodes=starts,
        rng="portable",
    ).select("walk_id", "start", "step", "node_id")


def _walk_pick_sql(step: int) -> str:
    h = (
        f"(('0x' || substr(md5('{_WALK_SEED}' || ':' || CAST(walk_id AS VARCHAR) || ':' || '{step}'), 1, 15))::BIGINT)"
    )
    return f"({h} % deg) + 1"


Q_WALKS_SQL = f"""
    WITH e AS MATERIALIZED (
        SELECT CAST(n_regionkey AS BIGINT) AS src, CAST(10 + n_nationkey AS BIGINT) AS dst FROM nation
        UNION ALL SELECT 10 + c_nationkey, 2000 + c_custkey FROM customer
        UNION ALL SELECT 10 + s_nationkey, 50 + s_suppkey FROM supplier
        UNION ALL SELECT 2000 + o_custkey, 100000 + o_orderkey FROM orders
    ),
    adj AS MATERIALIZED (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS r,
               COUNT(*) OVER (PARTITION BY src) AS deg
        FROM (SELECT DISTINCT src, dst FROM e) x
    ),
    s0 AS (SELECT CAST(10 + n_nationkey AS BIGINT) AS walk_id,
                  CAST(10 + n_nationkey AS BIGINT) AS start,
                  CAST(10 + n_nationkey AS BIGINT) AS node_id
           FROM nation),
    s1 AS (
        SELECT s0.walk_id, s0.start, adj.dst AS node_id
        FROM s0 JOIN adj ON adj.src = s0.node_id AND adj.r = {_walk_pick_sql(1)}
    ),
    s2 AS (
        SELECT s1.walk_id, s1.start, adj.dst AS node_id
        FROM s1 JOIN adj ON adj.src = s1.node_id AND adj.r = {_walk_pick_sql(2)}
    )
    SELECT walk_id, start, CAST(0 AS INT) AS step, node_id FROM s0
    UNION ALL SELECT walk_id, start, 1, node_id FROM s1
    UNION ALL SELECT walk_id, start, 2, node_id FROM s2
"""


# --------------------------------------------------------------------------
# KMeans over customer account balances (1-D, fixed seed centroids, fully
# unrolled Lloyd's in SQL)
# --------------------------------------------------------------------------

_KM_CENTS = [[0.0], [5000.0], [10000.0]]


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("node_id"),
        F.array(F.col("c_acctbal").cast("double")).alias("embedding"),
    )
    res = kmeans(
        cust, k=3, seed_centroids=_KM_CENTS, max_iterations=3, delta_threshold=0.0
    )
    return res.assignments.select(
        F.col("node_id").alias("c_custkey"),
        F.col("community").cast("int").alias("community"),
        _e(F.col("distance"), 2).alias("distance_c"),
    )


def _km_assign_sql(src: str, c0: str, c1: str, c2: str, out: str) -> str:
    """One Lloyd assignment round: community = argmin squared distance with
    ties to the lower index (strict < fold, same as the engine's)."""
    return f"""
    {out} AS MATERIALIZED (
        SELECT c_custkey, x,
               CASE WHEN d2 < (CASE WHEN d1 < d0 THEN d1 ELSE d0 END) THEN 2
                    WHEN d1 < d0 THEN 1 ELSE 0 END AS community
        FROM (SELECT c_custkey, x,
                     (x - ({c0})) * (x - ({c0})) AS d0,
                     (x - ({c1})) * (x - ({c1})) AS d1,
                     (x - ({c2})) * (x - ({c2})) AS d2
              FROM {src}) _d
    )"""


Q_KMEANS_SQL = f"""
    WITH pts AS MATERIALIZED (SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS x FROM customer),
    {_km_assign_sql("pts", "0.0", "5000.0", "10000.0", "a1")},
    m1 AS MATERIALIZED (
        SELECT COALESCE(AVG(CASE WHEN community = 0 THEN x END), 0.0) AS c0,
               COALESCE(AVG(CASE WHEN community = 1 THEN x END), 5000.0) AS c1,
               COALESCE(AVG(CASE WHEN community = 2 THEN x END), 10000.0) AS c2
        FROM a1
    ),
    {_km_assign_sql("pts, m1", "m1.c0", "m1.c1", "m1.c2", "a2")},
    m2 AS MATERIALIZED (
        SELECT COALESCE(AVG(CASE WHEN community = 0 THEN x END), (SELECT c0 FROM m1)) AS c0,
               COALESCE(AVG(CASE WHEN community = 1 THEN x END), (SELECT c1 FROM m1)) AS c1,
               COALESCE(AVG(CASE WHEN community = 2 THEN x END), (SELECT c2 FROM m1)) AS c2
        FROM a2
    ),
    {_km_assign_sql("pts, m2", "m2.c0", "m2.c1", "m2.c2", "a3")}
    SELECT a3.c_custkey, CAST(a3.community AS INT) AS community,
           {_floor_e("SQRT(CASE a3.community WHEN 0 THEN (a3.x - m2.c0) * (a3.x - m2.c0) WHEN 1 THEN (a3.x - m2.c1) * (a3.x - m2.c1) ELSE (a3.x - m2.c2) * (a3.x - m2.c2) END)", 2)} AS distance_c
    FROM a3, m2
"""


# --------------------------------------------------------------------------
# KNN + SLLPA: rows-only entries (approximate / JVM-hash-seeded)
# --------------------------------------------------------------------------

def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NN-descent run to convergence (delta_threshold=0: iterate until NO
    pair changes) on a 40-vector sub-corpus, where the neighbor-of-neighbor
    closure provably reaches the exact kNN fixed point — so the oracle is
    the brute-force top-k SQL, the same exact-on-small-fixture strategy the
    reference's own KnnTest uses. (On the full 500-vector corpus NN-descent
    plateaus at a local optimum — recall ~0.99 — which is the documented
    contract of the algorithm; the at-scale recall bound is asserted in
    tests/test_extras2.py.)"""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 40)
    res = knn(
        emb,
        k=5,
        id_col="vec_id",
        vec_col="embedding",
        max_iterations=20,
        min_iterations=20,
        delta_threshold=0.0,
        random_seed=3,
        explore=6,
    )
    return res.neighbors.select("node1", "node2", "rank", _e(F.col("similarity"), 4).alias("sim_e4"))


Q_KNN_SQL = """
    WITH sub AS (SELECT * FROM embeddings WHERE vec_id < 40),
    ae AS MATERIALIZED (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM sub, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
    nrm AS (SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM ae GROUP BY vec_id),
    dots AS (
        SELECT a.vec_id AS node1, b.vec_id AS node2, SUM(a.x * b.x) AS dot
        FROM ae a JOIN ae b ON a.i = b.i AND a.vec_id <> b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ),
    sims AS (
        SELECT node1, node2,
               CASE WHEN na.nrm > 0 AND nb.nrm > 0 THEN dot / (na.nrm * nb.nrm) ELSE 0.0 END AS sim
        FROM dots JOIN nrm na ON na.vec_id = node1 JOIN nrm nb ON nb.vec_id = node2
    ),
    ranked AS (
        SELECT node1, node2, sim,
               ROW_NUMBER() OVER (PARTITION BY node1 ORDER BY sim DESC, node2 ASC) AS rank
        FROM sims
    )
    SELECT node1, node2, CAST(rank AS INT) AS rank,
           CAST(FLOOR(sim * 1e4 + 0.3183098861837907) AS BIGINT) AS sim_e4
    FROM ranked WHERE rank <= 5
"""


def q_sllpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
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
        _t(spark, sf_dir, "nation").select((10 + F.col("n_nationkey")).cast("long").alias("node_id"))
        .union(customer.select((2000 + F.col("c_custkey")).cast("long")))
        .union(supplier.select((50 + F.col("s_suppkey")).cast("long")))
    )
    g = LinkGraph(edges=edges, vertices=vertices)
    res = speaker_listener_lpa(g, max_iterations=5, random_seed=7, rng="portable")
    return res.communities.select(
        "node_id", F.concat_ws(",", F.col("community_ids").cast("array<string>")).alias("communities")
    )




_SLLPA_SEED = 7


def _sllpa_pick_sql(step: int, size: int) -> str:
    """Replays the engine's portable draw: md5-derived 60-bit hash of
    (seed, src, dst, step), mod memory size, 1-based — bit-identical to
    sllpa.py's rng="portable" column expression."""
    h = (
        f"(('0x' || substr(md5('{_SLLPA_SEED}:' || CAST(e.src AS VARCHAR) || ':' "
        f"|| CAST(e.dst AS VARCHAR) || ':{step}'), 1, 15))::BIGINT)"
    )
    return f"(({h}) % {size}) + 1"


def _sllpa_step_sql(step: int, prev: str, out: str) -> str:
    """One speak+listen round: each edge draws a memory slot of the sender,
    the receiver appends the most frequent incoming label (ties to the
    smaller label), or its own id when nothing arrives."""
    size = step  # memory size entering step k is k
    slots = ", ".join(f"m{i}" for i in range(size))
    case = (
        f"m0" if size == 1
        else "CASE " + " ".join(
            f"WHEN pick = {i + 1} THEN m{i}" for i in range(size)
        ) + " END"
    )
    return f"""
    sent{step} AS (
        SELECT e.dst AS node, {case} AS lbl
        FROM e JOIN {prev} mm ON mm.node = e.src,
             LATERAL (SELECT {_sllpa_pick_sql(step, size)} AS pick) p
    ),
    win{step} AS (
        SELECT node, lbl FROM (
            SELECT node, lbl,
                   ROW_NUMBER() OVER (PARTITION BY node ORDER BY COUNT(*) DESC, lbl ASC) AS rk
            FROM sent{step} GROUP BY node, lbl
        ) x WHERE rk = 1
    ),
    {out} AS MATERIALIZED (
        SELECT mm.node, {slots}, COALESCE(w.lbl, mm.node) AS m{size}
        FROM {prev} mm LEFT JOIN win{step} w ON w.node = mm.node
    )"""


Q_SLLPA_SQL = f"""
    WITH e AS MATERIALIZED (
        SELECT CAST(2000 + c_custkey AS BIGINT) AS src, CAST(10 + c_nationkey AS BIGINT) AS dst FROM customer
        UNION ALL SELECT CAST(10 + c_nationkey AS BIGINT), CAST(2000 + c_custkey AS BIGINT) FROM customer
        UNION ALL SELECT CAST(50 + s_suppkey AS BIGINT), CAST(10 + s_nationkey AS BIGINT) FROM supplier
        UNION ALL SELECT CAST(10 + s_nationkey AS BIGINT), CAST(50 + s_suppkey AS BIGINT) FROM supplier
    ),
    nodes AS MATERIALIZED (
        SELECT CAST(10 + n_nationkey AS BIGINT) AS node FROM nation
        UNION ALL SELECT CAST(2000 + c_custkey AS BIGINT) FROM customer
        UNION ALL SELECT CAST(50 + s_suppkey AS BIGINT) FROM supplier
    ),
    mem1 AS MATERIALIZED (SELECT node, node AS m0 FROM nodes),
    {_sllpa_step_sql(1, "mem1", "mem2")},
    {_sllpa_step_sql(2, "mem2", "mem3")},
    {_sllpa_step_sql(3, "mem3", "mem4")},
    {_sllpa_step_sql(4, "mem4", "mem5")},
    ex AS (
        SELECT node, lbl FROM mem5, UNNEST([m0, m1, m2, m3, m4]) AS t(lbl)
    ),
    kept AS (
        SELECT node, lbl FROM (
            SELECT node, lbl, COUNT(*) AS cnt FROM ex GROUP BY node, lbl
        ) x WHERE cnt / 5.0 > 0.2
    )
    SELECT n.node AS node_id,
           COALESCE(string_agg(CAST(k.lbl AS VARCHAR), ',' ORDER BY k.lbl), '') AS communities
    FROM nodes n LEFT JOIN kept k ON k.node = n.node
    GROUP BY n.node
"""


QUERIES_EXT2 = {
    "closeness_customer_nation": q_closeness,
    "harmonic_customer_nation": q_harmonic,
    "collapse_orders_to_nations": q_collapse_path,
    "random_walks_supply_tree": q_random_walks,
    "kmeans_acctbal": q_kmeans,
    "knn_embeddings": q_knn,
    "sllpa_bipartite": q_sllpa,
}

ORACLES_EXT2 = {
    "closeness_customer_nation": Q_CLOSENESS_SQL,
    "harmonic_customer_nation": Q_HARMONIC_SQL,
    "collapse_orders_to_nations": Q_COLLAPSE_SQL,
    "random_walks_supply_tree": Q_WALKS_SQL,
    "kmeans_acctbal": Q_KMEANS_SQL,
    # knn_embeddings: run to convergence (delta 0), where NN-descent on
    # this corpus reaches the exact kNN fixed point — gated against the
    # brute-force top-k SQL.
    "knn_embeddings": Q_KNN_SQL,
    # sllpa_bipartite: portable md5 RNG — every random draw replays
    # bit-identically in the unrolled SQL above.
    "sllpa_bipartite": Q_SLLPA_SQL,
}
