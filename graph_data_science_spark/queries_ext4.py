"""Round-3 driver-contract queries: SCC on nation customer cycles
(closed-form condensation), K-1 coloring invariant gate, sampled
betweenness (explicit source set — the scale-guard path), all
oracle-checked. Merged into ``queries.QUERIES`` / ``queries.ORACLES``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.betweenness import betweenness
from graph_data_science_spark.algorithms.coloring import k1coloring
from graph_data_science_spark.algorithms.scc import scc
from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.queries import _t
from graph_data_science_spark.queries_ext import _supply_tree_graph

# --------------------------------------------------------------------------
# SCC: per-nation customer cycles + a DAG of cross-cycle edges. Every
# nation's customers form one directed cycle (sorted by key, last → first),
# so each nation IS one SCC; the nation-to-nation forward edges make the
# condensation non-trivial without merging components. The engine's
# component id convention is the MAX member node id — closed-form:
# 2000 + max(c_custkey) per nation (reference semantics: Scc.java:36
# assigns one component per maximal strongly connected set; the id
# convention is ours, documented in scc.py).
# --------------------------------------------------------------------------


_SCC_CYCLE_LEN = 8


def _nation_cycle_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    """Customers form directed cycles of ≤ _SCC_CYCLE_LEN members within
    each nation (grouped by key order), plus a DAG of group-to-group
    forward edges. Cycle length bounds the engine's color-propagation and
    capture rounds (both O(cycle length)), keeping the gate fast while the
    number of SCCs scales with the data."""
    customer = _t(spark, sf_dir, "customer")
    nodes = customer.select((2000 + F.col("c_custkey")).cast("long").alias("node_id"))
    wn = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    grouped = customer.select(
        "c_nationkey",
        "c_custkey",
        ((F.row_number().over(wn) - 1) / F.lit(_SCC_CYCLE_LEN)).cast("long").alias("grp"),
    )
    wg = Window.partitionBy("c_nationkey", "grp").orderBy("c_custkey")
    ring = grouped.select(
        "c_nationkey",
        "grp",
        (2000 + F.col("c_custkey")).cast("long").alias("src"),
        F.lead(F.col("c_custkey")).over(wg).alias("_next"),
        F.min(F.col("c_custkey")).over(Window.partitionBy("c_nationkey", "grp")).alias("_first"),
    ).select(
        "c_nationkey",
        "grp",
        "src",
        (2000 + F.coalesce(F.col("_next"), F.col("_first"))).cast("long").alias("dst"),
    )
    # Cross-group DAG edges: the minimum customer of each group points at
    # the minimum of the NEXT group in the same nation (strictly forward —
    # acyclic between groups, so no SCCs merge).
    firsts = grouped.groupBy("c_nationkey", "grp").agg(F.min("c_custkey").alias("mk"))
    nxt = firsts.select(
        "c_nationkey", (F.col("grp") + 1).alias("grp"), F.col("mk").alias("mk_next")
    )
    cross = firsts.join(nxt, ["c_nationkey", "grp"]).select(
        (2000 + F.col("mk")).cast("long").alias("src"),
        (2000 + F.col("mk_next")).cast("long").alias("dst"),
    )
    edges = ring.select("src", "dst").union(cross).withColumn("weight", F.lit(1.0))
    return LinkGraph(edges=edges, vertices=nodes)


def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _nation_cycle_graph(spark, sf_dir)
    return scc(g).components.select("node_id", "component")


Q_SCC_SQL = f"""
    WITH grouped AS (
        SELECT c_custkey, c_nationkey,
               CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) - 1)
                    / {_SCC_CYCLE_LEN}) AS BIGINT) AS grp
        FROM customer
    )
    SELECT CAST(2000 + c_custkey AS BIGINT) AS node_id,
           CAST(2000 + MAX(c_custkey) OVER (PARTITION BY c_nationkey, grp) AS BIGINT) AS component
    FROM grouped
"""


# --------------------------------------------------------------------------
# K-1 coloring on the nation cliques + customer pendants: the coloring is
# engine-arbitrary (any proper coloring is a valid answer — same contract
# as the reference, K1Coloring.java:65), so the gate is the INVARIANT the
# reference guarantees: zero monochromatic edges and colors used
# ≤ maxDegree + 1, checked per node so the oracle row count scales with
# the data.
# --------------------------------------------------------------------------


def q_k1coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Nation cliques + customer pendants: cliques bound the chromatic need,
    # pendants scale the node count with the data. (The dense co-part graph
    # needs O(clique size ~80) conflict-resolution rounds — correct but a
    # poor fit for a per-round-driver gate; this graph converges in ~10.)
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    from graph_data_science_spark.queries_ext import _nation_clique_edges

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
    res = k1coloring(g, max_iterations=100)
    colors = res.colors
    edges = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    a = colors.select(F.col("node_id").alias("src"), F.col("color").alias("ca"))
    b = colors.select(F.col("node_id").alias("dst"), F.col("color").alias("cb"))
    mono = (
        edges.join(a, "src").join(b, "dst")
        .filter(F.col("ca") == F.col("cb"))
        .count()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    max_deg = deg.agg(F.max("deg").alias("m")).collect()[0]["m"] or 0
    n_colors = colors.select("color").distinct().count()
    return colors.select(
        "node_id",
        F.lit(int(mono)).alias("monochromatic_edges"),
        F.lit(bool(n_colors <= max_deg + 1)).cast("int").alias("colors_within_bound"),
    )


Q_K1C_SQL = """
    SELECT CAST(10 + n_nationkey AS BIGINT) AS node_id,
           CAST(0 AS BIGINT) AS monochromatic_edges,
           CAST(1 AS INT) AS colors_within_bound
    FROM nation
    UNION ALL
    SELECT CAST(2000 + c_custkey AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS INT)
    FROM customer
"""


# --------------------------------------------------------------------------
# Sampled betweenness: the guard path — an EXPLICIT source set (the nation
# nodes) on the closed-form supply tree. With nation sources only, the
# only positive dependencies are the customers (each lies on the unique
# path nation → customer → its orders), so bc(customer) = #orders, all
# other nodes 0 — exact closed form for the approximation path the engine
# auto-switches to above exact_source_limit nodes.
# --------------------------------------------------------------------------


def q_betweenness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _supply_tree_graph(spark, sf_dir, weighted=False)
    nation = _t(spark, sf_dir, "nation")
    sources = nation.select((10 + F.col("n_nationkey")).cast("long").alias("node_id"))
    return betweenness(g, sources=sources).select(
        "node_id", F.col("score").cast("long").alias("score")
    )


Q_BETWEENNESS_SAMPLED_SQL = """
    WITH ord_per_cust AS (SELECT o_custkey, COUNT(*) AS n_ord FROM orders GROUP BY o_custkey)
    SELECT CAST(r_regionkey AS BIGINT) AS node_id, CAST(0 AS BIGINT) AS score FROM region
    UNION ALL
    SELECT CAST(10 + n_nationkey AS BIGINT), 0 FROM nation
    UNION ALL
    SELECT CAST(50 + s_suppkey AS BIGINT), 0 FROM supplier
    UNION ALL
    SELECT CAST(2000 + c_custkey AS BIGINT), CAST(COALESCE(n_ord, 0) AS BIGINT)
    FROM customer LEFT JOIN ord_per_cust ON o_custkey = c_custkey
    UNION ALL
    SELECT CAST(100000 + o_orderkey AS BIGINT), 0 FROM orders
"""


# --------------------------------------------------------------------------
# Dijkstra with path reconstruction on the weighted supply tree from region
# 0: every reachable node has a UNIQUE path (tree), so nodeIds and the
# cumulative costs arrays have closed forms. Costs are integral by
# construction (weights are small integers), so arrays compare exactly as
# bigints.
# --------------------------------------------------------------------------


def q_dijkstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.algorithms.paths import dijkstra

    g = _supply_tree_graph(spark, sf_dir, weighted=True)
    res = dijkstra(g, source=0, weighted=True)
    return res.paths.select(
        "index",
        "source_node",
        "target_node",
        F.col("total_cost").cast("long").alias("total_cost"),
        "node_ids",
        F.transform(F.col("costs"), lambda c: c.cast("long")).alias("costs"),
    )


Q_DIJKSTRA_SQL = """
    WITH p AS (
        SELECT CAST(0 AS BIGINT) AS target_node, CAST(0 AS BIGINT) AS total_cost,
               [CAST(0 AS BIGINT)] AS node_ids, [CAST(0 AS BIGINT)] AS costs
        UNION ALL
        SELECT CAST(10 + n_nationkey AS BIGINT), CAST(1 + n_nationkey % 3 AS BIGINT),
               [CAST(0 AS BIGINT), CAST(10 + n_nationkey AS BIGINT)],
               [CAST(0 AS BIGINT), CAST(1 + n_nationkey % 3 AS BIGINT)]
        FROM nation WHERE n_regionkey = 0
        UNION ALL
        SELECT CAST(50 + s_suppkey AS BIGINT),
               CAST((1 + n_nationkey % 3) + (1 + s_suppkey % 5) AS BIGINT),
               [CAST(0 AS BIGINT), CAST(10 + n_nationkey AS BIGINT), CAST(50 + s_suppkey AS BIGINT)],
               [CAST(0 AS BIGINT), CAST(1 + n_nationkey % 3 AS BIGINT),
                CAST((1 + n_nationkey % 3) + (1 + s_suppkey % 5) AS BIGINT)]
        FROM supplier JOIN nation ON n_nationkey = s_nationkey WHERE n_regionkey = 0
        UNION ALL
        SELECT CAST(2000 + c_custkey AS BIGINT),
               CAST((1 + n_nationkey % 3) + (1 + c_custkey % 7) AS BIGINT),
               [CAST(0 AS BIGINT), CAST(10 + n_nationkey AS BIGINT), CAST(2000 + c_custkey AS BIGINT)],
               [CAST(0 AS BIGINT), CAST(1 + n_nationkey % 3 AS BIGINT),
                CAST((1 + n_nationkey % 3) + (1 + c_custkey % 7) AS BIGINT)]
        FROM customer JOIN nation ON n_nationkey = c_nationkey WHERE n_regionkey = 0
        UNION ALL
        SELECT CAST(100000 + o_orderkey AS BIGINT),
               CAST((1 + n_nationkey % 3) + (1 + c_custkey % 7) + (1 + o_orderkey % 11) AS BIGINT),
               [CAST(0 AS BIGINT), CAST(10 + n_nationkey AS BIGINT), CAST(2000 + c_custkey AS BIGINT),
                CAST(100000 + o_orderkey AS BIGINT)],
               [CAST(0 AS BIGINT), CAST(1 + n_nationkey % 3 AS BIGINT),
                CAST((1 + n_nationkey % 3) + (1 + c_custkey % 7) AS BIGINT),
                CAST((1 + n_nationkey % 3) + (1 + c_custkey % 7) + (1 + o_orderkey % 11) AS BIGINT)]
        FROM orders JOIN customer ON c_custkey = o_custkey JOIN nation ON n_nationkey = c_nationkey
        WHERE n_regionkey = 0
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY total_cost ASC, target_node ASC) - 1 AS BIGINT) AS index,
           CAST(0 AS BIGINT) AS source_node, target_node, total_cost, node_ids, costs
    FROM p
"""


# --------------------------------------------------------------------------
# Node2Vec on the nation cliques: embeddings are float-SGD outputs (no SQL
# replay), so the gate is the geometric INVARIANT the algorithm exists to
# produce — every node's mean cosine to its own clique strictly exceeds its
# mean cosine to the rest (the same property Node2VecTest.java asserts:
# close nodes embed closer). One row per node keeps the oracle data-scaled.
# --------------------------------------------------------------------------


def q_node2vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.algorithms.node2vec import node2vec
    from graph_data_science_spark.queries_ext import _nation_clique_edges

    nation = _t(spark, sf_dir, "nation")
    half = _nation_clique_edges(spark, sf_dir)
    # walks follow edge direction — symmetrize so every clique member can
    # start and continue a walk (the reference projects UNDIRECTED too).
    edges = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    vertices = nation.select((10 + F.col("n_nationkey")).cast("long").alias("node_id"))
    g = LinkGraph(edges=edges, vertices=vertices)
    res = node2vec(
        g,
        embedding_dim=8,
        walk_length=8,
        walks_per_node=8,
        iterations=25,
        learning_rate=0.4,
        random_seed=11,
    )
    emb = res.embeddings
    comm = nation.select(
        (10 + F.col("n_nationkey")).cast("long").alias("node_id"),
        F.col("n_regionkey").alias("comm"),
    )
    e1 = emb.join(comm, "node_id").select(
        F.col("node_id").alias("a"), F.col("embedding").alias("va"), F.col("comm").alias("ca")
    )
    e2 = emb.join(comm, "node_id").select(
        F.col("node_id").alias("b"), F.col("embedding").alias("vb"), F.col("comm").alias("cb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )
    sims = (
        e1.join(e2, F.col("a") != F.col("b"))
        .select(
            "a",
            (F.col("ca") == F.col("cb")).alias("same"),
            (dot / (norm(F.col("va")) * norm(F.col("vb")))).alias("sim"),
        )
        .groupBy("a")
        .agg(
            F.avg(F.when(F.col("same"), F.col("sim"))).alias("intra"),
            F.avg(F.when(~F.col("same"), F.col("sim"))).alias("inter"),
        )
    )
    return sims.select(
        F.col("a").alias("node_id"),
        (F.col("intra") > F.col("inter")).cast("int").alias("intra_closer"),
    )


Q_NODE2VEC_SQL = """
    SELECT CAST(10 + n_nationkey AS BIGINT) AS node_id, CAST(1 AS INT) AS intra_closer
    FROM nation
"""


# --------------------------------------------------------------------------
# HashGNN on the symmetrized nation cliques, portable md5 hashing: every
# min-hash draw replays bit-identically in SQL, so the oracle is a full
# unrolled replay of both iterations × both draws — the strongest gate an
# inherently-randomized embedding admits.
# --------------------------------------------------------------------------

_HGNN_SEED = 13
_HGNN_ITERS = 2
_HGNN_DENSITY = 2


def q_hashgnn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.algorithms.hashgnn import hashgnn
    from graph_data_science_spark.queries_ext import _nation_clique_edges

    nation = _t(spark, sf_dir, "nation")
    half = _nation_clique_edges(spark, sf_dir)
    edges = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    vertices = nation.select((10 + F.col("n_nationkey")).cast("long").alias("node_id"))
    g = LinkGraph(edges=edges, vertices=vertices)
    res = hashgnn(
        g,
        iterations=_HGNN_ITERS,
        embedding_density=_HGNN_DENSITY,
        random_seed=_HGNN_SEED,
        rng="portable",
    )
    return res.embeddings.select("node_id", "features")


def _hgnn_hash_sql(role: str, it: int, k: int, feat: str) -> str:
    return (
        f"(('0x' || substr(md5('{_HGNN_SEED}:{role}:{it}:{k}:' || "
        f"CAST({feat} AS VARCHAR)), 1, 15))::BIGINT)"
    )


def _hgnn_argmin_sql(src: str, role: str, it: int, k: int, out: str, hc: str, fc: str) -> str:
    return f"""
    {out} AS (
        SELECT node, h AS {hc}, feat AS {fc} FROM (
            SELECT node, feat, h,
                   ROW_NUMBER() OVER (PARTITION BY node ORDER BY h ASC, feat ASC) AS rk
            FROM (SELECT node, feat, {_hgnn_hash_sql(role, it, k, "feat")} AS h FROM {src}) x
        ) y WHERE rk = 1
    )"""


def _hgnn_iteration_sql(it: int, prev: str, out: str) -> str:
    blocks, wins = [], []
    for k in range(_HGNN_DENSITY):
        blocks.append(_hgnn_argmin_sql(prev, "self", it, k, f"self{it}_{k}", "sh", "sf"))
        blocks.append(_hgnn_argmin_sql(prev, "pre", it, k, f"pre{it}_{k}", "ph", "pf"))
        blocks.append(f"""
    nv{it}_{k} AS (
        SELECT DISTINCT e.src AS node, p.pf AS feat
        FROM e JOIN pre{it}_{k} p ON p.node = e.dst
    )""")
        blocks.append(_hgnn_argmin_sql(f"nv{it}_{k}", "nbr", it, k, f"nbr{it}_{k}", "nh", "nf"))
        blocks.append(f"""
    win{it}_{k} AS (
        SELECT COALESCE(s.node, nb.node) AS node,
               CASE WHEN nb.nh IS NOT NULL AND (s.sh IS NULL OR nb.nh < s.sh)
                    THEN nb.nf ELSE s.sf END AS feat
        FROM self{it}_{k} s FULL OUTER JOIN nbr{it}_{k} nb ON nb.node = s.node
    )""")
        wins.append(f"SELECT node, feat FROM win{it}_{k}")
    blocks.append(f"""
    {out} AS MATERIALIZED (SELECT DISTINCT node, feat FROM ({" UNION ALL ".join(wins)}) u)""")
    return ",".join(blocks)


def _hgnn_oracle_sql() -> str:
    iters = ",".join(
        _hgnn_iteration_sql(it, f"prev{it}", f"prev{it + 1}")
        for it in range(1, _HGNN_ITERS + 1)
    )
    return f"""
    WITH e AS MATERIALIZED (
        SELECT CAST(10 + a.n_nationkey AS BIGINT) AS src, CAST(10 + b.n_nationkey AS BIGINT) AS dst
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey
    ),
    prev1 AS MATERIALIZED (SELECT CAST(10 + n_nationkey AS BIGINT) AS node, CAST(10 + n_nationkey AS BIGINT) AS feat FROM nation),
    {iters}
    SELECT node AS node_id, list_sort(list(feat)) AS features
    FROM prev{_HGNN_ITERS + 1}
    GROUP BY node
"""


Q_HASHGNN_SQL = _hgnn_oracle_sql()


QUERIES_EXT4 = {
    "dijkstra_supply_tree": q_dijkstra,
    "node2vec_nation_cliques": q_node2vec,
    "hashgnn_nation_cliques": q_hashgnn,
    "scc_nation_cycles": q_scc,
    "k1coloring_cliques": q_k1coloring,
    "betweenness_sampled_tree": q_betweenness_sampled,
}

ORACLES_EXT4 = {
    "dijkstra_supply_tree": Q_DIJKSTRA_SQL,
    "node2vec_nation_cliques": Q_NODE2VEC_SQL,
    "hashgnn_nation_cliques": Q_HASHGNN_SQL,
    "scc_nation_cycles": Q_SCC_SQL,
    "k1coloring_cliques": Q_K1C_SQL,
    "betweenness_sampled_tree": Q_BETWEENNESS_SAMPLED_SQL,
}
