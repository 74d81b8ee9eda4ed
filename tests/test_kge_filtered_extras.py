"""Tests for the round-3 batch-8 operators: KGE predict, filtered KNN,
silhouette, kmeans++ init, weighted all-pairs shortest paths."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.kge import kge_predict
from graph_data_science_spark.algorithms.kmeans import (
    kmeans,
    kmeanspp_centroids,
    silhouette,
)
from graph_data_science_spark.algorithms.knn import filtered_knn
from graph_data_science_spark.algorithms.paths import all_shortest_paths
from graph_data_science_spark.graph.build import LinkGraph

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb30(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") < 30)
        .persist()
    )


def _np_corpus(emb):
    pdf = emb.orderBy("vec_id").toPandas()
    V = np.stack(pdf["embedding"].values).astype(float)
    ids = np.array(pdf["vec_id"].values)
    return V, ids


def test_kge_transe_matches_brute_force(spark, emb30):
    rel = [0.01 * (j + 1) for j in range(64)]
    res = kge_predict(
        emb30, rel, "transe", top_k=3, id_col="vec_id", vec_col="embedding",
        source_filter=F.col("vec_id") < 5,
    )
    got = {(r.source, r.rank): (r.target, round(r.score, 9)) for r in res.predictions.collect()}
    V, ids = _np_corpus(emb30)
    relv = np.array(rel)
    for s in range(5):
        d = np.sqrt(((V[s] + relv - V) ** 2).sum(1))
        d[s] = np.inf
        order = np.lexsort((ids, d))[:3]
        for rk, t in enumerate(order, 1):
            tgt, score = got[(s, rk)]
            assert tgt == ids[t]
            assert math.isclose(score, d[t], rel_tol=1e-9)


def test_kge_distmult_higher_is_better(spark, emb30):
    rel = [0.01 * (j + 1) for j in range(64)]
    res = kge_predict(
        emb30, rel, "distmult", top_k=3, id_col="vec_id", vec_col="embedding",
        source_filter=F.col("vec_id") < 5,
    )
    rows = res.predictions.collect()
    V, ids = _np_corpus(emb30)
    relv = np.array(rel)
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for s, rs in by_src.items():
        rs.sort(key=lambda r: r.rank)
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)  # higher is better
        exact = (V[s] * relv * V).sum(1)
        exact[s] = -np.inf
        best = ids[np.argmax(exact)]
        assert rs[0].target == best


def test_kge_excludes_existing_edges_and_self(spark, emb30):
    rel = [0.0] * 64  # TransE with r=0: nearest neighbour by plain L2
    V, ids = _np_corpus(emb30)
    d = np.sqrt(((V[0] - V) ** 2).sum(1))
    d[0] = np.inf
    nearest = int(ids[np.argmin(d)])
    edges = emb30.sparkSession.createDataFrame([(0, nearest)], "src long, dst long")
    res = kge_predict(
        emb30, rel, "transe", top_k=1, id_col="vec_id", vec_col="embedding",
        source_filter=F.col("vec_id") == 0, existing_edges=edges,
    )
    got = res.predictions.collect()
    assert len(got) == 1
    assert got[0].target != nearest  # the existing edge is not a candidate
    assert got[0].target != 0  # no self-link


def test_filtered_knn_seeded_optimal_exact(spark, emb30):
    res = filtered_knn(
        emb30, k=5, id_col="vec_id", vec_col="embedding",
        source_filter=F.col("vec_id") < 4,
        target_filter=F.col("vec_id") >= 25,
        seeding=True,
    )
    assert res.seeded_optimally
    got = sorted((r.node1, r.node2, r.rank) for r in res.neighbors.collect())
    V, ids = _np_corpus(emb30)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    exp = []
    for s in range(4):
        cand = sorted(((-S[s, t], t) for t in range(25, 30)))
        for rk, (_, t) in enumerate(cand, 1):
            exp.append((s, t, rk))
    assert got == sorted(exp)


def test_filtered_knn_source_filter_descent_exact(spark, emb30):
    res = filtered_knn(
        emb30, k=3, id_col="vec_id", vec_col="embedding",
        source_filter=F.col("vec_id") < 6,
        max_iterations=12, min_iterations=12, delta_threshold=0.0,
        random_seed=3, explore=5,
    )
    assert not res.seeded_optimally
    got = sorted((r.node1, r.node2, r.rank) for r in res.neighbors.collect())
    assert {g[0] for g in got} == set(range(6))  # sources only
    V, ids = _np_corpus(emb30)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    exp = []
    for s in range(6):
        cand = sorted(((-S[s, t], t) for t in range(30) if t != s))[:3]
        for rk, (_, t) in enumerate(cand, 1):
            exp.append((s, t, rk))
    assert got == sorted(exp)


def test_silhouette_matches_numpy(spark):
    cust = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .select(
            F.col("c_custkey").cast("long").alias("node_id"),
            F.array(F.col("c_acctbal").cast("double")).alias("embedding"),
        )
    )
    km = kmeans(cust, k=3, seed_centroids=[[0.0], [5000.0], [10000.0]],
                max_iterations=3, delta_threshold=0.0)
    withc = cust.join(km.assignments.select("node_id", "community"), "node_id")
    sil = silhouette(withc)
    pdf = withc.orderBy("node_id").toPandas()
    X = np.stack(pdf["embedding"].values).astype(float)
    C = np.array(pdf["community"].values)
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    exp = []
    for i in range(len(X)):
        own = C == C[i]
        a = D[i][own].sum() / (own.sum() - 1)
        b = min(D[i][C == j].mean() for j in set(C) if j != C[i])
        exp.append((b - a) / max(a, b))
    assert math.isclose(sil.average_silhouette, float(np.mean(exp)), rel_tol=1e-9)


def test_silhouette_guard_refuses_large(spark):
    df = spark.range(10).select(
        F.col("id").alias("node_id"),
        F.array(F.col("id").cast("double")).alias("embedding"),
        (F.col("id") % 2).cast("int").alias("community"),
    )
    with pytest.raises(ValueError, match="exact O"):
        silhouette(df, exact_node_limit=5)


def test_kmeanspp_farthest_first(spark):
    # 1-d points 0, 1, 10, 11, 100: from first centroid [0.0], farthest-first
    # picks 100 then 11 (ties impossible here).
    df = spark.createDataFrame(
        [(i, [float(x)]) for i, x in enumerate([0, 1, 10, 11, 100])],
        "node_id long, vec array<double>",
    )
    cents = kmeanspp_centroids(df, 3, first_centroid=[0.0])
    assert cents == [[0.0], [100.0], [11.0]]


def test_kmeans_kmeanspp_init_runs(spark):
    df = spark.createDataFrame(
        [(i, [float(i % 7)]) for i in range(20)], "node_id long, vec array<double>"
    )
    res = kmeans(df, k=3, id_col="node_id", vec_col="vec", init="kmeans++",
                 max_iterations=5, delta_threshold=0.0)
    assert res.assignments.count() == 20
    assert len(res.centroids) == 3


def test_all_shortest_paths_forest(spark):
    edges = spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 3.0), (3, 4, 1.0)], "src long, dst long, weight double"
    )
    g = LinkGraph(edges=edges, node_count=5)
    res = all_shortest_paths(g, sources=[0, 1, 3])
    got = sorted((r.source_node, r.target_node, r.distance) for r in res.distances.collect())
    assert got == sorted(
        [(0, 0, 0.0), (0, 1, 2.0), (0, 2, 5.0), (1, 1, 0.0), (1, 2, 3.0), (3, 3, 0.0), (3, 4, 1.0)]
    )
    assert res.did_converge


def test_all_shortest_paths_unweighted_all_sources(spark):
    # path graph 0-1-2 directed; all sources (no guard trip at this size)
    edges = spark.createDataFrame([(0, 1, 9.0), (1, 2, 9.0)], "src long, dst long, weight double")
    g = LinkGraph(edges=edges, node_count=3)
    res = all_shortest_paths(g, weighted=False)
    got = sorted((r.source_node, r.target_node, r.distance) for r in res.distances.collect())
    assert got == sorted(
        [(0, 0, 0.0), (0, 1, 1.0), (0, 2, 2.0), (1, 1, 0.0), (1, 2, 1.0), (2, 2, 0.0)]
    )


def test_kge_large_source_skips_broadcast(spark):
    """r4 safe-default: source side above broadcast_row_limit must not be
    broadcast (no BroadcastExchange feeding the pair join) and the predict
    must still complete with correct top-k semantics."""
    from pyspark.sql import functions as F

    from graph_data_science_spark.algorithms.kge import kge_predict

    emb = spark.range(300).select(
        F.col("id").alias("node_id"),
        F.array(
            (F.col("id") % 7).cast("double"),
            (F.col("id") % 5).cast("double"),
            (F.col("id") % 3).cast("double"),
        ).alias("embedding"),
    )
    # Disable planner auto-broadcast so the assertion isolates OUR hint:
    # with the guard active and no forced hint, the plan must contain no
    # BroadcastExchange at all (Catalyst is free to re-add one from size
    # stats in normal operation — that is its call, not a forced OOM).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        res = kge_predict(
            emb, [0.1, 0.2, 0.3], score_function="transe", top_k=3,
            broadcast_row_limit=10,  # force the large-source path
        )
        plan = res.predictions._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan.split("== Initial Plan ==")[0], plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    rows = res.predictions.groupBy("source").count().agg(F.max("count")).collect()[0][0]
    assert rows == 3
    # forced broadcast still works and matches
    res_b = kge_predict(
        emb, [0.1, 0.2, 0.3], score_function="transe", top_k=3, broadcast_sources=True
    )
    assert res.predictions.exceptAll(res_b.predictions).count() == 0
