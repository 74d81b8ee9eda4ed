"""gds.similarity.* function family + KNN metric family + walk visit counts.

Hand-computed expectations mirror the reference semantics
(``proc/common/.../functions/SimilaritiesFunc.java``,
``algo/.../similarity/knn/metrics/*.java``,
``algo/.../traversal/RandomWalkCountingNodeVisits.java``).
"""

import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark import functions as GF
from graph_data_science_spark.algorithms.knn import knn
from graph_data_science_spark.algorithms.walks import random_walk_visit_counts
from graph_data_science_spark.graph.build import LinkGraph


def _one(spark, v1, v2, expr_fn, typ="array<double>"):
    df = spark.createDataFrame([(v1, v2)], f"v1 {typ}, v2 {typ}")
    return df.select(expr_fn(F.col("v1"), F.col("v2")).alias("x")).collect()[0]["x"]


def test_jaccard_multiset_duplicates(spark):
    # SimilaritiesFunc.jaccard: duplicates count — min-count intersection.
    # [1,2,2,3] vs [2,2,4]: inter = 2 (two 2s), union = 4+3-2 = 5.
    assert _one(spark, [1.0, 2.0, 2.0, 3.0], [2.0, 2.0, 4.0], GF.jaccard) == pytest.approx(0.4)
    # empty ∪ empty → 1 (reference: union == 0 ? 1 : ...)
    assert _one(spark, [], [], GF.jaccard) == 1.0
    # null vector → 0
    assert _one(spark, None, [1.0], GF.jaccard) == 0.0
    # null elements dropped before counting
    assert _one(spark, [1.0, None, 2.0], [1.0, 2.0], GF.jaccard) == pytest.approx(1.0)


def test_overlap_distinct_over_min_size(spark):
    # [1,2,2] vs [2,3]: distinct inter {2} = 1; denom = min(3, 2) = 2.
    assert _one(spark, [1.0, 2.0, 2.0], [2.0, 3.0], GF.overlap) == pytest.approx(0.5)
    assert _one(spark, [], [1.0], GF.overlap) == 0.0


def test_cosine_raw_and_nan(spark):
    assert _one(spark, [1.0, 0.0], [0.0, 1.0], GF.cosine) == pytest.approx(0.0)
    assert _one(spark, [1.0, 2.0], [2.0, 4.0], GF.cosine) == pytest.approx(1.0)
    # zero norm → NaN, as Intersections.cosine (no guard)
    assert math.isnan(_one(spark, [0.0, 0.0], [1.0, 1.0], GF.cosine))


def test_length_validation_raises(spark):
    df = spark.createDataFrame([([1.0], [1.0, 2.0])], "v1 array<double>, v2 array<double>")
    with pytest.raises(Exception, match="non-empty and of the same size"):
        df.select(GF.cosine(F.col("v1"), F.col("v2"))).collect()


def test_pearson_and_euclidean(spark):
    # pearson of perfectly anti-correlated = -1; constant vector → NaN → 0
    assert _one(spark, [1.0, 2.0, 3.0], [3.0, 2.0, 1.0], GF.pearson) == pytest.approx(-1.0)
    assert _one(spark, [2.0, 2.0], [1.0, 3.0], GF.pearson) == 0.0
    assert _one(spark, [0.0, 0.0], [3.0, 4.0], GF.euclidean_distance) == pytest.approx(5.0)
    assert _one(spark, [0.0, 0.0], [3.0, 4.0], GF.euclidean) == pytest.approx(1.0 / 6.0)


def test_knn_metric_normalization_and_truncation(spark):
    # gds cosine = (raw+1)/2; orthogonal → 0.5
    f = lambda a, b: GF.knn_similarity(a, b, "cosine")
    assert _one(spark, [1.0, 0.0], [0.0, 1.0], f) == pytest.approx(0.5)
    # min-length truncation (Cosine.java: Math.min(left.length, right.length))
    assert _one(spark, [1.0, 0.0, 9.0], [1.0, 0.0], f) == pytest.approx(1.0)
    # euclidean 1/(1+dist); pearson (r+1)/2
    g = lambda a, b: GF.knn_similarity(a, b, "euclidean")
    assert _one(spark, [0.0, 0.0], [3.0, 4.0], g) == pytest.approx(1.0 / 6.0)
    h = lambda a, b: GF.knn_similarity(a, b, "pearson")
    assert _one(spark, [1.0, 2.0, 3.0], [3.0, 2.0, 1.0], h) == pytest.approx(0.0)
    # scalar absdiff
    df = spark.createDataFrame([(3.0, 7.0)], "a double, b double")
    v = df.select(GF.knn_similarity(F.col("a"), F.col("b"), "absdiff").alias("x")).collect()[0]["x"]
    assert v == pytest.approx(0.2)
    # long-array jaccard/overlap (distinct-set forms)
    j = lambda a, b: GF.knn_similarity(a, b, "jaccard")
    assert _one(spark, [1, 2, 3], [2, 3, 4], j, typ="array<long>") == pytest.approx(0.5)


def test_combined_similarity_mean(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0], 3.0, 7.0)],
        "va array<double>, vb array<double>, sa double, sb double",
    )
    expr = GF.combined_similarity(
        [(F.col("va"), F.col("vb"), "cosine"), (F.col("sa"), F.col("sb"), "absdiff")]
    )
    v = df.select(expr.alias("x")).collect()[0]["x"]
    assert v == pytest.approx((1.0 + 0.2) / 2)


def test_knn_euclidean_matches_bruteforce(spark):
    # 8 points on a line: euclidean top-2 neighbors are the adjacent ids.
    pts = [(i, [float(i * i)]) for i in range(8)]
    df = spark.createDataFrame(pts, "node_id long, embedding array<double>")
    res = knn(
        df, k=2, metric="euclidean", max_iterations=10, min_iterations=6,
        delta_threshold=0.0, explore=3, random_seed=1,
    )
    rows = {(r.node1, r.rank): r.node2 for r in res.neighbors.collect()}
    # node 0 (at 0): nearest is 1 (at 1), then 2 (at 4)
    assert rows[(0, 1)] == 1 and rows[(0, 2)] == 2
    # node 7 (at 49): nearest is 6 (at 36), then 5 (at 25)
    assert rows[(7, 1)] == 6 and rows[(7, 2)] == 5


def test_random_walk_visit_counts(spark):
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (3, 0, 1.0)],
        "src long, dst long, weight double",
    )
    g = LinkGraph(edges=edges, node_count=5)
    counts = random_walk_visit_counts(g, walks_per_node=2, walk_length=4, random_seed=7)
    rows = {r.node_id: r.visits for r in counts.collect()}
    # every node appears; isolated node 4 is visited only as its own walks'
    # start (step 0 counts, as the reference tallies the start node too)
    assert set(rows) == {0, 1, 2, 3, 4}
    assert rows[4] == 2
    # total visits == total walk rows: 8 walks from nodes 0-3 run the full
    # 4 steps (cycle), node 4's 2 walks dead-end after the start visit
    assert sum(rows.values()) == 2 * 4 * 4 + 2 * 1


def test_util_functions(spark):
    from graph_data_science_spark import functions as gfn
    from graph_data_science_spark.graph.build import LinkGraph

    df = spark.createDataFrame(
        [(0, 1.0), (1, float("nan")), (2, float("inf")), (3, float("-inf"))],
        "node_id long, v double",
    )
    rows = {
        r["node_id"]: (r["f"], r["i"])
        for r in df.select(
            "node_id",
            gfn.is_finite(F.col("v")).alias("f"),
            gfn.is_infinite(F.col("v")).alias("i"),
        ).collect()
    }
    assert rows == {0: (True, False), 1: (False, False), 2: (False, True), 3: (False, True)}
    c = df.select(gfn.nan().alias("n"), gfn.infinity().alias("inf")).first()
    assert math.isnan(c["n"]) and math.isinf(c["inf"])

    verts = spark.createDataFrame(
        [(0, "a"), (1, "b")], "node_id long, name string"
    )
    res = spark.createDataFrame([(0, 0.5)], "node_id long, score double")
    joined = gfn.as_nodes(res, verts).collect()
    assert joined[0]["name"] == "a" and joined[0]["score"] == 0.5

    g = LinkGraph(
        edges=spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double"),
        vertices=verts,
        node_count=2,
    )
    assert gfn.node_property(g, 1, "name") == "b"
    with pytest.raises(KeyError):
        gfn.node_property(g, 9, "name")
    with pytest.raises(KeyError):
        gfn.node_property(g, 0, "missing")
    assert isinstance(gfn.version(), str) and gfn.version()
