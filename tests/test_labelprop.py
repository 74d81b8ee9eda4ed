"""Label Propagation fixture tests (FIXTURES.md F4, from the reference's
LabelPropagationTest.java)."""

from graph_data_science_spark.algorithms.labelprop import label_propagation
from graph_data_science_spark.graph.build import LinkGraph

F4_EDGES = [(0, 1), (0, 2), (4, 3), (1, 5), (3, 4), (5, 0), (0, 5), (1, 0), (5, 1), (2, 3)]
F4_SEEDS = [2, 3, 4, 3, 4, 2]  # nAlice..nMichael


def fixture_graph(spark, with_seeds=False):
    edges = spark.createDataFrame(
        [(s, d, 1.0) for s, d in F4_EDGES], "src long, dst long, weight double"
    )
    if with_seeds:
        vertices = spark.createDataFrame(
            [(i, F4_SEEDS[i]) for i in range(6)], "node_id long, seedId long"
        )
    else:
        vertices = spark.createDataFrame([(i,) for i in range(6)], "node_id long")
    return LinkGraph(edges=edges, vertices=vertices, node_count=6)


def labels_list(res, n):
    rows = {r["node_id"]: r["label"] for r in res.labels.collect()}
    return [rows[i] for i in range(n)]


def partition_of(labels):
    groups = {}
    for node, lbl in enumerate(labels):
        groups.setdefault(lbl, set()).add(node)
    return sorted(frozenset(g) for g in groups.values())


def test_lpa_seeded_exact_gds_parity(spark):
    # LabelPropagationTest.java:108-129: seeded, maxIterations=1 → [2,2,3,4,4,2]
    # under GDS's batch-order async updates.
    g = fixture_graph(spark, with_seeds=True)
    res = label_propagation(g, max_iterations=1, seed_col="seedId", mode="gds_sequential")
    assert labels_list(res, 6) == [2, 2, 3, 4, 4, 2]


def test_lpa_unseeded_converges_to_two_communities(spark):
    # LabelPropagationTest.java:172-187: converges (≥2 iterations) to the
    # partition {0,1,5} / {2,3,4}.
    g = fixture_graph(spark)
    res = label_propagation(g, max_iterations=10, mode="gds_sequential")
    assert res.ran_iterations >= 2
    assert partition_of(labels_list(res, 6)) == sorted([frozenset({0, 1, 5}), frozenset({2, 3, 4})])


def test_lpa_sync_distributed_partition(spark):
    # The distributed sync mode must reach the same converged partition.
    g = fixture_graph(spark)
    res = label_propagation(g, max_iterations=20, mode="sync")
    assert partition_of(labels_list(res, 6)) == sorted([frozenset({0, 1, 5}), frozenset({2, 3, 4})])


def test_lpa_sync_matches_sequential_on_disjoint_cliques(spark):
    # Two disjoint triangles: both modes converge to one label per clique.
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    e = spark.createDataFrame([(s, d, 1.0) for s, d in edges], "src long, dst long, weight double")
    e = e.union(e.selectExpr("dst as src", "src as dst", "weight"))
    g = LinkGraph(edges=e, node_count=6)
    for mode in ("sync", "gds_sequential"):
        res = label_propagation(g, max_iterations=10, mode=mode)
        labels = labels_list(res, 6)
        assert len({labels[0], labels[1], labels[2]}) == 1
        assert len({labels[3], labels[4], labels[5]}) == 1
        assert labels[0] != labels[3]


def test_gds_sequential_batched_equals_driver_kernel(spark):
    """The partition-serial batched pass (used above the driver kernel's
    100k cap) must be bit-equal to the driver kernel — same id-order
    async visibility, chunked. Forced here with a tiny batch_size so
    chunk boundaries fall mid-graph."""
    import random

    from graph_data_science_spark.algorithms.labelprop import (
        _label_propagation_sequential,
        _label_propagation_sequential_batched,
    )
    from graph_data_science_spark.graph.build import LinkGraph

    rng = random.Random(3)
    n = 60
    edges = [
        (u, v, 1.0 + (u + v) % 3)
        for u in range(n)
        for v in rng.sample(range(n), 4)
        if u != v
    ]
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    g = LinkGraph(edges=e, node_count=n)
    for iters in (1, 3):
        a = _label_propagation_sequential(g, iters, None, None)
        b = _label_propagation_sequential_batched(g, iters, None, None, batch_size=17)
        am = {r["node_id"]: r["label"] for r in a.labels.collect()}
        bm = {r["node_id"]: r["label"] for r in b.labels.collect()}
        assert am == bm, f"iters={iters}"
        assert a.ran_iterations == b.ran_iterations
        assert a.did_converge == b.did_converge
