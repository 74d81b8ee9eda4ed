"""ML splitting family (reference ``ml/ml-algo/.../splitting/`` +
``negativeSampling/RandomNegativeSampler.java``)."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.ml.splitting import (
    fraction_split,
    negative_sample,
    split_relationships,
    stratified_kfold_split,
)


def _graph(spark, pairs, n=None):
    e = spark.createDataFrame([(s, d, 1.0) for s, d in pairs], "src long, dst long, weight double")
    return LinkGraph(edges=e, node_count=n)


def test_split_directed_counts_and_partition(spark):
    # 10-edge path graph, holdout 0.3 → exactly 3 positives, 7 remaining
    g = _graph(spark, [(i, i + 1) for i in range(10)], n=11)
    res = split_relationships(g, holdout_fraction=0.3, negative_sampling_ratio=1.0, random_seed=1)
    sel = res.selected.collect()
    pos = [(r.src, r.dst) for r in sel if r.label == 1.0]
    neg = [(r.src, r.dst) for r in sel if r.label == 0.0]
    rem = [(r.src, r.dst) for r in res.remaining.collect()]
    assert len(pos) == 3 and res.selected_positive_count == 3
    assert len(rem) == 7
    # positives ∪ remaining == original edges, disjoint
    assert set(pos) | set(rem) == {(i, i + 1) for i in range(10)}
    assert not (set(pos) & set(rem))
    # negatives are non-edges, no self-loops
    edge_set = {(i, i + 1) for i in range(10)}
    for s, d in neg:
        assert s != d and (s, d) not in edge_set
    # best-effort: ≤ requested
    assert 0 < len(neg) <= 3


def test_split_undirected_canonical_once(spark):
    # symmetric edge list; each undirected pair sampled once
    pairs = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)]
    g = _graph(spark, pairs, n=5)
    res = split_relationships(
        g, holdout_fraction=0.5, negative_sampling_ratio=0.0, random_seed=2, undirected=True
    )
    pos = [(r.src, r.dst) for r in res.selected.filter(F.col("label") == 1.0).collect()]
    rem = [(r.src, r.dst) for r in res.remaining.collect()]
    # 4 canonical pairs → 2 selected (once each), remaining pairs both ways
    assert len(pos) == 2
    assert len(rem) == 4  # 2 pairs × 2 directions
    canon_pos = {tuple(sorted(p)) for p in pos}
    canon_rem = {tuple(sorted(p)) for p in rem}
    assert canon_pos | canon_rem == {(0, 1), (1, 2), (2, 3), (3, 4)}
    assert not (canon_pos & canon_rem)


def test_split_source_target_filters(spark):
    # bipartite-ish: only edges from {0,1} to {10,11} are valid candidates
    pairs = [(0, 10), (1, 11), (2, 10), (0, 20)]
    g = _graph(spark, pairs, n=21)
    srcs = spark.createDataFrame([(0,), (1,)], "node_id long")
    tgts = spark.createDataFrame([(10,), (11,)], "node_id long")
    res = split_relationships(
        g, holdout_fraction=1.0, negative_sampling_ratio=0.0, random_seed=3,
        source_nodes=srcs, target_nodes=tgts,
    )
    pos = {(r.src, r.dst) for r in res.selected.filter(F.col("label") == 1.0).collect()}
    assert pos == {(0, 10), (1, 11)}
    # invalid edges join NEITHER set (reference: "added to neither")
    assert res.remaining.count() == 0


def test_negative_sample_determinism_and_validity(spark):
    g = _graph(spark, [(i, (i + 1) % 6) for i in range(6)], n=6)
    a = sorted((r.src, r.dst) for r in negative_sample(g, 6, random_seed=9).collect())
    b = sorted((r.src, r.dst) for r in negative_sample(g, 9, random_seed=9).collect())
    c = sorted((r.src, r.dst) for r in negative_sample(g, 6, random_seed=9).collect())
    assert a == c  # deterministic in (count, seed)
    edge_set = {(i, (i + 1) % 6) for i in range(6)}
    for s, d in a + b:
        assert s != d and (s, d) not in edge_set


def test_fraction_split_prefix(spark):
    df = spark.createDataFrame([(i, 100 - i) for i in range(10)], "node_id long, h long")
    train, test = fraction_split(df, 0.7, order_col="h")
    # h descends with node_id, so smallest h (largest ids) lead the order
    assert train.count() == 7 and test.count() == 3
    assert {r.node_id for r in test.collect()} == {0, 1, 2}


def test_stratified_kfold_balanced_per_class(spark):
    # 3 classes × 10 items, k=5: each fold gets exactly 2 test items/class
    rows = [(c * 100 + i, c, i) for c in range(3) for i in range(10)]
    df = spark.createDataFrame(rows, "node_id long, target long, h long")
    out = stratified_kfold_split(df, k=5, target_col="target", order_col="h")
    counts = {
        (r.target, r.fold): r.cnt
        for r in out.groupBy("target", "fold").agg(F.count("*").alias("cnt")).collect()
    }
    assert all(counts[(c, f)] == 2 for c in range(3) for f in range(5))
    # the round-robin pointer carries across classes: class 0 ends at item
    # 9 → fold 4, so class 1 item 0 starts at fold 0 again only if 10 % 5
    # == 0 — with k=4 it would not. Verify the carry with k=4:
    out4 = stratified_kfold_split(df, k=4, target_col="target", order_col="h")
    first_c1 = out4.filter((F.col("target") == 1) & (F.col("h") == 0)).collect()[0]
    assert first_c1.fold == 10 % 4  # pointer continued from class 0's 10 items


def test_kfold_rejects_small_k(spark):
    df = spark.createDataFrame([(1, 0, 0)], "node_id long, target long, h long")
    with pytest.raises(ValueError):
        stratified_kfold_split(df, k=1, target_col="target", order_col="h")
