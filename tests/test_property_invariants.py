"""Property-based (hypothesis) differential tests for pure-expression kernels.

The reference's test strategy (SURVEY.md §5) leans on randomized
invariant checks next to fixed fixtures (e.g. ``RandomGraphGenerator``
inputs asserted against closed-form invariants). These tests do the same
for the engine's column-expression kernels: hypothesis draws arbitrary
small inputs, a pure-Python model computes the expected answer, and the
Spark expression must match bit-for-bit (exact) or to float64 tolerance.

Each example ships as ONE DataFrame roundtrip (hypothesis draws a batch
of rows per example) so the suite stays fast on the session fixture.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.community_post import community_postprocess
from graph_data_science_spark.datapipe.packing import pack_sequences
from graph_data_science_spark.functions import (
    cosine,
    euclidean,
    euclidean_distance,
    jaccard,
    overlap,
    pearson,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

finite = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False, width=32
)


def _vec_pairs():
    def pair(n):
        v = st.lists(finite, min_size=n, max_size=n)
        return st.tuples(v, v)

    return st.lists(st.integers(1, 8).flatmap(pair), min_size=1, max_size=16)


@given(pairs=_vec_pairs())
@SETTINGS
def test_float_similarity_functions_match_numpy(spark, pairs):
    import numpy as np

    rows = [(i, [float(x) for x in a], [float(x) for x in b]) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "i int, a array<double>, b array<double>")
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            cosine(F.col("a"), F.col("b")).alias("cos"),
            pearson(F.col("a"), F.col("b")).alias("pea"),
            euclidean_distance(F.col("a"), F.col("b")).alias("eud"),
            euclidean(F.col("a"), F.col("b")).alias("eu"),
        ).collect()
    }
    for i, (a, b) in enumerate(pairs):
        va, vb = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
        denom = math.sqrt(float((va * va).sum()) * float((vb * vb).sum()))
        exp_cos = float("nan") if denom == 0.0 else float(va @ vb) / denom
        da, db = va - va.mean(), vb - vb.mean()
        pd_ = math.sqrt(float((da * da).sum()) * float((db * db).sum()))
        exp_pea = 0.0 if pd_ == 0.0 else float(da @ db) / pd_
        if math.isnan(exp_pea):  # pragma: no cover - nanvl guard parity
            exp_pea = 0.0
        exp_eud = math.sqrt(float(((va - vb) ** 2).sum()))
        r = got[i]
        for name, exp, val in (
            ("cos", exp_cos, r["cos"]),
            ("pea", exp_pea, r["pea"]),
            ("eud", exp_eud, r["eud"]),
            ("eu", 1.0 / (1.0 + exp_eud), r["eu"]),
        ):
            if math.isnan(exp):
                assert math.isnan(val), (name, i, val)
            else:
                assert val == pytest.approx(exp, rel=1e-9, abs=1e-9), (name, i, a, b)


small_int_vec = st.lists(st.integers(0, 6), min_size=0, max_size=8)


@given(pairs=st.lists(st.tuples(small_int_vec, small_int_vec), min_size=1, max_size=16))
@SETTINGS
def test_multiset_jaccard_and_overlap_match_model(spark, pairs):
    rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "i int, a array<int>, b array<int>")
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            jaccard(F.col("a"), F.col("b")).alias("j"),
            overlap(F.col("a"), F.col("b")).alias("o"),
        ).collect()
    }
    for i, (a, b) in enumerate(pairs):
        ca, cb = Counter(a), Counter(b)
        inter = sum(min(ca[k], cb[k]) for k in ca)
        union = len(a) + len(b) - inter
        exp_j = 1.0 if union == 0 else inter / union
        set_inter = len(set(a) & set(b))
        denom = min(len(a), len(b))
        exp_o = 0.0 if denom == 0 else set_inter / denom
        assert got[i]["j"] == pytest.approx(exp_j, abs=1e-12), (i, a, b)
        assert got[i]["o"] == pytest.approx(exp_o, abs=1e-12), (i, a, b)


@given(
    assign=st.lists(
        st.tuples(st.integers(0, 40), st.integers(-5, 5)), min_size=1, max_size=30
    ).map(lambda rows: {n: c for n, c in rows}),
    min_size=st.one_of(st.none(), st.integers(1, 4)),
    consecutive=st.booleans(),
)
@SETTINGS
def test_community_postprocess_matches_reference_model(spark, assign, min_size, consecutive):
    rows = [(n, c) for n, c in assign.items()]
    df = spark.createDataFrame(rows, "node_id long, community long")
    got = {
        r["node_id"]: r["community"]
        for r in community_postprocess(
            df, min_community_size=min_size, consecutive_ids=consecutive
        ).collect()
    }

    # Pure-Python CommunityCompanion model: size-filter first, then densify
    # in first-appearance (ascending node id) order over survivors.
    sizes = Counter(assign.values())
    kept = {
        n: c
        for n, c in assign.items()
        if min_size is None or min_size <= 1 or sizes[c] >= min_size
    }
    if consecutive:
        order = sorted({c: min(n for n in kept if kept[n] == c) for c in set(kept.values())}.items(), key=lambda kv: (kv[1], kv[0]))
        remap = {c: i for i, (c, _) in enumerate(order)}
        expected = {n: remap[c] for n, c in kept.items()}
    else:
        expected = kept
    assert got == expected, (assign, min_size, consecutive)


def _pack_hash(doc_id, seed="pack"):
    return int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:15], 16)


@given(
    docs=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 40)), min_size=1, max_size=40
    ).map(lambda rows: dict(rows)),
    budget=st.integers(4, 64),
    n_buckets=st.integers(1, 8),
)
@SETTINGS
def test_pack_sequences_matches_prefix_sum_model(spark, docs, budget, n_buckets):
    rows = [(d, int(nt)) for d, nt in docs.items()]
    df = spark.createDataFrame(rows, "doc_id long, nt long")
    out = pack_sequences(
        df, budget=budget, n_buckets=n_buckets, n_tokens=F.col("nt")
    ).collect()
    got = {r["doc_id"]: (r["bucket"], r["seq_id"], r["token_offset"], r["n_tokens"]) for r in out}
    assert set(got) == set(docs)  # every doc assigned exactly once

    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for d in docs:
        by_bucket.setdefault(_pack_hash(d) % n_buckets, []).append((_pack_hash(d), d))
    for bucket, members in by_bucket.items():
        prefix = 0
        for _, d in sorted(members):
            assert got[d] == (bucket, prefix // budget, prefix % budget, docs[d]), (
                d,
                budget,
                n_buckets,
            )
            prefix += docs[d]


# --------------------------------------------------------------------------
# ordered_rank / ordered_scan vs the naive single-partition window, over
# adversarial float keys: NULL, NaN, ±Infinity, heavy duplicates. The
# Python model replays Spark's total order (NULL < -Inf < finite < +Inf
# < NaN) and the bucketed implementation must agree rank-for-rank.
# --------------------------------------------------------------------------

_float_keys = st.lists(
    st.one_of(
        st.none(),
        st.sampled_from([float("nan"), float("inf"), float("-inf"), 0.0, 1.0]),
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=60,
)


def _spark_key(v):
    # Spark total order for double asc: NULL first, NaN greatest.
    if v is None:
        return (0, 0.0)
    if isinstance(v, float) and v != v:
        return (2, 0.0)
    return (1, v)


@SETTINGS
@given(keys=_float_keys)
def test_ordered_rank_matches_model_adversarial_floats(spark, keys):
    from graph_data_science_spark.graph.ranks import ordered_rank

    rows = [(i, v) for i, v in enumerate(keys)]
    df = spark.createDataFrame(rows, "i long, k double")
    got = {
        r["i"]: r["_r"]
        for r in ordered_rank(df, ["k", "i"], rank_col="_r", n_buckets=7).collect()
    }
    expect = {
        i: pos
        for pos, (i, _) in enumerate(
            sorted(rows, key=lambda t: (_spark_key(t[1]), t[0]))
        )
    }
    assert got == expect


@SETTINGS
@given(keys=_float_keys)
def test_ordered_scan_cumsum_matches_model_adversarial_floats(spark, keys):
    from graph_data_science_spark.graph.ranks import ordered_scan

    rows = [(i, v, 1) for i, v in enumerate(keys)]
    df = spark.createDataFrame(rows, "i long, k double, one int")
    got = {
        r["i"]: r["_c"]
        for r in ordered_scan(df, ["k", "i"], {"one": "_c"}, n_buckets=5).collect()
    }
    order = sorted(rows, key=lambda t: (_spark_key(t[1]), t[0]))
    expect = {t[0]: pos + 1 for pos, t in enumerate(order)}
    assert got == expect


# --------------------------------------------------------------------------
# SSSP differential: frontier Bellman-Ford and bucketed delta-stepping (at
# a small, a medium, and an effectively-infinite Δ) must both match a
# pure-Python Dijkstra on arbitrary random weighted digraphs — the same
# distances on the same reached set, unreachable nodes omitted.
# --------------------------------------------------------------------------

_edge_lists = st.lists(
    st.tuples(
        st.integers(0, 9),
        st.integers(0, 9),
        st.floats(min_value=0.1, max_value=10.0, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=25,
)


def _dijkstra_model(n, edges, source=0):
    import heapq

    adj = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, float("inf")) - 1e-15:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(raw=_edge_lists)
def test_sssp_paths_match_dijkstra_model(spark, raw):
    from graph_data_science_spark.algorithms.paths import delta_stepping, shortest_paths
    from graph_data_science_spark.graph.build import from_edge_list

    edges = [(a, b, round(w, 2)) for a, b, w in raw if a != b] or [(0, 1, 1.0)]
    n = 10
    expect = _dijkstra_model(n, edges)
    g = from_edge_list(spark, edges, node_count=n)

    def _got(res):
        return {r["node_id"]: r["distance"] for r in res.distances.collect()}

    for got in (
        _got(shortest_paths(g, source=0)),
        _got(delta_stepping(g, source=0, delta=0.5)),
        _got(delta_stepping(g, source=0, delta=4.0)),
        _got(delta_stepping(g, source=0, delta=1e9)),
    ):
        assert set(got) == set(expect)
        for node, d in expect.items():
            assert abs(got[node] - d) < 1e-9, (node, got[node], d)


# --------------------------------------------------------------------------
# WCC + triangle-count differential on arbitrary random digraphs: the
# engine's contracts (component = min member id over the symmetrized
# graph; per-node triangle counts over the canonical undirected simple
# graph) replayed by pure-Python models.
# --------------------------------------------------------------------------

_digraphs = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)), min_size=1, max_size=40
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(raw=_digraphs)
def test_wcc_all_paths_match_union_find_model(spark, raw):
    from graph_data_science_spark.algorithms import wcc, wcc_star
    from graph_data_science_spark.algorithms.wcc import wcc_sampled
    from graph_data_science_spark.graph.build import from_edge_list

    n = 12
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in raw:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {v: find(v) for v in range(n)}

    g = from_edge_list(spark, [(a, b, 1.0) for a, b in raw], node_count=n)
    for algo in (wcc, wcc_star, wcc_sampled):
        got = {r["node_id"]: r["component"] for r in algo(g).components.collect()}
        assert got == expect, (algo.__name__, got, expect)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(raw=_digraphs)
def test_triangle_count_matches_model(spark, raw):
    from graph_data_science_spark.algorithms.triangles import triangle_count
    from graph_data_science_spark.graph.build import from_edge_list

    n = 12
    und = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    nbrs = {v: set() for v in range(n)}
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    expect = {v: 0 for v in range(n)}
    tri_total = 0
    for a, b in und:
        for c in nbrs[a] & nbrs[b]:
            if c > b:  # each triangle once via its smallest pair... (a<b<c)
                if a < b < c:
                    expect[a] += 1
                    expect[b] += 1
                    expect[c] += 1
                    tri_total += 1

    g = from_edge_list(spark, [(a, b, 1.0) for a, b in raw], node_count=n)
    res = triangle_count(g)
    got = {r["node_id"]: r["triangles"] for r in res.per_node.collect()}
    assert res.global_count == tri_total, (res.global_count, tri_total)
    for v in range(n):
        assert got.get(v, 0) == expect[v], (v, got.get(v, 0), expect[v])
