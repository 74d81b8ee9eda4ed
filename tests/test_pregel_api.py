"""Declarative Pregel API: semantics (vote-to-halt, reducers, weight hook,
convergence), the reference pregel-example programs re-derived on it, and
checkpoint/resume through the shared SuperstepLoop."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.pregel.examples import (
    connected_components_pregel,
    pagerank_pregel,
    sssp_pregel,
)


def _graph(spark, edges, weights=None, n=None):
    if weights is None:
        weights = [1.0] * len(edges)
    rows = [(int(s), int(d), float(w)) for (s, d), w in zip(edges, weights)]
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    n = n or (max(max(s, d) for s, d in edges) + 1)
    v = spark.range(n).select(F.col("id").alias("node_id"))
    return LinkGraph(edges=e, vertices=v, node_count=n)


EDGES = [
    (0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3),
    (6, 0), (6, 3), (7, 6), (1, 7), (8, 9),  # 10 nodes, 9 isolated-ish
]


def test_pagerank_pregel_matches_numpy(spark):
    n, d, updates = 10, 0.85, 15
    res = pagerank_pregel(_graph(spark, EDGES), damping=d, updates=updates)
    got = {r["node_id"]: r["pagerank"] for r in res.state.collect()}

    outdeg = np.zeros(n)
    for s, _ in EDGES:
        outdeg[s] += 1
    M = np.zeros((n, n))
    for s, t in EDGES:
        M[t, s] = 1.0 / outdeg[s]
    x = np.full(n, 1.0 / n)
    for _ in range(updates):
        x = (1 - d) / n + d * (M @ x)
    for i in range(n):
        assert got[i] == pytest.approx(x[i], abs=1e-9), i
    assert res.ran_supersteps == updates  # never votes to halt


def test_cc_pregel_matches_wcc(spark):
    from graph_data_science_spark.algorithms.wcc import wcc

    g = _graph(spark, EDGES)
    sym = g.edges.union(
        g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    res = connected_components_pregel(
        LinkGraph(edges=sym, vertices=g.vertices, node_count=g.node_count)
    )
    assert res.converged
    got = {r["node_id"]: r["component"] for r in res.state.collect()}
    want = {
        r["node_id"]: r["component"] for r in wcc(g).components.collect()
    }
    assert got == want
    assert set(got.values()) == {0, 8}


def test_sssp_pregel_weighted_matches_native(spark):
    from graph_data_science_spark.algorithms.paths import shortest_paths

    weights = [float(1 + (s * 7 + t * 3) % 5) for s, t in EDGES]
    g = _graph(spark, EDGES, weights)
    res = sssp_pregel(g, source=0)
    assert res.converged
    got = {
        r["node_id"]: r["distance"]
        for r in res.state.filter(F.col("distance").isNotNull()).collect()
    }
    want = {
        r["node_id"]: float(r["distance"])
        for r in shortest_paths(g, source=0, weighted=True).distances.collect()
    }
    assert got == want
    assert 8 not in got and 9 not in got  # unreachable stay null


def test_sssp_pregel_hop_counting_like_reference_example(spark):
    # weight 1.0 everywhere reproduces the reference example's hop counts.
    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])
    got = {
        r["node_id"]: r["distance"] for r in sssp_pregel(g, source=0).state.collect()
    }
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 1.0}


def test_reducer_validation(spark):
    from graph_data_science_spark.pregel.api import PregelComputation, run_pregel

    comp = PregelComputation(
        name="bad",
        schema={"x": 0.0},
        message=lambda s: s["x"],
        update=lambda s, m: {"x": s["x"]},
        reducer="median",
    )
    with pytest.raises(ValueError, match="reducer"):
        run_pregel(_graph(spark, [(0, 1)]), comp)


def test_update_schema_validation(spark):
    from graph_data_science_spark.pregel.api import PregelComputation, run_pregel

    comp = PregelComputation(
        name="bad2",
        schema={"x": 0.0},
        message=lambda s: s["x"],
        update=lambda s, m: {"y": s["x"]},
    )
    with pytest.raises(ValueError, match="non-schema"):
        run_pregel(_graph(spark, [(0, 1)]), comp)


def test_master_compute_stops_early(spark):
    from graph_data_science_spark.pregel.api import PregelComputation, run_pregel

    seen = []

    def master(step, vals):
        seen.append((step, vals.get("total")))
        return step >= 3

    comp = PregelComputation(
        name="counter",
        schema={"x": 1.0},
        message=lambda s: s["x"],
        update=lambda s, m: {"x": s["x"] + F.coalesce(m, F.lit(0.0))},
        aggregates={"total": lambda s: F.sum(s["x"])},
        master_compute=master,
    )
    res = run_pregel(_graph(spark, [(0, 1), (1, 0)]), comp, max_iterations=10)
    assert res.ran_supersteps == 3
    assert len(seen) == 3 and all(t is not None for _, t in seen)


def test_pregel_checkpoint_resume(spark, tmp_path):
    weights = [float(1 + (s * 7 + t * 3) % 5) for s, t in EDGES]
    g = _graph(spark, EDGES, weights)
    ck = str(tmp_path / "pregel_ck")
    partial = sssp_pregel(g, source=0, max_iterations=2, checkpoint_dir=ck)
    assert not partial.converged
    resumed = sssp_pregel(g, source=0, max_iterations=50, checkpoint_dir=ck)
    assert resumed.converged
    fresh = sssp_pregel(g, source=0)
    got = {
        r["node_id"]: r["distance"]
        for r in resumed.state.filter(F.col("distance").isNotNull()).collect()
    }
    want = {
        r["node_id"]: r["distance"]
        for r in fresh.state.filter(F.col("distance").isNotNull()).collect()
    }
    assert got == want
    # resumed run continued from superstep 2 rather than restarting
    supersteps = {r["superstep"] for r in resumed.loop.metrics().collect()}
    assert 2 in supersteps and 0 in supersteps


def test_register_pregel_procedure(spark, tmp_path):
    """pregel-proc-generator analog: a user computation becomes a facade
    procedure and every mode works."""
    from graph_data_science_spark.api import Procedures
    from graph_data_science_spark.graph.catalog import GraphCatalog
    from graph_data_science_spark.pregel.api import PregelComputation

    g = _graph(spark, EDGES)
    sym = g.edges.union(
        g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    cat = GraphCatalog(spark, str(tmp_path / "cat"))
    cat.project("g", LinkGraph(edges=sym, vertices=g.vertices, node_count=g.node_count))
    procs = Procedures(cat)

    comp = PregelComputation(
        name="user_cc",
        schema={"component": lambda ctx: ctx["node"].cast("long"), "changed": False},
        message=lambda s: s["component"],
        reducer="min",
        update=lambda s, msg: {
            "component": F.least(s["component"], F.coalesce(msg, s["component"])),
            "changed": msg.isNotNull() & (msg < s["component"]),
        },
        vote_to_halt=lambda s, msg: ~s["changed"],
    )
    procs.register_pregel("user.pregel.cc", comp, score_column="component", max_iterations=50)

    df = procs.stream("user.pregel.cc", "g")
    comps = {r["node_id"]: r["score"] for r in df.collect()}
    assert set(comps.values()) == {0, 8}
    st = procs.stats("user.pregel.cc", "g")
    assert st["nodeCount"] == 10

    with pytest.raises(ValueError, match="collides"):
        procs.register_pregel("pageRank", comp)
    with pytest.raises(KeyError, match="unknown algorithm"):
        procs.stream("user.pregel.missing", "g")
