"""Round-3 additions: Dijkstra path reconstruction (reference
``DijkstraTest.java`` Graph1 fixture), the all-sources scale guards, the
free_checkpointed storage contract, and the round-trip file lifecycle."""

import logging
import os

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.betweenness import betweenness
from graph_data_science_spark.algorithms.centrality_extra import (
    guard_all_sources,
    msbfs_distances,
)
from graph_data_science_spark.algorithms.paths import dijkstra
from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.pregel import superstep as ss


def _wiki_graph(spark):
    """DijkstraTest.java Graph1: the Wikipedia shortest-path example.
    a=0 b=1 c=2 d=3 e=4 f=5."""
    edges = spark.createDataFrame(
        [
            (0, 1, 4.0),
            (0, 2, 2.0),
            (1, 2, 5.0),
            (1, 3, 10.0),
            (2, 4, 3.0),
            (3, 5, 11.0),
            (4, 3, 4.0),
        ],
        "src long, dst long, weight double",
    )
    nodes = spark.createDataFrame([(i,) for i in range(6)], "node_id long")
    return LinkGraph(edges=edges, vertices=nodes, node_count=6)


def test_dijkstra_source_target_wiki(spark):
    """a→f: path a,c,e,d,f with cumulative costs 0,2,5,9,20
    (DijkstraTest.java sourceTarget)."""
    res = dijkstra(_wiki_graph(spark), source=0, targets=[5])
    rows = res.paths.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["source_node"] == 0 and r["target_node"] == 5
    assert r["total_cost"] == 20.0
    assert list(r["node_ids"]) == [0, 2, 4, 3, 5]
    assert list(r["costs"]) == [0.0, 2.0, 5.0, 9.0, 20.0]


def test_dijkstra_single_source_wiki(spark):
    """All targets from a (DijkstraTest.java singleSource): every reachable
    node gets its unique shortest path; b's direct edge (4) beats nothing
    else; d goes through c,e (9 < 14 via b)."""
    res = dijkstra(_wiki_graph(spark), source=0)
    by_target = {r["target_node"]: r for r in res.paths.collect()}
    assert set(by_target) == {0, 1, 2, 3, 4, 5}
    assert list(by_target[0]["node_ids"]) == [0]
    assert by_target[1]["total_cost"] == 4.0
    assert list(by_target[1]["node_ids"]) == [0, 1]
    assert by_target[3]["total_cost"] == 9.0
    assert list(by_target[3]["node_ids"]) == [0, 2, 4, 3]
    assert by_target[5]["total_cost"] == 20.0
    # index is dense 0..n-1 ordered by (total_cost, target)
    assert sorted(r["index"] for r in by_target.values()) == list(range(6))


def test_dijkstra_unreachable_source(spark):
    """f→a: no path (DijkstraTest.java nonExisting) — f itself is the only
    row in single-source mode, and an explicit unreachable target yields
    nothing."""
    res = dijkstra(_wiki_graph(spark), source=5, targets=[0])
    assert res.paths.count() == 0


# ---------------------------------------------------------------------------
# all-sources guards
# ---------------------------------------------------------------------------


def _star_graph(spark, n=30):
    edges = spark.createDataFrame(
        [(0, i, 1.0) for i in range(1, n)], "src long, dst long, weight double"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node_id long")
    return LinkGraph(edges=edges, vertices=nodes, node_count=n)


def test_guard_all_sources_trips_and_logs(spark, caplog):
    g = _star_graph(spark)
    with caplog.at_level(logging.WARNING):
        sources, sampled = guard_all_sources(
            g, None, "testalgo", exact_source_limit=10, auto_sample_size=4
        )
    assert sampled is True
    assert sources.count() == 4
    assert any("auto-sampling 4 sources" in r.message for r in caplog.records)


def test_guard_all_sources_below_limit_no_sample(spark):
    g = _star_graph(spark)
    sources, sampled = guard_all_sources(g, None, "testalgo", exact_source_limit=1000)
    assert sources is None and sampled is False


def test_msbfs_auto_sample_restricts_sources(spark):
    g = _star_graph(spark)
    d = msbfs_distances(g, exact_source_limit=10, auto_sample_size=4)
    n_sources = d.select("source").distinct().count()
    assert n_sources <= 4


def test_betweenness_guard_trips(spark, caplog):
    g = _star_graph(spark)
    with caplog.at_level(logging.WARNING):
        out = betweenness(g, exact_source_limit=10, auto_sample_size=4)
    assert out.count() == 30  # all nodes scored (unsampled get 0)
    assert any("auto-sampling" in r.message for r in caplog.records)


# ---------------------------------------------------------------------------
# free_checkpointed: the RDD-level unpersist must actually clear storage
# ---------------------------------------------------------------------------


def test_free_checkpointed_clears_storage(spark):
    df = spark.range(1000).select(F.col("id"), (F.col("id") * 2).alias("y"))
    ck = df.localCheckpoint(eager=True)
    rdd = ck._jdf.queryExecution().analyzed().rdd()
    assert rdd.getStorageLevel().useMemory() or rdd.getStorageLevel().useDisk()
    ss.free_checkpointed(ck)
    lvl = rdd.getStorageLevel()
    assert not lvl.useMemory() and not lvl.useDisk()


# ---------------------------------------------------------------------------
# round-trip file lifecycle: keep_last + mark/release + atexit registration
# ---------------------------------------------------------------------------


def test_roundtrip_keep_last_reclaims_old_files(spark):
    df = spark.range(10)
    a = ss.materialize_roundtrip(df, tag="t_keep", keep_last=2)
    b = ss.materialize_roundtrip(df, tag="t_keep", keep_last=2)
    c = ss.materialize_roundtrip(df, tag="t_keep", keep_last=2)
    assert not os.path.isdir(a._roundtrip_path)
    assert os.path.isdir(b._roundtrip_path)
    assert os.path.isdir(c._roundtrip_path)
    assert c.count() == 10  # newest is readable


def test_roundtrip_mark_release_keeps_final(spark):
    df = spark.range(5)
    mark = ss.roundtrip_mark()
    x = ss.materialize_roundtrip(df, tag="t_rel")
    y = ss.materialize_roundtrip(df, tag="t_rel")
    final = ss.materialize_roundtrip(df, tag="t_rel_out")
    ss.roundtrip_release(mark, keep=[final])
    assert not os.path.isdir(x._roundtrip_path)
    assert not os.path.isdir(y._roundtrip_path)
    assert os.path.isdir(final._roundtrip_path)
    assert final.count() == 5
