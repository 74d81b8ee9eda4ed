"""Catalog completions: SQL projection, node labels, graph properties,
relationship drop/write, and the operability procs (gds.list /
listProgress / userLog / memory.*)."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.api import Procedures
from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.graph.catalog import GraphCatalog


@pytest.fixture()
def procs(spark, tmp_path):
    cat = GraphCatalog(spark, str(tmp_path / "cat"))
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (3, 4, 2.0)],
        "src long, dst long, weight double",
    )
    vertices = spark.createDataFrame(
        [(i, float(i * 10)) for i in range(5)], "node_id long, val double"
    )
    cat.project("g", LinkGraph(edges=edges, vertices=vertices, node_count=5))
    return Procedures(cat)


def test_project_sql(procs, spark):
    spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "a long, b long"
    ).createOrReplaceTempView("raw_pairs")
    info = procs.catalog.project_sql(
        "sqlg",
        "SELECT DISTINCT a AS node_id FROM (SELECT a FROM raw_pairs UNION ALL SELECT b FROM raw_pairs)",
        "SELECT a AS src, b AS dst FROM raw_pairs",
    )
    assert info["relationshipCount"] == 3
    g = procs.catalog.get("sqlg")
    assert dict(g.edges.dtypes)["weight"] == "double"  # default weight added
    with pytest.raises(ValueError, match="src and dst"):
        procs.catalog.project_sql("bad", None, "SELECT a, b FROM raw_pairs")


def test_node_label_mutate_and_write(procs, tmp_path):
    info = procs.catalog.mutate_node_label("g", "Big", "val >= 20.0")
    assert info["nodeCount"] == 3  # nodes 2,3,4
    # idempotent: re-mutating the same label adds no duplicates
    info2 = procs.catalog.mutate_node_label("g", "Big", "val >= 20.0")
    assert info2["nodeCount"] == 3
    g = procs.catalog.get("g")
    labs = {
        r["node_id"]: list(r["labels"]) for r in g.vertices.collect()
    }
    assert labs[0] == [] and labs[2] == ["Big"]
    # second label stacks
    procs.catalog.mutate_node_label("g", "Even", "node_id % 2 = 0")
    g = procs.catalog.get("g")
    labs = {r["node_id"]: list(r["labels"]) for r in g.vertices.collect()}
    assert labs[2] == ["Big", "Even"] and labs[4] == ["Big", "Even"]
    out = str(tmp_path / "biglabel")
    w = procs.catalog.write_node_label("g", "Big", out)
    assert w["nodeCount"] == 3


def test_graph_properties_roundtrip(procs):
    procs.catalog.set_graph_property("g", "totalWeight", 5.0)
    procs.catalog.set_graph_property("g", "percentiles", [1.0, 2.0, 3.0])
    vals = [r["propertyValue"] for r in procs.catalog.stream_graph_property("g", "percentiles").collect()]
    assert vals == [1.0, 2.0, 3.0]
    assert [r["propertyValue"] for r in procs.catalog.stream_graph_property("g", "totalWeight").collect()] == [5.0]
    procs.catalog.drop_graph_property("g", "totalWeight")
    with pytest.raises(KeyError):
        procs.catalog.stream_graph_property("g", "totalWeight")
    # survives catalog reload (manifest-backed)
    assert procs.catalog._manifest("g")["graph_properties"] == {"percentiles": [1.0, 2.0, 3.0]}


def test_drop_and_write_relationships(procs, tmp_path):
    info = procs.catalog.drop_relationships("g", "weight > 1.5")
    assert info["deletedRelationships"] == 1
    assert procs.catalog.get("g").edges.count() == 3
    out = str(tmp_path / "rels")
    w = procs.catalog.write_relationships("g", out)
    assert w["relationshipsWritten"] == 3


def test_list_procedures_and_progress(procs):
    rows = procs.list_procedures()
    names = {r["name"] for r in rows}
    assert "gds.pageRank.stream" in names
    assert "gds.graph.project_sql" in names
    assert "gds.model.store" in names
    assert "gds.pipeline.create" in names
    assert all(r["description"] for r in rows if r["name"] == "gds.pageRank.stream")
    only_rank = procs.list_procedures(like="pagerank")
    assert {r["name"] for r in only_rank} == {
        f"gds.pageRank.{m}" for m in ("stream", "stats", "mutate", "write")
    } | {
        f"gds.pageRank.{m}.estimate" for m in ("stream", "stats", "mutate", "write")
    }

    procs.stream("degree", "g").collect()
    with pytest.raises(KeyError):
        procs.stream("degree", "missing-graph")  # catalog miss: not a task
    tasks = procs.list_progress()
    assert len(tasks) == 1
    assert tasks[0]["taskName"] == "degree :: g"
    assert tasks[0]["status"] == "finished" and tasks[0]["seconds"] >= 0


def test_task_failure_recorded_and_user_log(procs):
    import logging

    with pytest.raises(Exception):
        procs.stream("dijkstra", "g")  # missing required source/target config
    tasks = procs.list_progress()
    assert tasks[-1]["status"] == "failed"

    # a WARNING from an engine logger during a task lands in the user log
    logging.getLogger("graph_data_science_spark.test").warning("cap applied: %d", 7)
    log = procs.user_log()
    assert log and log[-1]["message"] == "cap applied: 7"
    assert log[-1]["level"] == "WARNING"


def test_memory_list_and_summary(procs):
    rows = procs.memory_list()
    assert len(rows) == 1 and rows[0]["graphName"] == "g"
    s = procs.memory_summary()
    assert s["graphCount"] == 1
    assert s["totalNodeCount"] == 5 and s["totalRelationshipCount"] == 4
    assert s["totalParquetBytes"] > 0
    assert s["modelCount"] == 0


def test_user_log_survives_dead_dispatchers(procs, spark, tmp_path):
    # Regression: with one self-detaching handler per dispatcher, dead
    # handlers removing themselves inside callHandlers' list iteration
    # skipped the next (live) handler — the triggering record was lost.
    import gc
    import logging

    for i in range(40):
        Procedures(GraphCatalog(spark, str(tmp_path / f"dead{i}")))
    gc.collect()
    logging.getLogger("graph_data_science_spark.purge").warning("after the purge")
    log = procs.user_log()
    assert log and log[-1]["message"] == "after the purge"
