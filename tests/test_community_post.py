"""Community post-processing (CommunityCompanion analog): minCommunitySize
filters whole communities first, consecutiveIds densifies in
first-appearance (ascending node id) order — reference
``CommunityCompanion.java:100-111``, ``ConsecutiveLongNodePropertyValues.java:46-59``."""

import pytest

from graph_data_science_spark.algorithms.community_post import community_postprocess
from graph_data_science_spark.api import Procedures
from graph_data_science_spark.graph.build import from_edge_list
from graph_data_science_spark.graph.catalog import GraphCatalog


def _frame(spark, rows):
    return spark.createDataFrame(rows, "node_id long, community long")


def test_consecutive_first_appearance_order(spark):
    # Raw ids deliberately NOT in min-node order: node 0's community (99)
    # must densify to 0, node 2's (10) to 1, node 4's (3) to 2 — the
    # reference assigns ++nextConsecutiveId on first sight scanning node
    # ids ascending, not by sorting the raw community ids.
    df = _frame(
        spark,
        [(0, 99), (1, 99), (2, 10), (3, 10), (4, 3), (5, 3)],
    )
    out = community_postprocess(df, consecutive_ids=True)
    got = {r["node_id"]: r["community"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2}


def test_min_size_drops_whole_communities(spark):
    df = _frame(spark, [(0, 7), (1, 7), (2, 7), (3, 8), (4, 9), (5, 9)])
    out = community_postprocess(df, min_community_size=2)
    got = {r["node_id"]: r["community"] for r in out.collect()}
    # community 8 (size 1) gone entirely; survivors keep raw ids
    assert got == {0: 7, 1: 7, 2: 7, 4: 9, 5: 9}


def test_filter_then_consecutive_composition(spark):
    # Reference order: size filter FIRST, then densify the survivors.
    # Community 5 (size 1, would have been consecutive id 0) is filtered,
    # so 20 -> 0 and 6 -> 1.
    df = _frame(spark, [(0, 5), (1, 20), (2, 20), (3, 6), (4, 6)])
    out = community_postprocess(df, min_community_size=2, consecutive_ids=True)
    got = {r["node_id"]: r["community"] for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1}


def test_noop_options_preserve_frame(spark):
    df = _frame(spark, [(0, 4), (1, 4), (2, 2)])
    out = community_postprocess(df)
    assert sorted(out.collect()) == sorted(df.collect())
    # min size 1 keeps everything (every community has >= 1 member)
    out1 = community_postprocess(df, min_community_size=1)
    assert out1.count() == 3


@pytest.fixture()
def procs(spark, tmp_path):
    cat = GraphCatalog(spark, str(tmp_path / "cat"))
    # two components: {0,1,2} and {3,4}; node 5 isolated (own component)
    g = from_edge_list(spark, [(0, 1), (1, 2), (3, 4)], node_count=6)
    cat.project("g", g)
    return Procedures(cat)


def test_facade_wcc_post_options(procs):
    df = procs.stream("wcc", "g", min_community_size=2, consecutive_ids=True)
    got = {r["node_id"]: r["score"] for r in df.collect()}
    # isolated node 5 filtered; components densify by min node id
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}


def test_facade_rejects_post_options_for_non_community(procs):
    with pytest.raises(TypeError):
        procs.stream("pageRank", "g", consecutive_ids=True)
