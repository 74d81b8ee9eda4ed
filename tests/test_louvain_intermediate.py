"""includeIntermediateCommunities: the per-level dendrogram of Louvain and
Leiden (reference ``Louvain.java:111-125``, ``LouvainBaseConfig`` /
``LeidenBaseConfig`` ``includeIntermediateCommunities``): element i of the
array is the node's community after level i; length == ranLevels; the last
element is the final community."""

from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.louvain import leiden, louvain
from graph_data_science_spark.graph.build import from_edge_list

# two 4-cliques bridged by one weak edge — one local-move level resolves the
# cliques, the fixpoint check then runs (at least) one more no-op level, so
# the dendrogram has >= 2 entries.
CLIQUES = [
    *[(a, b, 10.0) for a in range(4) for b in range(4) if a < b],
    *[(a, b, 10.0) for a in range(4, 8) for b in range(4, 8) if a < b],
    (3, 4, 0.1),
]


def _graph(spark):
    return from_edge_list(spark, CLIQUES, node_count=8)


def _check_dendrogram(res):
    assert res.intermediate is not None
    rows = {
        r["node_id"]: r["intermediate_communities"]
        for r in res.intermediate.collect()
    }
    finals = {r["node_id"]: r["community"] for r in res.communities.collect()}
    assert set(rows) == set(range(8))
    for nid, arr in rows.items():
        assert len(arr) == res.ran_levels
        assert arr[-1] == finals[nid]
    # level 0 already groups each clique together, and apart
    lvl0 = {nid: arr[0] for nid, arr in rows.items()}
    assert len({lvl0[n] for n in range(4)}) == 1
    assert len({lvl0[n] for n in range(4, 8)}) == 1
    assert lvl0[0] != lvl0[7]


def test_louvain_intermediate(spark):
    res = louvain(_graph(spark), include_intermediate=True)
    assert res.ran_levels >= 2
    _check_dendrogram(res)


def test_leiden_intermediate(spark):
    res = leiden(_graph(spark), include_intermediate=True)
    _check_dendrogram(res)


def test_louvain_default_has_no_intermediate(spark):
    res = louvain(_graph(spark))
    assert res.intermediate is None


def test_facade_intermediate_column(spark, tmp_path):
    from graph_data_science_spark.api import Procedures
    from graph_data_science_spark.graph.catalog import GraphCatalog

    cat = GraphCatalog(spark, str(tmp_path / "cat"))
    cat.project("g", _graph(spark))
    df = Procedures(cat).stream("louvain", "g", include_intermediate=True)
    assert "intermediate_communities" in df.columns
    row = df.filter(F.col("node_id") == 0).collect()[0]
    assert row["intermediate_communities"][-1] == row["score"]
