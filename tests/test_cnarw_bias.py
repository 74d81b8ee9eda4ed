"""cnarw_edge_bias: the CNARW acceptance table, verified on closed-form
graphs (reference ``CommonNeighbourAwareNextNodeStrategy.java:51-81`` —
overlap = |N(u)∩N(v)| / min(deg u, deg v), acceptance = 1 − overlap)."""

from graph_data_science_spark.graph.build import from_edge_list
from graph_data_science_spark.graph.subgraph import cnarw_edge_bias, cnarw_sample


def _bias_map(df):
    return {(r["u"], r["v"]): r for r in df.collect()}


def test_triangle_plus_pendant(spark):
    # Triangle 0-1-2 plus pendant 2-3.
    g = from_edge_list(spark, [(0, 1), (1, 2), (0, 2), (2, 3)], node_count=4)
    m = _bias_map(cnarw_edge_bias(g))
    # Both directions of every symmetrized edge are present.
    assert len(m) == 8
    # Triangle edge (0,1): N(0)={1,2}, N(1)={0,2} → cn={2}, min deg 2.
    r = m[(0, 1)]
    assert (r["cn"], r["du"], r["dv"]) == (1, 2, 2)
    assert abs(r["ov"] - 0.5) < 1e-12 and abs(r["bias"] - 0.5) < 1e-12
    # Pendant edge (2,3): N(3)={2} shares nothing with N(2) (2 ∉ N(2)).
    r = m[(2, 3)]
    assert r["cn"] == 0 and r["bias"] == 1.0
    # Symmetry: overlap is symmetric in (u, v).
    assert m[(1, 0)]["ov"] == m[(0, 1)]["ov"]


def test_clique_bias_matches_closed_form(spark):
    # K4: every adjacent pair shares the other 2 vertices; deg = 3
    # everywhere → overlap 2/3, bias 1/3.
    edges = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    g = from_edge_list(spark, edges, node_count=4)
    rows = cnarw_edge_bias(g).collect()
    assert len(rows) == 12
    for r in rows:
        assert r["cn"] == 2 and r["du"] == 3 and r["dv"] == 3
        assert abs(r["bias"] - (1.0 - 2.0 / 3.0)) < 1e-12


def test_sample_consumes_refactored_bias(spark):
    # Smoke: the sampler still runs through the factored-out bias frame.
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], node_count=4)
    starts = spark.createDataFrame([(0,)], "node_id long")
    s = cnarw_sample(g, starts, sample_fraction=1.0, random_seed=3, max_rounds=30)
    nodes = sorted(r["node_id"] for r in s.vertices.collect())
    assert nodes == [0, 1, 2, 3]
