"""CELF influence maximization (reference CELF.java:36): greedy argmax
sequence on closed-form cascade fixtures."""

from graph_data_science_spark.algorithms.celf import celf
from graph_data_science_spark.graph.build import LinkGraph


def _graph(spark, edges, n=None):
    df = spark.createDataFrame(
        [(int(s), int(d), 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    return LinkGraph(edges=df, node_count=n)


def test_disjoint_stars_p1(spark):
    # Stars: hub 0 -> 5 leaves, hub 100 -> 3 leaves, hub 200 -> 1 leaf.
    edges = (
        [(0, i) for i in range(1, 6)]
        + [(100, 100 + i) for i in range(1, 4)]
        + [(200, 201)]
    )
    res = celf(_graph(spark, edges), seed_set_size=3, propagation_probability=1.0,
               monte_carlo_simulations=4)
    assert res.seed_list == [0, 100, 200]
    rows = {r["node_id"]: r["spread"] for r in res.seeds.collect()}
    assert rows[0] == 6.0
    assert rows[100] == 10.0  # cumulative: 6 + 4
    assert rows[200] == 12.0


def test_no_propagation_picks_smallest_ids(spark):
    edges = [(0, 1), (2, 3), (4, 5)]
    res = celf(_graph(spark, edges), seed_set_size=2, propagation_probability=0.0,
               monte_carlo_simulations=2)
    # all gains equal 1 -> tie-break ascending node id
    assert res.seed_list == [0, 1]


def test_candidate_pool_cap(spark):
    edges = [(0, i) for i in range(1, 6)] + [(100, 101)]
    res = celf(
        _graph(spark, edges),
        seed_set_size=2,
        propagation_probability=1.0,
        monte_carlo_simulations=2,
        candidate_pool_size=1,  # only hub 0 selectable
    )
    assert res.seed_list == [0]


def test_deterministic_across_runs(spark):
    edges = [(i, (i * 7 + 3) % 20) for i in range(20)]
    g = _graph(spark, edges)
    r1 = celf(g, 3, monte_carlo_simulations=8, propagation_probability=0.4, seed=5)
    r2 = celf(g, 3, monte_carlo_simulations=8, propagation_probability=0.4, seed=5)
    assert r1.seed_list == r2.seed_list
    assert sorted(map(tuple, r1.seeds.collect())) == sorted(map(tuple, r2.seeds.collect()))
