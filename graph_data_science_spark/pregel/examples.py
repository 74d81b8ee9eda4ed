"""The reference's pregel-example algorithms re-derived on the declarative
Pregel API — proof the user-programmable surface expresses real programs
(reference ``examples/pregel-example/src/main/java/org/neo4j/gds/beta/
pregel/{pr,cc,sssp}``). Each is a handful of column expressions; the
runtime (active sets, reduce shuffle, vote-to-halt, checkpoint/resume)
comes from :mod:`graph_data_science_spark.pregel.api`.

These are deliberately *independent* re-implementations of algorithms the
engine already ships natively (``algorithms/pagerank.py``, ``wcc.py``,
``paths.py``) — the tests cross-check the two paths against each other,
which gates both the API semantics and the native operators.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.pregel.api import (
    PregelComputation,
    PregelResult,
    run_pregel,
)


def pagerank_pregel(
    graph: LinkGraph,
    damping: float = 0.85,
    updates: int = 20,
    checkpoint_dir: str | None = None,
) -> PregelResult:
    """``examples/pregel-example/.../pr/PageRankPregel.java:41``: init
    1/N; message = rank/degree; newRank = (1-d)/N + d·Σmsg; never votes
    to halt (runs exactly ``updates`` rank updates — GDS's maxIterations
    counts the initial send-only superstep, so GDS k supersteps ≡
    ``updates = k - 1``)."""
    comp = PregelComputation(
        name="example_pr",
        schema={"pagerank": lambda ctx: F.lit(1.0) / F.lit(float(ctx["node_count"]))},
        # Null-gated on degree: dangling nodes send nothing (ANSI-safe —
        # Catalyst pushes this sender-side projection below the edge join,
        # where degree-0 nodes still appear).
        message=lambda s: F.when(
            s["degree"] > 0, s["pagerank"] / s["degree"].cast("double")
        ),
        reducer="sum",
        update=lambda s, msg: {
            "pagerank": F.lit(1.0 - damping) / F.lit(float(s["node_count"]))
            + F.lit(damping) * F.coalesce(msg, F.lit(0.0))
        },
    )
    return run_pregel(graph, comp, max_iterations=updates, checkpoint_dir=checkpoint_dir)


def connected_components_pregel(
    graph: LinkGraph,
    max_iterations: int = 100,
    checkpoint_dir: str | None = None,
) -> PregelResult:
    """``examples/pregel-example/.../cc/ConnectedComponentsPregel.java``:
    component = own id; broadcast it; adopt any smaller incoming label;
    vote to halt when nothing improved (messages wake halted nodes).
    Pass a symmetrized graph for undirected semantics, as GDS projects
    UNDIRECTED before running it."""
    comp = PregelComputation(
        name="example_cc",
        schema={
            "component": lambda ctx: ctx["node"].cast("long"),
            "changed": False,
        },
        message=lambda s: s["component"],
        reducer="min",
        update=lambda s, msg: {
            "component": F.least(s["component"], F.coalesce(msg, s["component"])),
            "changed": msg.isNotNull() & (msg < s["component"]),
        },
        vote_to_halt=lambda s, msg: ~s["changed"],
    )
    return run_pregel(graph, comp, max_iterations=max_iterations, checkpoint_dir=checkpoint_dir)


def sssp_pregel(
    graph: LinkGraph,
    source: int,
    max_iterations: int = 100,
    checkpoint_dir: str | None = None,
) -> PregelResult:
    """``examples/pregel-example/.../sssp/SingleSourceShortestPathPregel
    .java:41`` generalized to weighted edges via the
    ``applyRelationshipWeight`` hook (the example itself counts hops,
    i.e. weight ≡ 1): frontier nodes send distance (+ edge weight),
    reducer Min, improved nodes stay active, everyone else halts until
    woken. Unreached nodes end with null distance."""
    comp = PregelComputation(
        # source in the name ⇒ distinct checkpoint subdir + lineage per
        # source: a stale checkpoint from another source can't be adopted.
        name=f"example_sssp_src{int(source)}",
        schema={
            "distance": lambda ctx: F.when(
                ctx["node"] == F.lit(int(source)), F.lit(0.0)
            ),
            "changed": lambda ctx: ctx["node"] == F.lit(int(source)),
        },
        message=lambda s: F.when(s["changed"], s["distance"]),
        apply_relationship_weight=lambda m, w: m + w,
        reducer="min",
        update=lambda s, msg: {
            "distance": F.when(
                msg.isNotNull() & (s["distance"].isNull() | (msg < s["distance"])), msg
            ).otherwise(s["distance"]),
            "changed": msg.isNotNull() & (s["distance"].isNull() | (msg < s["distance"])),
        },
        vote_to_halt=lambda s, msg: ~s["changed"],
    )
    return run_pregel(graph, comp, max_iterations=max_iterations, checkpoint_dir=checkpoint_dir)
