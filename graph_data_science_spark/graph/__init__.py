from graph_data_science_spark.graph.build import (
    LinkGraph,
    aggregate_parallel_edges,
    degrees,
    from_edge_list,
    reverse_edges,
    to_undirected,
)
from graph_data_science_spark.graph.ids import dense_ids

__all__ = [
    "LinkGraph",
    "aggregate_parallel_edges",
    "degrees",
    "dense_ids",
    "from_edge_list",
    "reverse_edges",
    "to_undirected",
]
