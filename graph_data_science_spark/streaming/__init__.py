from graph_data_science_spark.streaming.links import (
    derive_link_edges_stream,
    read_transcript_stream,
    run_incremental_pagerank,
    streaming_activity_windows,
    streaming_degree_counts,
)

__all__ = [
    "derive_link_edges_stream",
    "read_transcript_stream",
    "run_incremental_pagerank",
    "streaming_activity_windows",
    "streaming_degree_counts",
]
