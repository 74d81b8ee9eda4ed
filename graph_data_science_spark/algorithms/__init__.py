from graph_data_science_spark.algorithms.coloring import k1coloring
from graph_data_science_spark.algorithms.degree import degree_centrality
from graph_data_science_spark.algorithms.fastrp import fastrp
from graph_data_science_spark.algorithms.hits import hits
from graph_data_science_spark.algorithms.labelprop import label_propagation
from graph_data_science_spark.algorithms.louvain import louvain
from graph_data_science_spark.algorithms.misc import conductance, k_core, modularity, topological_sort
from graph_data_science_spark.algorithms.pagerank import article_rank, eigenvector, pagerank
from graph_data_science_spark.algorithms.paths import bfs_levels, shortest_paths
from graph_data_science_spark.algorithms.scaling import scale_properties
from graph_data_science_spark.algorithms.scc import scc
from graph_data_science_spark.algorithms.similarity import node_similarity
from graph_data_science_spark.algorithms.triangles import local_clustering_coefficient, triangle_count
from graph_data_science_spark.algorithms.wcc import wcc

__all__ = [
    "article_rank",
    "bfs_levels",
    "conductance",
    "degree_centrality",
    "eigenvector",
    "fastrp",
    "hits",
    "k1coloring",
    "k_core",
    "label_propagation",
    "louvain",
    "local_clustering_coefficient",
    "modularity",
    "node_similarity",
    "pagerank",
    "scale_properties",
    "scc",
    "shortest_paths",
    "topological_sort",
    "triangle_count",
    "wcc",
]
