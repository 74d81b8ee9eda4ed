from graph_data_science_spark.algorithms.degree import degree_centrality
from graph_data_science_spark.algorithms.labelprop import label_propagation
from graph_data_science_spark.algorithms.misc import conductance, k_core, modularity, topological_sort
from graph_data_science_spark.algorithms.pagerank import article_rank, eigenvector, pagerank
from graph_data_science_spark.algorithms.scaling import scale_properties
from graph_data_science_spark.algorithms.similarity import node_similarity
from graph_data_science_spark.algorithms.triangles import local_clustering_coefficient, triangle_count
from graph_data_science_spark.algorithms.wcc import wcc

__all__ = [
    "article_rank",
    "conductance",
    "degree_centrality",
    "eigenvector",
    "k_core",
    "label_propagation",
    "local_clustering_coefficient",
    "modularity",
    "node_similarity",
    "pagerank",
    "scale_properties",
    "topological_sort",
    "triangle_count",
    "wcc",
]
