from graph_data_science_spark.algorithms.betweenness import betweenness
from graph_data_science_spark.algorithms.centrality_extra import (
    closeness,
    harmonic_centrality,
    msbfs_distances,
)
from graph_data_science_spark.algorithms.coloring import k1coloring
from graph_data_science_spark.algorithms.degree import degree_centrality
from graph_data_science_spark.algorithms.exposure import indirect_exposure
from graph_data_science_spark.algorithms.fastrp import fastrp
from graph_data_science_spark.algorithms.hits import hits
from graph_data_science_spark.algorithms.kge import kge_predict
from graph_data_science_spark.algorithms.kmeans import kmeans, kmeanspp_centroids, silhouette
from graph_data_science_spark.algorithms.knn import filtered_knn, knn
from graph_data_science_spark.algorithms.labelprop import label_propagation
from graph_data_science_spark.algorithms.louvain import leiden, louvain, modularity_optimization
from graph_data_science_spark.algorithms.biconnectivity import (
    articulation_points,
    biconnectivity,
    bridges,
)
from graph_data_science_spark.algorithms.celf import celf
from graph_data_science_spark.algorithms.dag import dag_longest_path
from graph_data_science_spark.algorithms.graphsage import graphsage, graphsage_train, identity_weights
from graph_data_science_spark.algorithms.maxkcut import approx_max_k_cut
from graph_data_science_spark.algorithms.misc import conductance, k_core, modularity, topological_sort
from graph_data_science_spark.algorithms.traverse import dfs
from graph_data_science_spark.algorithms.pagerank import article_rank, eigenvector, pagerank
from graph_data_science_spark.algorithms.hashgnn import hashgnn
from graph_data_science_spark.algorithms.node2vec import node2vec
from graph_data_science_spark.algorithms.paths import all_shortest_paths, astar, bfs_levels, dijkstra, shortest_paths
from graph_data_science_spark.algorithms.yens import yens
from graph_data_science_spark.algorithms.scaling import scale_properties
from graph_data_science_spark.algorithms.scc import scc
from graph_data_science_spark.algorithms.linkpred import link_prediction
from graph_data_science_spark.algorithms.similarity import (
    filtered_node_similarity,
    node_similarity,
    node_similarity_weighted,
)
from graph_data_science_spark.algorithms.sllpa import speaker_listener_lpa
from graph_data_science_spark.algorithms.spanning import (
    k_spanning_tree,
    minimum_spanning_forest,
    prize_steiner_tree,
    spanning_tree,
    steiner_tree_approx,
)
from graph_data_science_spark.algorithms.triangles import (
    local_clustering_coefficient,
    triangle_count,
    triangle_listing,
)
from graph_data_science_spark.algorithms.walks import collapse_path, random_walk_visit_counts, random_walks
from graph_data_science_spark.algorithms.wcc import wcc, wcc_sampled, wcc_star

__all__ = [
    "approx_max_k_cut",
    "articulation_points",
    "biconnectivity",
    "bridges",
    "dag_longest_path",
    "celf",
    "graphsage",
    "graphsage_train",
    "identity_weights",
    "article_rank",
    "astar",
    "dfs",
    "yens",
    "betweenness",
    "bfs_levels",
    "dijkstra",
    "hashgnn",
    "node2vec",
    "closeness",
    "collapse_path",
    "conductance",
    "degree_centrality",
    "eigenvector",
    "fastrp",
    "filtered_node_similarity",
    "link_prediction",
    "harmonic_centrality",
    "hits",
    "indirect_exposure",
    "k1coloring",
    "k_core",
    "k_spanning_tree",
    "minimum_spanning_forest",
    "spanning_tree",
    "prize_steiner_tree",
    "steiner_tree_approx",
    "kge_predict",
    "kmeans",
    "kmeanspp_centroids",
    "silhouette",
    "filtered_knn",
    "knn",
    "label_propagation",
    "leiden",
    "louvain",
    "local_clustering_coefficient",
    "modularity",
    "modularity_optimization",
    "msbfs_distances",
    "node_similarity",
    "node_similarity_weighted",
    "pagerank",
    "random_walk_visit_counts",
    "random_walks",
    "scale_properties",
    "scc",
    "all_shortest_paths",
    "shortest_paths",
    "speaker_listener_lpa",
    "topological_sort",
    "triangle_count",
    "triangle_listing",
    "wcc",
    "wcc_sampled",
    "wcc_star",
]
