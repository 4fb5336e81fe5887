"""Graph algorithm kernels — each an iterative DataFrame join-aggregate pass.

Every reference kernel is "per-edge map → per-vertex aggregate → state
update → convergence test" (SURVEY.md §2.3); here each iteration is one
Catalyst-planned job: ``edges.join(state, 'src').groupBy('dst').agg(...)``
merged back into the vertex-state DataFrame.
"""

from linkgraph.operators.anf import (
    effective_diameter,
    mean_distance,
    neighborhood_function,
    neighborhood_function_exact,
)
from linkgraph.operators.backbone import disparity_backbone
from linkgraph.operators.betweenness import betweenness, edge_betweenness
from linkgraph.operators.bfs import bfs
from linkgraph.operators.cocitation import bibliographic_coupling, cocitation
from linkgraph.operators.coloring import graph_coloring
from linkgraph.operators.densest import densest_subgraph
from linkgraph.operators.harmonic import (
    closeness_centrality,
    harmonic_centrality,
    multi_source_bfs,
)
from linkgraph.operators.hits import eigenvector_centrality, hits, salsa
from linkgraph.operators.katz import katz
from linkgraph.operators.kcore import coreness, k_core, onion_decomposition
from linkgraph.operators.labelprop import label_propagation
from linkgraph.operators.landmarks import (
    landmark_distance_estimate,
    landmark_distances,
    select_landmarks,
)
from linkgraph.operators.linkpred import (
    adamic_adar,
    jaccard_pairs,
    preferential_attachment,
    resource_allocation,
)
from linkgraph.operators.louvain import louvain_move
from linkgraph.operators.matching import maximal_matching, maximal_weight_matching
from linkgraph.operators.mis import maximal_independent_set
from linkgraph.operators.featprop import feature_propagation
from linkgraph.operators.mst import minimum_spanning_forest
from linkgraph.operators.pagerank import pagerank, personalized_pagerank
from linkgraph.operators.scc import bowtie_census, scc, scc_census
from linkgraph.operators.simrank import simrank
from linkgraph.operators.spmv import spmv
from linkgraph.operators.sampling import ego_network
from linkgraph.operators.stats import (
    community_graph,
    conductance,
    degree_assortativity,
    degree_powerlaw,
    diameter_lower_bound,
    local_clustering,
    modularity,
    reciprocity,
    rich_club,
)
from linkgraph.operators.sssp import sssp
from linkgraph.operators.triangles import (
    four_clique_count,
    triangle_count,
    triangles_per_vertex,
)
from linkgraph.operators.truss import k_truss, trussness
from linkgraph.operators.walks import (
    node2vec_walks,
    random_walks,
    skipgram_pairs,
    walk_corpus,
)
from linkgraph.operators.wcc import wcc

__all__ = [
    "bfs",
    "betweenness",
    "graph_coloring",
    "densest_subgraph",
    "multi_source_bfs",
    "select_landmarks",
    "landmark_distances",
    "landmark_distance_estimate",
    "degree_powerlaw",
    "closeness_centrality",
    "harmonic_centrality",
    "neighborhood_function",
    "neighborhood_function_exact",
    "effective_diameter",
    "mean_distance",
    "hits",
    "salsa",
    "eigenvector_centrality",
    "cocitation",
    "bibliographic_coupling",
    "katz",
    "k_core",
    "k_truss",
    "trussness",
    "coreness",
    "onion_decomposition",
    "label_propagation",
    "maximal_independent_set",
    "maximal_matching",
    "maximal_weight_matching",
    "minimum_spanning_forest",
    "feature_propagation",
    "adamic_adar",
    "resource_allocation",
    "preferential_attachment",
    "disparity_backbone",
    "edge_betweenness",
    "jaccard_pairs",
    "simrank",
    "pagerank",
    "louvain_move",
    "spmv",
    "sssp",
    "scc",
    "bowtie_census",
    "scc_census",
    "four_clique_count",
    "triangle_count",
    "triangles_per_vertex",
    "personalized_pagerank",
    "reciprocity",
    "rich_club",
    "community_graph",
    "ego_network",
    "local_clustering",
    "degree_assortativity",
    "diameter_lower_bound",
    "conductance",
    "modularity",
    "node2vec_walks",
    "random_walks",
    "skipgram_pairs",
    "walk_corpus",
    "wcc",
]
