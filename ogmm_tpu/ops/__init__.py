from ogmm_tpu.ops.common import (cdist, cos_distance, cos_similarity,
                                 gather_neighbors, graph_feature, index_points,
                                 knn, l2_normalize, nn1, nn1_both,
                                 square_distance)
from ogmm_tpu.ops.fps import farthest_point_sample
from ogmm_tpu.ops.gmm import (get_anchor_corrs, get_local_corrs, gmm_params,
                              og_params, wkeans, wkeans_plus)
from ogmm_tpu.ops.icp import (estimate_normals_knn, icp_point_to_plane,
                              icp_point_to_point, refine_registration)
from ogmm_tpu.ops.sinkhorn import contrastsk, log_boltzmann_kernel, sinkhorn

__all__ = [
    "cdist", "cos_distance", "cos_similarity", "gather_neighbors",
    "graph_feature", "index_points", "knn", "l2_normalize", "nn1",
    "nn1_both",
    "square_distance",
    "farthest_point_sample", "get_anchor_corrs", "get_local_corrs",
    "gmm_params", "og_params", "wkeans", "wkeans_plus", "icp_point_to_point",
    "icp_point_to_plane", "estimate_normals_knn",
    "refine_registration", "contrastsk", "log_boltzmann_kernel", "sinkhorn",
]
