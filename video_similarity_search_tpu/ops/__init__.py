from .cc import compact_labels, connected_components
from .pallas_knn import nearest_neighbor_fused
from .pdist import (l2_normalize, nearest_neighbor, pairwise_distance,
                    topk_neighbors)
from .segment import segment_count, segment_mean

__all__ = [
    "compact_labels", "connected_components", "l2_normalize",
    "nearest_neighbor", "nearest_neighbor_fused", "pairwise_distance",
    "segment_count", "segment_mean", "topk_neighbors",
]
