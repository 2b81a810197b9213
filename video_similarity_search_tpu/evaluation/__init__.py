from .embed import (cache_embeddings, get_embeddings_and_labels,
                    load_cached_embeddings)
from .heatmap import temporal_heat_map
from .retrieval import (TOPK_DEFAULT, TOPK_EXTENDED, coclr_retrieval_acc,
                        get_distance_matrix, iic_retrieval_acc,
                        local_batch_retrieval_acc, topk_retrieval_acc)
from .validate import make_validate_step, validate

__all__ = [
    "TOPK_DEFAULT", "TOPK_EXTENDED", "cache_embeddings",
    "coclr_retrieval_acc", "get_distance_matrix",
    "get_embeddings_and_labels", "iic_retrieval_acc",
    "load_cached_embeddings", "local_batch_retrieval_acc",
    "make_validate_step", "temporal_heat_map", "topk_retrieval_acc",
    "validate",
]
