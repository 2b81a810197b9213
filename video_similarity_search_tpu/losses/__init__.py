from .combos import (INTRA_NEG_LAMBDA, RSP_LAMBDA, intra_neg_loss, llc_loss,
                     margin_ranking_loss, rsp_loss)
from .mem_triplet import MemTripletState, init_mem_triplet_state, mem_triplet_loss
from .nce import (AliasMethod, MemoryMoCoState, NCEAverageState,
                  init_memory_moco, init_nce_state, memory_moco, nce_average,
                  nce_average_intra_neg, nce_criterion, nce_softmax_loss)
from .triplet import online_triplet_loss

__all__ = [
    "AliasMethod", "INTRA_NEG_LAMBDA", "MemTripletState", "MemoryMoCoState",
    "NCEAverageState", "RSP_LAMBDA", "init_mem_triplet_state",
    "init_memory_moco", "init_nce_state", "intra_neg_loss", "llc_loss",
    "margin_ranking_loss", "mem_triplet_loss", "memory_moco", "nce_average",
    "nce_average_intra_neg", "nce_criterion", "nce_softmax_loss",
    "online_triplet_loss", "rsp_loss",
]
