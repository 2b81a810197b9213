"""Cosine-kNN retrieval protocols — the framework's headline metric.

Covers all three reference eval stacks (SURVEY §1) with one device kernel
(ops.topk_neighbors — tiled matmul + top-k over the HBM embedding bank):

  * native protocol: distance matrix + top-k label hit for k in {1,5,10,20}
    (reference evaluate.py:208-307, get_distance_matrix/get_topk_acc);
  * CoCLR protocol: center + L2-normalize, then similarity top-k with
    k in {1,5,10,20,50} (reference coclr_classify.py:784-810);
  * IIC protocol: mean of 10 clip features, cosine distance argsort, top-k
    in {1,5,10,20,50} (reference iic_retrieve_clips.py:275-314).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..ops.pdist import pairwise_distance, topk_neighbors

TOPK_DEFAULT = (1, 5, 10, 20)  # reference evaluate.py:287-307
TOPK_EXTENDED = (1, 5, 10, 20, 50)  # coclr / iic protocols


def get_distance_matrix(test_emb: np.ndarray, train_emb: np.ndarray,
                        metric: str = "cosine",
                        same_set: bool = False) -> np.ndarray:
    """Full distance matrix with self-query exclusion when ``same_set``
    (reference evaluate.py:208-223)."""
    return np.asarray(pairwise_distance(test_emb, train_emb, metric=metric,
                                        self_mask=same_set))


def topk_retrieval_acc(query_emb: np.ndarray, query_labels: np.ndarray,
                       bank_emb: np.ndarray, bank_labels: np.ndarray, *,
                       ks: Sequence[int] = TOPK_DEFAULT,
                       metric: str = "cosine",
                       exclude_self: bool = False,
                       approx: bool = False) -> Dict[int, float]:
    """Top-k label-hit accuracy: a video counts as correct at k if ANY of
    its k nearest bank entries shares its label
    (reference get_topk_acc, evaluate.py:287-307). ``approx`` enables the
    TPU approx_min_k reduction for Kinetics-scale banks (cfg
    ``TPU.APPROX_TOPK``; 8.5x at 240k rows, recall 0.998, PERF.md)."""
    kmax = max(ks)
    idx, _ = topk_neighbors(query_emb, bank_emb, k=kmax, metric=metric,
                            exclude_self=exclude_self, approx=approx)
    idx = np.asarray(idx)
    neighbor_labels = bank_labels[idx]  # (N, kmax)
    hit = neighbor_labels == query_labels[:, None]
    return {k: float(np.mean(np.any(hit[:, :k], axis=1))) for k in ks}


def coclr_retrieval_acc(test_emb: np.ndarray, test_labels: np.ndarray,
                        train_emb: np.ndarray, train_labels: np.ndarray, *,
                        ks: Sequence[int] = TOPK_EXTENDED
                        ) -> Dict[int, float]:
    """CoCLR-style: center both sets by the train mean, L2-normalize, then
    similarity top-k (reference coclr_classify.py:784-810)."""
    center = train_emb.mean(0, keepdims=True)
    te = test_emb - center
    tr = train_emb - center
    te = te / np.maximum(np.linalg.norm(te, axis=1, keepdims=True), 1e-12)
    tr = tr / np.maximum(np.linalg.norm(tr, axis=1, keepdims=True), 1e-12)
    return topk_retrieval_acc(te, test_labels, tr, train_labels, ks=ks)


def iic_retrieval_acc(test_feats: np.ndarray, test_labels: np.ndarray,
                      train_feats: np.ndarray, train_labels: np.ndarray, *,
                      ks: Sequence[int] = TOPK_EXTENDED) -> Dict[int, float]:
    """IIC protocol: features are (N, n_clips, D); mean over clips then
    cosine top-k (reference iic_retrieve_clips.py:275-314)."""
    if test_feats.ndim == 3:
        test_feats = test_feats.mean(1)
    if train_feats.ndim == 3:
        train_feats = train_feats.mean(1)
    return topk_retrieval_acc(test_feats, test_labels, train_feats,
                              train_labels, ks=ks)


def local_batch_retrieval_acc(emb: np.ndarray, labels: np.ndarray, *,
                              ks: Sequence[int] = (1, 5),
                              metric: str = "cosine") -> Dict[int, float]:
    """Within-batch retrieval (VAL.METRIC='local_batch',
    reference validation.py:96-130): each embedding queries the rest of
    its own batch."""
    return topk_retrieval_acc(emb, labels, emb, labels, ks=ks, metric=metric,
                              exclude_self=True)
