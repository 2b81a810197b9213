"""Embedding extraction over a dataset.

Reference ``evaluate.evaluate`` (evaluate.py:146-205) and ``test_evaluate``
(sliding-window + mean, evaluate.py:89-143). Batches are normalized on
device and run through the jitted embed step; multi-window test videos are
averaged into one embedding per video. Embeddings land in an HBM-resident
(N, D) bank used by retrieval, validation, and clustering.
"""

from __future__ import annotations

import pickle
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import normalize_only
from ..train.steps import make_embed_step


def _pad_to(arr: np.ndarray, n: int) -> Tuple[np.ndarray, int]:
    if arr.shape[0] == n:
        return arr, arr.shape[0]
    pad = n - arr.shape[0]
    return np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)]), \
        arr.shape[0]


def get_embeddings_and_labels(state, model, cfg, loader, *,
                              split: str = "train",
                              batch_pad: Optional[int] = None,
                              verbose: bool = True):
    """-> (embeddings (N, D) np, labels (N,), indices (N,)).

    For 'test' splits each video contributes the mean of its window
    embeddings (reference evaluate.py:120-130).
    """
    embed = make_embed_step(cfg, model)
    dataset = cfg.TRAIN.DATASET
    all_emb, all_labels, all_idx = [], [], []
    start = time.time()
    fixed = None
    for batch in loader:
        clips = batch["clip"]
        clips, valid = (clips, clips.shape[0])
        if fixed is None:
            fixed = clips.shape[0]
        clips, valid = _pad_to(clips, fixed) if clips.shape[0] < fixed \
            else (clips, clips.shape[0])
        x = normalize_only(jnp.asarray(clips), dataset=dataset)
        emb = np.asarray(embed(state.params, state.batch_stats, x))[:valid]

        # collapse windows back to one embedding per video
        counts = batch["window_counts"]
        if np.any(counts > 1):
            off = 0
            for cnt in counts:
                all_emb.append(emb[off:off + cnt].mean(0))
                all_labels.append(batch["target"][off])
                all_idx.append(batch["index"][off])
                off += cnt
        else:
            all_emb.extend(emb)
            all_labels.extend(batch["target"][:valid])
            all_idx.extend(batch["index"][:valid])
    if verbose:
        print(f"embedded {len(all_emb)} videos [{split}] "
              f"in {time.time() - start:.1f}s")
    return (np.asarray(all_emb, np.float32),
            np.asarray(all_labels, np.int64),
            np.asarray(all_idx, np.int64))


def cache_embeddings(path: str, embeddings, labels, indices) -> None:
    """pkl cache (reference evaluate.py:310-345)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"embeddings": embeddings, "labels": labels,
                     "indices": indices}, f)


def load_cached_embeddings(path: str):
    with open(path, "rb") as f:
        d = pickle.load(f)
    return d["embeddings"], d["labels"], d["indices"]
