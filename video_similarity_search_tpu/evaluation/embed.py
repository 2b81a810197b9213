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


def _pad_clips(arr, quantum: int) -> Tuple[np.ndarray, int]:
    """Pad the leading (clip) axis up to a multiple of ``quantum`` so the
    jitted embed step sees a bounded set of static shapes (multi-window
    test batches flatten a variable number of windows per batch; the
    item-level loader padding cannot make that static).

    Device arrays (loader ``device_upload``) pad in jnp — np.concatenate
    on a jax.Array would silently download it back to host."""
    n = arr.shape[0]
    target = max(quantum, -(-n // quantum) * quantum)
    if n == target:
        return arr, n
    xp = jnp if isinstance(arr, jax.Array) else np
    return xp.concatenate([arr, xp.repeat(arr[-1:], target - n, axis=0)]), n


def get_embeddings_and_labels(state, model, cfg, loader, *,
                              split: str = "train",
                              batch_pad: Optional[int] = None,
                              verbose: bool = True):
    """-> (embeddings (N, D) np, labels (N,), indices (N,)).

    For 'test' splits each video contributes the mean of its window
    embeddings (reference evaluate.py:120-130). Ragged batches arrive
    padded by the loader (``__size__`` = real item count); padded rows are
    dropped here on host.
    """
    embed = make_embed_step(cfg, model)
    dataset = cfg.TRAIN.DATASET
    all_emb, all_labels, all_idx = [], [], []
    start = time.time()
    quantum = batch_pad
    for batch in loader:
        clips = batch["clip"]
        n_items = int(batch.get("__size__", len(batch["window_counts"])))
        counts = batch["window_counts"]
        n_clips = int(np.sum(counts[:n_items]))
        if quantum is None:
            quantum = clips.shape[0]  # first batch is full: its clip count
        clips, _ = _pad_clips(clips, quantum)
        x = normalize_only(jnp.asarray(clips), dataset=dataset)
        emb = np.asarray(embed(state.params, state.batch_stats, x))[:n_clips]

        # collapse windows back to one embedding per video
        if np.any(counts[:n_items] > 1):
            off = 0
            for i in range(n_items):
                cnt = counts[i]
                all_emb.append(emb[off:off + cnt].mean(0))
                all_labels.append(batch["target"][off])
                all_idx.append(batch["index"][off])
                off += cnt
        else:
            all_emb.extend(emb)
            all_labels.extend(batch["target"][:n_clips])
            all_idx.extend(batch["index"][:n_clips])
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
