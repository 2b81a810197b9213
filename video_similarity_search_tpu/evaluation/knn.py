"""k-nearest-embedding retrieval report (reference evaluate.py:353-399).

Embeds the test split (sliding-window averaged) and the train split, runs
the top-k retrieval kernel, appends ``global_retrieval_acc.txt``, and can
render exemplar retrieval figures.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from ..utils.meters import append_metric_line
from .embed import (cache_embeddings, get_embeddings_and_labels,
                    load_cached_embeddings)
from .retrieval import TOPK_DEFAULT, topk_retrieval_acc


def k_nearest_embeddings(state, model, cfg, train_loader, test_loader, *,
                         epoch: Optional[int] = None,
                         cache_dir: Optional[str] = None,
                         is_master_proc: bool = True
                         ) -> Dict[int, float]:
    """Full retrieval eval; returns {k: acc} and logs to
    global_retrieval_acc.txt (reference evaluate.py:353-399 — note the
    reference's log line drops top-10/20 due to a format-string bug,
    SURVEY §7.4; we log all four)."""
    # cache keyed by split AND epoch: the reference's split-only pkl names
    # (evaluate.py:313-345) are fine for its one-shot eval CLI (epoch=None
    # keeps those names), but a caller passing cache_dir across epochs
    # would silently reuse stale embeddings forever (and freeze any
    # is_best decision on them) — so ANY explicit epoch, including 0, is
    # suffixed (`if epoch` was falsy at epoch 0 and read the legacy pkl).
    suffix = f"_ep{epoch}" if epoch is not None else ""
    test_cache = os.path.join(cache_dir, f"test_embeddings{suffix}.pkl") \
        if cache_dir else None
    train_cache = os.path.join(cache_dir, f"train_embeddings{suffix}.pkl") \
        if cache_dir else None

    if test_cache and os.path.exists(test_cache):
        test_emb, test_labels, _ = load_cached_embeddings(test_cache)
    else:
        test_emb, test_labels, test_idx = get_embeddings_and_labels(
            state, model, cfg, test_loader, split="test",
            verbose=is_master_proc)
        if test_cache:
            cache_embeddings(test_cache, test_emb, test_labels, test_idx)

    if train_cache and os.path.exists(train_cache):
        train_emb, train_labels, _ = load_cached_embeddings(train_cache)
    else:
        train_emb, train_labels, train_idx = get_embeddings_and_labels(
            state, model, cfg, train_loader, split="train",
            verbose=is_master_proc)
        if train_cache:
            cache_embeddings(train_cache, train_emb, train_labels, train_idx)

    topk = topk_retrieval_acc(test_emb, test_labels, train_emb, train_labels,
                              ks=TOPK_DEFAULT,
                              metric=cfg.LOSS.DIST_METRIC,
                              approx=bool(cfg.TPU.APPROX_TOPK))
    if is_master_proc:
        ep = 0 if epoch is None else epoch  # one-shot CLI logs as epoch 0
        line = " ".join(f"top{k}:{v:.4f}" for k, v in sorted(topk.items()))
        print(f"Retrieval epoch {ep}: {line}")
        append_metric_line(cfg.OUTPUT_PATH, "global_retrieval_acc.txt",
                           f"epoch:{ep} {line}")
    return topk


def plot_exemplar_retrievals(test_emb, train_emb, test_samples, train_samples,
                             out_png: str, n_examples: int = 4,
                             k: int = 5) -> Optional[str]:
    """Exemplar frames of the top-k retrieved train videos for a few test
    queries (reference evaluate.py:241-275, 376-394)."""
    from ..ops.pdist import topk_neighbors

    n_examples = min(n_examples, len(test_samples), len(test_emb))
    k = min(k, len(train_samples))
    if n_examples == 0 or k == 0:
        return None
    idx, _ = topk_neighbors(test_emb[:n_examples], train_emb, k=k)
    idx = np.asarray(idx)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    def first_frame(sample):
        path = os.path.join(sample["video"], "image_00001.jpg")
        if os.path.exists(path):
            return np.asarray(Image.open(path))
        return np.zeros((64, 64, 3), np.uint8)

    fig, axes = plt.subplots(n_examples, k + 1,
                             figsize=(2 * (k + 1), 2 * n_examples),
                             squeeze=False)
    for r in range(n_examples):
        axes[r][0].imshow(first_frame(test_samples[r]))
        axes[r][0].set_title("query", fontsize=7)
        for c in range(k):
            axes[r][c + 1].imshow(first_frame(train_samples[idx[r, c]]))
        for ax in axes[r]:
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return out_png
