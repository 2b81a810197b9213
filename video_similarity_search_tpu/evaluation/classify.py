"""Supervised classification eval: ten-crop testing and feature retrieval.

Reference coclr_classify.py:512-635 (``test_10crop`` + probability
summarization) and :638-822 (``test_retrieval``). The reference re-runs
the full test set once per (flip x 5-crop) combination; here the ten crop
views are enumerated ON DEVICE from one decoded buffer per clip — one data
pass, ten fused forwards.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@functools.partial(jax.jit, static_argnames=("crop",))
def five_crops(clips: Array, crop: int) -> Array:
    """(B, T, H, W, C) -> (5, B, T, crop, crop, C): four corners + center
    (reference coclr_utils/augmentation.py FiveCrop with position arg)."""
    h, w = clips.shape[2], clips.shape[3]
    ct, cl = (h - crop) // 2, (w - crop) // 2
    positions = [
        (0, 0), (0, w - crop), (h - crop, 0), (h - crop, w - crop),
        (ct, cl),
    ]
    return jnp.stack([
        clips[:, :, t:t + crop, l:l + crop, :] for t, l in positions
    ])


def ten_crop_views(clips: Array, crop: int) -> Array:
    """(B, T, H, W, C) -> (10, B, T, crop, crop, C): 5 crops x {id, hflip}
    (reference test_10crop loops flip x crop, coclr_classify.py:537-609)."""
    crops = five_crops(clips, crop)
    flipped = crops[:, :, :, :, ::-1, :]
    return jnp.concatenate([crops, flipped], axis=0)


def test_10crop(state, model, cfg, loader, *, crop: Optional[int] = None,
                is_master_proc: bool = True) -> Tuple[float, float]:
    """Ten-crop top-1/top-5: per-clip softmax probabilities averaged over
    the 10 views and a video's test windows (reference
    coclr_classify.py:512-635). Loader yields eval-buffer uint8 batches
    (slightly larger than crop so corners differ)."""
    from ..data.augment import normalize_only

    crop = crop or cfg.DATA.SAMPLE_SIZE

    @jax.jit
    def forward_views(params, batch_stats, views):
        def one(view):
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              view, train=False)
            logits = out[0] if isinstance(out, tuple) else out
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        return jnp.mean(jax.lax.map(one, views), axis=0)  # (B, n_class)

    video_probs: Dict[int, list] = {}
    video_label: Dict[int, int] = {}
    for batch in loader:
        clips = jnp.asarray(batch["clip"])
        x = normalize_only(clips, dataset=cfg.TRAIN.DATASET)
        views = ten_crop_views(x, crop)
        probs = np.asarray(forward_views(state.params, state.batch_stats,
                                         views))
        for i, vid_idx in enumerate(np.asarray(batch["index"])):
            video_probs.setdefault(int(vid_idx), []).append(probs[i])
            video_label[int(vid_idx)] = int(batch["target"][i])

    # summarize_probability (reference :613-635): mean over a video's clips
    correct1 = correct5 = 0
    for vid, plist in video_probs.items():
        mean_prob = np.mean(plist, axis=0)
        top5 = np.argsort(mean_prob)[-5:][::-1]
        if top5[0] == video_label[vid]:
            correct1 += 1
        if video_label[vid] in top5:
            correct5 += 1
    n = max(len(video_probs), 1)
    top1, top5_acc = correct1 / n, correct5 / n
    if is_master_proc:
        print(f"10-crop test: top1 {top1:.4f} top5 {top5_acc:.4f} "
              f"({n} videos)")
    return top1, top5_acc


def test_retrieval(state, model, cfg, train_loader, test_loader, *,
                   is_master_proc: bool = True) -> Dict[int, float]:
    """Feature-space retrieval from the classifier backbone
    (reference test_retrieval, coclr_classify.py:638-822): extract pooled
    features for train and test, center + normalize, top-k in
    {1,5,10,20,50}."""
    from .embed import get_embeddings_and_labels
    from .retrieval import coclr_retrieval_acc

    test_emb, test_labels, _ = get_embeddings_and_labels(
        state, model, cfg, test_loader, split="test",
        verbose=is_master_proc)
    train_emb, train_labels, _ = get_embeddings_and_labels(
        state, model, cfg, train_loader, split="train",
        verbose=is_master_proc)
    topk = coclr_retrieval_acc(test_emb, test_labels, train_emb,
                               train_labels)
    if is_master_proc:
        print("retrieval:", {k: round(v, 4) for k, v in topk.items()})
    return topk
