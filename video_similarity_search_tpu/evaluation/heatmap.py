"""Temporal similarity heat map (reference evaluate.py:402-483).

The reference implementation is defect-ridden (references ``test_video_in``
before assignment off the slowfast/cuda path and is driven by an
interactive cv2/matplotlib animation loop — SURVEY §7.4). This implements
the *intended* behavior as an offline artifact: slide a
``SAMPLE_DURATION`` window (stride = duration//2) across an exemplar
video, embed every window in ONE jitted batch, compute each window's
embedding distance to a fixed test clip's embedding, and save a
distance-over-time curve PNG plus the raw distances.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..data.augment import normalize_only
from ..models.triplet_net import pairwise_dist
from ..train.steps import make_embed_step


def temporal_heat_map(state, model, cfg, dataset, *, exemplar_idx: int,
                      test_idx: int, out_png: Optional[str] = None,
                      metric: str = "euclidean"
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (frame_positions, distances); writes ``out_png`` if given.

    ``dataset`` is a VideoDataset (its reader loads fixed-size eval clips).
    Window i covers exemplar frames [i - D, i) for i in
    range(D, num_frames, D//2) — the reference's TemporalSpecificCrop loop
    (evaluate.py:433-452).
    """
    d = cfg.DATA.SAMPLE_DURATION
    stride = max(d // 2, 1)
    reader = dataset.reader
    ex_sample = dataset.samples[exemplar_idx]
    test_sample = dataset.samples[test_idx]

    # one fixed test clip: center window
    n_test = test_sample["num_frames"]
    t0 = max((n_test - d) // 2, 0)
    test_clip = reader.load(test_sample,
                            [min(t0 + i + 1, n_test) for i in range(d)])

    positions = list(range(d, ex_sample["num_frames"], stride))
    windows = np.stack([
        reader.load(ex_sample, list(range(i - d + 1, i + 1)))
        for i in positions
    ])  # (W, T, H, W, C)

    embed = make_embed_step(cfg, model)
    batch = np.concatenate([windows, test_clip[None]], axis=0)
    x = normalize_only(jnp.asarray(batch), dataset=cfg.TRAIN.DATASET)
    emb = embed(state.params, state.batch_stats, x)
    ex_emb, test_emb = emb[:-1], emb[-1:]
    dists = np.asarray(pairwise_dist(
        ex_emb, jnp.broadcast_to(test_emb, ex_emb.shape), metric))

    if out_png:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 3))
        ax.plot(positions, dists, "b-")
        ax.set_xlabel("exemplar frame")
        ax.set_ylabel(f"{metric} distance to test clip")
        ax.set_title(f"temporal heat map: exemplar {exemplar_idx} vs "
                     f"test {test_idx}")
        fig.tight_layout()
        os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
        fig.savefig(out_png, dpi=120)
        plt.close(fig)
    return np.asarray(positions), dists
