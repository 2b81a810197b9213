"""Triplet wrapper: shared-encoder 3-tower forward.

Reference models/triplet_net.py:6-34 runs the encoder three times; here the
(anchor, positive, negative) clips are stacked on the batch axis and the
encoder runs ONCE on 3B clips — one big MXU-friendly batch instead of three
launches, and BN sees all three views (the reference's BN also sees all
three, just sequentially).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def pairwise_dist(a: jnp.ndarray, b: jnp.ndarray, metric: str = "cosine"):
    """Row-wise distance between aligned embeddings (B,D)x(B,D)->(B,).

    euclidean matches torch ``F.pairwise_distance(p=2)``; cosine is
    ``1 - cos_sim`` (reference models/triplet_net.py:26-31).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if metric == "euclidean":
        return jnp.sqrt(jnp.sum((a - b) ** 2, axis=1) + 1e-12)
    assert metric == "cosine"
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-12)
    return 1.0 - jnp.sum(an * bn, axis=1)


class TripletNet(nn.Module):
    """Returns (dist_a, dist_b, e_x, e_y, e_z) like the reference forward."""

    encoder: nn.Module
    dist_metric: str = "cosine"

    def __call__(self, x, y, z, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        assert self.dist_metric in ("cosine", "euclidean")
        b = x.shape[0]
        stacked = jnp.concatenate([x, y, z], axis=0)
        emb = self.encoder(stacked, train=train)
        if isinstance(emb, tuple):
            emb = emb[0]
        e_x, e_y, e_z = emb[:b], emb[b:2 * b], emb[2 * b:]
        dist_a = pairwise_dist(e_x, e_y, self.dist_metric)
        dist_b = pairwise_dist(e_x, e_z, self.dist_metric)
        return dist_a, dist_b, e_x, e_y, e_z
