"""MoCo-style InfoNCE / UberNCE for video, TPU-native.

Reference models/infoNCE.py:38-288 keeps the queue, pointer, and momentum
("key") encoder as mutable module buffers and defeats per-GPU BN-statistics
leakage with a cross-GPU batch shuffle (:108-153). Here everything is
functional: the queue, its pointer, the label queue (UberNCE), and the key
params are explicit state threaded through the train step, with
``jax.lax.all_gather`` over the data axis for the enqueue
(reference ``concat_all_gather``, models/infoNCE.py:24-35). The BN batch
shuffle is intentionally replaced by cross-replica BN (global batch
statistics under jit+sharding) — same purpose, TPU-native mechanism.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from .s3d import S3D

Dtype = Any


class MoCoEncoder(nn.Module):
    """Backbone + global pool + conv projection head.

    Matches the reference encoder stack (models/infoNCE.py:59-72):
    S3D -> AdaptiveAvgPool3d(1) -> 1x1x1 conv (feat->feat) -> ReLU ->
    1x1x1 conv (feat->dim). On pooled features a 1x1x1 conv == Dense.
    """

    network: str = "s3d"
    dim: int = 128
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert self.network in ("s3d", "s3dg")
        feat_map = S3D(gating=(self.network == "s3dg"), dtype=self.dtype,
                       axis_name=self.axis_name, name="backbone")(x, train=train)
        feat = jnp.mean(feat_map, axis=(1, 2, 3))  # (B, 1024)
        h = nn.Dense(feat.shape[-1], dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj_conv1")(feat)
        h = nn.relu(h)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj_conv2")(h)


class MoCoState(struct.PyTreeNode):
    """Explicit MoCo state (reference buffers at models/infoNCE.py:78-83).

    The key ("momentum") encoder's BN running stats are NOT stored here:
    they would alias the query encoder's ``batch_stats`` pytree inside one
    donated TrainState (double-donation is an XLA error). The key forward
    uses the query stats — the same statistics the reference's SyncBN'd
    encoder_k effectively tracks."""

    key_params: Any
    queue: jnp.ndarray  # (K, dim), L2-normalized rows
    queue_ptr: jnp.ndarray  # () int32
    queue_labels: Optional[jnp.ndarray] = None  # (K,) int32, UberNCE only


def init_moco_state(params, batch_stats, rng, dim: int, K: int,
                    with_labels: bool = False) -> MoCoState:
    queue = jax.random.normal(rng, (K, dim), dtype=jnp.float32)
    queue = queue / jnp.linalg.norm(queue, axis=1, keepdims=True)
    labels = -jnp.ones((K,), jnp.int32) if with_labels else None
    del batch_stats  # see MoCoState docstring
    return MoCoState(
        # deep copy: key params must not alias the donated query params
        key_params=jax.tree.map(lambda x: jnp.array(x, copy=True), params),
        queue=queue,
        queue_ptr=jnp.zeros((), jnp.int32),
        queue_labels=labels,
    )


def momentum_update(query_params, key_params, m: float = 0.999):
    """k <- m*k + (1-m)*q (reference models/infoNCE.py:86-90)."""
    return jax.tree.map(lambda k, q: m * k + (1.0 - m) * q, key_params,
                        query_params)


def dequeue_and_enqueue(state: MoCoState, keys: jnp.ndarray,
                        labels: Optional[jnp.ndarray] = None,
                        axis_name: Optional[str] = None) -> MoCoState:
    """Ring-buffer enqueue of the (globally gathered) keys
    (reference models/infoNCE.py:92-106).

    K must be divisible by the global batch (same assert as the reference).
    """
    if axis_name is not None:
        keys = jax.lax.all_gather(keys, axis_name, tiled=True)
        if labels is not None:
            labels = jax.lax.all_gather(labels, axis_name, tiled=True)
    bsz = keys.shape[0]
    k_total = state.queue.shape[0]
    assert k_total % bsz == 0, f"queue size {k_total} % batch {bsz} != 0"
    ptr = state.queue_ptr
    queue = jax.lax.dynamic_update_slice(state.queue, keys.astype(jnp.float32),
                                         (ptr, 0))
    new_labels = state.queue_labels
    if labels is not None and new_labels is not None:
        new_labels = jax.lax.dynamic_update_slice(new_labels,
                                                  labels.astype(jnp.int32),
                                                  (ptr,))
    return state.replace(
        queue=queue,
        queue_ptr=(ptr + bsz) % k_total,
        queue_labels=new_labels,
    )


def _l2norm(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def infonce_forward(encoder: MoCoEncoder, query_vars, state: MoCoState,
                    x1: jnp.ndarray, x2: jnp.ndarray, T: float = 0.07,
                    train: bool = True, axis_name: Optional[str] = None):
    """MoCo forward (reference models/infoNCE.py:155-200).

    Returns ``(logits, labels, keys, new_query_batch_stats)``. Momentum
    update and enqueue are the caller's responsibility (they mutate state).
    """
    if train:
        q, mutated = encoder.apply(query_vars, x1, train=True,
                                   mutable=["batch_stats"])
        new_bs = mutated["batch_stats"]
    else:
        q = encoder.apply(query_vars, x1, train=False)
        new_bs = query_vars.get("batch_stats")
    q = _l2norm(q.astype(jnp.float32))

    key_vars = {"params": state.key_params,
                "batch_stats": new_bs if train
                else query_vars.get("batch_stats", {})}
    if train:
        # the key forward uses BATCH statistics like the reference's
        # train-mode encoder_k (models/infoNCE.py:108-153) — its per-GPU
        # BN-shuffle trick is replaced by cross-replica (global-batch)
        # stats here; eval-mode running averages would normalize early
        # keys with near-init statistics. The stat mutation is discarded
        # (the key encoder keeps no running state of its own).
        k, _ = encoder.apply(key_vars, x2, train=True,
                             mutable=["batch_stats"])
    else:
        k = encoder.apply(key_vars, x2, train=False)
    k = jax.lax.stop_gradient(_l2norm(k.astype(jnp.float32)))

    l_pos = jnp.sum(q * k, axis=1, keepdims=True)  # (B, 1)
    l_neg = q @ state.queue.T  # (B, K)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / T
    labels = jnp.zeros((q.shape[0],), jnp.int32)  # positive at column 0
    return logits, labels, k, new_bs


def ubernce_forward(encoder: MoCoEncoder, query_vars, state: MoCoState,
                    x1: jnp.ndarray, x2: jnp.ndarray,
                    batch_labels: jnp.ndarray, T: float = 0.07,
                    train: bool = True):
    """UberNCE forward (reference models/infoNCE.py:203-288).

    Like InfoNCE but returns a binary mask marking all same-label keys
    (column 0 is the instance positive; remaining columns are queue entries
    whose stored label matches).
    """
    logits, _, k, new_bs = infonce_forward(encoder, query_vars, state, x1, x2,
                                           T, train)
    assert state.queue_labels is not None
    mask_queue = (state.queue_labels[None, :] == batch_labels[:, None])
    mask = jnp.concatenate(
        [jnp.ones((logits.shape[0], 1), bool), mask_queue], axis=1
    )
    return logits, mask, k, new_bs
