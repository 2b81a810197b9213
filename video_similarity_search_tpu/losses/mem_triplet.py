"""Triplet loss against a FIFO labeled memory bank.

Reference ``MemTripletLoss`` (loss/triplet_loss.py:9-81): a K=40 queue of
L2-space embeddings with labels, enqueued (after a cross-GPU gather) BEFORE
the distance computation, so the current batch participates as queue
entries. Positives are addressed at their just-enqueued queue slot
(``ptr - batch + j``, ref :324); negatives are queue slots whose stored
label differs. Here the queue is an explicit state array and the gather is
``jax.lax.all_gather`` on the data axis (ref concat_all_gather, :450-461).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.pdist import pairwise_distance
from .triplet import select_negative_indices

Array = jnp.ndarray


class MemTripletState(struct.PyTreeNode):
    queue: Array  # (K, dim)
    label_q: Array  # (K,) float-filled with -1 initially (ref :22)
    queue_ptr: Array  # () int32


def init_mem_triplet_state(key, K: int = 40, dim: int = 128) -> MemTripletState:
    q = jax.random.normal(key, (K, dim), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    return MemTripletState(queue=q,
                           label_q=jnp.full((K,), -1, jnp.int32),
                           queue_ptr=jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, static_argnames=("margin", "dist_metric",
                                             "sampling_strategy", "axis_name"))
def mem_triplet_loss(state: MemTripletState, embeddings: Array, labels: Array,
                     key, margin: float = 0.2, dist_metric: str = "cosine",
                     sampling_strategy: str = "adapted_hard",
                     axis_name: Optional[str] = None,
                     ) -> Tuple[Array, Array, MemTripletState]:
    """(loss, num_triplets, new_state) — reference forward (:44-81)."""
    emb = embeddings.astype(jnp.float32)
    if axis_name is not None:
        g_emb = jax.lax.all_gather(jax.lax.stop_gradient(emb), axis_name,
                                   tiled=True)
        g_labels = jax.lax.all_gather(labels, axis_name, tiled=True)
    else:
        g_emb, g_labels = jax.lax.stop_gradient(emb), labels

    k_total = state.queue.shape[0]
    bsz = g_emb.shape[0]
    assert k_total % bsz == 0, \
        f"queue size {k_total} must be a multiple of global batch {bsz}"

    # enqueue first (ref :50 — the batch is in the queue when mining)
    ptr = state.queue_ptr
    queue = jax.lax.dynamic_update_slice(state.queue, g_emb, (ptr, 0))
    label_q = jax.lax.dynamic_update_slice(state.label_q,
                                           g_labels.astype(jnp.int32), (ptr,))
    new_ptr = (ptr + bsz) % k_total
    new_state = MemTripletState(queue=queue, label_q=label_q,
                                queue_ptr=new_ptr)

    n = emb.shape[0]
    dist = pairwise_distance(emb, queue, metric=dist_metric)  # (n, K)

    # local anchor/positive pairs (i < j, same label, ref :257-258)
    same = labels[:, None] == labels[None, :]
    pair_valid = same & jnp.triu(jnp.ones((n, n), bool), k=1)
    # negatives: queue slots with a different label (ref :261)
    neg_mask = label_q[None, :] != labels[:, None]  # (n, K)
    pair_valid = pair_valid & jnp.any(neg_mask, axis=1)[:, None]

    # positive queue slot of local index j (ref :324); local->global offset
    # is the process's slice start within the gathered batch
    if axis_name is not None:
        offset = jax.lax.axis_index(axis_name) * n
    else:
        offset = 0
    pos_slot = (new_ptr - bsz + offset + jnp.arange(n)) % k_total  # (n,)
    d_ap = dist[:, pos_slot]  # (n_anchor, n_pos) = d(anchor_i, queue[pos of j])

    # negative selection per pair over queue slots — the SAME strategy
    # dispatch as the in-batch miner (triplet.py::select_negative_indices;
    # candidates here are the K queue slots instead of the batch rows)
    pair_loss = d_ap[:, :, None] + margin - dist[:, None, :]  # (n, n, K)
    neg3 = jnp.broadcast_to(neg_mask[:, None, :], pair_loss.shape)
    easy_dist = jnp.where(neg_mask, dist, jnp.inf)
    neg_idx = select_negative_indices(pair_loss, neg3, easy_dist,
                                      sampling_strategy, key)

    d_an = jnp.take_along_axis(
        jnp.broadcast_to(dist[:, None, :], pair_loss.shape),
        neg_idx[..., None], axis=-1)[..., 0]
    per_pair = jax.nn.relu(d_ap + margin - d_an)
    count = jnp.sum(pair_valid)
    loss = jnp.sum(jnp.where(pair_valid, per_pair, 0.0)) / jnp.maximum(count, 1)
    return loss, count.astype(jnp.int32), new_state
