"""CMC-style NCE losses with device-resident memory banks.

Reference loss/NCE_loss.py:10-352. The per-sample memory banks
(``memory_l``/``memory_ab``/``memory_neg``), the MoCo queue, and the
normalization constants are explicit state arrays threaded through the
train step; bank updates are ``.at[y].set`` scatters (XLA on-chip) instead
of torch ``index_copy_``. The AliasMethod O(1) multinomial sampler
(ref :246-307) is reimplemented; with the uniform unigrams the reference
actually uses (ref :15), drawing reduces to a plain randint — the fast
path taken on device.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jnp.ndarray
_EPS = 1e-7  # ref :8


class NCEAverageState(struct.PyTreeNode):
    """State of NCEAverage(+intra_neg) (ref buffers :21-24, :102-106)."""

    memory_l: Array  # (ndata, D)
    memory_ab: Array  # (ndata, D)
    memory_neg: Optional[Array] = None  # (ndata, D) intra-neg bank
    z_l: Array = struct.field(default_factory=lambda: jnp.float32(-1.0))
    z_ab: Array = struct.field(default_factory=lambda: jnp.float32(-1.0))


def init_nce_state(key, n_data: int, feat_dim: int,
                   intra_neg: bool = False) -> NCEAverageState:
    stdv = 1.0 / np.sqrt(feat_dim / 3.0)
    k1, k2, k3 = jax.random.split(key, 3)
    init = lambda k: jax.random.uniform(k, (n_data, feat_dim), jnp.float32,
                                        -stdv, stdv)
    return NCEAverageState(
        memory_l=init(k1),
        memory_ab=init(k2),
        memory_neg=init(k3) if intra_neg else None,
    )


def _draw_indices(key, y: Array, n_data: int, K: int) -> Array:
    """(B, K+1) negative sample indices, column 0 = the positive y.

    Uniform unigrams => multinomial == randint (see module docstring)."""
    b = y.shape[0]
    idx = jax.random.randint(key, (b, K + 1), 0, n_data)
    return idx.at[:, 0].set(y)


def _momentum_bank_update(memory: Array, feats: Array, y: Array,
                          momentum: float) -> Array:
    """bank[y] <- renorm(momentum*bank[y] + (1-m)*feat) (ref :73-86)."""
    old = memory[y]
    new = momentum * old + (1.0 - momentum) * feats.astype(jnp.float32)
    new = new / jnp.maximum(jnp.linalg.norm(new, axis=1, keepdims=True), 1e-12)
    return memory.at[y].set(new)


def _normalize_two_view(state, out_l, out_ab, T, use_softmax, n_data):
    """Shared scoring tail of the NCEAverage family: softmax scaling or
    the exp/Z NCE normalization with first-batch Z estimation (ref :55-71).
    One implementation so the Z logic cannot drift between the plain and
    intra-neg variants (they must stay in lockstep for checkpoints)."""
    if use_softmax:
        return out_l / T, out_ab / T, state.z_l, state.z_ab
    e_l = jnp.exp(out_l / T)
    e_ab = jnp.exp(out_ab / T)
    new_z_l = jnp.where(state.z_l < 0, jnp.mean(e_l) * n_data, state.z_l)
    new_z_ab = jnp.where(state.z_ab < 0, jnp.mean(e_ab) * n_data, state.z_ab)
    return (e_l / jax.lax.stop_gradient(new_z_l),
            e_ab / jax.lax.stop_gradient(new_z_ab), new_z_l, new_z_ab)


def _updated_banks(state, l, ab, y, momentum, neg=None):
    """Momentum update of the per-sample banks (ref :73-86); shared by
    both NCEAverage variants."""
    kw = dict(
        memory_l=_momentum_bank_update(state.memory_l,
                                       jax.lax.stop_gradient(l), y, momentum),
        memory_ab=_momentum_bank_update(state.memory_ab,
                                        jax.lax.stop_gradient(ab), y,
                                        momentum),
    )
    if neg is not None:
        kw["memory_neg"] = _momentum_bank_update(
            state.memory_neg, jax.lax.stop_gradient(neg), y, momentum)
    return kw


@functools.partial(jax.jit, static_argnames=("K", "T", "momentum",
                                             "use_softmax"))
def nce_average(state: NCEAverageState, l: Array, ab: Array, y: Array, key,
                K: int = 1024, T: float = 0.07, momentum: float = 0.5,
                use_softmax: bool = True,
                ) -> Tuple[Array, Array, NCEAverageState]:
    """Two-view NCE scoring + bank update (ref NCEAverage.forward :26-88).

    Returns (out_l, out_ab, new_state); out_* are (B, K+1) score tensors
    with the positive at column 0.
    """
    n_data = state.memory_l.shape[0]
    idx = _draw_indices(key, y, n_data, K)

    w_l = jax.lax.stop_gradient(state.memory_l[idx])  # (B, K+1, D)
    out_ab = jnp.einsum("bkd,bd->bk", w_l, ab.astype(jnp.float32))
    w_ab = jax.lax.stop_gradient(state.memory_ab[idx])
    out_l = jnp.einsum("bkd,bd->bk", w_ab, l.astype(jnp.float32))

    out_l, out_ab, new_z_l, new_z_ab = _normalize_two_view(
        state, out_l, out_ab, T, use_softmax, n_data)
    new_state = state.replace(z_l=new_z_l, z_ab=new_z_ab,
                              **_updated_banks(state, l, ab, y, momentum))
    return out_l, out_ab, new_state


@functools.partial(jax.jit, static_argnames=("K", "T", "momentum",
                                             "use_softmax"))
def nce_average_intra_neg(state: NCEAverageState, l: Array, ab: Array,
                          neg: Array, y: Array, key, K: int = 1024,
                          T: float = 0.07, momentum: float = 0.5,
                          use_softmax: bool = True,
                          ) -> Tuple[Array, Array, NCEAverageState]:
    """NCE with a third bank of shuffled-clip (intra-negative) embeddings
    concatenated into both views' negatives (ref :91-184). Output shape
    (B, 2*(K+1))."""
    assert state.memory_neg is not None
    n_data = state.memory_l.shape[0]
    idx = _draw_indices(key, y, n_data, K)

    w_neg = jax.lax.stop_gradient(state.memory_neg[idx])
    w_l = jnp.concatenate(
        [jax.lax.stop_gradient(state.memory_l[idx]), w_neg], axis=1)
    out_ab = jnp.einsum("bkd,bd->bk", w_l, ab.astype(jnp.float32))
    w_ab = jnp.concatenate(
        [jax.lax.stop_gradient(state.memory_ab[idx]), w_neg], axis=1)
    out_l = jnp.einsum("bkd,bd->bk", w_ab, l.astype(jnp.float32))

    out_l, out_ab, new_z_l, new_z_ab = _normalize_two_view(
        state, out_l, out_ab, T, use_softmax, n_data)
    new_state = state.replace(z_l=new_z_l, z_ab=new_z_ab,
                              **_updated_banks(state, l, ab, y, momentum,
                                               neg=neg))
    return out_l, out_ab, new_state


class MemoryMoCoState(struct.PyTreeNode):
    """Queue-style memory (ref MemoryMoCo :188-241)."""

    memory: Array  # (K, D)
    index: Array  # () int32
    z: Array = struct.field(default_factory=lambda: jnp.float32(-1.0))


def init_memory_moco(key, K: int, feat_dim: int) -> MemoryMoCoState:
    stdv = 1.0 / np.sqrt(feat_dim / 3.0)
    return MemoryMoCoState(
        memory=jax.random.uniform(key, (K, feat_dim), jnp.float32, -stdv, stdv),
        index=jnp.zeros((), jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("T", "use_softmax", "n_data"))
def memory_moco(state: MemoryMoCoState, q: Array, k: Array, T: float = 0.07,
                use_softmax: bool = False, n_data: Optional[int] = None,
                ) -> Tuple[Array, MemoryMoCoState]:
    """(out (B, 1+K), new_state) — ref MemoryMoCo.forward (:204-241).

    ``n_data`` (the dataset size, the NCE normalization constant's scale)
    is required on the NCE path — a zero default would silently set the
    Z estimate to 0 and emit inf/NaN."""
    if not use_softmax and not n_data:
        raise ValueError("memory_moco(use_softmax=False) needs n_data > 0 "
                         "(the NCE Z estimate is mean(out) * n_data)")
    q = q.astype(jnp.float32)
    k = jax.lax.stop_gradient(k.astype(jnp.float32))
    l_pos = jnp.sum(q * k, axis=1, keepdims=True)
    l_neg = q @ jax.lax.stop_gradient(state.memory).T
    out = jnp.concatenate([l_pos, l_neg], axis=1)
    new_z = state.z
    if use_softmax:
        out = out / T
    else:
        out = jnp.exp(out / T)
        new_z = jnp.where(state.z < 0, jnp.mean(out) * n_data, state.z)
        out = out / jax.lax.stop_gradient(new_z)

    bsz = q.shape[0]
    slots = (state.index + jnp.arange(bsz)) % state.memory.shape[0]
    memory = state.memory.at[slots].set(k)
    return out, state.replace(memory=memory,
                              index=(state.index + bsz) % state.memory.shape[0],
                              z=new_z)


def memory_moco_logits(memory: Array, q: Array, k: Array,
                       T: float = 0.07) -> Array:
    """Softmax-path MoCo logits (B, 1+K) against a FIXED memory — the
    scoring half of :func:`memory_moco` without the queue update. Used for
    the second view of the symmetric two-view contrastive dispatch so the
    queue advances exactly once per step."""
    q = q.astype(jnp.float32)
    k = jax.lax.stop_gradient(k.astype(jnp.float32))
    l_pos = jnp.sum(q * k, axis=1, keepdims=True)
    l_neg = q @ jax.lax.stop_gradient(memory).T
    return jnp.concatenate([l_pos, l_neg], axis=1) / T


def nce_criterion(x: Array, n_data: int) -> Array:
    """Eq.-12 NCE loss (ref NCECriterion :312-337); x: (B, K+1) probs."""
    x = x.astype(jnp.float32)
    m = x.shape[1] - 1
    pn = 1.0 / float(n_data)
    p_pos = x[:, 0]
    log_d1 = jnp.log(p_pos / (p_pos + m * pn + _EPS))
    p_neg = x[:, 1:]
    log_d0 = jnp.log((m * pn) / (p_neg + m * pn + _EPS))
    return -(jnp.sum(log_d1) + jnp.sum(log_d0)) / x.shape[0]


def nce_softmax_loss(x: Array) -> Array:
    """Softmax CE with target = column 0 (ref NCESoftmaxLoss :341-352)."""
    x = x.astype(jnp.float32)
    return jnp.mean(jax.nn.logsumexp(x, axis=1) - x[:, 0])


class AliasMethod:
    """O(1) multinomial sampling via alias tables (ref :246-307).

    Kept for parity with arbitrary unigram distributions; device sampling
    uses the uniform fast path in ``_draw_indices``.
    """

    def __init__(self, probs: np.ndarray):
        probs = np.asarray(probs, np.float64)
        if probs.sum() > 1:
            probs = probs / probs.sum()
        k = len(probs)
        self.prob = np.zeros(k)
        self.alias = np.zeros(k, np.int64)
        smaller, larger = [], []
        for i, p in enumerate(probs):
            self.prob[i] = k * p
            (smaller if self.prob[i] < 1.0 else larger).append(i)
        while smaller and larger:
            small, large = smaller.pop(), larger.pop()
            self.alias[small] = large
            self.prob[large] = (self.prob[large] - 1.0) + self.prob[small]
            (smaller if self.prob[large] < 1.0 else larger).append(large)
        for leftover in smaller + larger:
            self.prob[leftover] = 1.0

    def draw(self, key, n: int) -> Array:
        k1, k2 = jax.random.split(key)
        kk = jax.random.randint(k1, (n,), 0, len(self.prob))
        prob = jnp.asarray(self.prob, jnp.float32)[kk]
        b = jax.random.uniform(k2, (n,)) < prob
        alias = jnp.asarray(self.alias, jnp.int32)[kk]
        return jnp.where(b, kk, alias)
