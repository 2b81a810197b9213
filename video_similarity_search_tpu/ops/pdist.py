"""Pairwise-distance ops: the framework's hottest non-conv kernels.

Replaces, with MXU matmuls instead of Python loops:
  * the O(B^2) row-by-row ``pdist``/``pdist_v2`` in the triplet miner
    (reference loss/triplet_loss.py:429-447),
  * sklearn ``cosine_distances``/``euclidean_distances`` in eval
    (reference evaluate.py:208-223),
  * FINCH's first-neighbor computation (reference clustering/finch.py:22-47).

All ops accept ``metric in {'cosine', 'euclidean'}``. Large banks are
processed in row tiles via ``lax.map`` so the full N x M matrix never has
to materialize in HBM (used by 1-NN and top-k retrieval); XLA fuses the
normalize + matmul + reduce chain per tile.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_EPS = 1e-12


def l2_normalize(x: Array, axis: int = -1) -> Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), _EPS)


def pairwise_distance(x: Array, y: Optional[Array] = None,
                      metric: str = "cosine",
                      self_mask: bool = False) -> Array:
    """Full (N, M) distance matrix.

    ``self_mask=True`` sets the diagonal to +inf for self-query exclusion
    (reference evaluate.py:215-222 sets it to sys.maxsize).
    """
    if y is None:
        y = x
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    if metric == "cosine":
        d = 1.0 - l2_normalize(x) @ l2_normalize(y).T
    elif metric == "euclidean":
        sq = (jnp.sum(x * x, axis=1)[:, None] + jnp.sum(y * y, axis=1)[None, :]
              - 2.0 * (x @ y.T))
        d = jnp.sqrt(jnp.maximum(sq, 0.0))
    else:
        raise ValueError(f"unknown metric {metric!r}")
    if self_mask:
        n = min(d.shape[0], d.shape[1])
        idx = jnp.arange(n)
        d = d.at[idx, idx].set(jnp.inf)
    return d


def _prep(x: Array, y: Array, metric: str):
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    if metric == "cosine":
        return l2_normalize(x), l2_normalize(y), None
    y_sq = jnp.sum(y * y, axis=1)
    return x, y, y_sq


def _tile_dist(xt: Array, y: Array, y_sq, metric: str) -> Array:
    if metric == "cosine":
        return 1.0 - xt @ y.T
    sq = (jnp.sum(xt * xt, axis=1)[:, None] + y_sq[None, :] - 2.0 * (xt @ y.T))
    return jnp.sqrt(jnp.maximum(sq, 0.0))


def _pad_rows(x: Array, tile: int) -> Tuple[Array, int]:
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], 0)
    return x, n


@functools.partial(jax.jit, static_argnames=("metric", "exclude_self", "tile"))
def nearest_neighbor(x: Array, y: Optional[Array] = None,
                     metric: str = "cosine", exclude_self: bool = True,
                     tile: int = 1024) -> Tuple[Array, Array]:
    """1-NN of each row of x in y (default: in x itself, excluding self).

    Tiled so the N x M matrix never materializes — this is FINCH's
    ``clust_rank`` neighbor search (reference clustering/finch.py:22-47,
    which falls back to FLANN beyond 70k points; here one code path scales).
    Returns (indices, distances).
    """
    self_query = y is None
    if y is None:
        y = x
    xn, yn, y_sq = _prep(x, y, metric)
    xp, n = _pad_rows(xn, tile)
    rows = xp.reshape(-1, tile, xp.shape[1])
    row_offsets = jnp.arange(rows.shape[0]) * tile

    def one_tile(args):
        xt, off = args
        d = _tile_dist(xt, yn, y_sq, metric)  # (tile, M)
        if self_query and exclude_self:
            cols = jnp.arange(d.shape[1])[None, :]
            own = off + jnp.arange(tile)[:, None]
            d = jnp.where(cols == own, jnp.inf, d)
        idx = jnp.argmin(d, axis=1)
        return idx, jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]

    idxs, dists = jax.lax.map(one_tile, (rows, row_offsets))
    return idxs.reshape(-1)[:n], dists.reshape(-1)[:n]


def _topk_smallest_rows(d: Array, k_eff: int,
                        approx: bool = False) -> Tuple[Array, Array]:
    """k smallest entries per row of ``d`` -> (values, indices).

    ``approx=True`` uses ``lax.approx_min_k`` — the TPU's partial-reduce
    top-k. Measured round 4 at (9537 queries x 240k bank, k=50) on v5e:
    exact ``lax.top_k`` 414 ms (sort-bound, ~100x off the ~3 ms roofline;
    an exact two-stage per-chunk variant measured WORSE, 1044 ms);
    approx_min_k at the default recall_target=0.99: 49 ms with measured
    recall 0.9976. Exact stays the default — retrieval metrics are parity
    numbers — and callers opt in for bank-scale workloads."""
    if approx:
        vals, idx = jax.lax.approx_min_k(d, k_eff, recall_target=0.99)
        return vals, idx
    vals, idx = jax.lax.top_k(-d, k_eff)
    return -vals, idx


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "exclude_self", "tile",
                                    "approx"))
def topk_neighbors(queries: Array, bank: Array, k: int,
                   metric: str = "cosine", exclude_self: bool = False,
                   tile: int = 512, approx: bool = False
                   ) -> Tuple[Array, Array]:
    """Top-k nearest rows of ``bank`` for each query (tiled over queries).

    The retrieval kernel behind ``get_closest_data_mat``/``get_topk_acc``
    (reference evaluate.py:226-231, 287-307), coclr ``topk``
    (coclr_classify.py:784-810) and IIC argsort retrieval
    (iic_retrieve_clips.py:292-311).
    ``approx=True`` swaps in the TPU-native ``approx_min_k`` reduction
    (8.5x at a 240k bank, recall 0.998 — see ``_topk_smallest_rows``).
    Returns (indices (N,k), values (N,k)).
    """
    qn, bn, b_sq = _prep(queries, bank, metric)
    qp, n = _pad_rows(qn, tile)
    rows = qp.reshape(-1, tile, qp.shape[1])
    row_offsets = jnp.arange(rows.shape[0]) * tile
    # a bank smaller than k: return every bank row, padding by repeating
    # the farthest neighbor (keeps any()-style label-hit semantics exact)
    k_eff = min(k, bank.shape[0])

    def one_tile(args):
        qt, off = args
        d = _tile_dist(qt, bn, b_sq, metric)
        if exclude_self:
            cols = jnp.arange(d.shape[1])[None, :]
            own = off + jnp.arange(tile)[:, None]
            d = jnp.where(cols == own, jnp.inf, d)
        dv, idx = _topk_smallest_rows(d, k_eff, approx=approx)
        if k_eff < k:
            idx = jnp.concatenate(
                [idx, jnp.repeat(idx[:, -1:], k - k_eff, axis=1)], axis=1)
            dv = jnp.concatenate(
                [dv, jnp.repeat(dv[:, -1:], k - k_eff, axis=1)], axis=1)
        return idx, dv

    idxs, vals = jax.lax.map(one_tile, (rows, row_offsets))
    d_out = vals.reshape(-1, k)[:n]
    return idxs.reshape(-1, k)[:n], d_out
