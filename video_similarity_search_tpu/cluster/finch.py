"""FINCH: parameter-free hierarchical clustering by first-neighbor relations.

Re-implementation of reference clustering/finch.py:108-178 (Sarfraz et al.,
CVPR 2019) with the compute-heavy steps on device:

  * first-neighbor search: one tiled distance+argmin kernel
    (ops.pdist.nearest_neighbor) — one code path at every scale, replacing
    the reference's dense-sklearn-below-70k / FLANN-kd-tree-above split
    (clustering/finch.py:22-38);
  * the clustering equation A = (A+I)(A+I)^T expands to
    direct + reverse + shared-first-neighbor edges; connected components
    over it run as dense min-label propagation with pointer jumping in a
    ``lax.while_loop`` (small levels) or the sparse segment-min kernel
    (ops.cc) for a large first level;
  * group means: ``segment_mean`` (replaces cool_mean's sorted-cumsum
    trick, clustering/finch.py:58-71).

The level loop itself is a host while (sizes shrink each level — a few
retraces per dataset, cached thereafter).

Divergence note: for first levels larger than ``dense_threshold`` the
``ensure_early_exit`` min_sim is computed over direct/reverse edges only
(shared-neighbor pair distances would need group-wise pairwise work); the
dense path (default for UCF/HMDB scales) matches the reference exactly.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cc import connected_components
from ..ops.pallas_knn import nearest_neighbor_fused
from ..ops.pdist import pairwise_distance
from ..ops.segment import segment_mean

DENSE_THRESHOLD = 20000


@functools.partial(jax.jit, static_argnames=("metric", "use_min_sim"))
def _dense_level(mat, min_sim, metric: str = "cosine",
                 use_min_sim: bool = False):
    """One FINCH level on a dense (C, C) distance matrix.

    Returns (labels, nn_idx, max_adj_edge_dist)."""
    d = pairwise_distance(mat, metric=metric)
    c = d.shape[0]
    eye = jnp.eye(c, dtype=bool)
    d_masked = jnp.where(eye, 1e12, d)  # ref clust_rank fills diag 1e12
    nn = jnp.argmin(d_masked, axis=1)

    cols = jnp.arange(c)[None, :]
    direct = cols == nn[:, None]
    shared = nn[:, None] == nn[None, :]
    adj = (direct | direct.T | shared) & ~eye
    max_edge = jnp.max(jnp.where(adj, d, -jnp.inf))
    if use_min_sim:
        adj = adj & (d <= min_sim)

    # min-label propagation with pointer jumping
    init = jnp.arange(c, dtype=jnp.int32)

    def body(state):
        labels, _ = state
        neigh = jnp.min(jnp.where(adj, labels[None, :], jnp.iinfo(jnp.int32).max),
                        axis=1)
        new = jnp.minimum(labels, neigh)
        new = jnp.minimum(new, new[new])
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(lambda s: s[1], body,
                                   (init, jnp.bool_(True)))
    return labels, nn, max_edge


def _sparse_level0(data, metric: str):
    """Large-N first level: tiled 1-NN + sparse CC (no min_sim at level 0)."""
    # Pallas streaming 1-NN on TPU, jnp tiling elsewhere (ops/pallas_knn.py)
    nn, dist = nearest_neighbor_fused(data, metric=metric)
    labels = connected_components(nn)
    max_edge = jnp.max(dist)  # direct edges only (see module docstring)
    return labels, nn, max_edge


def _compact(labels: np.ndarray) -> Tuple[np.ndarray, int]:
    uniq, dense = np.unique(labels, return_inverse=True)
    return dense.astype(np.int64), len(uniq)


def FINCH(data, initial_rank=None, req_clust: Optional[int] = None,
          distance: str = "cosine", ensure_early_exit: bool = True,
          verbose: bool = True,
          ) -> Tuple[np.ndarray, List[int], Optional[np.ndarray]]:
    """Same signature/returns as the reference FINCH (clustering/finch.py:108):
    ``c`` (N, P) partition labels, ``num_clust`` per partition, ``req_c``.

    ``initial_rank`` (precomputed first neighbors) is honored for level 0.
    """
    data = jnp.asarray(np.asarray(data, np.float32))
    n = data.shape[0]

    # ---- level 0 over raw points -------------------------------------
    if initial_rank is not None:
        nn0 = jnp.asarray(np.asarray(initial_rank, np.int32))
        labels0 = connected_components(nn0)
        min_sim_val = None  # no distances available (ref sets orig_dist=[])
    elif n <= DENSE_THRESHOLD:
        labels0, _, max_edge = _dense_level(data, 0.0, metric=distance,
                                            use_min_sim=False)
        min_sim_val = float(max_edge)
    else:
        labels0, _, max_edge = _sparse_level0(data, distance)
        min_sim_val = float(max_edge)
    if not ensure_early_exit:
        min_sim_val = None

    c_, num0 = _compact(np.asarray(labels0))
    mat = segment_mean(data, jnp.asarray(c_), num0)

    if verbose:
        print(f"Partition 0: {num0} clusters")

    c = c_[:, None]
    num_clust = [num0]
    k = 1
    while True:
        use_ms = min_sim_val is not None
        labels, _, _ = _dense_level(
            mat, jnp.float32(min_sim_val if use_ms else 0.0),
            metric=distance, use_min_sim=use_ms)
        u, num_curr = _compact(np.asarray(labels))
        c_ = u[c_]
        mat = segment_mean(data, jnp.asarray(c_), num_curr)

        exit_clust = num_clust[-1] - num_curr
        if num_curr == 1 or exit_clust < 1:
            break
        num_clust.append(num_curr)
        c = np.column_stack((c, c_))
        if verbose:
            print(f"Partition {k}: {num_curr} clusters")
        k += 1

    req_c = None
    if req_clust is not None:
        if req_clust in num_clust:
            req_c = c[:, num_clust.index(req_clust)]
        elif req_clust > num_clust[0]:
            # more clusters requested than the finest partition has: the
            # reference crashes here (clustering/finch.py:170 indexes an
            # empty candidate list); return the finest partition with a
            # warning instead
            print(f"FINCH: req_clust={req_clust} exceeds the finest "
                  f"partition ({num_clust[0]} clusters); returning it")
            req_c = c[:, 0]
        else:
            candidates = [i for i, v in enumerate(num_clust) if v >= req_clust]
            req_c = _req_numclust(c[:, candidates[-1]], data, req_clust,
                                  distance)
    return c, num_clust, req_c


def _req_numclust(base: np.ndarray, data, req_clust: int, distance: str):
    """Merge the closest cluster pair one at a time down to ``req_clust``
    (reference clustering/finch.py:85-105)."""
    c_, num = _compact(base)
    while num > req_clust:
        mat = segment_mean(data, jnp.asarray(c_), num)
        d = np.array(pairwise_distance(mat, metric=distance))
        np.fill_diagonal(d, np.inf)
        nn = d.argmin(1)
        # adjacency of the level; merge only the single closest edge
        i = int(np.argmin(d.min(1)))
        j = int(nn[i])
        merged = np.where(c_ == max(i, j), min(i, j), c_)
        c_, num = _compact(merged)
    return c_
