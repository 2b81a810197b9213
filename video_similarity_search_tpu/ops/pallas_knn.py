"""Pallas fused 1-nearest-neighbor kernel (TPU).

FINCH's first-neighbor computation is the framework's hottest non-conv op
(reference clustering/finch.py:22-47 materializes the full N x N distance
matrix and caps exact search at 70k points, falling back to FLANN). This
kernel streams (tile_m x tile_n) similarity blocks through the MXU and
keeps only a running (min-distance, argmin) per row in VMEM scratch — the
N x M matrix never exists, so exact 1-NN scales to any bank that fits HBM.

``nearest_neighbor_fused`` dispatches: the Pallas kernel on TPU, the jnp
lax.map tiling (ops/pdist.py) elsewhere — keeping the CPU test suite and
interpret-mode parity checks working (see .claude/skills/verify/SKILL.md).

Design note — top-k retrieval stays jnp-tiled (ops/pdist.topk_neighbors):
``lax.top_k`` has no Pallas TPU lowering (verified: NotImplementedError
for primitive top_k), and a hand-rolled k-pass streaming extraction is
VPU-bound O(k) per block — slower than XLA's fused matmul + native top_k
over row tiles for the k<=50 this framework needs. 1-NN (k=1) is the case
where the streaming argmin genuinely wins, so that is the Pallas kernel.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .pdist import l2_normalize, nearest_neighbor

Array = jnp.ndarray

_BIG = 3.4e38  # plain float: a jax-array constant can't be captured by the kernel


def _nn_kernel(nvalid_ref, x_ref, y_ref, idx_ref, dist_ref,
               best_d, best_i, *, tile_m, tile_n, exclude_self):
    """Grid (M/tile_m, N/tile_n), N innermost; scratch carries the running
    best across the j sweep; outputs written on the last j step."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_d[:] = jnp.full((tile_m, 1), _BIG, jnp.float32)
        best_i[:] = jnp.zeros((tile_m, 1), jnp.int32)

    # cosine distance block: 1 - x_tile @ y_tile^T (rows pre-normalized)
    scores = jax.lax.dot_general(
        x_ref[:], y_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    d = 1.0 - scores  # (tile_m, tile_n)

    rows = i * tile_m + jax.lax.broadcasted_iota(jnp.int32,
                                                 (tile_m, tile_n), 0)
    cols = j * tile_n + jax.lax.broadcasted_iota(jnp.int32,
                                                 (tile_m, tile_n), 1)
    d = jnp.where(cols >= nvalid_ref[0], _BIG, d)  # bank padding
    if exclude_self:
        d = jnp.where(rows == cols, _BIG, d)

    local_d = jnp.min(d, axis=1, keepdims=True)  # (tile_m, 1)
    local_arg = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None] + j * tile_n

    better = local_d < best_d[:]
    best_i[:] = jnp.where(better, local_arg, best_i[:])
    best_d[:] = jnp.where(better, local_d, best_d[:])

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        idx_ref[:] = best_i[:]
        dist_ref[:] = best_d[:]


@functools.partial(jax.jit, static_argnames=("exclude_self", "tile_m",
                                             "tile_n", "interpret"))
def _nearest_neighbor_pallas(x: Array, y: Array, n_valid: Array,
                             exclude_self: bool = True, tile_m: int = 256,
                             tile_n: int = 512,
                             interpret: bool = False) -> Tuple[Array, Array]:
    """x (M, D), y (N, D) cosine-normalized, M/N padded to tile multiples;
    rows >= n_valid in y are padding. Returns (idx (M,), dist (M,))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, d_dim = x.shape
    n = y.shape[0]
    grid = (m // tile_m, n // tile_n)

    idx, dist = pl.pallas_call(
        functools.partial(_nn_kernel, tile_m=tile_m, tile_n=tile_n,
                          exclude_self=exclude_self),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid (1,)
            pl.BlockSpec((tile_m, d_dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_dim), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_m, 1), jnp.float32),
            pltpu.VMEM((tile_m, 1), jnp.int32),
        ],
        interpret=interpret,
    )(n_valid, x, y)
    return idx[:, 0], dist[:, 0]


def nearest_neighbor_fused(x: Array, y: Optional[Array] = None,
                           metric: str = "cosine",
                           exclude_self: bool = True,
                           tile_m: int = 256, tile_n: int = 512,
                           interpret: Optional[bool] = None
                           ) -> Tuple[Array, Array]:
    """Exact 1-NN with backend dispatch.

    TPU: the Pallas streaming kernel above (cosine). Anywhere else, or for
    euclidean metric: the jnp tiled path (ops/pdist.py nearest_neighbor).
    ``interpret=True`` forces the Pallas kernel in interpreter mode (used
    by the CPU parity tests).
    """
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = metric == "cosine" and (interpret or on_tpu)
    if not use_pallas:
        return nearest_neighbor(x, y, metric=metric,
                                exclude_self=exclude_self)

    self_query = y is None
    if y is None:
        y = x
    xn = l2_normalize(jnp.asarray(x, jnp.float32))
    yn = l2_normalize(jnp.asarray(y, jnp.float32))
    m0, n0 = xn.shape[0], yn.shape[0]

    def pad_to(a, mult):
        pad = (-a.shape[0]) % mult
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad, a.shape[1]), a.dtype)], 0)
        return a

    xp = pad_to(xn, tile_m)
    yp = pad_to(yn, tile_n)
    idx, dist = _nearest_neighbor_pallas(
        xp, yp, jnp.asarray([n0], jnp.int32),
        exclude_self=exclude_self and self_query,
        tile_m=tile_m, tile_n=tile_n, interpret=bool(interpret))
    return idx[:m0], dist[:m0]
