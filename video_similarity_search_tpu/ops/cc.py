"""Connected components of the first-neighbor graph, on device.

FINCH builds adjacency A(i,j) = [j == nn(i)] + [nn(j) == i] + [nn(i) == nn(j)]
and runs scipy connected_components (reference clustering/finch.py:50-55).
The same components fall out of the undirected edge set {i — nn(i)}: the
A·A^T term (shared first neighbor) is already a path through the common
neighbor. Here: min-label propagation with pointer-jumping inside a
``lax.while_loop`` — O(log N) sweeps, fixed shapes, no host round-trip.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@jax.jit
def connected_components(nn_idx: Array) -> Array:
    """Labels (N,) int32 in [0, N): component id = min vertex id in component."""
    n = nn_idx.shape[0]
    init = jnp.arange(n, dtype=jnp.int32)

    def propagate(labels):
        fwd = labels[nn_idx]  # follow edge i -> nn(i)
        rev = jax.ops.segment_min(labels, nn_idx, n)  # edges j -> i with nn(j)=i
        rev = jnp.where(rev == jnp.iinfo(jnp.int32).max, labels, rev)
        new = jnp.minimum(labels, jnp.minimum(fwd, rev))
        return jnp.minimum(new, new[new])  # pointer jumping

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        new = propagate(labels)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return labels


def compact_labels(labels: Array) -> Tuple[Array, Array]:
    """Map arbitrary non-negative component ids to [0, C); returns
    (dense_labels, num).

    The pad value must sort AFTER every real id — ``jnp.unique`` appends
    its padding at the END of the sorted prefix, so a pad that compares
    low (e.g. -1) leaves the array unsorted and breaks the binary search
    whenever C < N/2 (every label then maps to N)."""
    pad = jnp.iinfo(labels.dtype).max
    uniq = jnp.unique(labels, size=labels.shape[0], fill_value=pad)
    num = jnp.sum(uniq != pad)
    dense = jnp.searchsorted(uniq, labels)
    return dense, num
