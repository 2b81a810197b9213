"""Segment ops: group means and counts over cluster labels.

TPU-native replacement for FINCH's ``cool_mean`` (reference
clustering/finch.py:58-71, a scipy.sparse csr matmul) — here a single
``segment_sum`` that XLA lowers to on-chip scatter-adds.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_mean(data: Array, segment_ids: Array,
                 num_segments: int) -> Array:
    """Per-segment mean of rows: (N, D) x (N,) -> (num_segments, D)."""
    sums = jax.ops.segment_sum(data.astype(jnp.float32), segment_ids,
                               num_segments)
    counts = jax.ops.segment_sum(jnp.ones((data.shape[0],), jnp.float32),
                                 segment_ids, num_segments)
    return sums / jnp.maximum(counts, 1.0)[:, None]


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_count(segment_ids: Array, num_segments: int) -> Array:
    return jax.ops.segment_sum(jnp.ones_like(segment_ids, jnp.int32),
                               segment_ids, num_segments)
