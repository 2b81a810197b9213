"""Shared layer helpers for the video encoders.

All models use channels-last video layout ``(B, T, H, W, C)`` so XLA maps
3-D convolutions onto the MXU with lane-aligned channel tiles. The
reference uses torch's channels-first ``(B, C, T, H, W)``
(e.g. models/resnet.py:255-312); conversion happens only at the data/
checkpoint boundary.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _triple(v: Union[int, Sequence[int]]) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(v)
    assert len(t) == 3
    return t  # type: ignore[return-value]


class Conv3d(nn.Module):
    """3-D convolution on (B, T, H, W, C) with torch-style symmetric padding.

    Matches torch ``nn.Conv3d(kernel_size=k, padding=k//2)`` semantics
    (reference models/resnet.py:11-25) while staying channels-last.
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[str, int, Sequence[int], None] = None  # None = k//2 per dim
    use_bias: bool = False
    feature_group_count: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = _triple(self.kernel_size)
        s = _triple(self.strides)
        if self.padding is None:
            pad = [(d // 2, d // 2) for d in k]
        elif isinstance(self.padding, str):
            pad = self.padding
        elif (isinstance(self.padding, (tuple, list))
              and self.padding and isinstance(self.padding[0], (tuple, list))):
            pad = [tuple(p) for p in self.padding]  # explicit (lo, hi) pairs
        else:
            p = _triple(self.padding)
            pad = [(d, d) for d in p]
        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=s,
            padding=pad,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        )(x)


# running-average momentum shared by BatchNorm / SubBatchNorm; the
# batched-view encode (train/steps.py::_encode_views) telescopes
# this exact update when merging per-view statistics — import it
# from here so the two cannot drift
BN_MOMENTUM = 0.9


def _bn_compute_dtype():
    """Perf-ablation hook (round-4 verdict item 3): the train-step profile
    attributes ~8 MFU points to BN batch-statistic epilogues (f32
    `convert_reduce_fusion` sums fused into every conv, PERF.md round-4
    attribution). ``VSS_BN_DTYPE=bfloat16`` runs the BN normalization
    arithmetic (and therefore the fused stat sums) in bf16 so the cost
    can be measured inside the SHIPPED step. Default — and anything
    unrecognized — stays f32; running stats remain f32 params either
    way. Read at trace time: set the env var before building the step."""
    return (jnp.bfloat16
            if os.environ.get("VSS_BN_DTYPE") == "bfloat16"
            else jnp.float32)


class BatchNorm(nn.Module):
    """BatchNorm with torch-equivalent defaults (momentum 0.1, eps 1e-5).

    Statistics are computed in fp32 regardless of compute dtype (unless
    the ``VSS_BN_DTYPE`` ablation hook overrides — see
    ``_bn_compute_dtype``). Under jit with a batch axis sharded over the
    mesh, the batch-mean reduction is global, so this is cross-replica
    ("sync") BN by construction — the TPU-native equivalent of the
    reference's SyncBatchNorm / NaiveSyncBatchNorm3d
    (models/slowfast/slowfast/models/batchnorm_helper.py:122-222).
    ``axis_name`` is only needed under shard_map/pmap.
    """

    use_running_average: Optional[bool] = None
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        stat_dtype = _bn_compute_dtype()
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=BN_MOMENTUM,
            epsilon=1e-5,
            dtype=stat_dtype,
            param_dtype=jnp.float32,
            axis_name=self.axis_name,
        )(x.astype(stat_dtype)).astype(self.dtype)


class SubBatchNorm(nn.Module):
    """Split-batch BN for multigrid training (reference
    models/slowfast/slowfast/models/batchnorm_helper.py:41-120
    SubBatchNorm3d): normalize over batch/``num_splits`` groups during
    training — statistics computed per split via a reshape trick — while
    a single aggregated running-stat set serves eval. The affine
    scale/bias stays global like the reference's shared ``self.bn``
    weight/bias."""

    num_splits: int = 1
    use_running_average: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        xf = x.astype(jnp.float32)
        if ura:
            y = (xf - ra_mean.value) * jax.lax.rsqrt(ra_var.value + 1e-5)
        else:
            b = x.shape[0]
            assert b % self.num_splits == 0, \
                f"batch {b} % num_splits {self.num_splits} != 0"
            g = xf.reshape(self.num_splits, b // self.num_splits,
                           *x.shape[1:])
            mean = jnp.mean(g, axis=(1, 2, 3, 4))  # (splits, C)
            var = jnp.var(g, axis=(1, 2, 3, 4))
            # aggregate split stats into ONE running set (reference
            # _get_aggregated_mean_std, batchnorm_helper.py:60-78)
            agg_mean = jnp.mean(mean, axis=0)
            agg_var = (jnp.mean(var, axis=0)
                       + jnp.mean((mean - agg_mean) ** 2, axis=0))
            momentum = BN_MOMENTUM
            if not self.is_initializing():
                ra_mean.value = momentum * ra_mean.value + \
                    (1 - momentum) * agg_mean
                ra_var.value = momentum * ra_var.value + \
                    (1 - momentum) * agg_var
            mean_b = jnp.repeat(mean, b // self.num_splits, axis=0)
            var_b = jnp.repeat(var, b // self.num_splits, axis=0)
            y = (xf - mean_b[:, None, None, None, :]) * jax.lax.rsqrt(
                var_b[:, None, None, None, :] + 1e-5)
        return (y * scale + bias).astype(self.dtype)


def max_pool3d(x: jnp.ndarray, kernel: int = 3, stride: int = 2, pad: int = 1):
    """torch ``nn.MaxPool3d(kernel_size=3, stride=2, padding=1)`` equivalent."""
    return nn.max_pool(
        x,
        window_shape=(kernel, kernel, kernel),
        strides=(stride, stride, stride),
        padding=[(pad, pad)] * 3,
    )


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool3d((1,1,1)) + flatten: (B,T,H,W,C) -> (B,C)."""
    return jnp.mean(x, axis=(1, 2, 3))


class ProjectionHead(nn.Module):
    """Non-linear projection head: fc1 -> BN -> ReLU -> fc2.

    Reference models/resnet.py:180-184, 294-299.
    """

    hidden: int = 2048
    out_dim: int = 128
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        h = BatchNorm(use_running_average=not train, axis_name=self.axis_name,
                      dtype=self.dtype, name="bn_proj")(h)
        h = nn.relu(h)
        return nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(h)
