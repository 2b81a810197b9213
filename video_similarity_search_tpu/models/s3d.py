"""S3D / S3D-G separable 3-D Inception backbone in flax, channels-last.

Capability parity with the reference (models/s3d/s3dg.py:8-217 and its
duplicate at iic_datasets/s3dg.py): BasicConv3d (conv+BN+ReLU), STConv3d
(spatial-then-temporal factored conv), SelfGating (squeeze-excite over
channels, the "-G" variant), 4-branch SepInception, blocks 1-5, and the
``slow`` stem-stride variant. Output is the (B, T', H', W', 1024) feature
map (pooling/heads live in the callers, as in the reference).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, Conv3d

Dtype = Any


class BasicConv3d(nn.Module):
    """conv + BN + ReLU (reference models/s3d/s3dg.py:8-28)."""

    features: int
    kernel_size: Any = 1
    strides: Any = 1
    padding: Any = 0
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = Conv3d(self.features, self.kernel_size, self.strides,
                   padding=self.padding, dtype=self.dtype, name="conv")(x)
        h = BatchNorm(not train, self.axis_name, self.dtype, name="bn")(h)
        return nn.relu(h)


class STConv3d(nn.Module):
    """Separable spatio-temporal conv: (1,k,k) then (k,1,1), each +BN+ReLU
    (reference models/s3d/s3dg.py:30-65)."""

    features: int
    kernel_size: int = 3
    strides: Any = 1
    padding: int = 0
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(self.strides, (tuple, list)):
            t_stride, s_stride = self.strides[0], self.strides[-1]
        else:
            t_stride = s_stride = self.strides
        k, p = self.kernel_size, self.padding
        h = Conv3d(self.features, (1, k, k), (1, s_stride, s_stride),
                   padding=(0, p, p), dtype=self.dtype, name="conv1")(x)
        h = BatchNorm(not train, self.axis_name, self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = Conv3d(self.features, (k, 1, 1), (t_stride, 1, 1),
                   padding=(p, 0, 0), dtype=self.dtype, name="conv2")(h)
        h = BatchNorm(not train, self.axis_name, self.dtype, name="bn2")(h)
        return nn.relu(h)


class SelfGating(nn.Module):
    """S3D-G feature gating: sigmoid(fc(mean_TWH)) * x (reference :68-78)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        weights = jnp.mean(x, axis=(1, 2, 3))  # (B, C)
        weights = nn.Dense(x.shape[-1], dtype=self.dtype,
                           param_dtype=jnp.float32, name="fc")(weights)
        return nn.sigmoid(weights)[:, None, None, None, :] * x


class SepInception(nn.Module):
    """4-branch separable Inception block (reference :81-132).

    out_planes = [b0, b1a, b1b, b2a, b2b, b3b].
    """

    out_planes: Sequence[int]
    gating: bool = False
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0, b1a, b1b, b2a, b2b, b3b = self.out_planes
        args = dict(dtype=self.dtype, axis_name=self.axis_name)

        x0 = BasicConv3d(b0, 1, 1, 0, name="branch0_0", **args)(x, train)
        x1 = BasicConv3d(b1a, 1, 1, 0, name="branch1_0", **args)(x, train)
        x1 = STConv3d(b1b, 3, 1, 1, name="branch1_1", **args)(x1, train)
        x2 = BasicConv3d(b2a, 1, 1, 0, name="branch2_0", **args)(x, train)
        x2 = STConv3d(b2b, 3, 1, 1, name="branch2_1", **args)(x2, train)
        x3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding=[(1, 1)] * 3)
        x3 = BasicConv3d(b3b, 1, 1, 0, name="branch3_1", **args)(x3, train)

        if self.gating:
            x0 = SelfGating(self.dtype, name="gating_b0")(x0)
            x1 = SelfGating(self.dtype, name="gating_b1")(x1)
            x2 = SelfGating(self.dtype, name="gating_b2")(x2)
            x3 = SelfGating(self.dtype, name="gating_b3")(x3)
        return jnp.concatenate([x0, x1, x2, x3], axis=-1)


def _spatial_pool(x, k=(1, 3, 3), s=(1, 2, 2), p=(0, 1, 1)):
    return nn.max_pool(x, k, strides=s, padding=[(pi, pi) for pi in p])


class S3D(nn.Module):
    """Full S3D(-G) backbone (reference models/s3d/s3dg.py:135-217).

    Output: (B, T/8, H/32, W/32, 1024) feature map.
    """

    input_channel: int = 3
    gating: bool = False
    slow: bool = False
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.ndim == 5, f"expected (B,T,H,W,C), got {x.shape}"
        args = dict(dtype=self.dtype, axis_name=self.axis_name)
        x = x.astype(self.dtype)

        # block1
        stride = (1, 2, 2) if self.slow else 2
        h = STConv3d(64, 7, stride, 3, name="Conv_1a", **args)(x, train)
        # block2
        h = _spatial_pool(h)
        h = BasicConv3d(64, 1, 1, 0, name="Conv_2b", **args)(h, train)
        h = STConv3d(192, 3, 1, 1, name="Conv_2c", **args)(h, train)
        # block3
        h = _spatial_pool(h)
        h = SepInception([64, 96, 128, 16, 32, 32], self.gating,
                         name="Mixed_3b", **args)(h, train)
        h = SepInception([128, 128, 192, 32, 96, 64], self.gating,
                         name="Mixed_3c", **args)(h, train)
        # block4
        h = nn.max_pool(h, (3, 3, 3), strides=(2, 2, 2), padding=[(1, 1)] * 3)
        h = SepInception([192, 96, 208, 16, 48, 64], self.gating,
                         name="Mixed_4b", **args)(h, train)
        h = SepInception([160, 112, 224, 24, 64, 64], self.gating,
                         name="Mixed_4c", **args)(h, train)
        h = SepInception([128, 128, 256, 24, 64, 64], self.gating,
                         name="Mixed_4d", **args)(h, train)
        h = SepInception([112, 144, 288, 32, 64, 64], self.gating,
                         name="Mixed_4e", **args)(h, train)
        h = SepInception([256, 160, 320, 32, 128, 128], self.gating,
                         name="Mixed_4f", **args)(h, train)
        # block5
        h = nn.max_pool(h, (2, 2, 2), strides=(2, 2, 2), padding=[(0, 0)] * 3)
        assert all(d > 0 for d in h.shape), (
            f"S3D input {x.shape} too small: a dimension collapsed to 0 "
            "after the block5 pool (need T>=8 and H,W>=32)")
        h = SepInception([256, 160, 320, 32, 128, 128], self.gating,
                         name="Mixed_5b", **args)(h, train)
        h = SepInception([384, 192, 384, 48, 128, 128], self.gating,
                         name="Mixed_5c", **args)(h, train)
        return h


def select_backbone(network: str, first_channel: int = 3, **kwargs):
    """Name -> (model, feature_dim) (reference models/s3d/select_backbone.py:3-12)."""
    if network == "s3d":
        return S3D(input_channel=first_channel, gating=False, **kwargs), 1024
    if network == "s3dg":
        return S3D(input_channel=first_channel, gating=True, **kwargs), 1024
    raise ValueError(f"unknown backbone {network!r}")
