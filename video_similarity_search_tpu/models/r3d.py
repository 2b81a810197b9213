"""R3D small 3-D ResNet in flax, channels-last.

Capability parity with the reference R3DNet (models/r3d/r3d.py:126-187):
configurable layer sizes (e.g. (1,1,1,1)), a (3,7,7)/(1,2,2) stem, three
downsampling stages, optional classifier head, optional ``return_conv``
feature map (flattened after a (1,2,2) max-pool), and a 2-channel ``uv``
optical-flow stem.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, Conv3d, global_avg_pool

Dtype = Any


class SpatioTemporalResBlock(nn.Module):
    """conv->BN->ReLU->conv->BN->sum->ReLU (reference models/r3d/r3d.py:41-89)."""

    features: int
    downsample: bool = False
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        stride = 2 if self.downsample else 1
        res = Conv3d(self.features, 3, stride, dtype=self.dtype, name="conv1")(x)
        res = BatchNorm(not train, self.axis_name, self.dtype, name="bn1")(res)
        res = nn.relu(res)
        res = Conv3d(self.features, 3, 1, dtype=self.dtype, name="conv2")(res)
        res = BatchNorm(not train, self.axis_name, self.dtype, name="bn2")(res)
        if self.downsample:
            x = Conv3d(self.features, 1, 2, dtype=self.dtype,
                       name="downsampleconv")(x)
            x = BatchNorm(not train, self.axis_name, self.dtype,
                          name="downsamplebn")(x)
        return nn.relu(x + res)


class R3DNet(nn.Module):
    """R3D feature extractor (reference models/r3d/r3d.py:126-187)."""

    layer_sizes: Sequence[int] = (1, 1, 1, 1)
    with_classifier: bool = False
    return_conv: bool = False
    num_classes: int = 101
    modality: str = "rgb"  # 'rgb' | 'uv' (2-channel flow)
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.ndim == 5, f"expected (B,T,H,W,C), got {x.shape}"
        x = x.astype(self.dtype)
        h = Conv3d(64, (3, 7, 7), (1, 2, 2), padding=(1, 3, 3),
                   dtype=self.dtype, name="conv1")(x)
        h = BatchNorm(not train, self.axis_name, self.dtype, name="bn1")(h)
        h = nn.relu(h)

        widths = (64, 128, 256, 512)
        for stage, (width, n_blocks) in enumerate(zip(widths, self.layer_sizes), 2):
            for b in range(n_blocks):
                h = SpatioTemporalResBlock(
                    width,
                    downsample=(stage > 2 and b == 0),
                    dtype=self.dtype,
                    axis_name=self.axis_name,
                    name=f"conv{stage}_block{b}",
                )(h, train=train)

        if self.return_conv:
            h = nn.max_pool(h, (1, 2, 2), strides=(1, 2, 2))
            return h.reshape(h.shape[0], -1)

        feat = global_avg_pool(h)  # (B, 512)
        if self.with_classifier:
            return nn.Dense(self.num_classes, dtype=self.dtype,
                            param_dtype=jnp.float32, name="linear")(feat)
        return feat
