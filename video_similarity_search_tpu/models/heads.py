"""Classifier heads and embedder wrappers.

Covers: the CoCLR LinearClassifier (reference iic_datasets/CoCLR_model.py:32-90),
and the s3d / r3d embedding stacks assembled inline by the reference
model_selector (models/model_utils.py:80-96).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm
from .r3d import R3DNet
from .s3d import S3D

Dtype = Any


class S3DEmbedder(nn.Module):
    """S3D -> pool -> conv-proj(1024->1024) -> ReLU -> conv-proj(1024->128)
    (reference models/model_utils.py:80-88; 1x1x1 conv on pooled == Dense)."""

    dim: int = 128
    gating: bool = False
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = S3D(gating=self.gating, dtype=self.dtype, axis_name=self.axis_name,
                name="backbone")(x, train=train)
        h = jnp.mean(h, axis=(1, 2, 3))
        h = nn.Dense(h.shape[-1], dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj1")(h)
        h = nn.relu(h)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj2")(h)


class R3DEmbedder(nn.Module):
    """R3D(1,1,1,1) -> Linear(512->512) -> ReLU -> Linear(512->128)
    (reference models/model_utils.py:90-96)."""

    dim: int = 128
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = R3DNet(layer_sizes=(1, 1, 1, 1), dtype=self.dtype,
                   axis_name=self.axis_name, name="backbone")(x, train=train)
        h = nn.Dense(512, dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj1")(h)
        h = nn.relu(h)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj2")(h)


class LinearClassifier(nn.Module):
    """Frozen-backbone linear probe head (reference iic_datasets/CoCLR_model.py:32-90).

    Returns ``(logits, pooled_features)``.
    """

    num_class: int = 101
    network: str = "s3d"
    dropout: float = 0.5
    use_dropout: bool = True
    use_l2_norm: bool = False
    use_final_bn: bool = False
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.network in ("s3d", "s3dg")
        h = S3D(gating=(self.network == "s3dg"), dtype=self.dtype,
                axis_name=self.axis_name, name="backbone")(x, train=train)
        feat = jnp.mean(h, axis=(1, 2, 3)).astype(jnp.float32)  # (B, 1024)
        out = feat
        if self.use_l2_norm:
            out = out / jnp.maximum(jnp.linalg.norm(out, axis=1, keepdims=True),
                                    1e-12)
        if self.use_final_bn:
            out = BatchNorm(not train, self.axis_name, jnp.float32,
                            name="final_bn")(out)
        if self.use_dropout:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        logits = nn.Dense(
            self.num_class, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros, name="final_fc",
        )(out)
        return logits, feat
