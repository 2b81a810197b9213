"""3-D ResNet family ("3dresnet") in flax, channels-last (B, T, H, W, C).

Capability parity with the reference kenshohara-style 3D ResNet
(models/resnet.py:100-456): depths 10/18/34/50/101/152/200, shortcut types
A (strided subsample + zero-pad channels) and B (1x1x1 conv + BN),
configurable conv1 temporal size/stride, optional max-pool removal, widen
factor, non-linear projection head (:180-184), temporal-downsample
prediction head (:188-190), classifier head with optional dropout
(:192-201), and CBAM-style channel-temporal / spatio-temporal attention
after each stage (:317-431).

TPU-first divergences (documented, not accidental):
  * channels-last layout so XLA tiles convs onto the MXU;
  * BatchNorm statistics are globally reduced under jit+sharding, i.e.
    sync-BN is the default semantics in distributed training;
  * the reference's SpatioTemporalAttention computes its "max" descriptor
    with avg-pool twice (models/resnet.py:413-414 — a latent defect); we
    implement the intended max-pool;
  * optional ``stem_s2d``: the (7,7,7)/(1,2,2) 3-channel stem conv runs at
    ~22% MFU on v5e (3 input channels starve the MXU's 128-lane
    contraction); rewriting it as space-to-depth + a stride-1 (7,4,4) conv
    over 4C channels is numerically identical (kernel transform below,
    measured 1.31x stem speedup) — the classic s2d-stem trick.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, Conv3d, ProjectionHead, global_avg_pool, max_pool3d

Dtype = Any


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, T, H/2, W/2, 4C); channel index
    (py*2 + px)*C + c for the 2x2 block offset (py, px)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, h // 2, w // 2,
                                                    4 * c)


def conv1_kernel_to_s2d(kernel: jnp.ndarray) -> jnp.ndarray:
    """Transform a (kT, 7, 7, C, O) stride-(1,2,2) stem kernel into the
    equivalent (kT, 4, 4, 4C, O) stride-1 kernel over space-to-depth input.

    out(y) = sum_dy w[dy+3] * in[2y+dy-3+3]: input index 2y+dy lands in
    2x2 block y + (kb-2) at offset p with dy = 2*kb + p - 1 - 3; taps with
    2*kb+p-1 outside [0, 6] are zero (one per axis).
    """
    kt, kh, kw, c, o = kernel.shape
    assert kh == 7 and kw == 7, "s2d transform is for the 7x7 spatial stem"
    out = jnp.zeros((kt, 4, 4, 4 * c, o), kernel.dtype)
    for kby in range(4):
        for py in range(2):
            yy = 2 * kby + py - 1
            if not 0 <= yy <= 6:
                continue
            for kbx in range(4):
                for px in range(2):
                    xx = 2 * kbx + px - 1
                    if not 0 <= xx <= 6:
                        continue
                    ch = (py * 2 + px) * c
                    out = out.at[:, kby, kbx, ch:ch + c, :].set(
                        kernel[:, yy, xx, :, :])
    return out


class BasicBlock3d(nn.Module):
    """Two 3x3x3 convs + residual (reference models/resnet.py:27-57)."""

    planes: int
    stride: int = 1
    shortcut_type: str = "B"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    expansion: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out_ch = self.planes * self.expansion
        residual = _shortcut(
            x, out_ch, self.stride, self.shortcut_type, self.dtype,
            self.axis_name, train,
        )
        h = Conv3d(self.planes, 3, self.stride, dtype=self.dtype, name="conv1")(x)
        h = BatchNorm(not train, self.axis_name, self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = Conv3d(self.planes, 3, 1, dtype=self.dtype, name="conv2")(h)
        h = BatchNorm(not train, self.axis_name, self.dtype, name="bn2")(h)
        return nn.relu(h + residual)


class Bottleneck3d(nn.Module):
    """1x1x1 -> 3x3x3 -> 1x1x1 bottleneck (reference models/resnet.py:60-96)."""

    planes: int
    stride: int = 1
    shortcut_type: str = "B"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out_ch = self.planes * self.expansion
        residual = _shortcut(
            x, out_ch, self.stride, self.shortcut_type, self.dtype,
            self.axis_name, train,
        )
        h = Conv3d(self.planes, 1, 1, dtype=self.dtype, name="conv1")(x)
        h = BatchNorm(not train, self.axis_name, self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = Conv3d(self.planes, 3, self.stride, dtype=self.dtype, name="conv2")(h)
        h = BatchNorm(not train, self.axis_name, self.dtype, name="bn2")(h)
        h = nn.relu(h)
        h = Conv3d(out_ch, 1, 1, dtype=self.dtype, name="conv3")(h)
        h = BatchNorm(not train, self.axis_name, self.dtype, name="bn3")(h)
        return nn.relu(h + residual)


def _shortcut(x, out_ch, stride, shortcut_type, dtype, axis_name, train):
    """Identity / A (subsample + zero-pad, ref :212-221) / B (conv+BN, ref :230-233)."""
    in_ch = x.shape[-1]
    if stride == 1 and in_ch == out_ch:
        return x
    if shortcut_type == "A":
        # avg_pool3d(kernel=1, stride=s) == strided subsample
        out = x[:, ::stride, ::stride, ::stride, :]
        pad = out_ch - in_ch
        if pad > 0:
            out = jnp.pad(out, ((0, 0),) * 4 + ((0, pad),))
        return out
    h = Conv3d(out_ch, 1, stride, dtype=dtype, name="downsample_conv")(x)
    return BatchNorm(not train, axis_name, dtype, name="downsample_bn")(h)


class ChannelTemporalAttention(nn.Module):
    """Channel-temporal attention (reference models/resnet.py:317-376).

    Spatial avg+max pooled channel descriptors -> shared 2-layer MLP ->
    sigmoid -> two depthwise temporal convs -> sigmoid -> per-(T,C) mask.
    """

    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        d_avg = jnp.mean(x, axis=(2, 3))  # (B, T, C)
        d_max = jnp.max(x, axis=(2, 3))
        fc1 = nn.Dense(c // self.reduction, dtype=self.dtype,
                       param_dtype=jnp.float32, name="fc1")
        fc2 = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")
        m = nn.sigmoid(fc2(fc1(d_avg)) + fc2(fc1(d_max)))  # (B, T, C)
        # two depthwise 1-D temporal convs (groups=C in the reference)
        m = nn.Conv(c, (3,), padding=[(1, 1)], feature_group_count=c,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1d_1")(m)
        m = nn.Conv(c, (3,), padding=[(1, 1)], feature_group_count=c,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1d_2")(m)
        m = nn.sigmoid(m)
        return x * m[:, :, None, None, :]


class SpatioTemporalAttention(nn.Module):
    """Spatio-temporal attention (reference models/resnet.py:379-431).

    Channel avg/max maps -> (1,7,7) conv -> sigmoid -> two 3x3x3 convs ->
    sigmoid -> per-(T,H,W) mask. (Implements the intended max-pool branch;
    the reference reuses avg-pool at :414.)
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_avg = jnp.mean(x, axis=-1, keepdims=True)  # (B,T,H,W,1)
        d_max = jnp.max(x, axis=-1, keepdims=True)
        m = jnp.concatenate([d_avg, d_max], axis=-1)
        m = Conv3d(1, (1, 7, 7), 1, use_bias=True, dtype=self.dtype,
                   name="conv2d")(m)
        m = nn.sigmoid(m)
        m = Conv3d(1, 3, 1, use_bias=True, dtype=self.dtype, name="conv3d_1")(m)
        m = Conv3d(1, 3, 1, use_bias=True, dtype=self.dtype, name="conv3d_2")(m)
        return x * nn.sigmoid(m)


class ResNet3D(nn.Module):
    """The full 3-D ResNet encoder (reference models/resnet.py:100-312).

    Input: (B, T, H, W, C). Output semantics match the reference forward:
      * ``predict_temporal_ds``: returns ``(projection, ds_logits)``
      * ``classifier``: returns class logits (from pooled 512-d features)
      * ``projection_head``: returns the 128-d projection
      * otherwise: the pooled backbone features.
    """

    block: str  # 'basic' | 'bottleneck'
    layers: Sequence[int]
    block_inplanes: Sequence[int] = (64, 128, 256, 512)
    n_input_channels: int = 3
    conv1_t_size: int = 7
    conv1_t_stride: int = 1
    no_max_pool: bool = False
    shortcut_type: str = "B"
    widen_factor: float = 1.0
    hidden_layer: int = 2048
    out_dim: int = 128
    predict_temporal_ds: bool = False
    attention: bool = False
    projection_head: bool = True
    num_classes: int = 101
    classifier: bool = False
    dropout: Optional[float] = None
    stem_s2d: bool = False  # space-to-depth stem (see module docstring)
    remat: bool = False  # rematerialize residual blocks (trade FLOPs for HBM)
    # restrict remat to specific stages (1-based); None = all stages when
    # ``remat``. Stage 1 holds the ~2 GB/activation tensors at 256-clip
    # steps — stage-scoped remat frees most of the HBM for a fraction of
    # the recompute FLOPs (PERF.md round-4 profile)
    remat_stages: Optional[Sequence[int]] = None
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        assert x.ndim == 5, f"expected (B,T,H,W,C), got {x.shape}"
        plain_block_cls = BasicBlock3d if self.block == "basic" \
            else Bottleneck3d
        # activation checkpointing per residual block: backward recomputes
        # the block forward instead of keeping its activations in HBM —
        # what enables the reference's large-batch configs (Kinetics
        # B=104) on a fixed-HBM chip
        # static_argnums counts (scope, x, train): train must stay a
        # python bool so BN's mode stays static under the remat trace
        remat_block_cls = nn.remat(plain_block_cls, static_argnums=(2,))

        def block_for(stage: int):
            if self.remat and (self.remat_stages is None
                               or stage in self.remat_stages):
                return remat_block_cls
            return plain_block_cls

        expansion = plain_block_cls.expansion
        inplanes = [int(p * self.widen_factor) for p in self.block_inplanes]

        x = x.astype(self.dtype)
        if self.stem_s2d:
            # equivalent stem over 2x2-block channels; asymmetric spatial
            # padding (2, 1) handled inside the conv (no materialized pad)
            xs = space_to_depth(x)
            t_pad = self.conv1_t_size // 2
            h = Conv3d(
                inplanes[0],
                (self.conv1_t_size, 4, 4),
                (self.conv1_t_stride, 1, 1),
                padding=((t_pad, t_pad), (2, 1), (2, 1)),
                dtype=self.dtype,
                name="conv1",
            )(xs)
        else:
            h = Conv3d(
                inplanes[0],
                (self.conv1_t_size, 7, 7),
                (self.conv1_t_stride, 2, 2),
                padding=None,  # k//2 per dim == torch padding (t//2, 3, 3)
                dtype=self.dtype,
                name="conv1",
            )(x)
        h = BatchNorm(not train, self.axis_name, self.dtype, name="bn1")(h)
        h = nn.relu(h)
        if not self.no_max_pool:
            h = max_pool3d(h)

        for stage, (planes, blocks) in enumerate(zip(inplanes, self.layers), 1):
            stride = 1 if stage == 1 else 2
            for b in range(blocks):
                h = block_for(stage)(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    shortcut_type=self.shortcut_type,
                    dtype=self.dtype,
                    axis_name=self.axis_name,
                    name=f"layer{stage}_{b}",
                )(h, train)  # positional: remat static_argnums needs it
            if self.attention:
                h = ChannelTemporalAttention(
                    dtype=self.dtype, name=f"channel_temporal_attention{stage}"
                )(h)
                h = SpatioTemporalAttention(
                    dtype=self.dtype, name=f"spatio_temporal_attention{stage}"
                )(h)

        feat = global_avg_pool(h)  # (B, C_out)

        proj = None
        if self.projection_head:
            proj = ProjectionHead(
                self.hidden_layer, self.out_dim, self.dtype, self.axis_name,
                name="projection",
            )(feat, train=train)

        if self.predict_temporal_ds:
            ds_logits = nn.Dense(4, dtype=self.dtype, param_dtype=jnp.float32,
                                 name="temporal_ds_linear")(feat)
            return proj, ds_logits

        if self.classifier:
            cls_in = feat
            if self.dropout is not None and self.dropout > 0.0:
                cls_in = nn.Dropout(self.dropout, deterministic=not train)(cls_in)
            return nn.Dense(
                self.num_classes, dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=nn.initializers.normal(0.01),
                bias_init=nn.initializers.zeros,
                name="linear",
            )(cls_in)

        return proj if self.projection_head else feat


_DEPTH_TO_SPEC = {
    10: ("basic", (1, 1, 1, 1)),
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
    200: ("bottleneck", (3, 24, 36, 3)),
}


def generate_model(model_depth: int, **kwargs) -> ResNet3D:
    """Depth -> model (reference models/resnet.py:436-456)."""
    assert model_depth in _DEPTH_TO_SPEC, f"unsupported depth {model_depth}"
    block, layers = _DEPTH_TO_SPEC[model_depth]
    return ResNet3D(block=block, layers=layers, **kwargs)


def backbone_feature_dim(model_depth: int, widen_factor: float = 1.0) -> int:
    block, _ = _DEPTH_TO_SPEC[model_depth]
    expansion = 1 if block == "basic" else 4
    return int(512 * widen_factor) * expansion
