"""SlowFast two-pathway video network in flax, channels-last.

Capability parity with the vendored pyslowfast subset the reference uses
(models/slowfast/slowfast/models/): VideoModelStem (stem_helper.py:9-178),
ResStage/ResBlock/BottleneckTransform/BasicTransform (resnet_helper.py:25-561),
FuseFastToSlow lateral connections (video_model_builder.py:78-137),
Nonlocal blocks (nonlocal_helper.py:10-148), the pool-only
ResNetBasicHeadNoClassify (head_helper.py:223-297) and classifier
ResNetBasicHead (head_helper.py:133-220), the SlowFast classifier network
(video_model_builder.py:139-402), the single-pathway ResNet
(video_model_builder.py:404-596: arch 'slow'/'i3d'/'c2d'), and
SlowFastRepresentation = stages + fusion + pool + optional 2048->128
projection (video_model_builder.py:598-885).

The dual-pathway input split (slow = every alpha-th frame) is a device-side
temporal stride, see :func:`multipathway_input`
(reference models/model_utils.py:130-146).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, Conv3d, global_avg_pool

Dtype = Any

# Temporal kernel basis per arch (video_model_builder.py:23-66).
TEMPORAL_KERNEL_BASIS = {
    "c2d": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "c2d_nopool": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "i3d": [[[5]], [[3]], [[3, 1]], [[3, 1]], [[1, 3]]],
    "i3d_nopool": [[[5]], [[3]], [[3, 1]], [[3, 1]], [[1, 3]]],
    "slow": [[[1]], [[1]], [[1]], [[3]], [[3]]],
    "slowfast": [[[1], [5]], [[1], [3]], [[1], [3]], [[3], [3]], [[3], [3]]],
}

# Pool after s2 per arch (video_model_builder.py:68-75).
POOL1 = {
    "c2d": [[2, 1, 1]],
    "c2d_nopool": [[1, 1, 1]],
    "i3d": [[2, 1, 1]],
    "i3d_nopool": [[1, 1, 1]],
    "slow": [[1, 1, 1]],
    "slowfast": [[1, 1, 1], [1, 1, 1]],
}

MODEL_STAGE_DEPTH = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def multipathway_input(frames: jnp.ndarray, alpha: int,
                       fast_mask: bool = False) -> List[jnp.ndarray]:
    """(B,T,H,W,C) clip -> [slow, fast] pathway inputs.

    Fast gets all T frames; slow gets T//alpha frames sampled with the
    reference's linspace indexing (models/model_utils.py:130-146 uses
    ``linspace(0, T-1, T//alpha).long()``, not a plain stride). With
    ``fast_mask`` the 4th channel is routed (replicated 3x) to the fast
    pathway and RGB to the slow pathway (:139-143).
    """
    t = frames.shape[1]
    idx = jnp.linspace(0, t - 1, t // alpha).astype(jnp.int32)
    slow = jnp.take(frames, idx, axis=1)
    fast = frames
    if fast_mask:
        slow = slow[..., :3]
        mask = frames[..., 3:4]
        fast = jnp.concatenate([mask, mask, mask], axis=-1)
    return [slow, fast]


class Nonlocal(nn.Module):
    """Non-local block (reference nonlocal_helper.py:10-148).

    theta/phi/g 1x1x1 projections to dim//2, affinity theta @ phi^T
    (dot_product: scaled by 1/N; softmax: scaled by dim_inner^-0.5 then
    softmax), output conv + zero-init BN, residual add. Optional spatial
    max-pool on phi/g.
    """

    instantiation: str = "dot_product"
    pool_size: Optional[Sequence[int]] = None
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, h, w, c = x.shape
        dim_inner = c // 2
        theta = Conv3d(dim_inner, 1, 1, dtype=self.dtype, name="theta")(x)
        phi_in = g_in = x
        if self.pool_size is not None and any(s > 1 for s in self.pool_size):
            ps = tuple(self.pool_size)
            phi_in = nn.max_pool(x, ps, strides=ps)
            g_in = phi_in
        phi = Conv3d(dim_inner, 1, 1, dtype=self.dtype, name="phi")(phi_in)
        g = Conv3d(dim_inner, 1, 1, dtype=self.dtype, name="g")(g_in)

        theta_f = theta.reshape(b, -1, dim_inner)
        phi_f = phi.reshape(b, -1, dim_inner)
        g_f = g.reshape(b, -1, dim_inner)

        aff = jnp.einsum("bnd,bmd->bnm", theta_f, phi_f,
                         preferred_element_type=jnp.float32)
        if self.instantiation == "softmax":
            aff = nn.softmax(aff * (dim_inner ** -0.5), axis=-1)
        else:  # dot_product
            aff = aff / aff.shape[-1]
        out = jnp.einsum("bnm,bmd->bnd", aff.astype(self.dtype), g_f)
        out = out.reshape(b, t, h, w, dim_inner)
        out = Conv3d(c, 1, 1, dtype=self.dtype, name="out_conv")(out)
        # zero-init final BN so the block starts as identity
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=jnp.float32,
            scale_init=nn.initializers.zeros, axis_name=self.axis_name,
            name="bn",
        )(out.astype(jnp.float32)).astype(self.dtype)
        return x + out


class BasicTransform(nn.Module):
    """(T,3,3) -> (1,3,3) transform (reference resnet_helper.py:25-108)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        tk = self.temp_kernel_size
        h = Conv3d(self.dim_out, (tk, 3, 3), (1, self.stride, self.stride),
                   padding=(tk // 2, 1, 1), dtype=self.dtype, name="a")(x)
        h = BatchNorm(not train, self.axis_name, self.dtype, name="a_bn")(h)
        h = nn.relu(h)
        h = Conv3d(self.dim_out, (1, 3, 3), 1, padding=(0, 1, 1),
                   dtype=self.dtype, name="b")(h)
        return BatchNorm(not train, self.axis_name, self.dtype, name="b_bn")(h)


class BottleneckTransform(nn.Module):
    """Tx1x1 -> 1x3x3 -> 1x1x1 transform (reference resnet_helper.py:110-240)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int = 1
    stride_1x1: bool = False
    dilation: int = 1
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        str1x1, str3x3 = (self.stride, 1) if self.stride_1x1 else (1, self.stride)
        tk = self.temp_kernel_size
        h = Conv3d(self.dim_inner, (tk, 1, 1), (1, str1x1, str1x1),
                   padding=(tk // 2, 0, 0), dtype=self.dtype, name="a")(x)
        h = BatchNorm(not train, self.axis_name, self.dtype, name="a_bn")(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.dim_inner, (1, 3, 3), strides=(1, str3x3, str3x3),
            padding=[(0, 0), (self.dilation, self.dilation),
                     (self.dilation, self.dilation)],
            kernel_dilation=(1, self.dilation, self.dilation),
            feature_group_count=self.num_groups, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            name="b",
        )(h)
        h = BatchNorm(not train, self.axis_name, self.dtype, name="b_bn")(h)
        h = nn.relu(h)
        h = Conv3d(self.dim_out, 1, 1, dtype=self.dtype, name="c")(h)
        # final BN of the transform (zero-init per ZERO_INIT_FINAL_BN)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=jnp.float32,
            scale_init=nn.initializers.zeros, axis_name=self.axis_name,
            name="c_bn",
        )(h.astype(jnp.float32)).astype(self.dtype)


class ResBlock(nn.Module):
    """Residual block: shortcut + transform (reference resnet_helper.py:243-342)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int = 1
    trans_func: str = "bottleneck_transform"
    dilation: int = 1
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        if x.shape[-1] != self.dim_out or self.stride != 1:
            shortcut = Conv3d(self.dim_out, 1, (1, self.stride, self.stride),
                              dtype=self.dtype, name="branch1")(x)
            shortcut = BatchNorm(not train, self.axis_name, self.dtype,
                                 name="branch1_bn")(shortcut)
        if self.trans_func == "bottleneck_transform":
            h = BottleneckTransform(
                self.dim_out, self.temp_kernel_size, self.stride,
                self.dim_inner, self.num_groups, dilation=self.dilation,
                dtype=self.dtype, axis_name=self.axis_name, name="branch2",
            )(x, train=train)
        else:
            h = BasicTransform(
                self.dim_out, self.temp_kernel_size, self.stride,
                dtype=self.dtype, axis_name=self.axis_name, name="branch2",
            )(x, train=train)
        return nn.relu(shortcut + h)


class ResStage(nn.Module):
    """One pathway of one stage (reference resnet_helper.py:345-561).

    ``temp_kernel_sizes`` cycles over blocks; blocks past
    ``num_block_temp_kernel`` use temporal kernel 1. Nonlocal blocks are
    inserted after the block indices in ``nonlocal_inds``.
    """

    dim_out: int
    dim_inner: int
    temp_kernel_sizes: Sequence[int]
    stride: int
    num_blocks: int
    num_groups: int = 1
    num_block_temp_kernel: Optional[int] = None
    nonlocal_inds: Sequence[int] = ()
    nonlocal_pool: Optional[Sequence[int]] = None
    instantiation: str = "dot_product"
    trans_func: str = "bottleneck_transform"
    dilation: int = 1
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nbtk = (self.num_blocks if self.num_block_temp_kernel is None
                else self.num_block_temp_kernel)
        tks = (list(self.temp_kernel_sizes) * self.num_blocks)[:nbtk] + [1] * (
            self.num_blocks - nbtk
        )
        for i in range(self.num_blocks):
            x = ResBlock(
                dim_out=self.dim_out,
                temp_kernel_size=tks[i],
                stride=self.stride if i == 0 else 1,
                dim_inner=self.dim_inner,
                num_groups=self.num_groups,
                trans_func=self.trans_func,
                dilation=self.dilation,
                dtype=self.dtype,
                axis_name=self.axis_name,
                name=f"res{i}",
            )(x, train=train)
            if i in self.nonlocal_inds:
                x = Nonlocal(
                    instantiation=self.instantiation,
                    pool_size=self.nonlocal_pool,
                    dtype=self.dtype,
                    axis_name=self.axis_name,
                    name=f"nonlocal{i}",
                )(x, train=train)
        return x


class VideoModelStem(nn.Module):
    """Single-pathway stem: conv(T,7,7)/(1,2,2) + BN + ReLU + spatial max-pool
    (reference stem_helper.py:9-178)."""

    dim_out: int
    temp_kernel: int
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        tk = self.temp_kernel
        h = Conv3d(self.dim_out, (tk, 7, 7), (1, 2, 2), padding=(tk // 2, 3, 3),
                   dtype=self.dtype, name="conv")(x)
        h = BatchNorm(not train, self.axis_name, self.dtype, name="bn")(h)
        h = nn.relu(h)
        return nn.max_pool(h, (1, 3, 3), strides=(1, 2, 2),
                           padding=[(0, 0), (1, 1), (1, 1)])


class FuseFastToSlow(nn.Module):
    """Lateral fast->slow fusion (reference video_model_builder.py:78-137)."""

    fusion_conv_channel_ratio: int
    fusion_kernel: int
    alpha: int
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], train: bool = False):
        x_s, x_f = x
        fuse = Conv3d(
            x_f.shape[-1] * self.fusion_conv_channel_ratio,
            (self.fusion_kernel, 1, 1),
            (self.alpha, 1, 1),
            padding=(self.fusion_kernel // 2, 0, 0),
            dtype=self.dtype,
            name="conv_f2s",
        )(x_f)
        fuse = BatchNorm(not train, self.axis_name, self.dtype, name="bn")(fuse)
        fuse = nn.relu(fuse)
        return [jnp.concatenate([x_s, fuse], axis=-1), x_f]


class SlowFast(nn.Module):
    """Two-pathway SlowFast network (reference video_model_builder.py:139-402
    for the classifier net, :598-885 for the representation net).

    Input: list [slow, fast] of (B,T,H,W,C) (see :func:`multipathway_input`).
    Output: 128-d projection when ``projection_head``; class logits when
    ``classifier``; else the pooled concat feature (2048 + 2048/beta_inv).
    """

    depth: int = 50
    alpha: int = 4
    beta_inv: int = 8
    fusion_conv_channel_ratio: int = 2
    fusion_kernel_sz: int = 7
    width_per_group: int = 64
    num_groups: int = 1
    input_channels: Tuple[int, int] = (3, 3)
    nonlocal_location: Sequence[Sequence[Sequence[int]]] = (
        ((), ()), ((), ()), ((), ()), ((), ()),
    )
    nonlocal_instantiation: str = "dot_product"
    trans_func: str = "bottleneck_transform"
    projection_head: bool = True
    projection1_out: int = 2048
    projection2_out: int = 128
    classifier: bool = False
    num_classes: int = 400
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], train: bool = False):
        assert isinstance(x, (list, tuple)) and len(x) == 2, \
            "SlowFast expects [slow, fast] inputs"
        d2, d3, d4, d5 = MODEL_STAGE_DEPTH[self.depth]
        w = self.width_per_group
        b_inv = self.beta_inv
        dim_inner = self.num_groups * w
        out_dim_ratio = b_inv // self.fusion_conv_channel_ratio
        temp_kernel = TEMPORAL_KERNEL_BASIS["slowfast"]
        args = dict(dtype=self.dtype, axis_name=self.axis_name)

        # s1: stems + fuse
        paths = [
            VideoModelStem(w, temp_kernel[0][0][0], name="s1_pathway0_stem",
                           **args)(x[0].astype(self.dtype), train),
            VideoModelStem(w // b_inv, temp_kernel[0][1][0],
                           name="s1_pathway1_stem", **args)(
                x[1].astype(self.dtype), train),
        ]
        paths = FuseFastToSlow(self.fusion_conv_channel_ratio,
                               self.fusion_kernel_sz, self.alpha,
                               name="s1_fuse", **args)(paths, train)

        stage_dims = [
            # (dim_out_slow, n_blocks)
            (w * 4, d2),
            (w * 8, d3),
            (w * 16, d4),
            (w * 32, d5),
        ]
        for s, (dim_out, n_blocks) in enumerate(stage_dims, 2):
            stride = 1 if s == 2 else 2
            inner = dim_inner * (2 ** (s - 2))
            new_paths = []
            for p, (pdim_out, pinner) in enumerate(
                [(dim_out, inner), (dim_out // b_inv, inner // b_inv)]
            ):
                nl_inds = tuple(self.nonlocal_location[s - 2][p])
                new_paths.append(
                    ResStage(
                        dim_out=pdim_out,
                        dim_inner=pinner,
                        temp_kernel_sizes=temp_kernel[s - 1][p],
                        stride=stride,
                        num_blocks=n_blocks,
                        num_groups=self.num_groups,
                        nonlocal_inds=nl_inds,
                        instantiation=self.nonlocal_instantiation,
                        trans_func=self.trans_func,
                        name=f"s{s}_pathway{p}",
                        **args,
                    )(paths[p], train=train)
                )
            paths = new_paths
            if s < 5:
                paths = FuseFastToSlow(
                    self.fusion_conv_channel_ratio, self.fusion_kernel_sz,
                    self.alpha, name=f"s{s}_fuse", **args,
                )(paths, train)
            # pathway pool after s2 is identity for slowfast (POOL1 = 1,1,1)

        # head: per-pathway global average pool + concat
        # (ResNetBasicHeadNoClassify, head_helper.py:223-297 — the explicit
        # pool_size there exactly covers the feature map, i.e. global mean)
        feat = jnp.concatenate([global_avg_pool(p) for p in paths], axis=-1)

        if self.classifier:
            h = feat
            if self.dropout_rate > 0.0:
                h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
            return nn.Dense(self.num_classes, dtype=self.dtype,
                            param_dtype=jnp.float32, name="head_projection")(h)

        if self.projection_head:
            h = nn.Dense(self.projection1_out, dtype=self.dtype,
                         param_dtype=jnp.float32, name="fc1")(feat)
            h = nn.relu(h)
            return nn.Dense(self.projection2_out, dtype=self.dtype,
                            param_dtype=jnp.float32, name="fc2")(h)
        return feat


class SinglePathwayResNet(nn.Module):
    """Single-pathway video ResNet: arch 'slow' / 'i3d' / 'c2d'
    (reference video_model_builder.py:404-596)."""

    arch: str = "slow"
    depth: int = 50
    width_per_group: int = 64
    num_groups: int = 1
    input_channels: int = 3
    trans_func: str = "bottleneck_transform"
    num_classes: int = 400
    classifier: bool = False
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        d2, d3, d4, d5 = MODEL_STAGE_DEPTH[self.depth]
        w = self.width_per_group
        dim_inner = self.num_groups * w
        temp_kernel = TEMPORAL_KERNEL_BASIS[self.arch]
        pool1 = POOL1[self.arch][0]
        args = dict(dtype=self.dtype, axis_name=self.axis_name)

        h = VideoModelStem(w, temp_kernel[0][0][0], name="s1_pathway0_stem",
                           **args)(x.astype(self.dtype), train)
        for s, (dim_out, n_blocks) in enumerate(
            [(w * 4, d2), (w * 8, d3), (w * 16, d4), (w * 32, d5)], 2
        ):
            h = ResStage(
                dim_out=dim_out,
                dim_inner=dim_inner * (2 ** (s - 2)),
                temp_kernel_sizes=temp_kernel[s - 1][0],
                stride=1 if s == 2 else 2,
                num_blocks=n_blocks,
                num_groups=self.num_groups,
                trans_func=self.trans_func,
                name=f"s{s}_pathway0",
                **args,
            )(h, train=train)
            if s == 2 and any(p > 1 for p in pool1):
                h = nn.max_pool(h, tuple(pool1), strides=tuple(pool1))

        feat = global_avg_pool(h)
        if self.classifier:
            if self.dropout_rate > 0.0:
                feat = nn.Dropout(self.dropout_rate,
                                  deterministic=not train)(feat)
            return nn.Dense(self.num_classes, dtype=self.dtype,
                            param_dtype=jnp.float32, name="head_projection")(feat)
        return feat
