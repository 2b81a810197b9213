"""Checkpoint-fidelity gold tests for the S3D / R3D / SlowFast torch
importers (VERDICT round-1 item 4): a torch forward must match the flax
model once its state_dict passes through the conversion shim.

The torch nets are built here from torch primitives with the reference
naming schemes (models/s3d/s3dg.py, models/r3d/r3d.py, vendored pyslowfast
video_model_builder.py) — independent re-creations for testing, not
reference code.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from video_similarity_search_tpu.models.heads import (  # noqa: E402
    R3DEmbedder, S3DEmbedder)
from video_similarity_search_tpu.models.slowfast import (  # noqa: E402
    SlowFast, multipathway_input)
from video_similarity_search_tpu.train.checkpoint import (  # noqa: E402
    torch_r3d_to_flax, torch_s3d_to_flax, torch_slowfast_to_flax)


def _randomize_bn(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (nn.BatchNorm3d, nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.05)


def _to_flax_video(x):  # torch (B,C,T,H,W) -> flax (B,T,H,W,C)
    return jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))


# ---------------------------------------------------------------- S3D ----

class TBasicConv3d(nn.Module):
    def __init__(self, cin, cout, k=1, s=1, p=0):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, k, s, p, bias=False)
        self.bn = nn.BatchNorm3d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TSTConv3d(nn.Module):
    def __init__(self, cin, cout, k, s, p=0):
        super().__init__()
        ts = s[0] if isinstance(s, tuple) else s
        ss = s[-1] if isinstance(s, tuple) else s
        self.conv1 = nn.Conv3d(cin, cout, (1, k, k), (1, ss, ss),
                               (0, p, p), bias=False)
        self.conv2 = nn.Conv3d(cout, cout, (k, 1, 1), (ts, 1, 1),
                               (p, 0, 0), bias=False)
        self.bn1 = nn.BatchNorm3d(cout)
        self.bn2 = nn.BatchNorm3d(cout)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        return torch.relu(self.bn2(self.conv2(x)))


class TSepInception(nn.Module):
    def __init__(self, cin, out):
        super().__init__()
        b0, b1a, b1b, b2a, b2b, b3b = out
        self.branch0 = nn.Sequential(TBasicConv3d(cin, b0))
        self.branch1 = nn.Sequential(TBasicConv3d(cin, b1a),
                                     TSTConv3d(b1a, b1b, 3, 1, 1))
        self.branch2 = nn.Sequential(TBasicConv3d(cin, b2a),
                                     TSTConv3d(b2a, b2b, 3, 1, 1))
        self.branch3 = nn.Sequential(
            nn.MaxPool3d(3, stride=1, padding=1), TBasicConv3d(cin, b3b))

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x),
                          self.branch2(x), self.branch3(x)], 1)


class TS3D(nn.Module):
    """Reference-named S3D (models/s3d/s3dg.py:135-217), gating off."""

    def __init__(self):
        super().__init__()
        self.Conv_1a = TSTConv3d(3, 64, 7, 2, 3)
        self.Conv_2b = TBasicConv3d(64, 64)
        self.Conv_2c = TSTConv3d(64, 192, 3, 1, 1)
        self.Mixed_3b = TSepInception(192, [64, 96, 128, 16, 32, 32])
        self.Mixed_3c = TSepInception(256, [128, 128, 192, 32, 96, 64])
        self.Mixed_4b = TSepInception(480, [192, 96, 208, 16, 48, 64])
        self.Mixed_4c = TSepInception(512, [160, 112, 224, 24, 64, 64])
        self.Mixed_4d = TSepInception(512, [128, 128, 256, 24, 64, 64])
        self.Mixed_4e = TSepInception(512, [112, 144, 288, 32, 64, 64])
        self.Mixed_4f = TSepInception(528, [256, 160, 320, 32, 128, 128])
        self.Mixed_5b = TSepInception(832, [256, 160, 320, 32, 128, 128])
        self.Mixed_5c = TSepInception(832, [384, 192, 384, 48, 128, 128])
        self.pool2 = nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1))
        self.pool3 = nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1))
        self.pool4 = nn.MaxPool3d(3, 2, 1)
        self.pool5 = nn.MaxPool3d(2, 2, 0)

    def forward(self, x):
        h = self.Conv_1a(x)
        h = self.Conv_2c(self.Conv_2b(self.pool2(h)))
        h = self.Mixed_3c(self.Mixed_3b(self.pool3(h)))
        h = self.Mixed_4b(self.pool4(h))
        h = self.Mixed_4f(self.Mixed_4e(self.Mixed_4d(self.Mixed_4c(h))))
        return self.Mixed_5c(self.Mixed_5b(self.pool5(h)))


def test_s3d_embedder_torch_parity():
    """'s3d' arch Sequential(backbone, pool, 1x1conv, relu, 1x1conv)
    (reference models/model_utils.py:76-85)."""
    torch.manual_seed(0)
    tnet = nn.Sequential(
        TS3D(), nn.AdaptiveAvgPool3d(1),
        nn.Conv3d(1024, 1024, 1, bias=True), nn.ReLU(),
        nn.Conv3d(1024, 128, 1, bias=True), nn.Flatten()).eval()
    _randomize_bn(tnet)

    x = np.random.default_rng(0).normal(
        size=(2, 3, 8, 64, 64)).astype(np.float32)
    with torch.no_grad():
        expect = tnet(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, stats = torch_s3d_to_flax(sd)
    fmodel = S3DEmbedder(dim=128)
    got = fmodel.apply({"params": params, "batch_stats": stats},
                       _to_flax_video(x), train=False)
    np.testing.assert_allclose(np.asarray(got), expect, atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------- R3D ----

class TSTConv(nn.Module):  # reference SpatioTemporalConv wrapper
    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.temporal_spatial_conv = nn.Conv3d(cin, cout, k, stride, padding,
                                               bias=False)

    def forward(self, x):
        return self.temporal_spatial_conv(x)


class TResBlock(nn.Module):
    def __init__(self, cin, cout, downsample=False):
        super().__init__()
        self.downsample = downsample
        if downsample:
            self.downsampleconv = TSTConv(cin, cout, 1, stride=2)
            self.downsamplebn = nn.BatchNorm3d(cout)
            self.conv1 = TSTConv(cin, cout, 3, stride=2, padding=1)
        else:
            self.conv1 = TSTConv(cin, cout, 3, padding=1)
        self.bn1 = nn.BatchNorm3d(cout)
        self.conv2 = TSTConv(cout, cout, 3, padding=1)
        self.bn2 = nn.BatchNorm3d(cout)

    def forward(self, x):
        res = torch.relu(self.bn1(self.conv1(x)))
        res = self.bn2(self.conv2(res))
        if self.downsample:
            x = self.downsamplebn(self.downsampleconv(x))
        return torch.relu(x + res)


class TResLayer(nn.Module):
    def __init__(self, cin, cout, n, downsample=False):
        super().__init__()
        self.block1 = TResBlock(cin, cout, downsample)
        self.blocks = nn.ModuleList(
            [TResBlock(cout, cout) for _ in range(n - 1)])

    def forward(self, x):
        x = self.block1(x)
        for b in self.blocks:
            x = b(x)
        return x


class TR3DNet(nn.Module):
    def __init__(self, layer_sizes=(1, 1, 1, 1)):
        super().__init__()
        self.conv1 = TSTConv(3, 64, (3, 7, 7), (1, 2, 2), (1, 3, 3))
        self.bn1 = nn.BatchNorm3d(64)
        self.conv2 = TResLayer(64, 64, layer_sizes[0])
        self.conv3 = TResLayer(64, 128, layer_sizes[1], True)
        self.conv4 = TResLayer(128, 256, layer_sizes[2], True)
        self.conv5 = TResLayer(256, 512, layer_sizes[3], True)
        self.pool = nn.AdaptiveAvgPool3d(1)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.conv5(self.conv4(self.conv3(self.conv2(x))))
        return self.pool(x).flatten(1)


def test_r3d_embedder_torch_parity():
    """'r3d' arch Sequential(backbone, Linear, ReLU, Linear)
    (reference models/model_utils.py:87-95)."""
    torch.manual_seed(1)
    tnet = nn.Sequential(TR3DNet(), nn.Linear(512, 512), nn.ReLU(),
                         nn.Linear(512, 128)).eval()
    _randomize_bn(tnet)

    x = np.random.default_rng(1).normal(
        size=(2, 3, 8, 32, 32)).astype(np.float32)
    with torch.no_grad():
        expect = tnet(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, stats = torch_r3d_to_flax(sd)
    got = R3DEmbedder(dim=128).apply(
        {"params": params, "batch_stats": stats}, _to_flax_video(x),
        train=False)
    np.testing.assert_allclose(np.asarray(got), expect, atol=5e-4, rtol=1e-3)


# ----------------------------------------------------------- SlowFast ----

ALPHA, BINV, RATIO, FK = 4, 8, 2, 7


class TStem(nn.Module):
    def __init__(self, cin, cout, tk):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, (tk, 7, 7), (1, 2, 2),
                              (tk // 2, 3, 3), bias=False)
        self.bn = nn.BatchNorm3d(cout)
        self.pool = nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1))

    def forward(self, x):
        return self.pool(torch.relu(self.bn(self.conv(x))))


class TS1(nn.Module):
    def __init__(self):
        super().__init__()
        self.pathway0_stem = TStem(3, 64, 1)
        self.pathway1_stem = TStem(3, 64 // BINV, 5)

    def forward(self, x):
        return [self.pathway0_stem(x[0]), self.pathway1_stem(x[1])]


class TFuse(nn.Module):
    def __init__(self, cf):
        super().__init__()
        self.conv_f2s = nn.Conv3d(cf, cf * RATIO, (FK, 1, 1), (ALPHA, 1, 1),
                                  (FK // 2, 0, 0), bias=False)
        self.bn = nn.BatchNorm3d(cf * RATIO)

    def forward(self, x):
        xs, xf = x
        fuse = torch.relu(self.bn(self.conv_f2s(xf)))
        return [torch.cat([xs, fuse], 1), xf]


class TBottleneckBlock(nn.Module):
    def __init__(self, cin, cout, inner, tk, stride):
        super().__init__()
        if cin != cout or stride != 1:
            self.branch1 = nn.Conv3d(cin, cout, 1, (1, stride, stride),
                                     bias=False)
            self.branch1_bn = nn.BatchNorm3d(cout)
        self.branch2 = nn.Module()
        self.branch2.a = nn.Conv3d(cin, inner, (tk, 1, 1), 1,
                                   (tk // 2, 0, 0), bias=False)
        self.branch2.a_bn = nn.BatchNorm3d(inner)
        self.branch2.b = nn.Conv3d(inner, inner, (1, 3, 3),
                                   (1, stride, stride), (0, 1, 1), bias=False)
        self.branch2.b_bn = nn.BatchNorm3d(inner)
        self.branch2.c = nn.Conv3d(inner, cout, 1, 1, bias=False)
        self.branch2.c_bn = nn.BatchNorm3d(cout)

    def forward(self, x):
        h = torch.relu(self.branch2.a_bn(self.branch2.a(x)))
        h = torch.relu(self.branch2.b_bn(self.branch2.b(h)))
        h = self.branch2.c_bn(self.branch2.c(h))
        s = self.branch1_bn(self.branch1(x)) if hasattr(self, "branch1") \
            else x
        return torch.relu(s + h)


class TStage(nn.Module):
    def __init__(self, cins, couts, inners, tks, n_blocks, stride):
        super().__init__()
        for p in range(2):
            cin = cins[p]
            for i in range(n_blocks):
                block = TBottleneckBlock(cin, couts[p], inners[p], tks[p],
                                         stride if i == 0 else 1)
                setattr(self, f"pathway{p}_res{i}", block)
                cin = couts[p]
        self.n_blocks = n_blocks

    def forward(self, x):
        out = []
        for p in range(2):
            h = x[p]
            for i in range(self.n_blocks):
                h = getattr(self, f"pathway{p}_res{i}")(h)
            out.append(h)
        return out


class TSlowFastRep(nn.Module):
    """Reference SlowFastRepresentation (video_model_builder.py:598-885),
    depth 50, width 64, fc1/fc2 projection."""

    def __init__(self):
        super().__init__()
        w, b = 64, BINV
        depths = (3, 4, 6, 3)
        tks = [(1, 3), (1, 3), (3, 3), (3, 3)]
        self.s1 = TS1()
        self.s1_fuse = TFuse(w // b)
        cin_s = w + w // b * RATIO
        cin_f = w // b
        for s, (d, tk) in enumerate(zip(depths, tks), 2):
            inner = w * (2 ** (s - 2))
            cout = w * 4 * (2 ** (s - 2))
            stage = TStage((cin_s, cin_f), (cout, cout // b),
                           (inner, inner // b), tk, d,
                           1 if s == 2 else 2)
            setattr(self, f"s{s}", stage)
            if s < 5:
                setattr(self, f"s{s}_fuse", TFuse(cout // b))
                cin_s = cout + cout // b * RATIO
            else:
                cin_s = cout
            cin_f = cout // b
        feat = w * 32 + w * 32 // b
        self.fc1 = nn.Linear(feat, 2048)
        self.fc2 = nn.Linear(2048, 128)

    def forward(self, x):
        x = self.s1_fuse(self.s1(x))
        x = self.s2_fuse(self.s2(x))
        x = self.s3_fuse(self.s3(x))
        x = self.s4_fuse(self.s4(x))
        x = self.s5(x)
        feat = torch.cat([p.mean(dim=(2, 3, 4)) for p in x], 1)
        return self.fc2(torch.relu(self.fc1(feat)))


def test_slowfast_torch_parity():
    torch.manual_seed(2)
    tnet = TSlowFastRep().eval()
    _randomize_bn(tnet)

    x = np.random.default_rng(2).normal(
        size=(1, 3, 8, 32, 32)).astype(np.float32)
    xt = torch.from_numpy(x)
    # reference multipathway split (models/model_utils.py:130-146)
    idx = torch.linspace(0, x.shape[2] - 1, x.shape[2] // ALPHA).long()
    with torch.no_grad():
        expect = tnet([xt.index_select(2, idx), xt]).numpy()

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, stats = torch_slowfast_to_flax(sd)
    fmodel = SlowFast(depth=50, alpha=ALPHA, beta_inv=BINV,
                      fusion_conv_channel_ratio=RATIO, fusion_kernel_sz=FK,
                      projection_head=True, projection2_out=128)
    paths = multipathway_input(_to_flax_video(x), ALPHA)
    got = fmodel.apply({"params": params, "batch_stats": stats}, paths,
                       train=False)
    np.testing.assert_allclose(np.asarray(got), expect, atol=1e-3, rtol=1e-3)
