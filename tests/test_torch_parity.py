"""Checkpoint-fidelity gold test: a torch 3D-ResNet forward must match our
flax model once its state dict is imported through the shim
(SURVEY §7.2 step 10: same checkpoint -> same embeddings -> same ranks).

The torch net here is built from torch primitives with the kenshohara
naming scheme (conv1/bn1/layerX.Y.convZ/fc1/bn_proj/fc2) — independent
re-creation for testing, not reference code.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from video_similarity_search_tpu.models import generate_model  # noqa: E402
from video_similarity_search_tpu.train.checkpoint import (  # noqa: E402
    torch_resnet3d_to_flax)


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv3d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm3d(cout)
        self.conv2 = nn.Conv3d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm3d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv3d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm3d(cout))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return torch.relu(h + r)


class TorchR3D10(nn.Module):
    """Depth-10 layout: one BasicBlock per stage, conv1 (7,7,7)/(1,2,2),
    no max-pool, projection head fc1->bn_proj->relu->fc2."""

    def __init__(self, out_dim=16, hidden=32):
        super().__init__()
        self.conv1 = nn.Conv3d(3, 64, (7, 7, 7), (1, 2, 2), (3, 3, 3),
                               bias=False)
        self.bn1 = nn.BatchNorm3d(64)
        self.layer1 = nn.Sequential(TorchBasicBlock(64, 64))
        self.layer2 = nn.Sequential(TorchBasicBlock(64, 128, 2))
        self.layer3 = nn.Sequential(TorchBasicBlock(128, 256, 2))
        self.layer4 = nn.Sequential(TorchBasicBlock(256, 512, 2))
        self.fc1 = nn.Linear(512, hidden)
        self.bn_proj = nn.BatchNorm1d(hidden)
        self.fc2 = nn.Linear(hidden, out_dim)

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.layer4(self.layer3(self.layer2(self.layer1(h))))
        h = h.mean(dim=(2, 3, 4))
        h = torch.relu(self.bn_proj(self.fc1(h)))
        return self.fc2(h)


def test_torch_import_forward_parity():
    torch.manual_seed(0)
    tnet = TorchR3D10().eval()
    # randomize BN running stats so the test exercises them
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, (nn.BatchNorm3d, nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    x = np.random.default_rng(0).normal(
        size=(2, 3, 4, 16, 16)).astype(np.float32)  # torch (B,C,T,H,W)
    with torch.no_grad():
        expect = tnet(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, stats = torch_resnet3d_to_flax(sd)

    fmodel = generate_model(10, no_max_pool=True, hidden_layer=32,
                            out_dim=16)
    x_flax = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # (B,T,H,W,C)
    got = fmodel.apply({"params": params, "batch_stats": stats}, x_flax,
                       train=False)
    np.testing.assert_allclose(np.asarray(got), expect, atol=2e-4, rtol=1e-3)


def test_same_checkpoint_same_retrieval_ranks():
    """The BASELINE.json fidelity criterion: the same checkpoint must
    reproduce the same retrieval RANKS. Embed the same clips through the
    torch net and the imported flax net and compare the full neighbor
    ordering."""
    from video_similarity_search_tpu.ops.pdist import topk_neighbors

    torch.manual_seed(3)
    tnet = TorchR3D10().eval()
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, (nn.BatchNorm3d, nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    clips = np.random.default_rng(3).normal(
        size=(12, 3, 4, 16, 16)).astype(np.float32)
    with torch.no_grad():
        t_emb = tnet(torch.from_numpy(clips)).numpy()

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, stats = torch_resnet3d_to_flax(sd)
    fmodel = generate_model(10, no_max_pool=True, hidden_layer=32,
                            out_dim=16)
    f_emb = np.asarray(fmodel.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(clips, (0, 2, 3, 4, 1))), train=False))

    t_idx, _ = topk_neighbors(jnp.asarray(t_emb), jnp.asarray(t_emb),
                              k=11, exclude_self=True)
    f_idx, _ = topk_neighbors(jnp.asarray(f_emb), jnp.asarray(f_emb),
                              k=11, exclude_self=True)
    np.testing.assert_array_equal(np.asarray(t_idx), np.asarray(f_idx))
