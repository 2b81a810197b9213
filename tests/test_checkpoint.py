"""Torch .pth.tar import shim tests: name mapping + layout conversion."""

import numpy as np
import pytest

from video_similarity_search_tpu.train.checkpoint import (
    merge_pretrained, torch_resnet3d_to_flax)


def _fake_torch_sd():
    """Random torch-layout state dict for a tiny resnet10-ish net."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, cout, cin, kt, kh, kw):
        sd[name + ".weight"] = rng.normal(size=(cout, cin, kt, kh, kw)
                                          ).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = np.ones(c, np.float32)
        sd[name + ".bias"] = np.zeros(c, np.float32)
        sd[name + ".running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[name + ".running_var"] = np.abs(rng.normal(size=c)
                                           ).astype(np.float32)

    conv("conv1", 64, 3, 7, 7, 7)
    bn("bn1", 64)
    for s, (cin, cout) in enumerate([(64, 64), (64, 128)], 1):
        conv(f"layer{s}.0.conv1", cout, cin, 3, 3, 3)
        bn(f"layer{s}.0.bn1", cout)
        conv(f"layer{s}.0.conv2", cout, cout, 3, 3, 3)
        bn(f"layer{s}.0.bn2", cout)
        if cin != cout:
            conv(f"layer{s}.0.downsample.0", cout, cin, 1, 1, 1)
            bn(f"layer{s}.0.downsample.1", cout)
    sd["fc1.weight"] = rng.normal(size=(2048, 128)).astype(np.float32)
    sd["fc1.bias"] = np.zeros(2048, np.float32)
    bn("bn_proj", 2048)
    sd["fc2.weight"] = rng.normal(size=(128, 2048)).astype(np.float32)
    sd["fc2.bias"] = np.zeros(128, np.float32)
    return sd


def test_conv_layout_conversion():
    sd = _fake_torch_sd()
    params, stats = torch_resnet3d_to_flax(sd)
    # torch (Cout, Cin, kT, kH, kW) -> flax (kT, kH, kW, Cin, Cout)
    assert params["conv1"]["Conv_0"]["kernel"].shape == (7, 7, 7, 3, 64)
    assert params["layer1_0"]["conv1"]["Conv_0"]["kernel"].shape == (3, 3, 3, 64, 64)
    assert params["layer2_0"]["downsample_conv"]["Conv_0"]["kernel"]\
        .shape == (1, 1, 1, 64, 128)
    np.testing.assert_allclose(
        np.asarray(params["conv1"]["Conv_0"]["kernel"]),
        np.transpose(sd["conv1.weight"], (2, 3, 4, 1, 0)))


def test_bn_and_dense_mapping():
    sd = _fake_torch_sd()
    params, stats = torch_resnet3d_to_flax(sd)
    assert params["bn1"]["BatchNorm_0"]["scale"].shape == (64,)
    np.testing.assert_allclose(np.asarray(stats["bn1"]["BatchNorm_0"]["mean"]),
                               sd["bn1.running_mean"])
    # dense transposed
    assert params["projection"]["fc1"]["kernel"].shape == (128, 2048)
    np.testing.assert_allclose(
        np.asarray(params["projection"]["fc2"]["kernel"]),
        sd["fc2.weight"].T)


def test_skip_heads():
    params, _ = torch_resnet3d_to_flax(_fake_torch_sd(), skip_heads=True)
    assert "projection" not in params


def test_merge_pretrained_partial():
    init_p = {"a": {"kernel": np.zeros((2, 2), np.float32)},
              "b": {"kernel": np.zeros((3,), np.float32)}}
    loaded = {"a": {"kernel": np.ones((2, 2), np.float32)},
              "b": {"kernel": np.ones((4,), np.float32)}}  # shape mismatch
    merged, _ = merge_pretrained(init_p, {}, loaded, {}, verbose=False)
    np.testing.assert_allclose(np.asarray(merged["a"]["kernel"]), 1.0)
    np.testing.assert_allclose(np.asarray(merged["b"]["kernel"]), 0.0)
