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


def test_restored_opt_state_trains(tmp_path):
    """The optimizer state restored from orbax must be USABLE: a train
    step after resume must run (orbax returns plain dicts for optax's
    NamedTuple states; the restore rebuilds the live tree structure —
    regression for a crash in optax.sgd's TraceState after resume)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_similarity_search_tpu.config import get_cfg
    from video_similarity_search_tpu.models import model_selector
    from video_similarity_search_tpu.train import (create_train_state,
                                                   load_checkpoint,
                                                   make_triplet_train_step,
                                                   restore_train_state,
                                                   save_checkpoint)

    cfg = get_cfg()
    cfg.MODEL.ARCH = "3dresnet"
    cfg.RESNET.MODEL_DEPTH = 10
    cfg.RESNET.NO_MAX_POOl = True
    cfg.RESNET.HIDDEN_LAYER = 16
    cfg.RESNET.OUT_DIM = 4
    cfg.DATA.SAMPLE_DURATION = 4
    cfg.DATA.SAMPLE_SIZE = 16
    cfg.TPU.COMPUTE_DTYPE = "float32"

    model = model_selector(cfg)
    sample = jnp.zeros((2, 4, 16, 16, 3))
    state = create_train_state(jax.random.key(0), model, cfg, sample)
    step = make_triplet_train_step(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "anchor": jnp.asarray(rng.normal(size=(2, 4, 16, 16, 3)),
                              jnp.float32),
        "positive": jnp.asarray(rng.normal(size=(2, 4, 16, 16, 3)),
                                jnp.float32),
        "targets": jnp.asarray([0, 1, 0, 1], jnp.int32),
    }
    state, _ = step(state, batch, jax.random.key(1))  # momentum buf filled
    path = save_checkpoint(str(tmp_path), "3dresnet", state, 0, 0.0)

    state2 = create_train_state(jax.random.key(9), model, cfg, sample)
    state2, epoch, _ = restore_train_state(state2, load_checkpoint(path))
    assert epoch == 1
    # momentum trace round-tripped (non-zero after one step)
    t1 = jax.tree.leaves(state.opt_state)
    t2 = jax.tree.leaves(state2.opt_state)
    assert any(float(jnp.max(jnp.abs(a))) > 0 for a in t2)
    for a, b in zip(t1, t2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # and the restored optimizer actually steps
    state2, m = step(state2, batch, jax.random.key(2))
    assert np.isfinite(float(m["loss"]))
