"""Gold tests for the Caffe2 / 2D-inflation / Sub-BN SlowFast checkpoint
import (reference models/slowfast/slowfast/utils/checkpoint.py:107-389 +
c2_model_loading.py:9-112).

The gold fixture is a synthetic Caffe2-layout blob dict derived from the
independent torch SlowFast replica in test_torch_parity_more (reverse name
mapping is test-local); the assertion is BIT equality between the Caffe2
import path and the already-parity-proven torch import path — identical
pytrees imply identical forward/retrieval ranks.
"""

import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_parity_more import TSlowFastRep, _randomize_bn  # noqa: E402
from video_similarity_search_tpu.train.checkpoint import (  # noqa: E402
    caffe2_blobs_to_torch_sd, caffe2_name_to_torch, load_caffe2_checkpoint,
    merge_pretrained, sub_to_normal_bn_sd, torch_slowfast_to_flax)

_BN_SUFFIX = {"weight": "bn_s", "bias": "bn_b", "running_mean": "bn_rm",
              "running_var": "bn_riv"}


def _torch_key_to_caffe2(key: str):
    """Test-local REVERSE of the reference c2 naming rules; returns None
    for keys with no Caffe2 counterpart (fc projection, bookkeeping)."""
    import re

    if key.endswith("num_batches_tracked") or key.startswith(("fc1", "fc2")):
        return None
    # stems
    m = re.match(r"^s1\.pathway([01])_stem\.(conv|bn)\.(\w+)$", key)
    if m:
        p, leaf, field = m.groups()
        t = "t_" if p == "1" else ""
        if leaf == "conv":
            return f"{t}conv1_w"
        return f"{t}res_conv1_{_BN_SUFFIX[field]}"
    # fusion
    m = re.match(r"^s(\d)_fuse\.(conv_f2s|bn)\.(\w+)$", key)
    if m:
        n, leaf, field = m.groups()
        base = ("t_pool1_subsample" if n == "1"
                else f"t_res{n}_0_branch2c_bn_subsample")
        if leaf == "conv_f2s":
            return f"{base}_w"
        return f"{base}_{_BN_SUFFIX[field]}"
    # residual blocks
    m = re.match(r"^s(\d)\.pathway([01])_res(\d+)\.(.+)$", key)
    if m:
        n, p, i, rest = m.groups()
        t = "t_" if p == "1" else ""
        m2 = re.match(r"^branch2\.([abc])\.weight$", rest)
        if m2:
            return f"{t}res{n}_{i}_branch2{m2.group(1)}_w"
        m2 = re.match(r"^branch2\.([abc])_bn\.(\w+)$", rest)
        if m2:
            return f"{t}res{n}_{i}_branch2{m2.group(1)}_{_BN_SUFFIX[m2.group(2)]}"
        if rest == "branch1.weight":
            return f"{t}res{n}_{i}_branch1_w"
        m2 = re.match(r"^branch1_bn\.(\w+)$", rest)
        if m2:
            return f"{t}res{n}_{i}_branch1_{_BN_SUFFIX[m2.group(1)]}"
    raise AssertionError(f"unmapped torch key {key}")


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=f"{path}/{k}")


def test_caffe2_slowfast_gold():
    """Synthetic Caffe2-layout dict -> flax pytrees BIT-identical to the
    (forward-parity-proven) torch loader's result on every shared tensor
    (VERDICT round-2 task 5 done-condition)."""
    torch.manual_seed(0)
    tnet = TSlowFastRep().eval()
    _randomize_bn(tnet)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}

    blobs = {}
    for k, v in sd.items():
        c2 = _torch_key_to_caffe2(k)
        if c2 is not None:
            blobs[c2] = v
    # solver blobs the loader must skip
    blobs["conv1_w_momentum"] = np.zeros(3)
    blobs["lr"] = np.float32(0.1)
    blobs["model_iter"] = np.int64(1000)

    # forward name conversion must invert the test's reverse map exactly
    for k in sd:
        c2 = _torch_key_to_caffe2(k)
        if c2 is not None:
            assert caffe2_name_to_torch(c2) == k, (c2, caffe2_name_to_torch(c2))

    converted_sd = caffe2_blobs_to_torch_sd(blobs)
    got_params, got_stats = torch_slowfast_to_flax(converted_sd)
    want_params, want_stats = torch_slowfast_to_flax(sd)
    # fc1/fc2 exist only in the torch dict (no Caffe2 counterpart)
    want_params.pop("fc1"), want_params.pop("fc2")
    _tree_equal(got_params, want_params)
    _tree_equal(got_stats, want_stats)


def test_load_caffe2_pickle_roundtrip(tmp_path):
    """.pkl checkpoints load through load_checkpoint's extension dispatch
    and skip solver blobs."""
    from video_similarity_search_tpu.train.checkpoint import load_checkpoint

    blobs = {"conv1_w": np.ones((8, 3, 1, 7, 7), np.float32),
             "res_conv1_bn_s": np.ones(8, np.float32),
             "conv1_w_momentum": np.zeros((8, 3, 1, 7, 7), np.float32),
             "model_iter": np.int64(5)}
    p = tmp_path / "c2.pkl"
    with open(p, "wb") as f:
        pickle.dump({"blobs": blobs}, f)
    payload = load_checkpoint(str(p))
    sd = payload["torch_state_dict"]
    assert set(sd) == {"s1.pathway0_stem.conv.weight",
                       "s1.pathway0_stem.bn.weight"}
    ld = load_caffe2_checkpoint(str(p))
    assert set(ld["torch_state_dict"]) == set(sd)


def test_sub_to_normal_bn_sd():
    """Sub-BN checkpoints normalize to plain-BN keys: bn.bn running stats
    promoted, split_bn dropped, (C,1,1,1) affines squeezed (reference
    sub_to_normal_bn, slowfast/utils/checkpoint.py:290-329)."""
    sd = {
        "s1.pathway0_stem.bn.weight": np.ones((8, 1, 1, 1), np.float32),
        "s1.pathway0_stem.bn.bias": np.zeros((8, 1, 1, 1), np.float32),
        "s1.pathway0_stem.bn.bn.running_mean": np.full(8, 2.0, np.float32),
        "s1.pathway0_stem.bn.bn.running_var": np.full(8, 3.0, np.float32),
        "s1.pathway0_stem.bn.split_bn.num_batches_tracked": np.int64(7),
        "s1.pathway0_stem.bn.split_bn.running_mean": np.zeros(16, np.float32),
        "s1.pathway0_stem.conv.weight": np.ones((8, 3, 1, 7, 7), np.float32),
    }
    out = sub_to_normal_bn_sd(sd)
    assert set(out) == {"s1.pathway0_stem.bn.weight",
                        "s1.pathway0_stem.bn.bias",
                        "s1.pathway0_stem.bn.running_mean",
                        "s1.pathway0_stem.bn.running_var",
                        "s1.pathway0_stem.conv.weight"}
    assert out["s1.pathway0_stem.bn.weight"].shape == (8,)
    np.testing.assert_array_equal(out["s1.pathway0_stem.bn.running_mean"],
                                  np.full(8, 2.0))
    # idempotent on an already-normal dict
    assert set(sub_to_normal_bn_sd(out)) == set(out)


def test_2d_inflation_merge(capsys):
    """2D (4D-kernel) conv weights inflate to (kT,...)/kT on merge — the
    Carreira-Zisserman property: each temporal slice is the 2D kernel/kT,
    so a temporally constant input reproduces the 2D activations
    (reference inflate_weight, slowfast/utils/checkpoint.py:139-175)."""
    import jax.numpy as jnp

    sd2d = {"s1.pathway0_stem.conv.weight":
            np.random.default_rng(0).normal(size=(8, 3, 7, 7)).astype(
                np.float32)}
    loaded_params, _ = torch_slowfast_to_flax(sd2d)
    kernel_1t = np.asarray(
        loaded_params["s1_pathway0_stem"]["conv"]["Conv_0"]["kernel"])
    assert kernel_1t.shape == (1, 7, 7, 3, 8)

    init_params = {"s1_pathway0_stem": {"conv": {"Conv_0": {
        "kernel": jnp.zeros((5, 7, 7, 3, 8), jnp.float32)}}}}
    merged, _ = merge_pretrained(init_params, {}, loaded_params, {},
                                 inflate_temporal=True)
    out = capsys.readouterr().out
    assert "temporally inflated 1" in out
    got = np.asarray(merged["s1_pathway0_stem"]["conv"]["Conv_0"]["kernel"])
    assert got.shape == (5, 7, 7, 3, 8)
    for t in range(5):
        np.testing.assert_allclose(got[t], kernel_1t[0] / 5, rtol=1e-6)
    # without the flag the mismatched kernel stays at init
    merged2, _ = merge_pretrained(init_params, {}, loaded_params, {},
                                  inflate_temporal=False)
    assert np.all(np.asarray(
        merged2["s1_pathway0_stem"]["conv"]["Conv_0"]["kernel"]) == 0)


def test_caffe2_pkl_merges_into_slowfast_model(tmp_path):
    """Integration: a Caffe2 .pkl through load_checkpoint + the
    arch-dispatching torch_to_flax merges real tensors into a live
    SlowFast model's params (the driver's --checkpoint_path resume path
    for MODEL.ARCH=slowfast; review finding: it previously hardcoded the
    3dresnet converter and matched 0 tensors)."""
    import jax
    import jax.numpy as jnp

    from video_similarity_search_tpu.train.checkpoint import (
        load_checkpoint, merge_pretrained, torch_to_flax)
    from video_similarity_search_tpu.models.slowfast import (
        SlowFast, multipathway_input)

    torch.manual_seed(1)
    tnet = TSlowFastRep().eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    blobs = {}
    for k, v in sd.items():
        c2 = _torch_key_to_caffe2(k)
        if c2 is not None:
            blobs[c2] = v
    p = tmp_path / "sf.pkl"
    with open(p, "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    payload = load_checkpoint(str(p))
    params, stats = torch_to_flax(payload["torch_state_dict"], "slowfast")

    fmodel = SlowFast(depth=50, alpha=4, beta_inv=8,
                      fusion_conv_channel_ratio=2, fusion_kernel_sz=7,
                      projection_head=True, projection2_out=128)
    x = multipathway_input(np.zeros((1, 8, 32, 32, 3), np.float32), 4)
    variables = fmodel.init(jax.random.key(0), x, train=False)
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        merged, _ = merge_pretrained(variables["params"],
                                     variables.get("batch_stats", {}),
                                     params, stats)
    out = buf.getvalue()
    matched = int(out.split("matched ")[1].split(" tensors")[0])
    assert matched > 100, out  # the whole backbone landed
