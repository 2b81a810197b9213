"""Checkpoint I/O: orbax for native state, plus a PyTorch ``.pth.tar``
import shim for checkpoint fidelity.

Reference behavior being covered (SURVEY.md §2.3 'Checkpoint I/O'):
  * save ``{epoch, state_dict, best_prec1}`` under
    ``<OUTPUT_PATH>/tnet_checkpoints/<arch>/`` with a ``model_best`` copy on
    improvement (models/model_utils.py:161-176) and periodic epoch copies
    (online_train.py:749-776);
  * load with ``module.`` prefix stripping and optional fc/bn_proj skipping
    for classifier transfer (models/model_utils.py:180-211);
  * ``encoder_q.0. -> backbone.`` remap for MoCo checkpoints
    (coclr_classify.py:244-249);
  * partial ("neq") loading that keeps unmatched params at init
    (coclr_utils/utils.py:93-118).

The torch import shim converts torch layouts to flax: Conv3d
(Cout, Cin, kT, kH, kW) -> (kT, kH, kW, Cin, Cout); Linear (out, in) ->
(in, out); BN weight/bias/running_* -> scale/bias + batch_stats mean/var.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Native (orbax) checkpoints
# --------------------------------------------------------------------------

def _ckpt_dir(output_path: str, arch: str) -> str:
    return os.path.join(output_path, "tnet_checkpoints", arch)


def save_checkpoint(output_path: str, arch: str, state, epoch: int,
                    best_prec1: float, is_best: bool = False,
                    keep_every: int = 200) -> str:
    """Save under <out>/tnet_checkpoints/<arch>/ (ref model_utils.py:161-176).

    Layout: ``checkpoint/`` (latest, overwritten), ``model_best/`` copy,
    ``checkpoint_<epoch>/`` every ``keep_every`` epochs
    (online_train.py:749-776 keeps .pth.tar files; here orbax dirs).
    """
    import orbax.checkpoint as ocp

    base = _ckpt_dir(output_path, arch)
    os.makedirs(base, exist_ok=True)
    payload = {
        "epoch": epoch + 1,  # reference stores resume epoch (epoch + 1)
        "best_prec1": float(best_prec1),
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
    }
    ckpt_path = os.path.join(base, "checkpoint")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(ckpt_path, payload, force=True)
    if is_best:
        best_path = os.path.join(base, "model_best")
        if os.path.exists(best_path):
            shutil.rmtree(best_path)
        shutil.copytree(ckpt_path, best_path)
    if keep_every and (epoch + 1) % keep_every == 0:
        epoch_path = os.path.join(base, f"checkpoint_{epoch + 1}")
        if os.path.exists(epoch_path):
            shutil.rmtree(epoch_path)
        shutil.copytree(ckpt_path, epoch_path)
    return ckpt_path


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load an orbax dir OR a torch .pth.tar (detected by extension)."""
    if path.endswith((".pth.tar", ".pth", ".tar", ".pt")):
        return load_torch_checkpoint(path)
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(path)


def restore_train_state(state, payload) -> Tuple[Any, int, float]:
    """Apply a loaded payload to a TrainState; returns
    (state, start_epoch, best_prec1) (ref model_utils.py:180-211)."""
    if "params" in payload:  # native
        state = state.replace(
            params=jax.tree.map(jnp.asarray, payload["params"]),
            batch_stats=jax.tree.map(jnp.asarray, payload["batch_stats"]),
        )
        if payload.get("opt_state") is not None:
            try:
                state = state.replace(opt_state=jax.tree.map(
                    jnp.asarray, payload["opt_state"],
                    is_leaf=lambda x: isinstance(x, np.ndarray)))
            except Exception:
                pass  # optimizer changed shape; keep fresh opt state
        return state, int(payload.get("epoch", 0)), float(
            payload.get("best_prec1", 0.0))
    raise ValueError("unrecognized checkpoint payload")


# --------------------------------------------------------------------------
# Torch checkpoint import
# --------------------------------------------------------------------------

def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):  # DDP prefix strip (model_utils.py:184)
            k = k[len("module."):]
        if k.startswith("encoder_q.0."):  # MoCo remap (coclr_classify.py:244)
            k = "backbone." + k[len("encoder_q.0."):]
        sd[k] = np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach") \
            else np.asarray(v)
    return {
        "torch_state_dict": sd,
        "epoch": int(ckpt.get("epoch", 0)) if isinstance(ckpt, dict) else 0,
        "best_prec1": float(ckpt.get("best_prec1", 0.0))
        if isinstance(ckpt, dict) else 0.0,
    }


def _set_nested(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = jnp.asarray(value)


_RESNET3D_BN_RE = re.compile(r"^(bn1|layer(\d)\.(\d+)\.(bn\d|downsample\.1))")


def torch_resnet3d_to_flax(sd: Dict[str, np.ndarray],
                           skip_heads: bool = False
                           ) -> Tuple[dict, dict]:
    """Map a kenshohara 3D-ResNet torch state_dict to our ResNet3D pytrees.

    Returns (params, batch_stats). ``skip_heads`` drops fc/bn_proj keys for
    classifier transfer (reference model_utils.py:196-203).
    """
    params: dict = {}
    stats: dict = {}

    def conv(v):  # (Cout, Cin, kT, kH, kW) -> (kT, kH, kW, Cin, Cout)
        return np.transpose(v, (2, 3, 4, 1, 0))

    def dense(v):  # (out, in) -> (in, out)
        return np.transpose(v, (1, 0))

    def put_bn(flax_name, torch_prefix):
        _set_nested(params, flax_name + ("scale",), sd[torch_prefix + ".weight"])
        _set_nested(params, flax_name + ("bias",), sd[torch_prefix + ".bias"])
        _set_nested(stats, flax_name + ("mean",),
                    sd[torch_prefix + ".running_mean"])
        _set_nested(stats, flax_name + ("var",),
                    sd[torch_prefix + ".running_var"])

    # stem
    _set_nested(params, ("conv1", "Conv_0", "kernel"),
                conv(sd["conv1.weight"]))
    put_bn(("bn1", "BatchNorm_0"), "bn1")

    # stages
    for key in sd:
        m = re.match(r"^layer(\d)\.(\d+)\.conv(\d)\.weight$", key)
        if m:
            s, b, c = m.groups()
            _set_nested(params,
                        (f"layer{s}_{b}", f"conv{c}", "Conv_0", "kernel"),
                        conv(sd[key]))
        m = re.match(r"^layer(\d)\.(\d+)\.bn(\d)\.weight$", key)
        if m:
            s, b, c = m.groups()
            put_bn((f"layer{s}_{b}", f"bn{c}", "BatchNorm_0"),
                   f"layer{s}.{b}.bn{c}")
        m = re.match(r"^layer(\d)\.(\d+)\.downsample\.0\.weight$", key)
        if m:
            s, b = m.groups()
            _set_nested(params,
                        (f"layer{s}_{b}", "downsample_conv", "Conv_0",
                         "kernel"),
                        conv(sd[key]))
        m = re.match(r"^layer(\d)\.(\d+)\.downsample\.1\.weight$", key)
        if m:
            s, b = m.groups()
            put_bn((f"layer{s}_{b}", "downsample_bn", "BatchNorm_0"),
                   f"layer{s}.{b}.downsample.1")

    # projection head (fc1 -> bn_proj -> fc2), ref models/resnet.py:180-184
    if not skip_heads and "fc1.weight" in sd:
        _set_nested(params, ("projection", "fc1", "kernel"),
                    dense(sd["fc1.weight"]))
        _set_nested(params, ("projection", "fc1", "bias"), sd["fc1.bias"])
        put_bn(("projection", "bn_proj", "BatchNorm_0"), "bn_proj")
        _set_nested(params, ("projection", "fc2", "kernel"),
                    dense(sd["fc2.weight"]))
        _set_nested(params, ("projection", "fc2", "bias"), sd["fc2.bias"])

    if "temporal_ds_linear.weight" in sd:
        _set_nested(params, ("temporal_ds_linear", "kernel"),
                    dense(sd["temporal_ds_linear.weight"]))
        _set_nested(params, ("temporal_ds_linear", "bias"),
                    sd["temporal_ds_linear.bias"])

    # classifier: plain Linear or Sequential(Dropout, Linear)
    for lk in ("linear.weight", "linear.1.weight"):
        if not skip_heads and lk in sd:
            _set_nested(params, ("linear", "kernel"), dense(sd[lk]))
            _set_nested(params, ("linear", "bias"),
                        sd[lk.replace("weight", "bias")])
    return params, stats


def merge_pretrained(init_params, init_stats, loaded_params, loaded_stats,
                     verbose: bool = True) -> Tuple[Any, Any]:
    """'neq' partial load: take loaded values where the path+shape matches,
    keep init elsewhere (reference coclr_utils/utils.py:93-118)."""
    flat_init = dict(jax.tree_util.tree_flatten_with_path(init_params)[0])
    matched, skipped = 0, 0

    def merge(init_tree, loaded_tree):
        nonlocal matched, skipped
        out = {}
        for k, v in init_tree.items():
            if isinstance(v, dict):
                out[k] = merge(v, loaded_tree.get(k, {}))
            else:
                lv = loaded_tree.get(k) if isinstance(loaded_tree, dict) else None
                if lv is not None and tuple(np.shape(lv)) == tuple(np.shape(v)):
                    out[k] = jnp.asarray(lv)
                    matched += 1
                else:
                    out[k] = v
                    skipped += 1
        return out

    new_params = merge(init_params, loaded_params)
    new_stats = merge(init_stats, loaded_stats)
    if verbose:
        print(f"partial load: matched {matched} tensors, kept {skipped} at init")
    return new_params, new_stats
