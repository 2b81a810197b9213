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


def _stable_keystr(path) -> str:
    """Version-stable keypath serialization: ``jax.tree_util.keystr``'s
    output format is an implementation detail of the installed JAX, so a
    checkpoint written under one version could fail every key match under
    another and (loudly but wrongly) reset optimizer state / banks. Build
    the string from the key objects' own fields instead: each entry
    becomes ``<KeyType>:<value>`` (DictKey/FlattenedIndexKey ``.key``,
    SequenceKey ``.idx``, GetAttrKey ``.name``)."""
    parts = []
    for k in path:
        for attr in ("key", "idx", "name"):
            v = getattr(k, attr, None)
            if v is not None:
                parts.append(f"{type(k).__name__}:{v}")
                break
        else:  # unknown key type: repr is the best available
            parts.append(repr(k))
    return "/" + "/".join(parts)


def _flatten_keystr(tree) -> Dict[str, np.ndarray]:
    """Flatten a pytree to an explicit {keypath-string: leaf} mapping, so a
    restore can pour leaves back BY NAME instead of relying on orbax's
    sorted-dict enumeration order (which silently transposes same-shape
    leaves when e.g. a tuple level has >= 10 entries and '10' sorts
    before '2')."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {_stable_keystr(path): np.asarray(leaf)
            for path, leaf in flat}


def _pour_flat(live_tree, saved_flat, name: str, verbose: bool = True):
    """Rebuild ``live_tree``'s structure from a keypath-keyed flat mapping.

    Leaves whose keypath is missing or whose shape mismatches keep the live
    (fresh) value — LOUDLY: a resumed run silently losing optimizer momentum
    or a contrastive memory bank is a correctness bug, not a detail."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(live_tree)
    out, kept_fresh = [], []
    for path, live in flat:
        k = _stable_keystr(path)
        # legacy fallback: checkpoints written before the stable key
        # format used this version's raw keystr() output
        sv = saved_flat.get(k)
        if sv is None:
            sv = saved_flat.get(jax.tree_util.keystr(path))
        if sv is not None and tuple(np.shape(sv)) == tuple(np.shape(live)):
            out.append(jnp.asarray(sv))
        else:
            kept_fresh.append(k)
            out.append(live)
    if kept_fresh and verbose:
        print(f"WARNING: restore[{name}]: {len(kept_fresh)}/{len(out)} "
              f"leaves had no matching saved value and stay freshly "
              f"initialized (first: {kept_fresh[0]})")
    return jax.tree_util.tree_unflatten(treedef, out), len(kept_fresh)


# loss-side TrainState banks persisted alongside params (a --vector
# preemptible resume of a contrastive/UberNCE/MEM_TRIPLET run must NOT
# reinitialize its NCE memory banks / MoCo queue mid-training)
_BANK_FIELDS = ("nce", "moco", "mem_triplet", "memory_moco")


def save_checkpoint(output_path: str, arch: str, state, epoch: int,
                    best_prec1: float, is_best: bool = False,
                    keep_every: int = 200) -> str:
    """Save under <out>/tnet_checkpoints/<arch>/ (ref model_utils.py:161-176).

    Layout: ``checkpoint/`` (latest, overwritten), ``model_best/`` copy,
    ``checkpoint_<epoch>/`` every ``keep_every`` epochs
    (online_train.py:749-776 keeps .pth.tar files; here orbax dirs).

    Multi-host: must be called on EVERY process — ``Checkpointer.save``
    runs cross-process barriers (save_start/save), so a master-only call
    deadlocks the job (master waits in the barrier, the other hosts have
    moved on to the next collective; found live in the 2-process
    full-driver test). Orbax itself writes array data only on process 0
    (NumpyHandler gates on ``process_index() == 0``), and the host-side
    dir/copy ops below are gated the same way, so non-primary calls touch
    no files.
    """
    import orbax.checkpoint as ocp

    primary = jax.process_index() == 0
    base = _ckpt_dir(output_path, arch)
    if primary:
        os.makedirs(base, exist_ok=True)
    payload = {
        "epoch": epoch + 1,  # reference stores resume epoch (epoch + 1)
        "best_prec1": float(best_prec1),
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
        # keypath-keyed (structure-aware restore; see _flatten_keystr)
        "opt_state_flat": _flatten_keystr(state.opt_state),
    }
    for bank in _BANK_FIELDS:
        val = getattr(state, bank, None)
        if val is not None:
            payload[f"{bank}_flat"] = _flatten_keystr(val)
    ckpt_path = os.path.join(base, "checkpoint")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(ckpt_path, payload, force=True)
    if is_best and primary:
        best_path = os.path.join(base, "model_best")
        if os.path.exists(best_path):
            shutil.rmtree(best_path)
        shutil.copytree(ckpt_path, best_path)
    if keep_every and (epoch + 1) % keep_every == 0 and primary:
        epoch_path = os.path.join(base, f"checkpoint_{epoch + 1}")
        if os.path.exists(epoch_path):
            shutil.rmtree(epoch_path)
        shutil.copytree(ckpt_path, epoch_path)
    return ckpt_path


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load an orbax dir, a torch .pth.tar, or a Caffe2 .pkl (by extension)."""
    if path.endswith(".pkl"):
        return load_caffe2_checkpoint(path)
    if path.endswith((".pth.tar", ".pth", ".tar", ".pt")):
        return load_torch_checkpoint(path)
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(path)


def restore_train_state(state, payload, verbose: bool = True
                        ) -> Tuple[Any, int, float]:
    """Apply a loaded payload to a TrainState; returns
    (state, start_epoch, best_prec1) (ref model_utils.py:180-211).

    The optimizer state and the loss-side banks (NCE memories / MoCo queue /
    mem-triplet FIFO) are restored structure-aware: saved as keypath-keyed
    flat mappings, poured back into the LIVE pytree by name. Any leaf that
    cannot be matched keeps its fresh value with a printed WARNING (never
    silently)."""
    if "params" in payload:  # native
        state = state.replace(
            params=jax.tree.map(jnp.asarray, payload["params"]),
            batch_stats=jax.tree.map(jnp.asarray, payload["batch_stats"]),
        )
        if payload.get("opt_state_flat") is not None:
            opt, _ = _pour_flat(state.opt_state, payload["opt_state_flat"],
                                "opt_state", verbose)
            state = state.replace(opt_state=opt)
        elif payload.get("opt_state") is not None:
            # legacy (round-2) layout: enumeration-order pour, gated on a
            # full leaf-count + shape match
            saved_leaves = jax.tree.leaves(payload["opt_state"])
            treedef = jax.tree.structure(state.opt_state)
            live_leaves = jax.tree.leaves(state.opt_state)
            shapes_match = (
                len(saved_leaves) == len(live_leaves)
                and all(np.shape(s) == np.shape(l)
                        for s, l in zip(saved_leaves, live_leaves)))
            if shapes_match:
                state = state.replace(opt_state=jax.tree.unflatten(
                    treedef, [jnp.asarray(x) for x in saved_leaves]))
            elif verbose:
                print("WARNING: restore[opt_state]: saved optimizer state "
                      "does not match the live optimizer (leaf count/shape "
                      "mismatch) — keeping FRESH opt state; momentum is lost")
        for bank in _BANK_FIELDS:
            saved = payload.get(f"{bank}_flat")
            live = getattr(state, bank, None)
            if saved is not None and live is not None:
                poured, _ = _pour_flat(live, saved, bank, verbose)
                state = state.replace(**{bank: poured})
            elif saved is not None and live is None and verbose:
                print(f"WARNING: restore[{bank}]: checkpoint carries a "
                      f"{bank} bank but the live state has none "
                      "(LOSS.TYPE changed?) — discarding it")
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
                           skip_heads: bool = False,
                           stem_s2d: bool = False
                           ) -> Tuple[dict, dict]:
    """Map a kenshohara 3D-ResNet torch state_dict to our ResNet3D pytrees.

    Returns (params, batch_stats). ``skip_heads`` drops fc/bn_proj keys for
    classifier transfer (reference model_utils.py:196-203). ``stem_s2d``
    converts conv1 to the equivalent space-to-depth stem kernel
    (models/resnet3d.py conv1_kernel_to_s2d) so imported checkpoints keep
    bit-level retrieval-rank parity under the fast stem.
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
    conv1 = conv(sd["conv1.weight"])
    if stem_s2d:
        from ..models.resnet3d import conv1_kernel_to_s2d

        conv1 = np.asarray(conv1_kernel_to_s2d(jnp.asarray(conv1)))
    _set_nested(params, ("conv1", "Conv_0", "kernel"), conv1)
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


def _conv_t(v):
    """torch Conv3d (Cout, Cin, kT, kH, kW) -> flax (kT, kH, kW, Cin, Cout).

    A 4D (2D-conv) kernel maps to kT=1 — the marker the temporal-inflation
    merge expands to the target kT (reference inflate_weight,
    models/slowfast/slowfast/utils/checkpoint.py:139-175)."""
    if np.ndim(v) == 4:  # (Cout, Cin, kH, kW) -> (1, kH, kW, Cin, Cout)
        return np.transpose(v, (2, 3, 1, 0))[None]
    return np.transpose(v, (2, 3, 4, 1, 0))


def _dense_t(v):  # torch Linear (out, in) -> flax (in, out)
    return np.transpose(v, (1, 0))


def _conv1x1_to_dense(v):  # torch Conv3d (Cout, Cin, 1,1,1) -> Dense (in, out)
    return np.transpose(v.reshape(v.shape[0], v.shape[1]), (1, 0))


# S3D: torch attribute names registered both directly (Conv_1a, Mixed_3b, ...)
# and through the block Sequentials (block1.0, block3.1, ...) — the
# state_dict contains both aliases of the same tensors
# (reference models/s3d/s3dg.py:143-197). Canonicalize to the direct names.
_S3D_BLOCK_ALIASES = {
    "block1.0": "Conv_1a", "block2.1": "Conv_2b", "block2.2": "Conv_2c",
    "block3.1": "Mixed_3b", "block3.2": "Mixed_3c",
    "block4.1": "Mixed_4b", "block4.2": "Mixed_4c", "block4.3": "Mixed_4d",
    "block4.4": "Mixed_4e", "block4.5": "Mixed_4f",
    "block5.1": "Mixed_5b", "block5.2": "Mixed_5c",
}

# Sequential index -> flax submodule name inside SepInception
_S3D_BRANCH = {"branch0.0": "branch0_0", "branch1.0": "branch1_0",
               "branch1.1": "branch1_1", "branch2.0": "branch2_0",
               "branch2.1": "branch2_1", "branch3.1": "branch3_1"}


def _put_bn_leaf(params, stats, path, sd, torch_prefix):
    _set_nested(params, path + ("scale",), sd[torch_prefix + ".weight"])
    _set_nested(params, path + ("bias",), sd[torch_prefix + ".bias"])
    _set_nested(stats, path + ("mean",), sd[torch_prefix + ".running_mean"])
    _set_nested(stats, path + ("var",), sd[torch_prefix + ".running_var"])


def torch_s3d_backbone_to_flax(sd: Dict[str, np.ndarray],
                               prefix: str = "") -> Tuple[dict, dict]:
    """Map a torch S3D(-G) state_dict subtree (reference models/s3d/s3dg.py)
    to the flax :class:`~video_similarity_search_tpu.models.s3d.S3D` pytree.

    ``prefix`` selects the subtree (e.g. ``"backbone."`` for
    LinearClassifier / MoCo-remapped checkpoints, ``"0."`` for the
    model_selector Sequential, models/model_utils.py:76-85).
    """
    params: dict = {}
    stats: dict = {}
    canon: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if prefix and not k.startswith(prefix):
            continue
        k = k[len(prefix):]
        for alias, name in _S3D_BLOCK_ALIASES.items():
            if k.startswith(alias + "."):
                k = name + k[len(alias):]
                break
        canon[k] = v

    for k, v in canon.items():
        parts = k.split(".")
        mod = parts[0]
        if mod.startswith("Mixed_"):
            branch = ".".join(parts[1:3])
            if branch in _S3D_BRANCH:
                inner = (mod, _S3D_BRANCH[branch])
                leaf = parts[3]  # conv / bn / conv1 / bn1 / conv2 / bn2
                field = parts[4]
            elif parts[1].startswith("gating_b"):
                inner = (mod, parts[1])
                leaf, field = parts[2], parts[3]  # fc.weight / fc.bias
            else:
                continue
        else:  # Conv_1a / Conv_2b / Conv_2c
            inner = (mod,)
            leaf, field = parts[1], parts[2]

        if leaf.startswith("conv"):
            if field == "weight":
                _set_nested(params, inner + (leaf, "Conv_0", "kernel"),
                            _conv_t(v))
        elif leaf.startswith("bn"):
            if field == "weight":
                torch_prefix = k[: k.rfind(".")]
                _put_bn_leaf(params, stats, inner + (leaf, "BatchNorm_0"),
                             canon, torch_prefix)
        elif leaf == "fc":
            if field == "weight":
                _set_nested(params, inner + ("fc", "kernel"), _dense_t(v))
            else:
                _set_nested(params, inner + ("fc", "bias"), v)
    return params, stats


def torch_s3d_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """Torch 's3d' arch Sequential(backbone, pool, conv1x1, relu, conv1x1,
    flatten) (reference models/model_utils.py:76-85) -> S3DEmbedder pytrees.

    Also accepts ``backbone.``-prefixed dicts (MoCo ``encoder_q.0.`` remap,
    coclr_classify.py:244-249)."""
    prefix = "0." if any(k.startswith("0.") for k in sd) else (
        "backbone." if any(k.startswith("backbone.") for k in sd) else "")
    bb_params, bb_stats = torch_s3d_backbone_to_flax(sd, prefix)
    params = {"backbone": bb_params}
    stats = {"backbone": bb_stats} if bb_stats else {}
    for torch_key, flax_name in (("2", "proj1"), ("4", "proj2")):
        wk = f"{torch_key}.weight"
        if wk in sd:
            _set_nested(params, (flax_name, "kernel"),
                        _conv1x1_to_dense(sd[wk]))
            _set_nested(params, (flax_name, "bias"),
                        sd[f"{torch_key}.bias"].reshape(-1))
    return params, stats


def torch_moco_encoder_to_flax(sd: Dict[str, np.ndarray],
                               encoder: str = "q") -> Tuple[dict, dict]:
    """InfoNCE/UberNCE encoder (reference models/infoNCE.py:59-72) ->
    MoCoEncoder pytrees. ``encoder_q.0.`` arrives pre-remapped to
    ``backbone.`` by :func:`load_torch_checkpoint`; the 1x1x1 projection
    convs sit at ``encoder_q.2`` / ``encoder_q.4``."""
    if encoder == "q":
        bb_prefix = "backbone." if any(k.startswith("backbone.")
                                       for k in sd) else "encoder_q.0."
        proj_prefix = "encoder_q."
    else:
        bb_prefix, proj_prefix = "encoder_k.0.", "encoder_k."
    bb_params, bb_stats = torch_s3d_backbone_to_flax(sd, bb_prefix)
    params = {"backbone": bb_params}
    stats = {"backbone": bb_stats} if bb_stats else {}
    for idx, flax_name in ((2, "proj_conv1"), (4, "proj_conv2")):
        wk = f"{proj_prefix}{idx}.weight"
        if wk in sd:
            _set_nested(params, (flax_name, "kernel"),
                        _conv1x1_to_dense(sd[wk]))
            _set_nested(params, (flax_name, "bias"),
                        sd[f"{proj_prefix}{idx}.bias"].reshape(-1))
    return params, stats


def torch_linear_classifier_to_flax(sd: Dict[str, np.ndarray]
                                    ) -> Tuple[dict, dict]:
    """CoCLR LinearClassifier (reference iic_datasets/CoCLR_model.py:32-90)
    -> flax LinearClassifier pytrees: S3D backbone + optional final_bn +
    final_fc (Sequential([Dropout,] Linear))."""
    bb_params, bb_stats = torch_s3d_backbone_to_flax(sd, "backbone.")
    params = {"backbone": bb_params}
    stats = {"backbone": bb_stats} if bb_stats else {}
    if "final_bn.weight" in sd:
        _put_bn_leaf(params, stats, ("final_bn", "BatchNorm_0"), sd,
                     "final_bn")
    for fk in ("final_fc.0.weight", "final_fc.1.weight"):
        if fk in sd:
            _set_nested(params, ("final_fc", "kernel"), _dense_t(sd[fk]))
            _set_nested(params, ("final_fc", "bias"),
                        sd[fk.replace("weight", "bias")])
    return params, stats


def torch_r3d_backbone_to_flax(sd: Dict[str, np.ndarray],
                               prefix: str = "") -> Tuple[dict, dict]:
    """Torch R3DNet (reference models/r3d/r3d.py:126-187) -> flax R3DNet.

    Torch layers: conv1 stem; conv{2..5} = SpatioTemporalResLayer with
    ``block1`` then ``blocks.{i}``; convs wrapped in SpatioTemporalConv
    (``.temporal_spatial_conv``)."""
    params: dict = {}
    stats: dict = {}

    def get(k):
        return sd[prefix + k]

    def has(k):
        return (prefix + k) in sd

    _set_nested(params, ("conv1", "Conv_0", "kernel"),
                _conv_t(get("conv1.temporal_spatial_conv.weight")))
    _put_bn_leaf(params, stats, ("bn1", "BatchNorm_0"),
                 {k[len(prefix):]: v for k, v in sd.items()
                  if k.startswith(prefix)}, "bn1")

    for stage in range(2, 6):
        blocks = [f"conv{stage}.block1"]
        i = 0
        while has(f"conv{stage}.blocks.{i}.conv1.temporal_spatial_conv.weight"):
            blocks.append(f"conv{stage}.blocks.{i}")
            i += 1
        for b, tprefix in enumerate(blocks):
            fmod = f"conv{stage}_block{b}"
            for leaf in ("conv1", "conv2", "downsampleconv"):
                k = f"{tprefix}.{leaf}.temporal_spatial_conv.weight"
                if has(k):
                    _set_nested(params, (fmod, leaf, "Conv_0", "kernel"),
                                _conv_t(get(k)))
            for leaf in ("bn1", "bn2", "downsamplebn"):
                if has(f"{tprefix}.{leaf}.weight"):
                    _put_bn_leaf(params, stats, (fmod, leaf, "BatchNorm_0"),
                                 {k[len(prefix):]: v for k, v in sd.items()
                                  if k.startswith(prefix)},
                                 f"{tprefix}.{leaf}")
    if has("linear.weight"):
        _set_nested(params, ("linear", "kernel"), _dense_t(get("linear.weight")))
        _set_nested(params, ("linear", "bias"), get("linear.bias"))
    return params, stats


def torch_r3d_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """Torch 'r3d' arch Sequential(backbone, Linear, ReLU, Linear)
    (reference models/model_utils.py:87-95) -> R3DEmbedder pytrees."""
    prefix = "0." if any(k.startswith("0.") for k in sd) else (
        "backbone." if any(k.startswith("backbone.") for k in sd) else "")
    bb_params, bb_stats = torch_r3d_backbone_to_flax(sd, prefix)
    params = {"backbone": bb_params}
    stats = {"backbone": bb_stats} if bb_stats else {}
    for torch_key, flax_name in (("1", "proj1"), ("3", "proj2")):
        wk = f"{torch_key}.weight"
        if wk in sd:
            _set_nested(params, (flax_name, "kernel"), _dense_t(sd[wk]))
            _set_nested(params, (flax_name, "bias"), sd[f"{torch_key}.bias"])
    return params, stats


# SlowFast: flax submodule nesting per conv/bn leaf. BottleneckTransform
# wraps a/c in Conv3d (-> Conv_0) but b is a bare nn.Conv; c_bn and the
# Nonlocal bn are bare nn.BatchNorm (models/slowfast.py:146-222).
_SF_CONV_WRAPPED = {"a": True, "b": False, "c": True}
_SF_BN_WRAPPED = {"a_bn": True, "b_bn": True, "c_bn": False}


def torch_slowfast_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """Torch pyslowfast SlowFastRepresentation state_dict
    (reference video_model_builder.py:598-885) -> flax SlowFast pytrees.

    Torch naming: ``s{n}.pathway{p}_stem.conv``, ``s{n}_fuse.conv_f2s``,
    ``s{n}.pathway{p}_res{i}.branch1/branch2.{a,b,c}``, ``fc1``/``fc2``
    projection, ``head.projection`` classifier. Sub-BN checkpoints are
    normalized to plain-BN keys first (sub_to_normal_bn_sd); 2D (4D-kernel)
    conv weights land with kT=1 for the temporal-inflation merge."""
    sd = sub_to_normal_bn_sd(sd)
    params: dict = {}
    stats: dict = {}

    def put_bn(path, torch_prefix, wrapped=True):
        full = path + (("BatchNorm_0",) if wrapped else ())
        _put_bn_leaf(params, stats, full, sd, torch_prefix)

    for k, v in sd.items():
        m = re.match(r"^s(\d)\.pathway(\d)_stem\.(conv|bn)\.(\w+)$", k)
        if m:
            n, p, leaf, field = m.groups()
            base = (f"s{n}_pathway{p}_stem",)
            if leaf == "conv" and field == "weight":
                _set_nested(params, base + ("conv", "Conv_0", "kernel"),
                            _conv_t(v))
            elif leaf == "bn" and field == "weight":
                put_bn(base + ("bn",), f"s{n}.pathway{p}_stem.bn")
            continue
        m = re.match(r"^s(\d)_fuse\.(conv_f2s|bn)\.(\w+)$", k)
        if m:
            n, leaf, field = m.groups()
            base = (f"s{n}_fuse",)
            if leaf == "conv_f2s" and field == "weight":
                _set_nested(params, base + ("conv_f2s", "Conv_0", "kernel"),
                            _conv_t(v))
            elif leaf == "bn" and field == "weight":
                put_bn(base + ("bn",), f"s{n}_fuse.bn")
            continue
        m = re.match(r"^s(\d)\.pathway(\d)_res(\d+)\.(.+)$", k)
        if m:
            n, p, i, rest = m.groups()
            base = (f"s{n}_pathway{p}", f"res{i}")
            tbase = f"s{n}.pathway{p}_res{i}"
            if rest == "branch1.weight":
                _set_nested(params, base + ("branch1", "Conv_0", "kernel"),
                            _conv_t(v))
            elif rest == "branch1_bn.weight":
                put_bn(base + ("branch1_bn",), f"{tbase}.branch1_bn")
            else:
                # BasicTransform (depth 18) has no 'c' conv and wraps both
                # a and b in Conv3d; BottleneckTransform's 'b' is a bare
                # nn.Conv and its c_bn a bare nn.BatchNorm
                bottleneck = f"{tbase}.branch2.c.weight" in sd
                m2 = re.match(r"^branch2\.(a|b|c)\.weight$", rest)
                if m2:
                    leaf = m2.group(1)
                    path = base + ("branch2", leaf)
                    if _SF_CONV_WRAPPED[leaf] or (leaf == "b"
                                                  and not bottleneck):
                        path = path + ("Conv_0",)
                    _set_nested(params, path + ("kernel",), _conv_t(v))
                m2 = re.match(r"^branch2\.(a_bn|b_bn|c_bn)\.weight$", rest)
                if m2:
                    leaf = m2.group(1)
                    put_bn(base + ("branch2", leaf),
                           f"{tbase}.branch2.{leaf}",
                           wrapped=_SF_BN_WRAPPED[leaf])
            continue
        m = re.match(r"^(fc1|fc2)\.(weight|bias)$", k)
        if m:
            name, field = m.groups()
            _set_nested(params, (name, "kernel" if field == "weight"
                                 else "bias"),
                        _dense_t(v) if field == "weight" else v)
            continue
        m = re.match(r"^head\.projection\.(weight|bias)$", k)
        if m:
            field = m.group(1)
            _set_nested(params, ("head_projection",
                                 "kernel" if field == "weight" else "bias"),
                        _dense_t(v) if field == "weight" else v)
    return params, stats


# --------------------------------------------------------------------------
# Caffe2 / 2D-inflation / Sub-BN import (reference
# models/slowfast/slowfast/utils/checkpoint.py:107-389 + c2_model_loading.py)
# --------------------------------------------------------------------------

# Caffe2 blob name -> pyslowfast torch name, applied in order (the mapping
# table of reference c2_model_loading.py:9-112 — a name schema, reproduced
# by necessity so public Caffe2-format SlowFast checkpoints import).
_C2_NAME_RULES = [
    # nonlocal: 'nonlocal_conv3_1_theta_w' -> 's3.pathway0_nonlocal1.conv_theta.weight'
    (r"^nonlocal_conv([0-9]+)_([0-9]+)_(.*)", r"s\1.pathway0_nonlocal\2_\3"),
    (r"^(.*)_nonlocal([0-9]+)_(theta|g|phi|out)(.*)",
     r"\1_nonlocal\2.conv_\3\4"),
    (r"^(.*)_nonlocal([0-9]+)_(bn)_(.*)", r"\1_nonlocal\2.\3.\4"),
    # fast->slow fusion: 't_pool1_subsample*' / 't_resN_i_branch2c_bn_subsample*'
    (r"^t_pool1_subsample_bn_(.*)", r"s1_fuse.bn.\1"),
    (r"^t_pool1_subsample_(.*)", r"s1_fuse.conv_f2s.\1"),
    (r"^t_res([0-9]+)_([0-9]+)_branch2c_bn_subsample_bn_(.*)",
     r"s\1_fuse.bn.\3"),
    (r"^t_res([0-9]+)_([0-9]+)_branch2c_bn_subsample_(.*)",
     r"s\1_fuse.conv_f2s.\3"),
    # slow pathway residual blocks + stem
    (r"^res([0-9]+)_([0-9]+)_branch([0-9]+)([a-z])_(.*)",
     r"s\1.pathway0_res\2.branch\3.\4_\5"),
    (r"^res_conv1_bn_(.*)", r"s1.pathway0_stem.bn.\1"),
    (r"^conv1_(.*)", r"s1.pathway0_stem.conv.\1"),
    (r"^res([0-9]+)_([0-9]+)_branch([0-9]+)_(.*)",
     r"s\1.pathway0_res\2.branch\3_\4"),
    (r"^res_conv1_(.*)", r"s1.pathway0_stem.conv.\1"),
    # fast pathway ('t_' prefix)
    (r"^t_res([0-9]+)_([0-9]+)_branch([0-9]+)([a-z])_(.*)",
     r"s\1.pathway1_res\2.branch\3.\4_\5"),
    (r"^t_res_conv1_bn_(.*)", r"s1.pathway1_stem.bn.\1"),
    (r"^t_conv1_(.*)", r"s1.pathway1_stem.conv.\1"),
    (r"^t_res([0-9]+)_([0-9]+)_branch([0-9]+)_(.*)",
     r"s\1.pathway1_res\2.branch\3_\4"),
    (r"^t_res_conv1_(.*)", r"s1.pathway1_stem.conv.\1"),
    # classifier head + parameter-suffix normalization
    (r"pred_(.*)", r"head.projection.\1"),
    (r"(.*)bn.b\Z", r"\1bn.bias"),
    (r"(.*)bn.s\Z", r"\1bn.weight"),
    (r"(.*)bn.rm\Z", r"\1bn.running_mean"),
    (r"(.*)bn.riv\Z", r"\1bn.running_var"),
    (r"(.*)[\._]b\Z", r"\1.bias"),
    (r"(.*)[\._]w\Z", r"\1.weight"),
]


def caffe2_name_to_torch(name: str) -> str:
    """Apply the Caffe2->pytorch naming rules in order (reference
    get_name_convert_func, c2_model_loading.py:9-112)."""
    for src, dst in _C2_NAME_RULES:
        name = re.sub(src, dst, name)
    return name


def _is_c2_solver_blob(key: str) -> bool:
    """Caffe2 solver/bookkeeping blobs that are not model weights. The
    reference uses these substrings only to SUPPRESS warnings for
    unconvertible blobs (c2_model_loading.py / checkpoint.py:250-258);
    match them as name segments — not bare substrings — so a weight blob
    whose name merely contains e.g. 'lr' is converted, not dropped."""
    return (key == "lr" or key.endswith("_lr")
            or key == "momentum" or key.endswith("_momentum")
            or key == "model_iter" or key.endswith("_model_iter")
            or key.startswith("__"))


def caffe2_blobs_to_torch_sd(blobs: Dict[str, np.ndarray],
                             verbose: bool = True) -> Dict[str, np.ndarray]:
    """{caffe2 blob name: array} -> pyslowfast-style torch state_dict
    (reference load_checkpoint convert_from_caffe2 branch,
    slowfast/utils/checkpoint.py:206-263). Caffe2 conv blobs share torch's
    (Cout, Cin, kT, kH, kW) layout, so the arch converters below apply
    unchanged."""
    sd, skipped = {}, []
    for key, blob in blobs.items():
        if _is_c2_solver_blob(key):
            skipped.append(key)
            continue
        sd[caffe2_name_to_torch(key)] = np.asarray(blob)
    if skipped and verbose:
        print(f"caffe2 import: skipped {len(skipped)} solver/bookkeeping "
              f"blobs (first: {skipped[0]})")
    return sd


def load_caffe2_checkpoint(path: str) -> Dict[str, Any]:
    """Load a Caffe2 pickle ``{"blobs": {...}}`` (the public pretrained
    SlowFast distribution format) into the torch-import payload shape."""
    import pickle

    with open(path, "rb") as f:
        ckpt = pickle.load(f, encoding="latin1")
    blobs = ckpt["blobs"] if isinstance(ckpt, dict) and "blobs" in ckpt \
        else ckpt
    return {"torch_state_dict": caffe2_blobs_to_torch_sd(blobs),
            "epoch": 0, "best_prec1": 0.0}


def sub_to_normal_bn_sd(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Normalize Sub-BN checkpoints to plain-BN keys (reference
    sub_to_normal_bn, slowfast/utils/checkpoint.py:290-329): ``bn.bn.*``
    running stats -> ``bn.*``, ``bn.split_bn.*`` dropped, (C,1,1,1)-shaped
    bn affines squeezed to (C,). Idempotent on normal state dicts."""
    out = {}
    for key, v in sd.items():
        if ".split_bn." in key:
            continue
        if key.endswith(("bn.bn.running_mean", "bn.bn.running_var",
                         "bn.bn.num_batches_tracked")):
            key = key.replace("bn.bn.", "bn.")
        elif "bn.bn." in key:
            continue  # duplicate affine copy held by the wrapper
        if key.endswith(("bn.weight", "bn.bias")) and np.ndim(v) == 4:
            v = v[:, 0, 0, 0]
        out[key] = v
    return out


_ARCH_CONVERTERS = {
    "3dresnet": None,  # torch_resnet3d_to_flax (special: skip_heads arg)
    "s3d": "torch_s3d_to_flax",
    "r3d": "torch_r3d_to_flax",
    "slowfast": "torch_slowfast_to_flax",
    "info_nce": "torch_moco_encoder_to_flax",
    "uber_nce": "torch_moco_encoder_to_flax",
}


def torch_to_flax(sd: Dict[str, np.ndarray], arch: str,
                  skip_heads: bool = False,
                  stem_s2d: bool = False) -> Tuple[dict, dict]:
    """Arch-dispatching torch state_dict converter (checkpoint-fidelity
    surface: same ckpt -> same retrieval ranks, BASELINE.json).

    ``stem_s2d`` must mirror the live model's ``TPU.STEM_S2D`` — without
    the kernel transform the imported (7,7,7,C,O) conv1 shape-mismatches
    the s2d stem and silently stays at random init."""
    if arch == "3dresnet":
        return torch_resnet3d_to_flax(sd, skip_heads=skip_heads,
                                      stem_s2d=stem_s2d)
    if arch in ("s3d", "s3dg"):
        if any(k.startswith("final_fc.") for k in sd):
            return torch_linear_classifier_to_flax(sd)
        return torch_s3d_to_flax(sd)
    if arch == "r3d":
        return torch_r3d_to_flax(sd)
    if arch == "slowfast":
        return torch_slowfast_to_flax(sd)
    if arch in ("info_nce", "uber_nce"):
        return torch_moco_encoder_to_flax(sd)
    raise ValueError(f"no torch converter for arch {arch!r}")


def merge_pretrained(init_params, init_stats, loaded_params, loaded_stats,
                     verbose: bool = True,
                     inflate_temporal: bool = False) -> Tuple[Any, Any]:
    """'neq' partial load: take loaded values where the path+shape matches,
    keep init elsewhere (reference coclr_utils/utils.py:93-118).

    ``inflate_temporal``: a loaded conv kernel of temporal size 1 whose
    other dims match a (kT, kH, kW, Cin, Cout) target is tiled kT times and
    divided by kT — the Carreira-Zisserman 2D->3D inflation (reference
    inflate_weight, slowfast/utils/checkpoint.py:139-175): a temporally
    constant input then produces exactly the 2D network's activations."""
    matched, skipped, inflated = 0, 0, 0

    def merge(init_tree, loaded_tree):
        nonlocal matched, skipped, inflated
        out = {}
        for k, v in init_tree.items():
            if isinstance(v, dict):
                out[k] = merge(v, loaded_tree.get(k, {}))
                continue
            lv = loaded_tree.get(k) if isinstance(loaded_tree, dict) else None
            if lv is not None and tuple(np.shape(lv)) == tuple(np.shape(v)):
                out[k] = jnp.asarray(lv)
                matched += 1
            elif (inflate_temporal and lv is not None
                  and np.ndim(lv) == 5 and np.ndim(v) == 5
                  and np.shape(lv)[0] == 1
                  and tuple(np.shape(lv)[1:]) == tuple(np.shape(v)[1:])):
                kt = np.shape(v)[0]
                out[k] = jnp.tile(jnp.asarray(lv), (kt, 1, 1, 1, 1)) / kt
                inflated += 1
            else:
                out[k] = v
                skipped += 1
        return out

    new_params = merge(init_params, loaded_params)
    new_stats = merge(init_stats, loaded_stats)
    if verbose:
        msg = (f"partial load: matched {matched} tensors, "
               f"kept {skipped} at init")
        if inflate_temporal:
            msg += f", temporally inflated {inflated}"
        print(msg)
    return new_params, new_stats
