"""Model registry: cfg -> flax module.

Same dispatch surface as the reference ``model_selector``
(models/model_utils.py:33-127): ARCH in {3dresnet, slowfast, info_nce,
uber_nce, s3d, r3d}, wiring projection/classifier heads and the SlowFast
sub-config (ALPHA/BETA_INV/FUSION_*/DEPTH promoted into cfg.SLOWFAST).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from .heads import R3DEmbedder, S3DEmbedder
from .moco import MoCoEncoder
from .resnet3d import generate_model
from .slowfast import SlowFast

ARCHES = ("3dresnet", "slowfast", "info_nce", "uber_nce", "s3d", "r3d")


def _parse_remat_stages(spec) -> Optional[tuple]:
    """``TPU.REMAT_STAGES`` '1' / '1,2' -> (1, 2); ''/None -> None (= all
    stages when TPU.REMAT)."""
    if not spec:
        return None
    if isinstance(spec, (list, tuple)):
        return tuple(int(s) for s in spec)
    return tuple(int(s) for s in str(spec).split(","))


def _dtype_from_cfg(cfg) -> Any:
    name = str(cfg.TPU.COMPUTE_DTYPE).lower() if "TPU" in cfg else "float32"
    return {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
            "float32": jnp.float32, "fp32": jnp.float32}.get(name, jnp.float32)


def embedding_dim(cfg) -> int:
    """Output embedding dim of the arch's projection head."""
    arch = cfg.MODEL.ARCH
    if arch == "3dresnet":
        return cfg.RESNET.OUT_DIM
    if arch == "slowfast":
        return cfg.SLOWFAST.OUT_DIM
    return 128  # s3d / r3d / info_nce / uber_nce embedders


def model_selector(cfg, projection_head: bool = True, classifier: bool = False,
                   dropout: Optional[float] = None, num_classes: int = 101,
                   axis_name: Optional[str] = None, dtype: Any = None):
    """Build the encoder module named by ``cfg.MODEL.ARCH``.

    Returns a flax module whose __call__ takes (B,T,H,W,C) clips —
    SlowFast takes the [slow, fast] list from
    :func:`video_similarity_search_tpu.models.slowfast.multipathway_input`.
    """
    arch = cfg.MODEL.ARCH
    assert arch in ARCHES, f"unknown arch {arch!r}"
    if dtype is None:
        dtype = _dtype_from_cfg(cfg)

    if arch == "3dresnet":
        return generate_model(
            model_depth=cfg.RESNET.MODEL_DEPTH,
            hidden_layer=cfg.RESNET.HIDDEN_LAYER,
            out_dim=cfg.RESNET.OUT_DIM,
            num_classes=num_classes,
            n_input_channels=cfg.DATA.INPUT_CHANNEL_NUM,
            shortcut_type=cfg.RESNET.SHORTCUT,
            conv1_t_size=cfg.RESNET.CONV1_T_SIZE,
            conv1_t_stride=cfg.RESNET.CONV1_T_STRIDE,
            no_max_pool=cfg.RESNET.NO_MAX_POOl,
            widen_factor=cfg.RESNET.WIDEN_FACTOR,
            projection_head=projection_head,
            predict_temporal_ds=cfg.MODEL.PREDICT_TEMPORAL_DS,
            attention=cfg.RESNET.ATTENTION,
            classifier=classifier,
            dropout=dropout,
            stem_s2d=bool(cfg.TPU.STEM_S2D) if "TPU" in cfg else False,
            remat=bool(cfg.TPU.REMAT) if "TPU" in cfg else False,
            remat_stages=_parse_remat_stages(
                cfg.TPU.REMAT_STAGES) if "TPU" in cfg else None,
            dtype=dtype,
            axis_name=axis_name,
        )
    if arch == "s3d":
        return S3DEmbedder(dim=128, dtype=dtype, axis_name=axis_name)
    if arch == "r3d":
        return R3DEmbedder(dim=128, dtype=dtype, axis_name=axis_name)
    if arch == "slowfast":
        n_ch = cfg.DATA.INPUT_CHANNEL_NUM
        in_ch = (3, 3) if cfg.SLOWFAST.FAST_MASK else (n_ch, n_ch)
        if cfg.SLOWFAST.FAST_MASK:
            assert n_ch == 4, "FAST_MASK expects a 4th mask channel"
        return SlowFast(
            depth=cfg.SLOWFAST.DEPTH,
            alpha=cfg.SLOWFAST.ALPHA,
            beta_inv=cfg.SLOWFAST.BETA_INV,
            fusion_conv_channel_ratio=cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO,
            fusion_kernel_sz=cfg.SLOWFAST.FUSION_KERNEL_SZ,
            input_channels=in_ch,
            projection_head=projection_head and not classifier,
            projection2_out=cfg.SLOWFAST.OUT_DIM,
            classifier=classifier,
            num_classes=num_classes if classifier else cfg.SLOWFAST.NUM_CLASSES,
            dropout_rate=cfg.SLOWFAST.DROPOUT_RATE if dropout is None else dropout,
            dtype=dtype,
            axis_name=axis_name,
        )
    if arch in ("info_nce", "uber_nce"):
        # encoder only; queue/momentum state lives in train.state.MoCoState
        return MoCoEncoder(network="s3d", dim=128, dtype=dtype,
                           axis_name=axis_name)
    raise AssertionError
