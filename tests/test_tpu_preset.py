"""The TPU-optimized preset (configs/resnet_kin_itercluster_flow_tpu.yaml,
round-4 verdict item 5): the measured-best v5e training configuration —
TRAIN.ACCUM_STEPS at 128-clip microbatches (PERF.md accumulation table,
343.5 clips/s vs 311.9 plain) — must ship as a preset, merge cleanly, and
drive the full driver end-to-end with its structural knobs active.
Reference recipe it extends: resnet_kin_itercluster_flow.yaml (B=104 on 8
GPUs, README.md:37-40) — the effective batch here (2048 clips) exceeds it
on one chip."""

import argparse
import os

import jax
import numpy as np
import pytest

from synthetic_data import make_synthetic_ucf
from video_similarity_search_tpu.config import get_cfg
from video_similarity_search_tpu.train.driver import train

CONFIGS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")
PRESET = os.path.join(CONFIGS, "resnet_kin_itercluster_flow_tpu.yaml")


def test_tpu_preset_merges_and_is_consistent():
    cfg = get_cfg()
    cfg.merge_from_file(PRESET)
    # the measured optimum: 16 microbatches x 64 anchors = 128 clips each
    assert cfg.TRAIN.ACCUM_STEPS == 16
    assert cfg.TRAIN.BATCH_SIZE == 1024
    assert cfg.TRAIN.BATCH_SIZE % cfg.TRAIN.ACCUM_STEPS == 0
    anchors_per_micro = cfg.TRAIN.BATCH_SIZE // cfg.TRAIN.ACCUM_STEPS
    assert 2 * anchors_per_micro == 128  # the MXU tiling optimum
    # input-path knobs measured net-positive ship enabled
    assert cfg.TPU.HOST_RRC is True
    assert cfg.TPU.PREFETCH_DEVICE_PUT is True
    # recipe semantics unchanged from the base preset
    assert cfg.OPTIM.LR == pytest.approx(0.1)
    assert cfg.RESNET.MODEL_DEPTH == 18
    assert cfg.DATA.SAMPLE_SIZE == 128 and cfg.DATA.SAMPLE_DURATION == 16
    assert cfg.ITERCLUSTER.METHOD == "finch"
    assert cfg.LOSS.LOCAL_LOCAL_CONTRAST is True


def test_tpu_preset_structure_driver_e2e(tmp_path):
    """The preset's structural path — ACCUM_STEPS>1 microbatch scan +
    HOST_RRC native decode + producer device upload + LLC extra clip —
    runs one driver epoch end-to-end on the 8-device mesh (shapes scaled
    down for CI; the STRUCTURE is the preset's)."""
    assert jax.device_count() == 8
    vid_path, ann_path = make_synthetic_ucf(str(tmp_path / "data"),
                                            videos_per_class=8)
    cfg = get_cfg()
    cfg.merge_from_file(PRESET)
    # scale down for the CPU mesh; keep every structural knob
    cfg.TRAIN.DATASET = "ucf101"  # synthetic UCF-format tree
    cfg.TRAIN.BATCH_SIZE = 16
    cfg.TRAIN.ACCUM_STEPS = 2   # >1 keeps the scan-of-microbatches path
    cfg.TRAIN.EPOCHS = 1
    cfg.TRAIN.NUM_DATA_WORKERS = 2
    cfg.VAL.BATCH_SIZE = 8
    cfg.RESNET.MODEL_DEPTH = 10
    cfg.RESNET.HIDDEN_LAYER = 64
    cfg.RESNET.OUT_DIM = 16
    cfg.DATA.SAMPLE_DURATION = 4
    cfg.DATA.SAMPLE_SIZE = 16
    cfg.DATASET.VID_PATH = vid_path
    cfg.DATASET.ANNOTATION_PATH = ann_path
    cfg.DATASET.POSITIVE_SAMPLING_P = 1.0
    # synthetic tree has no optical-flow channel files
    cfg.DATASET.POS_CHANNEL_REPLACE = False
    cfg.DATASET.CHANNEL_EXTENSIONS = ""
    cfg.OPTIM.LR = 0.01
    cfg.OUTPUT_PATH = str(tmp_path / "out")
    cfg.TPU.COMPUTE_DTYPE = "float32"
    os.makedirs(cfg.OUTPUT_PATH, exist_ok=True)
    args = argparse.Namespace(checkpoint_path=None, start_epoch=None,
                              iterative_cluster=False, vector=False)
    state = train(args, cfg)
    # optimizer applied once per GLOBAL batch (not per microbatch): with
    # 21 train videos and 16 anchors/global batch there is exactly 1
    # static-shape global batch per epoch
    assert int(np.asarray(state.step)) >= 1
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8
    logs = os.path.join(cfg.OUTPUT_PATH, "tnet_checkpoints")
    assert os.path.exists(os.path.join(logs, "train_loss_and_acc.txt"))
