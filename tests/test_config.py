"""Config system tests: defaults, YAML merge, opts merge, CLI overrides."""

import os

from video_similarity_search_tpu.config import arg_parser, get_cfg, load_config

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_defaults_match_reference_keys():
    cfg = get_cfg()
    # Spot-check defaults against reference config/default_params.py
    assert cfg.TRAIN.EPOCHS == 300
    assert cfg.TRAIN.BATCH_SIZE == 16
    assert cfg.VAL.METRIC == "global"
    assert cfg.MODEL.ARCH == "slowfast"
    assert cfg.DATASET.POSITIVE_SAMPLING_P == 0.8
    assert cfg.RESNET.MODEL_DEPTH == 18
    assert cfg.RESNET.NO_MAX_POOl is True
    assert cfg.DATA.SAMPLE_DURATION == 8
    assert cfg.LOSS.MARGIN == 0.2
    assert cfg.LOSS.T == 0.07
    assert cfg.OPTIM.MOMENTUM == 0.5
    assert cfg.ITERCLUSTER.K == 1000
    assert cfg.ITERCLUSTER.L2_NORMALIZE is True


def test_clone_isolated():
    a = get_cfg()
    b = get_cfg()
    a.TRAIN.BATCH_SIZE = 999
    assert b.TRAIN.BATCH_SIZE == 16


def test_yaml_merge_preset():
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIGS, "resnet_ucf_itercluster_flow.yaml"))
    assert cfg.TRAIN.EPOCHS == 600
    assert cfg.TRAIN.BATCH_SIZE == 32
    assert cfg.MODEL.ARCH == "3dresnet"
    assert cfg.DATASET.POS_CHANNEL_REPLACE is True
    assert cfg.DATASET.CHANNEL_EXTENSIONS == "optical_u"
    assert cfg.DATA.SAMPLE_SIZE == 128
    assert cfg.DATA.SAMPLE_DURATION == 16
    assert cfg.ITERCLUSTER.METHOD == "finch"
    assert cfg.OPTIM.LR == 0.1
    # untouched keys keep defaults
    assert cfg.VAL.BATCH_SIZE == 80


def test_merge_from_list_coercion():
    cfg = get_cfg()
    cfg.merge_from_list(["TRAIN.BATCH_SIZE", "64", "LOSS.DIST_METRIC", "euclidean",
                         "ITERCLUSTER.ADAPTIVEP", "True"])
    assert cfg.TRAIN.BATCH_SIZE == 64
    assert cfg.LOSS.DIST_METRIC == "euclidean"
    assert cfg.ITERCLUSTER.ADAPTIVEP is True


def test_cli_precedence():
    parser = arg_parser()
    args = parser.parse_args(
        ["--cfg", os.path.join(CONFIGS, "resnet_hmdb.yaml"),
         "--batch_size", "8", "--sampling_strategy", "fixed_semi_hard",
         "TRAIN.EPOCHS", "5"]
    )
    cfg = load_config(args)
    assert cfg.TRAIN.DATASET == "hmdb51"
    assert cfg.TRAIN.EPOCHS == 5        # opts beat YAML
    assert cfg.TRAIN.BATCH_SIZE == 8    # flag beats all
    assert cfg.DATASET.SAMPLING_STRATEGY == "fixed_semi_hard"


def test_optim_schedule_drives_optimizer():
    """OPTIM.SCHEDULE epoch milestones produce x0.1 LR drops through the
    driver's optimizer (the reference defines the key but never consumes
    it, config/default_params.py:150)."""
    import jax.numpy as jnp
    import numpy as np

    from video_similarity_search_tpu.config import get_cfg
    from video_similarity_search_tpu.train.state import make_optimizer

    cfg = get_cfg()
    cfg.OPTIM.OPTIMIZER = "sgd"
    cfg.OPTIM.LR = 0.1
    cfg.OPTIM.MOMENTUM = 0.0
    cfg.OPTIM.SCHEDULE = [2]
    tx = make_optimizer(cfg, steps_per_epoch=3)
    params = {"w": jnp.ones(2)}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones(2)}
    mags = []
    for _ in range(9):
        upd, opt_state = tx.update(grads, opt_state, params)
        mags.append(abs(float(upd["w"][0])))
    # steps 0-5 (epochs 0-1): lr 0.1; steps 6-8 (epoch 2+): lr 0.01
    np.testing.assert_allclose(mags[:6], [0.1] * 6, rtol=1e-5)
    np.testing.assert_allclose(mags[6:], [0.01] * 3, rtol=1e-5)
