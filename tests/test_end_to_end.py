"""Minimum end-to-end slice (SURVEY §7.2 step 6): synthetic UCF-style data
-> triplet loader -> fused device augmentation -> jitted train steps (loss
decreases) -> embedding pass -> clustering -> retrieval -> checkpoint
round-trip.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthetic_data import make_synthetic_ucf
from video_similarity_search_tpu.config import get_cfg
from video_similarity_search_tpu.data import build_data_loader
from video_similarity_search_tpu.models import model_selector
from video_similarity_search_tpu.train import (create_train_state,
                                               make_triplet_train_step)
from video_similarity_search_tpu.train.driver import (_device_batch,
                                                      triplet_train_epoch)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    vid_path, ann_path = make_synthetic_ucf(str(root))
    return vid_path, ann_path


@pytest.fixture(scope="module")
def cfg(synth):
    vid_path, ann_path = synth
    cfg = get_cfg()
    cfg.MODEL.ARCH = "3dresnet"
    cfg.RESNET.MODEL_DEPTH = 10
    cfg.RESNET.NO_MAX_POOl = True
    cfg.RESNET.HIDDEN_LAYER = 64
    cfg.RESNET.OUT_DIM = 16
    cfg.DATA.SAMPLE_DURATION = 4
    cfg.DATA.SAMPLE_SIZE = 16
    cfg.TRAIN.DATASET = "ucf101"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TRAIN.NUM_DATA_WORKERS = 2
    cfg.VAL.BATCH_SIZE = 4
    cfg.DATASET.VID_PATH = vid_path
    cfg.DATASET.ANNOTATION_PATH = ann_path
    cfg.DATASET.SAMPLING_STRATEGY = "random_semi_hard"
    cfg.DATASET.POSITIVE_SAMPLING_P = 1.0
    cfg.OPTIM.LR = 0.01
    return cfg


def test_loader_yields_batches(cfg):
    loader, (dataset, idx_to_class) = build_data_loader(
        "train", cfg, triplets=True)
    assert len(dataset) == 9  # 3 classes x 3 training videos
    assert len(idx_to_class) == 3
    batch = next(iter(loader))
    assert batch["anchor"].shape == (4, 4, 32, 32, 3)  # 2x sample_size buffer
    assert batch["anchor"].dtype == np.uint8
    assert batch["targets"].shape == (8,)


def test_train_steps_and_loss(cfg):
    """Overfit one fixed batch: the triplet loss must actually decrease."""
    loader, _ = build_data_loader("train", cfg, triplets=True)
    model = model_selector(cfg)
    sample = jnp.zeros((2, 4, 16, 16, 3))
    state = create_train_state(jax.random.key(0), model, cfg, sample)
    step_fn = make_triplet_train_step(cfg)

    batch = next(iter(loader))
    key = jax.random.key(7)
    dev = _device_batch(batch, cfg, key, train=True)  # fixed augmented batch
    losses = []
    for i in range(10):
        state, metrics = step_fn(state, dev, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == len(losses)
    # overfitting a single batch must drive the mined-triplet loss down
    assert np.mean(losses[-3:]) < losses[0]


def test_validation_negative_loader(cfg):
    loader, _ = build_data_loader("val", cfg, triplets=True,
                                  negative_sampling=True)
    batch = next(iter(loader))
    assert "negative" in batch
    # val buffer is eval-mode: sample_size, not 2x
    assert batch["negative"].shape[2] == 16


def test_embed_cluster_retrieve(cfg):
    from video_similarity_search_tpu.cluster import fit_cluster
    from video_similarity_search_tpu.evaluation import (
        get_embeddings_and_labels, topk_retrieval_acc)

    model = model_selector(cfg)
    sample = jnp.zeros((2, 4, 16, 16, 3))
    state = create_train_state(jax.random.key(0), model, cfg, sample)
    loader, _ = build_data_loader("train", cfg, triplets=False,
                                  req_train_shuffle=False, drop_last=False)
    emb, labels, idx = get_embeddings_and_labels(state, model, cfg, loader,
                                                 verbose=False)
    assert emb.shape == (9, 16)
    assert sorted(idx.tolist()) == list(range(9))

    cluster_labels = fit_cluster(emb, method="finch", verbose=False)
    assert cluster_labels.shape == (9,)

    topk = topk_retrieval_acc(emb, labels, emb, labels, ks=(1, 5),
                              exclude_self=True)
    assert 0.0 <= topk[1] <= 1.0 and 0.0 <= topk[5] <= 1.0


def test_checkpoint_roundtrip(cfg, tmp_path):
    from video_similarity_search_tpu.train import (load_checkpoint,
                                                   restore_train_state,
                                                   save_checkpoint)

    model = model_selector(cfg)
    sample = jnp.zeros((2, 4, 16, 16, 3))
    state = create_train_state(jax.random.key(0), model, cfg, sample)
    path = save_checkpoint(str(tmp_path), "3dresnet", state, epoch=3,
                           best_prec1=0.5, is_best=True)
    payload = load_checkpoint(path)
    state2 = create_train_state(jax.random.key(1), model, cfg, sample)
    state2, start_epoch, best = restore_train_state(state2, payload)
    assert start_epoch == 4 and best == 0.5
    chex_equal = jax.tree.all(jax.tree.map(
        lambda a, b: jnp.allclose(a, b), state.params, state2.params))
    assert bool(chex_equal)
    assert os.path.exists(os.path.join(str(tmp_path), "tnet_checkpoints",
                                       "3dresnet", "model_best"))


def test_temporal_heat_map(cfg, tmp_path):
    """Intended behavior of reference evaluate.py:402-483: distance of
    sliding exemplar windows to a fixed test clip, rendered to a PNG."""
    from video_similarity_search_tpu.evaluation import temporal_heat_map

    model = model_selector(cfg)
    sample = jnp.zeros((2, 4, 16, 16, 3))
    state = create_train_state(jax.random.key(0), model, cfg, sample)
    _, (dataset, _) = build_data_loader("train", cfg, triplets=False,
                                        req_train_shuffle=False,
                                        drop_last=False)
    out = str(tmp_path / "hm.png")
    positions, dists = temporal_heat_map(state, model, cfg, dataset,
                                         exemplar_idx=0, test_idx=1,
                                         out_png=out)
    # 24 frames, D=4, stride 2 -> windows at 4,6,...,22
    assert len(positions) == len(dists) == 10
    assert np.all(np.isfinite(dists)) and np.all(dists >= 0)
    assert os.path.exists(out)


def test_channel_extension_concat(cfg, synth):
    """Without POS_CHANNEL_REPLACE, channel extensions CONCAT into the
    input channels (reference dataset_utils.py:96-103, data_loader.py:233:
    len(ext)+3 == INPUT_CHANNEL_NUM)."""
    from synthetic_data import add_synthetic_flow

    vid_path, ann_path = synth
    u_root, v_root = add_synthetic_flow(os.path.dirname(ann_path))
    cfg2 = cfg.clone()
    cfg2.DATASET.CHANNEL_EXTENSIONS = "optical_u,optical_v"
    cfg2.DATASET.OPTICAL_U_PATH = u_root
    cfg2.DATASET.OPTICAL_V_PATH = v_root
    cfg2.DATASET.POS_CHANNEL_REPLACE = False
    cfg2.DATA.INPUT_CHANNEL_NUM = 5
    loader, _ = build_data_loader("train", cfg2, triplets=True)
    batch = next(iter(loader))
    assert batch["anchor"].shape[-1] == 5
    assert batch["positive"].shape[-1] == 5


def test_evaluate_crop_center_vs_windows(cfg, synth):
    """--crop center: one center clip per test video; avg: every
    non-overlapping window (reference evaluate.py:89-143)."""
    vid_path, ann_path = synth
    cfg2 = cfg.clone()
    # synthetic annotation has no 'test' subset; use with_test data
    import tempfile

    from synthetic_data import make_synthetic_ucf

    root = tempfile.mkdtemp()
    vp, ap = make_synthetic_ucf(root, videos_per_class=5, with_test=True)
    cfg2.DATASET.VID_PATH = vp
    cfg2.DATASET.ANNOTATION_PATH = ap
    win_loader, (win_ds, _) = build_data_loader(
        "test", cfg2, triplets=False, drop_last=False, batch_size=1)
    cen_loader, (cen_ds, _) = build_data_loader(
        "test", cfg2, triplets=False, drop_last=False, batch_size=1,
        test_windows=False)
    wi = win_ds[0]["clip"]
    ci = cen_ds[0]["clip"]
    assert wi.ndim == 5 and wi.shape[0] > 1  # (windows, T, H, W, C)
    assert ci.ndim == 4  # single center clip


def test_salient_replace_rejection(cfg, synth):
    """An (almost) empty salient mask is REJECTED as a positive
    replacement and the RGB clip is used instead (reference
    dataset_utils.py:86-90, SALIENT_MASK_THRESHOLD)."""
    from video_similarity_search_tpu.data.datasets import ClipReader

    vid_path, _ = synth

    class ZeroLoader:
        def __call__(self, path, frame_indices):
            return [np.zeros((20, 20, 1), np.uint8)
                    for _ in frame_indices]

    class OnesLoader:
        def __call__(self, path, frame_indices):
            return [np.full((20, 20, 1), 255, np.uint8)
                    for _ in frame_indices]

    sample = {
        "video": os.path.join(vid_path, "class0", "v_class0_g00_c01"),
        "salient": "unused",
        "num_frames": 8,
    }
    # empty mask -> rejected -> RGB clip (3 channels, not a mask replica)
    reader = ClipReader({"salient": ("unused", ZeroLoader())},
                        buffer_size=16, eval_mode=False,
                        prob_pos_channel_replace=1.0,
                        rng=np.random.default_rng(0))
    clip = reader.load(sample, [1, 2, 3, 4], pos_channel_replace=True)
    assert clip.shape == (4, 16, 16, 3)
    assert not (clip[..., 0] == clip[..., 1]).all()  # real RGB, not mask x3

    # non-empty mask -> replaced: 3 identical channels
    reader = ClipReader({"salient": ("unused", OnesLoader())},
                        buffer_size=16, eval_mode=False,
                        prob_pos_channel_replace=1.0,
                        rng=np.random.default_rng(0))
    clip = reader.load(sample, [1, 2, 3, 4], pos_channel_replace=True)
    np.testing.assert_array_equal(clip[..., 0], clip[..., 1])
    np.testing.assert_array_equal(clip[..., 1], clip[..., 2])
