"""Driver-level end-to-end tests on the virtual 8-device mesh.

Covers the reference ``online_train.train`` control flow (online_train.py:
441-776) as rebuilt in ``train/driver.py``: mesh-sharded triplet training,
LOSS.TYPE dispatch to contrastive (NCE banks) and UberNCE (MoCo queue)
paths, the every-10-epochs retrieval eval, --vector checkpointing, and
static (pad+mask) batch shapes across a ragged tail.
"""

import argparse
import os

import jax
import numpy as np
import pytest

from synthetic_data import make_synthetic_ucf
from video_similarity_search_tpu.config import get_cfg
from video_similarity_search_tpu.train.driver import train


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_driver")
    vid_path, ann_path = make_synthetic_ucf(str(root))
    return vid_path, ann_path


def _base_cfg(synth, out_dir, arch="3dresnet"):
    vid_path, ann_path = synth
    cfg = get_cfg()
    cfg.MODEL.ARCH = arch
    cfg.RESNET.MODEL_DEPTH = 10
    cfg.RESNET.NO_MAX_POOl = True
    cfg.RESNET.HIDDEN_LAYER = 64
    cfg.RESNET.OUT_DIM = 16
    cfg.DATA.SAMPLE_DURATION = 4
    cfg.DATA.SAMPLE_SIZE = 16
    cfg.TRAIN.DATASET = "ucf101"
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.EPOCHS = 1
    cfg.TRAIN.NUM_DATA_WORKERS = 2
    cfg.TRAIN.LOG_INTERVAL = 100
    cfg.VAL.BATCH_SIZE = 8
    cfg.DATASET.VID_PATH = vid_path
    cfg.DATASET.ANNOTATION_PATH = ann_path
    cfg.DATASET.SAMPLING_STRATEGY = "random_semi_hard"
    cfg.DATASET.POSITIVE_SAMPLING_P = 1.0
    cfg.OPTIM.LR = 0.01
    cfg.OUTPUT_PATH = str(out_dir)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def _args(**kw):
    defaults = dict(checkpoint_path=None, start_epoch=None,
                    iterative_cluster=False, vector=False)
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def test_driver_triplet_mesh_end_to_end(synth, tmp_path):
    """One full epoch of driver.train on the 8-device mesh: sharded
    batches, validation, epoch-0 retrieval eval, checkpoint."""
    assert jax.device_count() == 8
    cfg = _base_cfg(synth, tmp_path)
    state = train(_args(), cfg)
    assert int(np.asarray(state.step)) > 0
    # metric logs written (reference txt-log surface)
    logs = os.path.join(str(tmp_path), "tnet_checkpoints")
    assert os.path.exists(os.path.join(logs, "train_loss_and_acc.txt"))
    assert os.path.exists(os.path.join(logs, "val_loss_and_acc.txt"))
    # epoch 0 %10==0 -> retrieval eval ran (reference online_train.py:736)
    assert os.path.exists(os.path.join(logs, "global_retrieval_acc.txt"))
    assert os.path.exists(os.path.join(str(tmp_path), "tnet_checkpoints",
                                       "3dresnet", "checkpoint"))
    # every param is laid out over the mesh (replicated) not a single device
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_driver_contrastive_end_to_end(synth, tmp_path):
    """LOSS.TYPE='contrastive' runs end-to-end through the driver: NCE
    banks live in the state and update, losses are finite, and two epoch
    lines land in the log. (The loss-decrease assertion lives in the
    deterministic step-level overfit test,
    test_contrastive_step_overfits_fixed_batch — epoch-over-epoch loss on
    9 synthetic videos is too noisy to assert on.)"""
    cfg = _base_cfg(synth, tmp_path)
    cfg.LOSS.TYPE = "contrastive"
    cfg.LOSS.FEAT_DIM = 16
    cfg.LOSS.K = 4  # few negatives on 9 videos
    cfg.TRAIN.EPOCHS = 2
    cfg.OPTIM.LR = 0.003  # NCE on 9 videos diverges at larger lrs
    state = train(_args(), cfg)
    assert state.nce is not None
    # memory banks renormalized to unit rows once touched
    norms = np.linalg.norm(np.asarray(state.nce.memory_l), axis=1)
    assert np.all(np.isfinite(norms))
    lines = open(os.path.join(str(tmp_path), "tnet_checkpoints",
                              "train_loss_and_acc.txt")).read().splitlines()
    losses = [float(l.split()[-1]) for l in lines]
    assert len(losses) == 2
    assert all(np.isfinite(losses))


def test_contrastive_step_overfits_fixed_batch():
    """Deterministic NCE convergence: repeated steps on one fixed batch
    must drive the contrastive loss down (VERDICT round-1 item 3)."""
    import jax.numpy as jnp

    from video_similarity_search_tpu.losses import init_nce_state
    from video_similarity_search_tpu.models import model_selector
    from video_similarity_search_tpu.train import (
        create_train_state, make_contrastive_train_step)

    cfg = get_cfg()
    cfg.MODEL.ARCH = "3dresnet"
    cfg.RESNET.MODEL_DEPTH = 10
    cfg.RESNET.NO_MAX_POOl = True
    cfg.RESNET.HIDDEN_LAYER = 32
    cfg.RESNET.OUT_DIM = 8
    cfg.DATA.SAMPLE_DURATION = 4
    cfg.DATA.SAMPLE_SIZE = 16
    cfg.OPTIM.LR = 0.01
    cfg.TPU.COMPUTE_DTYPE = "float32"

    model = model_selector(cfg)
    sample = jnp.zeros((2, 4, 16, 16, 3))
    state = create_train_state(jax.random.key(0), model, cfg, sample)
    n_data = 8
    state = state.replace(nce=init_nce_state(jax.random.key(7), n_data, 8))
    step = make_contrastive_train_step(cfg, n_data, modality="res")

    rng = np.random.default_rng(0)
    batch = {
        "view1": jnp.asarray(rng.normal(size=(4, 4, 16, 16, 3)),
                             jnp.float32),
        "index": jnp.arange(4, dtype=jnp.int32),
    }
    losses = []
    for i in range(12):
        state, m = step(state, batch, jax.random.fold_in(jax.random.key(1),
                                                         i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < losses[0]


def test_driver_ubernce_queue_advances(synth, tmp_path):
    """LOSS.TYPE='UberNCE' arch uber_nce: queue pointer advances, labels
    enqueue, loss finite (VERDICT round-1 item 3 done-criterion)."""
    cfg = _base_cfg(synth, tmp_path, arch="uber_nce")
    cfg.LOSS.TYPE = "UberNCE"
    cfg.LOSS.FEAT_DIM = 128  # MoCoEncoder output dim
    cfg.LOSS.K = 16  # divisible by batch 8
    cfg.DATA.SAMPLE_SIZE = 32  # S3D minimums: H,W>=32 ...
    cfg.DATA.SAMPLE_DURATION = 8  # ... and T>=8 (block5 pool)
    cfg.TRAIN.EPOCHS = 1
    state = train(_args(), cfg)
    assert state.moco is not None
    # one epoch = len(train)//8 = 1 step of 8 keys -> ptr = 8 % 16
    assert int(np.asarray(state.moco.queue_ptr)) == 8
    assert np.any(np.asarray(state.moco.queue_labels) >= 0)
    lines = open(os.path.join(str(tmp_path), "tnet_checkpoints",
                              "train_loss_and_acc.txt")).read().splitlines()
    assert np.isfinite(float(lines[-1].split()[-1]))


def test_driver_vector_checkpointing(synth, tmp_path):
    """--vector preemptible round-trip: every-epoch checkpoint to the
    cluster-stable ROOT, milestone checkpoints to OUTPUT_PATH, and a
    relaunch with the SAME args resumes from the saved epoch instead of
    restarting (reference online_train.py:756-776 + resume :501-506)."""
    cfg = _base_cfg(synth, tmp_path / "out")
    stable = str(tmp_path / "stable")
    os.makedirs(stable, exist_ok=True)
    train(_args(vector=True, checkpoint_path=stable), cfg)
    # epoch 0 is a milestone (epoch % 100 == 0) -> OUTPUT_PATH checkpoint
    assert os.path.exists(os.path.join(str(tmp_path / "out"),
                                       "tnet_checkpoints", "3dresnet",
                                       "checkpoint"))
    # cluster-stable root checkpoint always written
    stable_ckpt = os.path.join(stable, "tnet_checkpoints", "3dresnet",
                               "checkpoint")
    assert os.path.exists(stable_ckpt)

    # preemption + relaunch with identical args: resumes at epoch 1 ==
    # EPOCHS, so NO new epoch runs and no new train-log line appears
    log = os.path.join(str(tmp_path / "out"), "tnet_checkpoints",
                       "train_loss_and_acc.txt")
    n_lines = len(open(log).read().splitlines())
    train(_args(vector=True, checkpoint_path=stable), cfg)
    assert len(open(log).read().splitlines()) == n_lines


def test_ragged_tail_single_trace(synth, tmp_path):
    """Pad+mask keeps one jitted step signature across an epoch with a
    ragged tail (VERDICT round-1 item 7 done-criterion)."""
    import jax.numpy as jnp

    from video_similarity_search_tpu.data import build_data_loader

    cfg = _base_cfg(synth, tmp_path)
    cfg.TRAIN.BATCH_SIZE = 4
    # 9 train videos / batch 4 with drop_last=False -> 2 full + 1 ragged
    loader, _ = build_data_loader("train", cfg, triplets=True,
                                  drop_last=False)
    shapes = set()
    sizes = []
    for batch in loader:
        shapes.add(batch["anchor"].shape)
        sizes.append(batch["__size__"])
        assert batch["anchor"].shape[0] == 4  # padded to static batch
        assert batch["__valid__"].sum() == batch["__size__"]
    assert len(shapes) == 1
    assert sorted(sizes) == [1, 4, 4]


def test_driver_iterative_cluster(synth, tmp_path):
    """The main SLIC path: --iterative_cluster embeds the train set,
    clusters (FINCH), logs NMI/AMI, writes vid_clusters.txt, adapts the
    positive-sampling p, and rebuilds the triplet loader with
    pseudo-labels (reference online_train.py:599-667)."""
    cfg = _base_cfg(synth, tmp_path)
    cfg.TRAIN.EPOCHS = 2
    cfg.ITERCLUSTER.METHOD = "finch"
    cfg.ITERCLUSTER.INTERVAL = 1
    cfg.ITERCLUSTER.WARMUP_EPOCHS = 0
    cfg.ITERCLUSTER.ADAPTIVEP = True
    p_before = cfg.DATASET.POSITIVE_SAMPLING_P
    train(_args(iterative_cluster=True), cfg)
    logs = os.path.join(str(tmp_path), "tnet_checkpoints")
    assert os.path.exists(os.path.join(str(tmp_path), "vid_clusters.txt"))
    labels = [int(l) for l in open(
        os.path.join(str(tmp_path), "vid_clusters.txt")).read().split()]
    assert len(labels) == 9  # one pseudo-label per train video
    nmis = open(os.path.join(logs, "NMIs.txt")).read().split()
    assert len(nmis) == 2  # one clustering step per epoch
    # adaptive p = 1 - NMI was applied
    assert cfg.DATASET.POSITIVE_SAMPLING_P != p_before or \
        float(nmis[-1]) == 0.0
    assert cfg.DATASET.TARGET_TYPE_T == "cluster_label"


def test_driver_flow_channel_replace(synth, tmp_path):
    """The headline UCF RGB+TVL1-flow config: optical_u/optical_v channel
    extensions with positive-channel replacement (reference
    resnet_ucf_itercluster_flow.yaml + datasets/dataset_utils.py:22-114)."""
    from synthetic_data import add_synthetic_flow

    vid_path, ann_path = synth
    root = os.path.dirname(ann_path)
    u_root, v_root = add_synthetic_flow(root)
    cfg = _base_cfg(synth, tmp_path)
    cfg.DATASET.CHANNEL_EXTENSIONS = "optical_u,optical_v"
    cfg.DATASET.OPTICAL_U_PATH = u_root
    cfg.DATASET.OPTICAL_V_PATH = v_root
    cfg.DATASET.POS_CHANNEL_REPLACE = True
    cfg.DATASET.PROB_POS_CHANNEL_REPLACE = 1.0  # always replace
    cfg.DATA.INPUT_CHANNEL_NUM = 3  # replace mode keeps 3 channels
    state = train(_args(), cfg)
    assert int(np.asarray(state.step)) > 0
    assert os.path.exists(os.path.join(str(tmp_path), "tnet_checkpoints",
                                       "train_loss_and_acc.txt"))


def test_slowfast_triplet_step():
    """ARCH='slowfast': the jitted triplet step splits clips into
    [slow, fast] pathways in-graph (multipathway_input, reference
    models/model_utils.py:130-146) and trains."""
    import jax.numpy as jnp

    from video_similarity_search_tpu.models import model_selector
    from video_similarity_search_tpu.train import (create_train_state,
                                                   make_triplet_train_step)

    cfg = get_cfg()
    cfg.MODEL.ARCH = "slowfast"
    cfg.SLOWFAST.DEPTH = 50
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.OUT_DIM = 16
    cfg.DATA.SAMPLE_DURATION = 8
    cfg.DATA.SAMPLE_SIZE = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"

    from video_similarity_search_tpu.models.slowfast import \
        multipathway_input

    model = model_selector(cfg)
    sample = multipathway_input(jnp.zeros((2, 8, 32, 32, 3)), 4)
    state = create_train_state(jax.random.key(0), model, cfg, sample)
    step = make_triplet_train_step(cfg)

    rng = np.random.default_rng(0)
    b = 2
    batch = {
        "anchor": jnp.asarray(rng.normal(size=(b, 8, 32, 32, 3)),
                              jnp.float32),
        "positive": jnp.asarray(rng.normal(size=(b, 8, 32, 32, 3)),
                                jnp.float32),
        "targets": jnp.asarray([0, 1, 0, 1], jnp.int32),
    }
    state, m = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    assert int(np.asarray(state.step)) == 1


def test_contrastive_rgb_modality_uses_second_view():
    """modality='rgb': view2 is the independently-augmented positive clip,
    not the frame residual (reference contrastive_train_epoch,
    online_train.py:154-158)."""
    import jax.numpy as jnp

    from video_similarity_search_tpu.losses import init_nce_state
    from video_similarity_search_tpu.models import model_selector
    from video_similarity_search_tpu.train import (
        create_train_state, make_contrastive_train_step)

    cfg = get_cfg()
    cfg.MODEL.ARCH = "3dresnet"
    cfg.RESNET.MODEL_DEPTH = 10
    cfg.RESNET.NO_MAX_POOl = True
    cfg.RESNET.HIDDEN_LAYER = 32
    cfg.RESNET.OUT_DIM = 8
    cfg.DATA.SAMPLE_DURATION = 4
    cfg.DATA.SAMPLE_SIZE = 16
    cfg.TPU.COMPUTE_DTYPE = "float32"

    model = model_selector(cfg)
    sample = jnp.zeros((2, 4, 16, 16, 3))
    state = create_train_state(jax.random.key(0), model, cfg, sample)
    state = state.replace(nce=init_nce_state(jax.random.key(7), 4, 8))
    step = make_contrastive_train_step(cfg, 4, modality="rgb")

    rng = np.random.default_rng(0)
    batch = {
        "view1": jnp.asarray(rng.normal(size=(2, 4, 16, 16, 3)),
                             jnp.float32),
        "view2": jnp.asarray(rng.normal(size=(2, 4, 16, 16, 3)),
                             jnp.float32),
        "index": jnp.arange(2, dtype=jnp.int32),
    }
    state, m = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))


def test_contrastive_intra_negative_step():
    """LOSS.INTRA_NEGATIVE contrastive: a block-shuffled third view feeds
    the 3-bank NCEAverage_intra_neg (reference online_train.py:179-182 +
    loss/NCE_loss.py:91-184); output width doubles to 2*(K+1)."""
    import jax.numpy as jnp

    from video_similarity_search_tpu.losses import init_nce_state
    from video_similarity_search_tpu.models import model_selector
    from video_similarity_search_tpu.train import (
        create_train_state, make_contrastive_train_step)

    cfg = get_cfg()
    cfg.MODEL.ARCH = "3dresnet"
    cfg.RESNET.MODEL_DEPTH = 10
    cfg.RESNET.NO_MAX_POOl = True
    cfg.RESNET.HIDDEN_LAYER = 32
    cfg.RESNET.OUT_DIM = 8
    cfg.DATA.SAMPLE_DURATION = 4
    cfg.DATA.SAMPLE_SIZE = 16
    cfg.LOSS.INTRA_NEGATIVE = True
    cfg.TPU.COMPUTE_DTYPE = "float32"

    model = model_selector(cfg)
    sample = jnp.zeros((2, 4, 16, 16, 3))
    state = create_train_state(jax.random.key(0), model, cfg, sample)
    state = state.replace(nce=init_nce_state(jax.random.key(7), 4, 8,
                                             intra_neg=True))
    step = make_contrastive_train_step(cfg, 4, modality="res",
                                       intra_neg=True)
    rng = np.random.default_rng(0)
    batch = {
        "view1": jnp.asarray(rng.normal(size=(2, 4, 16, 16, 3)),
                             jnp.float32),
        "index": jnp.arange(2, dtype=jnp.int32),
    }
    state, m = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    assert state.nce.memory_neg is not None


def test_validate_local_batch_metric(synth, tmp_path):
    """VAL.METRIC='local_batch': per-batch retrieval averaged over batches
    (reference validation.py:96-130) instead of the global all-gathered
    protocol."""
    from video_similarity_search_tpu.data import build_data_loader
    from video_similarity_search_tpu.evaluation import validate
    from video_similarity_search_tpu.models import model_selector
    from video_similarity_search_tpu.train import create_train_state

    import jax.numpy as jnp

    cfg = _base_cfg(synth, tmp_path)
    cfg.VAL.METRIC = "local_batch"
    model = model_selector(cfg)
    sample = jnp.zeros((2, 4, 16, 16, 3))
    state = create_train_state(jax.random.key(0), model, cfg, sample)
    loader, _ = build_data_loader("val", cfg, triplets=True,
                                  negative_sampling=True)
    acc, topk = validate(state, model, cfg, loader, epoch=0)
    assert 0.0 <= acc <= 1.0
    assert set(topk) == {1, 5}
    assert all(0.0 <= v <= 1.0 for v in topk.values())
    assert os.path.exists(os.path.join(str(tmp_path), "tnet_checkpoints",
                                       "val_loss_and_acc.txt"))


def test_resume_reenables_cluster_labels(synth, tmp_path):
    """Resuming past WARMUP_EPOCHS must re-enable the pseudo-label tables
    IMMEDIATELY (from the checkpoint-derived epoch), not wait for the next
    clustering interval (review finding: the gate ran before the
    checkpoint was loaded)."""
    cfg = _base_cfg(synth, tmp_path)
    cfg.TRAIN.EPOCHS = 1
    cfg.ITERCLUSTER.METHOD = "finch"
    cfg.ITERCLUSTER.INTERVAL = 5  # no boundary at epoch 1
    cfg.ITERCLUSTER.WARMUP_EPOCHS = 0
    stable = str(tmp_path / "stable")
    os.makedirs(stable, exist_ok=True)
    train(_args(iterative_cluster=True, vector=True,
                checkpoint_path=stable), cfg)
    assert os.path.exists(os.path.join(str(tmp_path), "vid_clusters.txt"))

    # resume for epoch 1: start_epoch comes from the checkpoint (1 >= 0),
    # so CLUSTER_PATH must be set before the loaders are built
    cfg2 = _base_cfg(synth, tmp_path)
    cfg2.TRAIN.EPOCHS = 2
    cfg2.ITERCLUSTER.METHOD = "finch"
    cfg2.ITERCLUSTER.INTERVAL = 5
    cfg2.ITERCLUSTER.WARMUP_EPOCHS = 0
    train(_args(iterative_cluster=True, vector=True,
                checkpoint_path=stable), cfg2)
    assert cfg2.DATASET.CLUSTER_PATH == os.path.join(
        str(tmp_path), "vid_clusters.txt")


def test_pretrain_path_loads_weights_only(synth, tmp_path):
    """--pretrain_path loads encoder weights without resuming the epoch
    counter (reference load_pretrained_model, models/model_utils.py:
    148-156): training starts at epoch 0 with the loaded weights."""
    cfg = _base_cfg(synth, tmp_path / "a")
    train(_args(), cfg)
    ckpt = os.path.join(str(tmp_path / "a"), "tnet_checkpoints",
                        "3dresnet", "checkpoint")
    assert os.path.exists(ckpt)

    cfg2 = _base_cfg(synth, tmp_path / "b")
    args = _args()
    args.pretrain_path = ckpt
    train(args, cfg2)
    # trained from epoch 0 (one fresh epoch line), despite the ckpt's epoch
    log = os.path.join(str(tmp_path / "b"), "tnet_checkpoints",
                       "train_loss_and_acc.txt")
    lines = open(log).read().splitlines()
    assert len(lines) == 1 and lines[0].startswith("epoch:0")


def test_encode_views_matches_sequential_encodes():
    """Round-4 batched multi-view encode (_encode_views): features AND the
    merged running statistics must equal the sequential per-view form the
    reference uses (view1's running-stat update feeding view2's), since
    vmap keeps per-view batch statistics and the stat merge telescopes the
    flax r' = m*r + (1-m)*s update exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_similarity_search_tpu.config import get_cfg
    from video_similarity_search_tpu.models import model_selector
    from video_similarity_search_tpu.train import create_train_state
    from video_similarity_search_tpu.train.steps import (_encode,
                                                         _encode_views)

    cfg = get_cfg()
    cfg.MODEL.ARCH = "3dresnet"
    cfg.RESNET.MODEL_DEPTH = 10
    cfg.RESNET.NO_MAX_POOl = True
    cfg.RESNET.HIDDEN_LAYER = 32
    cfg.RESNET.OUT_DIM = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = model_selector(cfg)
    state = create_train_state(jax.random.key(0), model, cfg,
                               jnp.zeros((2, 4, 16, 16, 3)))

    rng = np.random.default_rng(0)
    v1 = jnp.asarray(rng.normal(size=(4, 4, 16, 16, 3)) * 0.3, jnp.float32)
    v2 = jnp.asarray(rng.normal(size=(4, 4, 16, 16, 3)) * 0.3, jnp.float32)

    f1_seq, bs1 = _encode(state, state.params, v1, cfg, train=True)
    f2_seq, bs2_seq = _encode(state.replace(batch_stats=bs1), state.params,
                              v2, cfg, train=True)

    feats, bs_merged = _encode_views(state, state.params,
                                     jnp.stack([v1, v2]), cfg)
    np.testing.assert_allclose(np.asarray(feats[0]), np.asarray(f1_seq),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(feats[1]), np.asarray(f2_seq),
                               rtol=2e-5, atol=2e-5)
    for a, b in zip(jax.tree.leaves(bs2_seq), jax.tree.leaves(bs_merged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_slowfast_contrastive_step_batched_views():
    """ARCH='slowfast' through the round-4 batched-view contrastive step:
    multipathway splitting happens per view under the vmap (list-of-
    pathways pytree), BN stays per-view."""
    import jax.numpy as jnp

    from video_similarity_search_tpu.models import model_selector
    from video_similarity_search_tpu.models.slowfast import \
        multipathway_input
    from video_similarity_search_tpu.train import (
        create_train_state, make_contrastive_train_step)

    cfg = get_cfg()
    cfg.MODEL.ARCH = "slowfast"
    cfg.SLOWFAST.DEPTH = 50
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.OUT_DIM = 16
    cfg.DATA.SAMPLE_DURATION = 8
    cfg.DATA.SAMPLE_SIZE = 32
    cfg.LOSS.TYPE = "contrastive"
    cfg.LOSS.FEAT_DIM = 16
    cfg.LOSS.K = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"

    model = model_selector(cfg)
    sample = multipathway_input(jnp.zeros((2, 8, 32, 32, 3)), 4)
    state = create_train_state(jax.random.key(0), model, cfg, sample)
    from video_similarity_search_tpu.losses import init_nce_state
    state = state.replace(nce=init_nce_state(
        jax.random.key(2), n_data=8, feat_dim=16))
    step = make_contrastive_train_step(cfg, n_data=8)

    rng = np.random.default_rng(0)
    b = 2
    batch = {
        "view1": jnp.asarray(rng.normal(size=(b, 8, 32, 32, 3)),
                             jnp.float32),
        "view2": jnp.asarray(rng.normal(size=(b, 8, 32, 32, 3)),
                             jnp.float32),
        "index": jnp.arange(b, dtype=jnp.int32),
    }
    state, m = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))


def test_make_step_and_state_slowfast_init():
    """Round-4 fix: _make_step_and_state must init SlowFast with the
    [slow, fast] pathway list (SlowFast.__call__ asserts on a plain
    array) — previously train() crashed at state creation for
    ARCH='slowfast' on every LOSS.TYPE."""
    import argparse

    from video_similarity_search_tpu.models import model_selector
    from video_similarity_search_tpu.train.driver import _make_step_and_state

    cfg = get_cfg()
    cfg.MODEL.ARCH = "slowfast"
    cfg.SLOWFAST.DEPTH = 50
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.OUT_DIM = 16
    cfg.DATA.SAMPLE_DURATION = 8
    cfg.DATA.SAMPLE_SIZE = 32
    cfg.LOSS.TYPE = "triplet"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    args = argparse.Namespace(checkpoint_path=None, start_epoch=None,
                              iterative_cluster=False, vector=False)
    step, state = _make_step_and_state(args, cfg, model_selector(cfg),
                                       n_data=8, mesh=None)
    assert "s1" in state.params or any("pathway" in k or "s1" in k
                                      for k in state.params)
