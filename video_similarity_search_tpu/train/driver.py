"""Self-supervised pretrain driver: the reference ``online_train.train``
(online_train.py:441-776) re-shaped around jitted steps on a device mesh.

Per epoch:
  * every ITERCLUSTER.INTERVAL epochs after WARMUP_EPOCHS: embed the whole
    train set (device, sharded batches), cluster (FINCH/k-means/... on
    device), log NMI/AMI vs true labels, optionally adapt the positive
    sampling p to 1 - NMI, write ``vid_clusters.txt``, rebuild the triplet
    loader's pseudo-label tables (reference online_train.py:599-667);
  * run the triplet / contrastive(NCE) / UberNCE epoch per ``LOSS.TYPE``
    (reference dispatch online_train.py:675-720) — one jitted step per
    batch, device augmentation fused, batch sharded over the 1-D data
    mesh (params replicated; grad sync + cross-replica BN are implicit
    XLA collectives — the reference's DDP + SyncBatchNorm);
  * validate (triplet acc + top1/5 retrieval) and checkpoint; every 10
    epochs a full train-bank/val-query retrieval eval drives ``is_best``
    (reference online_train.py:736-746);
  * ``--vector`` preemptible mode: best/periodic checkpoints to
    OUTPUT_PATH plus an every-epoch checkpoint to the cluster-stable
    ``args.checkpoint_path`` (reference online_train.py:756-776).

The reference's ``torch.distributed.barrier()`` after the master writes the
cluster file (online_train.py:661-662) is unnecessary here: clustering is
computed identically on every host (deterministic — cross-process
bit-equality asserted in tests/test_multiprocess.py), and the loader
rebuild consumes the IN-MEMORY labels on every host; the txt file is
master-only bookkeeping that nothing on the training path reads back.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cluster import fit_cluster
from ..data import build_data_loader, train_augment, write_cluster_labels
from ..data.augment import normalize_only
from ..evaluation import get_embeddings_and_labels, validate
from ..evaluation.knn import k_nearest_embeddings
from ..parallel import (batch_sharding, is_master_proc, make_mesh,
                        microbatch_sharding, replicate, shard_batch)
from ..utils.meters import AverageMeter, append_metric_line
from ..utils.profiling import StepProfiler, Throughput
from .state import create_train_state
from .steps import (make_contrastive_train_step, make_moco_train_step,
                    make_triplet_train_step)


def _microbatch_leaf(name: str, x, accum: int):
    """Host leaf (B, ...) -> (A, B/A, ...) for gradient accumulation.

    The triplet collate's ``targets`` is (2B,) laid out
    [anchor_targets(B); positive_targets(B)] (pipeline.collate_triplets)
    — a naive contiguous reshape would hand microbatch 0 ALL the anchor
    targets; instead each microbatch keeps its own [anchors_a; positives_a]
    halves. Leaves already on device (producer-side ``device_upload``
    reshapes before upload) pass through."""
    if isinstance(x, jax.Array):
        return x
    x = np.asarray(x)
    if x.ndim == 0:
        return x
    if name == "targets" and x.shape[0] % (2 * accum) == 0:
        half = x.shape[0] // 2
        return (x.reshape((2, accum, half // accum) + x.shape[1:])
                .transpose(1, 0, 2).reshape((accum, -1) + x.shape[1:]))
    assert x.shape[0] % accum == 0, (
        f"batch leaf {name!r} (dim0={x.shape[0]}) must divide "
        f"TRAIN.ACCUM_STEPS={accum}")
    return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])


def _shard_host_batch(mesh, batch, keys, accum: int = 1):
    """Shard the named uint8/int arrays of a host batch over the data mesh
    (leading axis split; the reference's DistributedSampler+DDP input path,
    misc/distributed_helper.py + datasets/data_loader.py:283).

    Leaves already living on device (the loader's producer-side
    ``device_upload``) pass through without a host round-trip —
    ``np.asarray`` on a device array would D2H-download it.

    ``accum > 1`` (TRAIN.ACCUM_STEPS): leaves reshape to (A, B/A, ...)
    and shard on axis 1, so each scan microbatch inside the train step is
    device-local (parallel.microbatch_sharding)."""
    def to_host(x):
        return x if isinstance(x, jax.Array) else np.asarray(x)

    if accum > 1:
        batch = {k: _microbatch_leaf(k, batch[k], accum)
                 for k in keys if k in batch}
        if mesh is None:
            return {k: (v if isinstance(v, jax.Array) else jnp.asarray(v))
                    for k, v in batch.items()}
        return shard_batch(mesh, batch, microbatched=True)
    if mesh is None:
        return {k: jnp.asarray(batch[k]) for k in keys if k in batch}
    return shard_batch(mesh, {k: to_host(batch[k])
                              for k in keys if k in batch})


def _device_batch(batch, cfg, key, train: bool, mesh=None, accum: int = 1):
    """uint8 host batch -> normalized device batch (fused augmentation).

    ``accum > 1``: clip leaves are (A, b, T, H, W, C); augmentation runs
    per microbatch (each slice of a microbatch-sharded array is
    device-local) and restacks, preserving the (A, b, ...) layout the
    accumulating train step scans over."""
    dataset = cfg.TRAIN.DATASET
    clip_names = [k for k in ("anchor", "positive", "extra", "negative")
                  if k in batch]
    sharded = _shard_host_batch(mesh, batch,
                                clip_names + ["targets", "index"],
                                accum=accum)
    out = {}
    keys = jax.random.split(key, max(len(clip_names) * accum, 1))
    for i, name in enumerate(clip_names):
        clips = sharded[name]
        if not train:
            out[name] = normalize_only(clips, dataset=dataset)
        elif accum > 1:
            out[name] = jnp.stack([
                train_augment(clips[a], keys[i * accum + a],
                              cfg.DATA.SAMPLE_SIZE, dataset=dataset,
                              pre_cropped=bool(cfg.TPU.HOST_RRC))
                for a in range(accum)])
        else:
            out[name] = train_augment(clips, keys[i], cfg.DATA.SAMPLE_SIZE,
                                      dataset=dataset,
                                      pre_cropped=bool(cfg.TPU.HOST_RRC))
    out["targets"] = sharded["targets"]
    if "index" in sharded:
        out["index"] = sharded["index"]
    return out


def _drain(pending, meter_updates):
    """Pull deferred device metrics onto host. Metrics are NOT read per
    step — a per-step float() would synchronize the dispatch queue and
    serialize host decode with device compute; deferring the reads to log
    points keeps the host pipelining batches ahead of the chip."""
    for metrics, bsz in pending:
        meter_updates(metrics, bsz)
    pending.clear()


def triplet_train_epoch(state, step_fn, train_loader, cfg, epoch: int,
                        base_key, is_master: bool = True, mesh=None,
                        sink=None):
    """One triplet epoch (reference online_train.py:245-434)."""
    losses = AverageMeter("loss")
    n_triplets = AverageMeter("n_triplets")
    start = time.time()
    # epoch 0 only: cfg dir, else $VSS_PROFILE_DIR (None = env fallback);
    # "" hard-disables tracing for every later epoch
    profiler = StepProfiler((cfg.TPU.PROFILE_DIR or None) if epoch == 0
                            else "")
    thru = Throughput()
    pending = []

    def update(metrics, bsz):
        losses.update(float(metrics["loss"]), bsz)
        n_triplets.update(float(metrics["n_triplets"]))

    accum = max(1, int(cfg.TRAIN.ACCUM_STEPS))
    for batch_idx, batch in enumerate(train_loader):
        profiler.step(batch_idx)
        key = jax.random.fold_in(base_key, epoch * 100000 + batch_idx)
        aug_key, step_key = jax.random.split(key)
        dev_batch = _device_batch(batch, cfg, aug_key, train=True, mesh=mesh,
                                  accum=accum)
        state, metrics = step_fn(state, dev_batch, step_key)
        pending.append((metrics, batch["__size__"]))
        thru.tick(batch["__size__"])
        if is_master and (batch_idx + 1) % cfg.TRAIN.LOG_INTERVAL == 0:
            _drain(pending, update)
            print(f"Train Epoch: {epoch} [{losses.count}]\t"
                  f"Loss: {losses.val:.4f} ({losses.avg:.4f})\t"
                  f"N_Triplets: {n_triplets.avg:.1f}\t"
                  f"{thru.items_per_sec:.1f} clips/s")
            if sink:
                it = epoch * len(train_loader) + batch_idx
                sink.add_scalar("train/loss", losses.val, it)
                sink.add_scalar("train/clips_per_sec",
                                thru.items_per_sec, it)
    _drain(pending, update)
    profiler.close()
    if is_master:
        runtime_h = (time.time() - start) / 3600
        print(f"\nTrain set: Average loss: {losses.avg:.4f} "
              f"({thru.items_per_sec:.1f} clips/s steady-state)")
        append_metric_line(cfg.OUTPUT_PATH, "train_loss_and_acc.txt",
                           f"epoch:{epoch} runtime:{round(runtime_h, 2)} "
                           f"{losses.avg:.4f}")
        if sink:
            sink.add_scalar("epoch/train_loss", losses.avg, epoch)
    return state, losses.avg


def contrastive_train_epoch(state, step_fn, train_loader, cfg, epoch: int,
                            base_key, is_master: bool = True, mesh=None,
                            sink=None):
    """One contrastive (NCE) epoch (reference contrastive_train_epoch,
    online_train.py:136-225). The two views are the triplet loader's
    anchor and positive clips (``inputs[0]``/``inputs[1]`` in the
    reference); for ``modality='res'`` view2 is the on-device frame
    residual of view1 (reference ``diff``, :228-230 — computed inside the
    jitted step). The modality is derived from cfg HERE, with the same
    rule _make_step_and_state uses to build the step — a mismatched
    keyword default previously left the step's batch['view2'] unfed for
    MODALITY='rgb'."""
    modality = "rgb" if str(cfg.DATASET.MODALITY) == "rgb" else "res"
    losses = AverageMeter("loss")
    v1_loss = AverageMeter("view1_loss")
    v2_loss = AverageMeter("view2_loss")
    start = time.time()
    pending = []

    def update(metrics, bsz):
        losses.update(float(metrics["loss"]), bsz)
        v1_loss.update(float(metrics["view1_loss"]), bsz)
        v2_loss.update(float(metrics["view2_loss"]), bsz)

    accum = max(1, int(cfg.TRAIN.ACCUM_STEPS))
    for batch_idx, batch in enumerate(train_loader):
        key = jax.random.fold_in(base_key, epoch * 100000 + batch_idx)
        aug_key, step_key = jax.random.split(key)
        if modality == "res":
            # view2 is computed in-graph from view1 — don't upload and
            # augment the positive clip just to discard it
            batch = {k: v for k, v in batch.items() if k != "positive"}
        dev = _device_batch(batch, cfg, aug_key, train=True, mesh=mesh,
                            accum=accum)
        step_batch = {"view1": dev["anchor"], "index": dev["index"]}
        if modality != "res":
            step_batch["view2"] = dev["positive"]
        state, metrics = step_fn(state, step_batch, step_key)
        pending.append((metrics, batch["__size__"]))
        if is_master and (batch_idx + 1) % cfg.TRAIN.LOG_INTERVAL == 0:
            _drain(pending, update)
            print(f"Train Epoch: {epoch} [{losses.count}]\t"
                  f"Loss: {losses.val:.4f} ({losses.avg:.4f})")
            if sink:
                it = epoch * len(train_loader) + batch_idx
                sink.add_scalar("train/loss", losses.val, it)
                sink.add_scalar("train/view1_loss", v1_loss.val, it)
                sink.add_scalar("train/view2_loss", v2_loss.val, it)
    _drain(pending, update)
    if is_master:
        runtime_h = (time.time() - start) / 3600
        print(f"\nTrain set: Average loss: {losses.avg:.4f}")
        append_metric_line(cfg.OUTPUT_PATH, "train_loss_and_acc.txt",
                           f"epoch:{epoch} runtime:{round(runtime_h, 2)} "
                           f"{losses.avg:.4f}")
        if sink:
            sink.add_scalar("epoch/train_loss", losses.avg, epoch)
    return state, losses.avg


def ubernce_train_epoch(state, step_fn, train_loader, cfg, epoch: int,
                        base_key, is_master: bool = True, mesh=None,
                        sink=None):
    """One MoCo/UberNCE epoch (reference UberNCE_train_epoch,
    online_train.py:60-133): two augmented clips (the triplet loader's
    anchor/positive pair) through query/momentum encoders, queue logits,
    CE (info_nce) or masked log-softmax (uber_nce)."""
    losses = AverageMeter("loss")
    top1 = AverageMeter("top1")
    top5 = AverageMeter("top5")
    start = time.time()
    pending = []

    def update(metrics, bsz):
        losses.update(float(metrics["loss"]), bsz)
        top1.update(float(metrics["top1"]), bsz)
        top5.update(float(metrics["top5"]), bsz)

    for batch_idx, batch in enumerate(train_loader):
        key = jax.random.fold_in(base_key, epoch * 100000 + batch_idx)
        aug_key, step_key = jax.random.split(key)
        dev = _device_batch(batch, cfg, aug_key, train=True, mesh=mesh)
        b = dev["anchor"].shape[0]
        step_batch = {"x1": dev["anchor"], "x2": dev["positive"],
                      "label": dev["targets"][:b]}
        state, metrics = step_fn(state, step_batch, step_key)
        pending.append((metrics, batch["__size__"]))
        if is_master and (batch_idx + 1) % cfg.TRAIN.LOG_INTERVAL == 0:
            _drain(pending, update)
            print(f"Train Epoch: {epoch} [{losses.count}]\t"
                  f"Loss: {losses.val:.4f} ({losses.avg:.4f})  "
                  f"Top1:{top1.val:.4f} Top5:{top5.val:.4f}")
            if sink:
                it = epoch * len(train_loader) + batch_idx
                sink.add_scalar("train/loss", losses.val, it)
                sink.add_scalar("train/top1", top1.val, it)
                sink.add_scalar("train/top5", top5.val, it)
    _drain(pending, update)
    if is_master:
        runtime_h = (time.time() - start) / 3600
        print(f"\nTrain set: Average loss: {losses.avg:.4f}")
        append_metric_line(cfg.OUTPUT_PATH, "train_loss_and_acc.txt",
                           f"epoch:{epoch} runtime:{round(runtime_h, 2)} "
                           f"{losses.avg:.4f}")
        if sink:
            sink.add_scalar("epoch/train_loss", losses.avg, epoch)
    return state, losses.avg


def iterative_cluster_step(state, model, cfg, eval_train_loader,
                           is_master: bool = True, sink=None,
                           epoch: int = 0) -> Optional[np.ndarray]:
    """Embed train set -> cluster -> NMI/AMI logs -> vid_clusters.txt
    (reference online_train.py:599-667). Returns labels in dataset order."""
    from sklearn.metrics import (adjusted_mutual_info_score,
                                 normalized_mutual_info_score)

    t0 = time.time()
    emb, true_labels, indices = get_embeddings_and_labels(
        state, model, cfg, eval_train_loader, split="train",
        verbose=is_master)
    if is_master:
        print(f"embedding pass: {time.time() - t0:.1f}s")

    t0 = time.time()
    labels = fit_cluster(emb, method=cfg.ITERCLUSTER.METHOD,
                         k=cfg.ITERCLUSTER.K,
                         l2normalize=cfg.ITERCLUSTER.L2_NORMALIZE,
                         finch_partition=cfg.ITERCLUSTER.FINCH_PARTITION,
                         verbose=is_master)
    if is_master:
        print(f"clustering: {time.time() - t0:.1f}s")

    # restore dataset order (loader iterates unshuffled, but be safe)
    order = np.argsort(indices)
    labels = labels[order]
    true = true_labels[order]

    nmi = normalized_mutual_info_score(true, labels)
    ami = adjusted_mutual_info_score(true, labels)
    if is_master:
        print(f"NMI: {nmi:.4f} AMI: {ami:.4f}")
        append_metric_line(cfg.OUTPUT_PATH, "NMIs.txt", f"{nmi:.6f}")
        append_metric_line(cfg.OUTPUT_PATH, "AMIs.txt", f"{ami:.6f}")
        if sink:
            sink.add_scalar("cluster/nmi", nmi, epoch)
            sink.add_scalar("cluster/ami", ami, epoch)
        cluster_file = os.path.join(cfg.OUTPUT_PATH, "vid_clusters.txt")
        write_cluster_labels(cluster_file, labels)

    if cfg.ITERCLUSTER.ADAPTIVEP:
        # adaptive positive sampling p = 1 - NMI (reference :645-646)
        cfg.DATASET.POSITIVE_SAMPLING_P = float(1.0 - nmi)
    return labels


def _make_step_and_state(args, cfg, model, n_data: int, mesh,
                         steps_per_epoch: Optional[int] = None):
    """LOSS.TYPE dispatch (reference online_train.py:675-720): build the
    jitted step and a TrainState whose loss-side banks match."""
    from ..losses import init_nce_state
    from ..models.moco import init_moco_state
    from .state import make_optimizer

    dtype = jnp.float32
    n_views = 2  # anchor+positive stacked forward dominates shapes
    sample = jnp.zeros((n_views, cfg.DATA.SAMPLE_DURATION,
                        cfg.DATA.SAMPLE_SIZE, cfg.DATA.SAMPLE_SIZE,
                        cfg.DATA.INPUT_CHANNEL_NUM), dtype)
    if cfg.MODEL.ARCH == "slowfast":
        # SlowFast.__call__ takes the [slow, fast] pathway list the steps
        # build in-graph — init must match or it asserts before step one
        from ..models.slowfast import multipathway_input

        sample = multipathway_input(sample, cfg.SLOWFAST.ALPHA,
                                    fast_mask=cfg.SLOWFAST.FAST_MASK)
    tx = make_optimizer(cfg, steps_per_epoch)  # honors OPTIM.SCHEDULE
    state = create_train_state(jax.random.key(0), model, cfg, sample, tx=tx)

    loss_type = cfg.LOSS.TYPE
    if loss_type == "triplet":
        if cfg.LOSS.MEM_TRIPLET:
            from ..losses import init_mem_triplet_state
            from ..models.registry import embedding_dim

            state = state.replace(mem_triplet=init_mem_triplet_state(
                jax.random.key(9), K=cfg.LOSS.MEM_TRIPLET_K,
                dim=embedding_dim(cfg)))
        return make_triplet_train_step(cfg), state
    if loss_type == "contrastive":
        intra_neg = cfg.LOSS.INTRA_NEGATIVE
        use_moco = bool(cfg.LOSS.MOCO) and not intra_neg  # ref dispatch
        modality = "rgb" if str(cfg.DATASET.MODALITY) == "rgb" else "res"
        if use_moco:
            # reference's intended moco=True branch (online_train.py:697):
            # MemoryMoCo(FEAT_DIM, n_data, K, T) instead of NCEAverage
            from ..losses import init_memory_moco

            state = state.replace(memory_moco=init_memory_moco(
                jax.random.key(7), K=cfg.LOSS.K, feat_dim=cfg.LOSS.FEAT_DIM))
        else:
            nce = init_nce_state(jax.random.key(7), n_data,
                                 cfg.LOSS.FEAT_DIM, intra_neg=intra_neg)
            state = state.replace(nce=nce)
        step = make_contrastive_train_step(cfg, n_data, modality=modality,
                                           intra_neg=intra_neg,
                                           use_moco=use_moco)
        return step, state
    if loss_type == "UberNCE":
        uber = cfg.MODEL.ARCH == "uber_nce"
        moco = init_moco_state(state.params, state.batch_stats,
                               jax.random.key(7), dim=cfg.LOSS.FEAT_DIM,
                               K=cfg.LOSS.K, with_labels=uber)
        state = state.replace(moco=moco)
        step = make_moco_train_step(cfg, model, uber=uber)
        return step, state
    raise AssertionError(f"Loss Type:{loss_type} not recognized "
                         "(reference online_train.py:719-720)")


def train(args, cfg) -> None:
    """Full pretrain loop for all LOSS.TYPE paths.

    Mirrors reference online_train.train (:441-776): model, loaders,
    optional resume, per-epoch clustering/training/validation/retrieval/
    checkpointing — data-parallel over the TPU mesh instead of DDP.
    """
    from ..models import model_selector
    from .checkpoint import (load_checkpoint, restore_train_state,
                             save_checkpoint, merge_pretrained)

    is_master = is_master_proc()
    mesh = make_mesh(mesh_shape=cfg.TPU.MESH_SHAPE or None)
    n_devices = mesh.devices.size
    assert cfg.TRAIN.BATCH_SIZE % n_devices == 0, (
        f"TRAIN.BATCH_SIZE={cfg.TRAIN.BATCH_SIZE} must divide over "
        f"{n_devices} devices (reference asserts the same for NUM_GPUS, "
        "online_train.py:797-798)")
    assert cfg.VAL.BATCH_SIZE % n_devices == 0, (
        f"VAL.BATCH_SIZE={cfg.VAL.BATCH_SIZE} not divisible by {n_devices}")
    accum = max(1, int(cfg.TRAIN.ACCUM_STEPS))
    if accum > 1:
        if cfg.LOSS.TYPE == "UberNCE":
            # the momentum-encoder step has no accumulation path (S3D is
            # ~9x cheaper per clip — there is no memory pressure to split)
            print("WARN: TRAIN.ACCUM_STEPS ignored for LOSS.TYPE=UberNCE")
            cfg.TRAIN.ACCUM_STEPS = accum = 1
        else:
            assert cfg.TRAIN.BATCH_SIZE % (accum * n_devices) == 0, (
                f"TRAIN.BATCH_SIZE={cfg.TRAIN.BATCH_SIZE} must divide over "
                f"ACCUM_STEPS={accum} x {n_devices} devices")
    model = model_selector(cfg)

    iter_cluster = bool(getattr(args, "iterative_cluster", False))

    # resolve + peek the checkpoint BEFORE anything start_epoch-dependent
    # (cluster-path gate, loader construction): resuming must re-enable the
    # pseudo-label tables immediately, not at the next interval boundary
    ckpt_path = _resolve_checkpoint(
        getattr(args, "checkpoint_path", None), cfg.MODEL.ARCH,
        allow_missing=bool(getattr(args, "vector", False)))
    if jax.process_count() > 1:
        # checkpoint paths must resolve identically on every host (shared
        # filesystem, the reference's assumption too): orbax restore runs
        # cross-process barriers, so a host-dependent resolution (file on
        # the master's local disk only) would deadlock exactly like the
        # master-gated save did. Fail loudly instead.
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.int32(ckpt_path is not None))
        assert int(flags.min()) == int(flags.max()), (
            f"--checkpoint_path resolves on only {int(flags.sum())}/"
            f"{jax.process_count()} hosts — checkpoints must live on a "
            "filesystem shared by every host")
    payload = load_checkpoint(ckpt_path) if ckpt_path else None
    start_epoch, best_prec1 = 0, 0.0
    if payload is not None:
        start_epoch = int(payload.get("epoch", 0))
        best_prec1 = float(payload.get("best_prec1", 0.0))
    if getattr(args, "start_epoch", None) is not None:
        start_epoch = args.start_epoch
    # in-memory pseudo-labels for the loader rebuild: every host computes
    # identical labels (deterministic clustering — cross-process equality
    # asserted in tests/test_multiprocess.py), but only the master writes
    # vid_clusters.txt, so non-master hosts must NOT depend on reading the
    # file back (they would silently fall back to true labels)
    latest_cluster_labels = {"labels": None}
    if iter_cluster and start_epoch >= cfg.ITERCLUSTER.WARMUP_EPOCHS:
        cluster_file = os.path.join(cfg.OUTPUT_PATH, "vid_clusters.txt")
        if os.path.exists(cluster_file):
            cfg.DATASET.CLUSTER_PATH = cluster_file
            # re-enable pseudo-label targets NOW: pre-preemption the run
            # trained on cluster labels; without this the resumed run
            # silently used true labels until the next interval boundary
            cfg.DATASET.TARGET_TYPE_T = "cluster_label"
        elif is_master:
            # resume into a fresh OUTPUT_PATH (e.g. from a --vector stable
            # checkpoint after preemption): no cluster file exists yet —
            # train on true labels until the next cluster interval instead
            # of crashing in read_cluster_labels
            print(f"resume: {cluster_file} not found; using true labels "
                  "until the next clustering step")

    # per-host shard of the global index stream (reference
    # DistributedSampler, datasets/data_loader.py:283); each host feeds
    # BATCH_SIZE/nproc items so the assembled GLOBAL batch is BATCH_SIZE
    proc, nproc = jax.process_index(), jax.process_count()
    assert cfg.TRAIN.BATCH_SIZE % nproc == 0, (
        f"TRAIN.BATCH_SIZE={cfg.TRAIN.BATCH_SIZE} must divide across "
        f"{nproc} hosts")
    def with_upload_sharding(loader, train: bool = False):
        # producer-side uploads go straight to the mesh sharding on
        # multi-chip single-process runs — otherwise every batch stages
        # whole on device 0 and reaches the other chips via a reshard hop
        if loader.device_upload and mesh is not None \
                and len(mesh.devices.flat) > 1:
            loader.upload_sharding = (microbatch_sharding(mesh)
                                      if train and accum > 1
                                      else batch_sharding(mesh))
        if train and accum > 1:
            # uploaded clip leaves arrive pre-reshaped (A, b, ...) so the
            # consumer never reshapes a batch-sharded array in-jit
            loader.upload_microbatch = accum
        return loader

    def make_train_loader():
        # ONE builder for both the initial construction and the post-cluster
        # rebuild so the per-host batch division can never diverge between
        # the two sites (each host feeds BATCH_SIZE/nproc items; the
        # assembled global batch stays BATCH_SIZE).
        loader, _ = build_data_loader(
            "train", cfg, is_master, triplets=True, shard_index=proc,
            num_shards=nproc, batch_size=cfg.TRAIN.BATCH_SIZE // nproc,
            cluster_labels=latest_cluster_labels["labels"])
        return with_upload_sharding(loader, train=True)

    train_loader = make_train_loader()
    val_loader, _ = build_data_loader("val", cfg, is_master, triplets=True,
                                      negative_sampling=True)
    eval_train_loader, _ = build_data_loader(
        "train", cfg, is_master, triplets=False, req_train_shuffle=False,
        drop_last=False)
    eval_val_loader, _ = build_data_loader(
        "val", cfg, is_master, triplets=False, val_sample=None,
        drop_last=False)
    for _ld in (val_loader, eval_train_loader, eval_val_loader):
        with_upload_sharding(_ld)

    step_fn, state = _make_step_and_state(
        args, cfg, model, len(train_loader.dataset), mesh,
        steps_per_epoch=len(train_loader))

    # --pretrain_path: weights only, no epoch/optimizer resume
    # (reference load_pretrained_model, models/model_utils.py:148-156)
    pretrain_path = getattr(args, "pretrain_path", None)
    if pretrain_path:
        pre = load_checkpoint(pretrain_path)
        if "torch_state_dict" in pre:
            from .checkpoint import torch_to_flax

            p, s = torch_to_flax(pre["torch_state_dict"], cfg.MODEL.ARCH,
                                 stem_s2d=bool(cfg.TPU.STEM_S2D))
        else:
            p, s = pre.get("params", {}), pre.get("batch_stats", {})
        params, stats = merge_pretrained(
            state.params, state.batch_stats, p, s, verbose=is_master,
            inflate_temporal=bool(cfg.SLOWFAST.CHECKPOINT_INFLATE))
        state = state.replace(params=params, batch_stats=stats)

    if payload is not None:
        if "torch_state_dict" in payload:
            # arch-dispatching converter: a --checkpoint_path pointing at a
            # torch .pth.tar OR a Caffe2 .pkl must convert for the active
            # MODEL.ARCH, not assume 3dresnet
            from .checkpoint import torch_to_flax

            p, s = torch_to_flax(payload["torch_state_dict"],
                                 cfg.MODEL.ARCH,
                                 stem_s2d=bool(cfg.TPU.STEM_S2D))
            params, stats = merge_pretrained(
                state.params, state.batch_stats, p, s, verbose=is_master,
                inflate_temporal=bool(cfg.SLOWFAST.CHECKPOINT_INFLATE))
            state = state.replace(params=params, batch_stats=stats)
        else:
            state, _, _ = restore_train_state(state, payload)

    state = replicate(mesh, state)
    base_key = jax.random.key(1234)
    vector = bool(getattr(args, "vector", False))

    from ..utils.metrics_sink import MetricsSink

    sink = MetricsSink(os.path.join(cfg.OUTPUT_PATH, "metrics"),
                       enabled=bool(cfg.TRAIN.METRICS_SINK) and is_master)

    epoch_fns = {"triplet": triplet_train_epoch,
                 "contrastive": contrastive_train_epoch,
                 "UberNCE": ubernce_train_epoch}
    epoch_fn = epoch_fns[cfg.LOSS.TYPE]

    for epoch in range(start_epoch, cfg.TRAIN.EPOCHS):
        if is_master:
            print(f"\nEpoch {epoch}/{cfg.TRAIN.EPOCHS - 1}")

        if (iter_cluster and epoch >= cfg.ITERCLUSTER.WARMUP_EPOCHS
                and (epoch - cfg.ITERCLUSTER.WARMUP_EPOCHS)
                % cfg.ITERCLUSTER.INTERVAL == 0):
            labels = iterative_cluster_step(state, model, cfg,
                                            eval_train_loader, is_master,
                                            sink=sink, epoch=epoch)
            # hand the in-memory labels to the rebuild: every host has
            # them; the txt file is master-written bookkeeping (reference
            # needed a barrier here, online_train.py:661-662)
            latest_cluster_labels["labels"] = labels
            cfg.DATASET.CLUSTER_PATH = os.path.join(cfg.OUTPUT_PATH,
                                                    "vid_clusters.txt")
            cfg.DATASET.TARGET_TYPE_T = "cluster_label"
            train_loader = make_train_loader()

        train_loader.set_epoch(epoch)
        state, _ = epoch_fn(state, step_fn, train_loader, cfg, epoch,
                            base_key, is_master, mesh=mesh, sink=sink)

        acc, topk = validate(state, model, cfg, val_loader, epoch, is_master)
        if sink.enabled:
            sink.add_scalar("val/triplet_acc", acc, epoch)
            for k, v in (topk or {}).items():
                sink.add_scalar(f"val/top{k}", v, epoch)

        # every-RETRIEVAL_INTERVAL-epochs global retrieval drives is_best
        # (reference online_train.py:736-746; its cadence is hardcoded 10)
        is_best = False
        if epoch % max(1, cfg.TRAIN.RETRIEVAL_INTERVAL) == 0:
            retr = k_nearest_embeddings(state, model, cfg, eval_train_loader,
                                        eval_val_loader, epoch=epoch,
                                        is_master_proc=is_master)
            top1 = retr.get(1, 0.0)
            if sink.enabled:
                for k, v in retr.items():
                    sink.add_scalar(f"retrieval/top{k}", v, epoch)
            is_best = top1 > best_prec1
            best_prec1 = max(best_prec1, top1)

        # Checkpointing runs on EVERY host, not just the master: orbax's
        # save barriers across processes and a master-only call deadlocks
        # (checkpoint.py::save_checkpoint docstring). Only process 0
        # writes files; the branch conditions below are host-invariant
        # (epoch/vector/args, and is_best derives from the collective
        # retrieval result, identical on all hosts).
        # --vector: checkpoint OUTPUT_PATH only on milestone epochs,
        # but ALWAYS checkpoint the cluster-stable path
        # (reference online_train.py:756-776)
        if not vector or (epoch % 100 == 0 or is_best
                          or epoch == cfg.TRAIN.EPOCHS - 1):
            save_checkpoint(cfg.OUTPUT_PATH, cfg.MODEL.ARCH, state,
                            epoch, best_prec1, is_best=is_best)
        if vector and getattr(args, "checkpoint_path", None):
            # cluster-stable every-epoch checkpoint: --checkpoint_path
            # is the ROOT directory; the save lands at
            # <root>/tnet_checkpoints/<arch>/checkpoint, which is
            # exactly where _resolve_checkpoint looks on resume
            save_checkpoint(args.checkpoint_path, cfg.MODEL.ARCH,
                            state, epoch, best_prec1, is_best=False)
    sink.close()
    return state


def _resolve_checkpoint(path, arch: str, allow_missing: bool = False):
    """Map a --checkpoint_path argument to a loadable checkpoint.

    Accepts: a direct orbax dir / torch .pth.tar, OR a run root (e.g. the
    --vector stable directory) containing tnet_checkpoints/<arch>/checkpoint
    — mirroring the reference's <out>/tnet_checkpoints/<arch>/ layout
    (models/model_utils.py:161-176).

    ``allow_missing`` (the --vector preemptible case, where the path is the
    stable ROOT that may not have been written yet) returns None for a
    nonexistent/empty target; otherwise a missing path is a typo'd resume
    and raises instead of silently training from scratch."""
    if not path:
        return None
    nested = os.path.join(path, "tnet_checkpoints", arch, "checkpoint")
    if os.path.isdir(path):
        if os.path.exists(nested):
            return nested
        # a directory is loadable only if it IS an orbax checkpoint
        if os.path.exists(os.path.join(path, "_METADATA")):
            return path
        if allow_missing:
            return None  # fresh --vector stable dir: nothing saved yet
        raise FileNotFoundError(
            f"--checkpoint_path {path!r} contains no checkpoint "
            f"(looked for {nested} and an orbax _METADATA)")
    if os.path.exists(path):
        return path  # torch .pth.tar / file checkpoint
    if allow_missing:
        return None  # --vector stable root not created yet (first run)
    raise FileNotFoundError(
        f"--checkpoint_path {path!r} does not exist (a missing path is only "
        "tolerated under --vector, the preemptible-resume case)")
