"""Self-supervised pretrain driver: the reference ``online_train.train``
(online_train.py:441-776) re-shaped around jitted steps.

Per epoch:
  * every ITERCLUSTER.INTERVAL epochs after WARMUP_EPOCHS: embed the whole
    train set (device, sharded batches), cluster (FINCH/k-means/... on
    device), log NMI/AMI vs true labels, optionally adapt the positive
    sampling p to 1 - NMI, write ``vid_clusters.txt``, rebuild the triplet
    loader's pseudo-label tables (reference online_train.py:599-667);
  * run the triplet/contrastive/UberNCE epoch (one jitted step per batch,
    device augmentation fused);
  * validate (triplet acc + top1/5 retrieval) and checkpoint.

The reference's ``torch.distributed.barrier()`` after the master writes the
cluster file (online_train.py:661-662) is unnecessary here: clustering is
computed on device identically on every host (deterministic), and the file
write is master-only bookkeeping.
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
from ..evaluation import get_embeddings_and_labels, topk_retrieval_acc, validate
from ..parallel import is_master_proc
from ..utils.meters import AverageMeter, append_metric_line
from .state import create_train_state
from .steps import make_triplet_train_step


def _device_batch(batch, cfg, key, train: bool):
    """uint8 host batch -> normalized device batch (fused augmentation)."""
    dataset = cfg.TRAIN.DATASET
    out = {}
    n_clips = sum(1 for k in ("anchor", "positive", "extra", "negative")
                  if k in batch)
    keys = jax.random.split(key, max(n_clips, 1))
    i = 0
    for name in ("anchor", "positive", "extra", "negative"):
        if name in batch:
            clips = jnp.asarray(batch[name])
            if train:
                out[name] = train_augment(clips, keys[i],
                                          cfg.DATA.SAMPLE_SIZE,
                                          dataset=dataset)
            else:
                out[name] = normalize_only(clips, dataset=dataset)
            i += 1
    out["targets"] = jnp.asarray(batch["targets"])
    if "index" in batch:
        out["index"] = jnp.asarray(batch["index"])
    return out


def triplet_train_epoch(state, step_fn, train_loader, cfg, epoch: int,
                        base_key, is_master: bool = True):
    """One triplet epoch (reference online_train.py:245-434)."""
    losses = AverageMeter("loss")
    n_triplets = AverageMeter("n_triplets")
    start = time.time()
    for batch_idx, batch in enumerate(train_loader):
        key = jax.random.fold_in(base_key, epoch * 100000 + batch_idx)
        aug_key, step_key = jax.random.split(key)
        dev_batch = _device_batch(batch, cfg, aug_key, train=True)
        state, metrics = step_fn(state, dev_batch, step_key)
        bsz = batch["__size__"]
        losses.update(float(metrics["loss"]), bsz)
        n_triplets.update(float(metrics["n_triplets"]))
        if is_master and (batch_idx + 1) % cfg.TRAIN.LOG_INTERVAL == 0:
            print(f"Train Epoch: {epoch} [{losses.count}]\t"
                  f"Loss: {losses.val:.4f} ({losses.avg:.4f})\t"
                  f"N_Triplets: {n_triplets.avg:.1f}")
    if is_master:
        runtime_h = (time.time() - start) / 3600
        print(f"\nTrain set: Average loss: {losses.avg:.4f}")
        append_metric_line(cfg.OUTPUT_PATH, "train_loss_and_acc.txt",
                           f"epoch:{epoch} runtime:{round(runtime_h, 2)} "
                           f"{losses.avg:.4f}")
    return state, losses.avg


def iterative_cluster_step(state, model, cfg, eval_train_loader,
                           is_master: bool = True) -> Optional[np.ndarray]:
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
        cluster_file = os.path.join(cfg.OUTPUT_PATH, "vid_clusters.txt")
        write_cluster_labels(cluster_file, labels)

    if cfg.ITERCLUSTER.ADAPTIVEP:
        # adaptive positive sampling p = 1 - NMI (reference :645-646)
        cfg.DATASET.POSITIVE_SAMPLING_P = float(1.0 - nmi)
    return labels


def train(args, cfg) -> None:
    """Full pretrain loop for LOSS.TYPE='triplet' (the shipped-config path).

    Mirrors reference online_train.train (:441-776): model, loaders,
    optional resume, per-epoch clustering/training/validation/retrieval/
    checkpointing.
    """
    from ..models import model_selector
    from .checkpoint import (load_checkpoint, restore_train_state,
                             save_checkpoint, torch_resnet3d_to_flax,
                             merge_pretrained)

    is_master = is_master_proc()
    model = model_selector(cfg)
    dtype = jnp.float32
    sample = jnp.zeros((2, cfg.DATA.SAMPLE_DURATION, cfg.DATA.SAMPLE_SIZE,
                        cfg.DATA.SAMPLE_SIZE, cfg.DATA.INPUT_CHANNEL_NUM),
                       dtype)
    state = create_train_state(jax.random.key(0), model, cfg, sample)

    start_epoch, best_prec1 = 0, 0.0
    if getattr(args, "checkpoint_path", None):
        payload = load_checkpoint(args.checkpoint_path)
        if "torch_state_dict" in payload:
            p, s = torch_resnet3d_to_flax(payload["torch_state_dict"])
            params, stats = merge_pretrained(state.params, state.batch_stats,
                                             p, s, verbose=is_master)
            state = state.replace(params=params, batch_stats=stats)
            start_epoch = payload.get("epoch", 0)
            best_prec1 = payload.get("best_prec1", 0.0)
        else:
            state, start_epoch, best_prec1 = restore_train_state(state,
                                                                 payload)
    if getattr(args, "start_epoch", None) is not None:
        start_epoch = args.start_epoch

    iter_cluster = bool(getattr(args, "iterative_cluster", False))
    if iter_cluster and start_epoch >= cfg.ITERCLUSTER.WARMUP_EPOCHS:
        cfg.DATASET.CLUSTER_PATH = os.path.join(cfg.OUTPUT_PATH,
                                                "vid_clusters.txt")

    train_loader, _ = build_data_loader("train", cfg, is_master,
                                        triplets=True)
    val_loader, _ = build_data_loader("val", cfg, is_master, triplets=True,
                                      negative_sampling=True)
    eval_train_loader, _ = build_data_loader(
        "train", cfg, is_master, triplets=False, req_train_shuffle=False,
        drop_last=False)

    step_fn = make_triplet_train_step(cfg)
    base_key = jax.random.key(1234)

    for epoch in range(start_epoch, cfg.TRAIN.EPOCHS):
        if is_master:
            print(f"\nEpoch {epoch}/{cfg.TRAIN.EPOCHS - 1}")

        if (iter_cluster and epoch >= cfg.ITERCLUSTER.WARMUP_EPOCHS
                and (epoch - cfg.ITERCLUSTER.WARMUP_EPOCHS)
                % cfg.ITERCLUSTER.INTERVAL == 0):
            iterative_cluster_step(state, model, cfg, eval_train_loader,
                                   is_master)
            cfg.DATASET.CLUSTER_PATH = os.path.join(cfg.OUTPUT_PATH,
                                                    "vid_clusters.txt")
            cfg.DATASET.TARGET_TYPE_T = "cluster_label"
            train_loader, _ = build_data_loader("train", cfg, is_master,
                                                triplets=True)

        train_loader.set_epoch(epoch)
        state, _ = triplet_train_epoch(state, step_fn, train_loader, cfg,
                                       epoch, base_key, is_master)

        acc, topk = validate(state, model, cfg, val_loader, epoch, is_master)
        prec1 = topk.get(1, 0.0)
        is_best = prec1 > best_prec1
        best_prec1 = max(best_prec1, prec1)
        if is_master:
            save_checkpoint(cfg.OUTPUT_PATH, cfg.MODEL.ARCH, state, epoch,
                            best_prec1, is_best=is_best)
    return state
