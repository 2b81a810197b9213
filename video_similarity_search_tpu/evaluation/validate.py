"""Validation: triplet accuracy + retrieval top-1/5.

Reference ``validation.validate`` (validation.py:12-151): run the
3-tower forward on (anchor, positive, negative) validation batches, count
``d(a,n) > d(a,p) + margin`` as a correct triplet, then compute either a
'global' retrieval metric over all-gathered embeddings or 'local_batch'
per-batch retrieval; append a line to ``val_loss_and_acc.txt``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import normalize_only
from ..models.slowfast import multipathway_input
from ..models.triplet_net import pairwise_dist
from ..utils.meters import AverageMeter, append_metric_line
from .retrieval import local_batch_retrieval_acc, topk_retrieval_acc


def make_validate_step(cfg, model):
    margin = cfg.LOSS.MARGIN
    metric = cfg.LOSS.DIST_METRIC

    @jax.jit
    def step(params, batch_stats, anchor, positive, negative):
        b = anchor.shape[0]
        clips = jnp.concatenate([anchor, positive, negative], axis=0)
        if cfg.MODEL.ARCH == "slowfast":
            clips = multipathway_input(clips, cfg.SLOWFAST.ALPHA,
                                       fast_mask=cfg.SLOWFAST.FAST_MASK)
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          clips, train=False)
        if isinstance(out, tuple):
            out = out[0]
        e_a, e_p, e_n = out[:b], out[b:2 * b], out[2 * b:]
        dist_a = pairwise_dist(e_a, e_p, metric)
        dist_b = pairwise_dist(e_a, e_n, metric)
        # per-sample values: the host slices off loader-padded tail rows,
        # keeping this step's traced shape static across ragged batches
        losses = jax.nn.relu(dist_a - dist_b + margin)
        correct = dist_b > dist_a + margin
        return losses, correct, e_a.astype(jnp.float32)

    return step


def validate(state, model, cfg, val_loader, epoch: int = 0,
             is_master_proc: bool = True) -> Tuple[float, Dict[int, float]]:
    """Returns (triplet_accuracy, {k: retrieval acc}). Writes
    val_loss_and_acc.txt like the reference (validation.py:148-149)."""
    step = make_validate_step(cfg, model)
    losses = AverageMeter("loss")
    n_correct, n_total = 0, 0
    embs, labels = [], []
    dataset = cfg.TRAIN.DATASET

    for batch in val_loader:
        anchor = normalize_only(jnp.asarray(batch["anchor"]), dataset=dataset)
        positive = normalize_only(jnp.asarray(batch["positive"]),
                                  dataset=dataset)
        negative = normalize_only(jnp.asarray(batch["negative"]),
                                  dataset=dataset)
        per_loss, per_correct, e_a = step(state.params, state.batch_stats,
                                          anchor, positive, negative)
        b = int(batch.get("__size__", anchor.shape[0]))  # real (unpadded)
        losses.update(float(jnp.mean(per_loss[:b])), b)
        n_correct += int(jnp.sum(per_correct[:b]))
        n_total += b
        embs.append(np.asarray(e_a)[:b])
        labels.append(np.asarray(batch["targets"][:b]))

    acc = n_correct / max(n_total, 1)

    if cfg.VAL.METRIC == "local_batch":
        metrics = [local_batch_retrieval_acc(e, l)
                   for e, l in zip(embs, labels)]
        topk = {k: (float(np.mean([m[k] for m in metrics])) if metrics
                    else 0.0) for k in (1, 5)}
    else:  # 'global': all embeddings as both query and bank
        emb = np.concatenate(embs) if embs else np.zeros((0, 1), np.float32)
        lab = np.concatenate(labels) if labels else np.zeros((0,), np.int64)
        topk = topk_retrieval_acc(emb, lab, emb, lab, ks=(1, 5),
                                  exclude_self=True) if len(emb) else \
            {1: 0.0, 5: 0.0}

    if is_master_proc:
        print(f"Val epoch {epoch}: loss {losses.avg:.4f} "
              f"triplet_acc {acc:.4f} top1 {topk[1]:.4f} top5 {topk[5]:.4f}")
        append_metric_line(
            cfg.OUTPUT_PATH, "val_loss_and_acc.txt",
            f"epoch:{epoch} {losses.avg:.4f} {acc:.4f} "
            f"{topk[1]:.4f} {topk[5]:.4f}")
    return acc, topk
