"""Jitted train / eval step factories.

Each reference epoch function (online_train.py: triplet_train_epoch :245,
contrastive_train_epoch :136, UberNCE_train_epoch :60) becomes one pure
jitted step: forward + loss + grad + optimizer + BN-stats update in a
single XLA program with donated state. Under a data-sharded batch the
global-mean loss makes gradient averaging implicit (the DDP all-reduce of
the reference disappears into XLA collectives), and BN reductions are
global (sync-BN semantics).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..losses import (INTRA_NEG_LAMBDA, RSP_LAMBDA, intra_neg_loss, llc_loss,
                      mem_triplet_loss, memory_moco, nce_average,
                      nce_average_intra_neg, nce_criterion, nce_softmax_loss,
                      online_triplet_loss, rsp_loss)
from ..losses.nce import memory_moco_logits
from ..models.layers import BN_MOMENTUM as _BN_MOMENTUM
from ..models.moco import (dequeue_and_enqueue, infonce_forward,
                           momentum_update, ubernce_forward)
from ..models.slowfast import multipathway_input
from .state import TrainState


def _encode(state: TrainState, params, clips, cfg, train: bool,
            rngs=None):
    """Run the encoder; returns (embeddings, new_batch_stats)."""
    if cfg.MODEL.ARCH == "slowfast":
        clips = multipathway_input(clips, cfg.SLOWFAST.ALPHA,
                                   fast_mask=cfg.SLOWFAST.FAST_MASK)
    variables = {"params": params, "batch_stats": state.batch_stats}
    if train:
        out, mutated = state.apply_fn(variables, clips, train=True,
                                      mutable=["batch_stats"], rngs=rngs)
        new_bs = mutated["batch_stats"]
    else:
        out = state.apply_fn(variables, clips, train=False)
        new_bs = state.batch_stats
    if isinstance(out, tuple):
        out = out[0]
    return out, new_bs


def _encode_views(state: TrainState, params, views, cfg, rngs=None):
    """Encode V stacked views (V, B, T, H, W, C) in ONE batched program.

    Round-4 optimization for the contrastive paths: the reference (and
    round 3 here) runs each view through a separate forward — on TPU two
    sequential B-clip forwards tile at the small-batch rate (36% MFU at
    B=64) while one 2B-clip call sits in the 52% regime (PERF.md). A
    ``jax.vmap`` over the view axis collapses into the conv batch dim, so
    XLA sees 2B clips per conv, while BatchNorm still normalizes each
    view by ITS OWN batch statistics (the vmapped axis is never reduced)
    — identical normalization to the sequential per-call form.

    Running statistics are then merged to the exact sequential update:
    flax BN does r' = m*r + (1-m)*s per call, so with per-view results
    M_v = m*r0 + (1-m)*s_v the chained update telescopes to
    r_k = m*r_{k-1} + (M_v - m*r0). Same numbers as calling the encoder
    view-by-view (up to float association).

    Returns (feats (V, B, D), merged batch_stats)."""
    if cfg.MODEL.ARCH == "slowfast":
        views = jax.vmap(lambda v: multipathway_input(
            v, cfg.SLOWFAST.ALPHA, fast_mask=cfg.SLOWFAST.FAST_MASK))(views)

    def one(clips):
        out, mut = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats}, clips,
            train=True, mutable=["batch_stats"], rngs=rngs)
        if isinstance(out, tuple):
            out = out[0]
        return out, mut["batch_stats"]

    feats, muts = jax.vmap(one)(views)

    m = _BN_MOMENTUM
    n_views = jax.tree_util.tree_leaves(views)[0].shape[0]

    def merge(r0, mut_stack):
        r = r0
        for v in range(n_views):
            r = m * r + (mut_stack[v] - m * r0)
        return r

    new_bs = jax.tree.map(merge, state.batch_stats, muts)
    return feats, new_bs


def diff_view(x: jnp.ndarray) -> jnp.ndarray:
    """Residual 'res' modality view: frame difference rescaled to [0,1]
    (reference online_train.py:228-230; roll over the T axis)."""
    return ((x - jnp.roll(x, 1, axis=1)) + 1.0) / 2.0


def shuffle_view(x: jnp.ndarray, key, block_size: int = 2) -> jnp.ndarray:
    """Intra-negative view: temporally block-shuffled clip (the device-side
    equivalent of datasets/temporal_transforms.py Shuffle, :233-246).

    Each clip gets its OWN block permutation like the reference's per-item
    transform (a single shared permutation would correlate every
    intra-negative in the batch); an odd trailing frame stays in place
    instead of being truncated (which would change T and break the view
    stack)."""
    b, t = x.shape[0], x.shape[1]
    n_blocks = t // block_size
    perms = jax.vmap(lambda k: jax.random.permutation(k, n_blocks))(
        jax.random.split(key, b))
    idx = (perms[:, :, None] * block_size
           + jnp.arange(block_size)[None, None, :]).reshape(b, -1)
    if idx.shape[1] < t:  # ragged tail frames keep their positions
        tail = jnp.broadcast_to(jnp.arange(idx.shape[1], t)[None, :],
                                (b, t - idx.shape[1]))
        idx = jnp.concatenate([idx, tail], axis=1)
    return jnp.take_along_axis(x, idx[:, :, None, None, None], axis=1)


def make_triplet_loss_fn(cfg) -> Callable:
    """The triplet step's loss body, shared by the plain step and the
    gradient-accumulation scan (and pinned directly by the accumulation
    parity test): ``loss_fn(params, state, batch, mine_key, drop_key)``
    -> (loss, (new_batch_stats, t_loss, aux_loss, n_triplets, new_mem)).

    ``state`` carries apply_fn + batch_stats + mem_triplet; gradients are
    taken with respect to ``params`` only."""
    margin = cfg.LOSS.MARGIN
    metric = cfg.LOSS.DIST_METRIC
    strategy = cfg.DATASET.SAMPLING_STRATEGY
    use_mem = cfg.LOSS.MEM_TRIPLET  # reference MemTripletLoss
    use_rsp = cfg.LOSS.RELATIVE_SPEED_PERCEPTION
    use_llc = cfg.LOSS.LOCAL_LOCAL_CONTRAST
    use_intra = cfg.LOSS.INTRA_NEGATIVE
    intra_compat = getattr(cfg.LOSS, "INTRA_NEG_REFERENCE_COMPAT", False)
    llc_margin = cfg.LOSS.LOCAL_LOCAL_MARGIN
    llc_weight = cfg.LOSS.LOCAL_LOCAL_WEIGHT

    def loss_fn(params, state, batch, mine_key, drop_key):
        b = batch["anchor"].shape[0]
        clips = [batch["anchor"], batch["positive"]]
        if use_rsp or use_llc or use_intra:
            clips.append(batch["extra"])
        emb, new_bs = _encode(state, params, jnp.concatenate(clips, 0),
                              cfg, train=True,
                              rngs={"dropout": drop_key})
        emb2 = emb[:2 * b]
        if use_mem:
            # triplets vs the labeled FIFO bank (reference
            # MemTripletLoss, loss/triplet_loss.py:9-81 — wired here
            # behind LOSS.MEM_TRIPLET; the reference left it commented
            # out at online_train.py:538)
            t_loss, n_triplets, new_mem = mem_triplet_loss(
                state.mem_triplet, emb2, batch["targets"], mine_key,
                margin=margin, dist_metric=metric,
                sampling_strategy=strategy)
        else:
            t_loss, n_triplets = online_triplet_loss(
                emb2, batch["targets"], mine_key, margin=margin,
                dist_metric=metric, sampling_strategy=strategy)
            new_mem = state.mem_triplet
        aux_loss = 0.0
        if use_rsp:
            aux_loss = RSP_LAMBDA * rsp_loss(emb[:b], emb[b:2 * b],
                                             emb[2 * b:], metric)
        elif use_llc:
            aux_loss = llc_weight * llc_loss(emb[:b], emb[b:2 * b],
                                             emb[2 * b:], llc_margin,
                                             metric)
        elif use_intra:
            aux_loss = INTRA_NEG_LAMBDA * intra_neg_loss(
                emb[:b], emb[b:2 * b], emb[2 * b:], metric,
                reference_compat=intra_compat)
        loss = t_loss + aux_loss
        return loss, (new_bs, t_loss, aux_loss, n_triplets, new_mem)

    return loss_fn


def make_triplet_train_step(cfg) -> Callable:
    """Step for LOSS.TYPE='triplet' (ref triplet_train_epoch :245-434).

    batch dict: anchor, positive, optional extra (fast_positive / anchor2 /
    intra_neg per LOSS flags), targets (2B,). Returns (state, metrics).

    ``TRAIN.ACCUM_STEPS = A > 1``: batch leaves arrive (A, b, ...) and a
    ``lax.scan`` runs A microbatches sequentially inside the one jitted
    step — per-microbatch gradients accumulate and average, the optimizer
    applies ONCE, BN stats and the mem-triplet bank chain through the
    scan. Peak activation memory is one microbatch's, so effective
    batches past the 16 GB emergency-remat regime train at the
    small-batch MFU optimum (PERF.md round 4). Mining and BN are
    microbatch-local — the reference's per-GPU DDP semantics with A
    extra shards."""
    accum = max(1, int(cfg.TRAIN.ACCUM_STEPS))
    loss_fn = make_triplet_loss_fn(cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, key):
        mine_key, drop_key = jax.random.split(key)
        (loss, (new_bs, t_loss, aux, n_trip, new_mem)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state, batch, mine_key, drop_key)
        state = state.apply_gradients(grads).replace(batch_stats=new_bs,
                                                     mem_triplet=new_mem)
        metrics = {"loss": loss, "triplet_loss": t_loss, "aux_loss": aux,
                   "n_triplets": n_trip}
        return state, metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def accum_step(state: TrainState, batch, key):
        keys = jax.random.split(key, accum)

        def micro(carry, xs):
            bs, mem, gsum, lsum, tsum, asum, nsum = carry
            mb, k = xs
            mine_key, drop_key = jax.random.split(k)
            st = state.replace(batch_stats=bs, mem_triplet=mem)
            (loss, (new_bs, t_loss, aux, n_trip, new_mem)), g = \
                jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, st, mb, mine_key, drop_key)
            gsum = jax.tree.map(jnp.add, gsum, g)
            carry = (new_bs, new_mem, gsum, lsum + loss, tsum + t_loss,
                     asum + aux, nsum + n_trip)
            return carry, None

        init = (state.batch_stats, state.mem_triplet,
                jax.tree.map(jnp.zeros_like, state.params),
                jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
        (new_bs, new_mem, gsum, lsum, tsum, asum, nsum), _ = jax.lax.scan(
            micro, init, (batch, keys))
        grads = jax.tree.map(lambda g: g / accum, gsum)
        state = state.apply_gradients(grads).replace(batch_stats=new_bs,
                                                     mem_triplet=new_mem)
        metrics = {"loss": lsum / accum, "triplet_loss": tsum / accum,
                   "aux_loss": asum / accum, "n_triplets": nsum}
        return state, metrics

    return accum_step if accum > 1 else step


def make_contrastive_train_step(cfg, n_data: int, modality: str = "rgb",
                                intra_neg: bool = False,
                                neg_type: str = "shuffle",
                                use_moco: bool = False) -> Callable:
    """Step for LOSS.TYPE='contrastive' (ref contrastive_train_epoch
    :136-225): two views through the encoder, NCEAverage banks, NCE/softmax
    criteria. batch: view1, view2 (ignored for 'res' modality), index.

    ``use_moco`` (LOSS.MOCO) swaps the per-sample NCEAverage banks for the
    MemoryMoCo queue — the reference's intended ``moco=True`` dispatch
    (online_train.py:38,697; the upstream import is broken, SURVEY §7.4).
    Symmetric two-view scoring against the pre-update queue; the queue
    advances once per step with the view2 keys."""
    K, T, M = cfg.LOSS.K, cfg.LOSS.T, cfg.LOSS.M
    use_softmax = True
    accum = max(1, int(cfg.TRAIN.ACCUM_STEPS))

    def loss_fn(params, state, batch, nce_key, view_key, drop_key):
        view1 = batch["view1"]
        view2 = (diff_view(view1) if modality == "res"
                 else batch["view2"])
        # all views encode in ONE batched forward (2B/3B clips per
        # conv — the large-batch tiling regime) with per-view BN
        # statistics; see _encode_views
        views = [view1, view2]
        if intra_neg and not use_moco:
            views.append(shuffle_view(view1, view_key))
        feats, bs2 = _encode_views(state, params, jnp.stack(views),
                                   cfg, rngs={"dropout": drop_key})
        feat1, feat2 = feats[0], feats[1]
        if use_moco:
            # view1 queries / view2 keys advance the queue; view2's
            # logits score against the SAME pre-update memory
            out2 = memory_moco_logits(state.memory_moco.memory, feat2,
                                      feat1, T=T)
            out1, new_mm = memory_moco(state.memory_moco, feat1, feat2,
                                       T=T, use_softmax=use_softmax,
                                       n_data=n_data)
            new_nce = new_mm
        elif intra_neg:
            out1, out2, new_nce = nce_average_intra_neg(
                state.nce, feat1, feat2, feats[2], batch["index"],
                nce_key, K=K, T=T, momentum=M, use_softmax=use_softmax)
        else:
            out1, out2, new_nce = nce_average(
                state.nce, feat1, feat2, batch["index"], nce_key, K=K,
                T=T, momentum=M, use_softmax=use_softmax)
        if use_softmax:
            l1 = nce_softmax_loss(out1)
            l2 = nce_softmax_loss(out2)
        else:
            l1 = nce_criterion(out1, n_data)
            l2 = nce_criterion(out2, n_data)
        loss = l1 + l2
        probs = (jnp.mean(out1[:, 0]), jnp.mean(out2[:, 0]))
        return loss, (bs2, new_nce, l1, l2, probs)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, key):
        nce_key, view_key, drop_key = jax.random.split(key, 3)
        (loss, (new_bs, new_nce, l1, l2, probs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state, batch, nce_key,
                                   view_key, drop_key)
        bank = {"memory_moco": new_nce} if use_moco else {"nce": new_nce}
        state = state.apply_gradients(grads).replace(batch_stats=new_bs,
                                                     **bank)
        metrics = {"loss": loss, "view1_loss": l1, "view2_loss": l2,
                   "view1_prob": probs[0], "view2_prob": probs[1]}
        return state, metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def accum_step(state: TrainState, batch, key):
        # TRAIN.ACCUM_STEPS microbatches scanned inside the one step:
        # grads average, the NCE/MoCo bank and BN stats chain through the
        # scan (each microbatch's indices are distinct, so sequential
        # bank updates are the exact smaller-batch semantics), optimizer
        # applies once. See make_triplet_train_step for the memory model.
        keys = jax.random.split(key, accum)
        bank0 = state.memory_moco if use_moco else state.nce

        def micro(carry, xs):
            bs, bank, gsum, sums = carry
            mb, k = xs
            nce_key, view_key, drop_key = jax.random.split(k, 3)
            st = (state.replace(batch_stats=bs, memory_moco=bank)
                  if use_moco else state.replace(batch_stats=bs, nce=bank))
            (loss, (new_bs, new_bank, l1, l2, probs)), g = \
                jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, st, mb, nce_key, view_key, drop_key)
            gsum = jax.tree.map(jnp.add, gsum, g)
            sums = tuple(s + v for s, v in zip(
                sums, (loss, l1, l2, probs[0], probs[1])))
            return (new_bs, new_bank, gsum, sums), None

        init = (state.batch_stats, bank0,
                jax.tree.map(jnp.zeros_like, state.params),
                tuple(jnp.zeros(()) for _ in range(5)))
        (new_bs, new_bank, gsum, sums), _ = jax.lax.scan(
            micro, init, (batch, keys))
        grads = jax.tree.map(lambda g: g / accum, gsum)
        bank = {"memory_moco": new_bank} if use_moco else {"nce": new_bank}
        state = state.apply_gradients(grads).replace(batch_stats=new_bs,
                                                     **bank)
        loss, l1, l2, p1, p2 = (s / accum for s in sums)
        metrics = {"loss": loss, "view1_loss": l1, "view2_loss": l2,
                   "view1_prob": p1, "view2_prob": p2}
        return state, metrics

    return accum_step if accum > 1 else step


def _topk_accuracy(logits, target, ks=(1, 5)):
    """reference coclr_utils calc_topk_accuracy semantics (k clamped to
    the class count for few-class heads)."""
    kmax = min(max(ks), logits.shape[-1])
    _, pred = jax.lax.top_k(logits, kmax)
    correct = pred == target[:, None]
    return [jnp.mean(jnp.any(correct[:, :min(k, kmax)],
                             axis=1).astype(jnp.float32))
            for k in ks]


def make_moco_train_step(cfg, encoder, uber: bool = False,
                         axis_name: Optional[str] = None) -> Callable:
    """Step for LOSS.TYPE='UberNCE' arches info_nce / uber_nce
    (ref UberNCE_train_epoch :60-133 + models/infoNCE.py forward).

    batch: x1, x2 (two augmented clips), label. Performs the momentum
    update and queue enqueue after the gradient step, like the reference
    (momentum update inside forward :86-90, enqueue at :198)."""
    T = 0.07  # ref model_selector models/model_utils.py:122-125
    m = 0.999

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, key):
        def loss_fn(params):
            qvars = {"params": params, "batch_stats": state.batch_stats}
            if uber:
                logits, mask, keys, new_bs = ubernce_forward(
                    encoder, qvars, state.moco, batch["x1"], batch["x2"],
                    batch["label"], T=T, train=True)
                logp = jax.nn.log_softmax(logits, axis=1)
                mask_f = mask.astype(jnp.float32)
                loss = jnp.mean(-jnp.sum(logp * mask_f, 1)
                                / jnp.sum(mask_f, 1))
                top1 = jnp.mean(jnp.take_along_axis(
                    mask_f, jnp.argmax(logits, 1)[:, None], 1)[:, 0])
                # top5 = any of the 5 highest logits hits a positive
                # column (was erroneously logged as a copy of top1)
                _, t5_idx = jax.lax.top_k(logits, min(5, logits.shape[1]))
                top5 = jnp.mean(jnp.any(
                    jnp.take_along_axis(mask_f, t5_idx, 1) > 0,
                    axis=1).astype(jnp.float32))
                aux = (keys, new_bs, top1, top5)
            else:
                logits, target, keys, new_bs = infonce_forward(
                    encoder, qvars, state.moco, batch["x1"], batch["x2"],
                    T=T, train=True)
                loss = jnp.mean(jax.nn.logsumexp(logits, 1) - logits[:, 0])
                t1, t5 = _topk_accuracy(logits, target)
                aux = (keys, new_bs, t1, t5)
            return loss, aux

        (loss, (keys, new_bs, top1, top5)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)

        moco = state.moco.replace(
            key_params=momentum_update(state.params, state.moco.key_params, m),
        )
        moco = dequeue_and_enqueue(
            moco, keys, labels=batch["label"] if uber else None,
            axis_name=axis_name)
        state = state.replace(moco=moco)
        return state, {"loss": loss, "top1": top1, "top5": top5}

    return step


def make_classify_train_step(cfg) -> Callable:
    """Supervised CE step for finetune / linear probe
    (reference coclr_classify.py:395-458). Model output may be
    (logits, feat) (LinearClassifier) or logits.

    Weight decay and train_what freezing live ENTIRELY in the optimizer
    the CLI builds (optax.multi_transform + add_decayed_weights in
    cli/coclr_classify.py); this factory deliberately takes neither, so
    nothing reads as if the step applied them a second time."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, key):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, mutated = state.apply_fn(
                variables, batch["clips"], train=True,
                mutable=["batch_stats"], rngs={"dropout": key})
            logits = out[0] if isinstance(out, tuple) else out
            labels = batch["label"]
            loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels))
            t1, t5 = _topk_accuracy(logits, labels)
            return loss, (mutated["batch_stats"], t1, t5)

        (loss, (new_bs, t1, t5)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        return state, {"loss": loss, "top1": t1, "top5": t5}

    return step


def make_embed_step(cfg, model) -> Callable:
    """Eval-mode embedding forward (used by evaluate/validation/clustering)."""

    @jax.jit
    def step(params, batch_stats, clips):
        if cfg.MODEL.ARCH == "slowfast":
            clips = multipathway_input(clips, cfg.SLOWFAST.ALPHA,
                                       fast_mask=cfg.SLOWFAST.FAST_MASK)
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          clips, train=False)
        if isinstance(out, tuple):
            out = out[0]
        return out.astype(jnp.float32)

    return step
