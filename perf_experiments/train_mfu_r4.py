"""Round-4 train-step MFU attribution at the 256-clip shape.

Round 3 left one measurable gap (VERDICT round-3, Weak #1): the triplet
train step at B=128 (2B=256 clips) runs at 50.0% MFU while the SAME-shape
inference pass runs at 74.7% (the >=256-clip conv packing plateau). This
script localizes where the step loses the packing:

    fwd_eval      train=False forward (the embed pass; expect ~74.7%)
    fwd_train     train=True forward (BN batch stats mutated)
    fwd_mine      train=True forward + triplet mining (loss value only)
    grad_nomine   value_and_grad of sum(emb), no mining, no optimizer
    grad_mine     value_and_grad of the full triplet loss, no optimizer
    full_step     the shipped make_triplet_train_step (grad + SGD + banks)

Each timed program is ONE jit: a lax.scan over n_iters with per-step
perturbed inputs and a scalar accumulator (axon tunnel rules: unique
seeds per call, scalar materialization — see PERF.md / memory notes).

MFU convention: forward-only variants count 1x forward FLOPs; gradient
variants count 3x (fwd + ~2x bwd), matching PERF.md round 3.

Usage: JAX_PLATFORMS=axon python perf_experiments/train_mfu_r4.py \
           [--clips 256 128] [--exps fwd_eval,grad_nomine,...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from video_similarity_search_tpu.config import get_cfg
from video_similarity_search_tpu.losses import online_triplet_loss
from video_similarity_search_tpu.models import model_selector
from video_similarity_search_tpu.train import (create_train_state,
                                               make_triplet_train_step)
from video_similarity_search_tpu.utils.flops import (chip_peak_tflops,
                                                     resnet3d_flops_per_clip)

T, S = 16, 128


def build():
    cfg = get_cfg()
    cfg.MODEL.ARCH = "3dresnet"
    cfg.RESNET.MODEL_DEPTH = 18
    cfg.RESNET.NO_MAX_POOl = True
    cfg.DATASET.SAMPLING_STRATEGY = "random_semi_hard"
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    model = model_selector(cfg)
    sample = jnp.zeros((2, T, S, S, 3), jnp.bfloat16)
    state = create_train_state(jax.random.key(0), model, cfg, sample)
    return cfg, model, state


def timed(fn, *args, reps=3):
    """Compile + best-of-reps wall time; fn must return a scalar and take a
    trailing float seed arg (unique per call)."""
    float(fn(*args, jnp.float32(-1.0)))  # compile + warm
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        float(fn(*args, jnp.float32(r)))
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, n_clips, secs, n_iters, flops_mult, fpc, peak):
    clips_s = n_clips * n_iters / secs
    mfu = clips_s * flops_mult * fpc / 1e12 / peak
    print(json.dumps({"exp": name, "clips": n_clips,
                      "ms_per_iter": round(secs * 1e3 / n_iters, 1),
                      "clips_per_sec": round(clips_s, 1),
                      "mfu": round(mfu, 4)}), flush=True)
    return mfu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, nargs="+", default=[256, 128])
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--exps", type=str, default="")
    args = ap.parse_args()
    want = set(args.exps.split(",")) if args.exps else None

    cfg, model, state = build()
    fpc = resnet3d_flops_per_clip(depth=18, t=T, size=S, no_max_pool=True)
    peak = chip_peak_tflops(jax.devices()[0].device_kind)
    n_iters = args.iters
    rng = np.random.default_rng(0)

    def clips_arr(n):
        return jnp.asarray(rng.normal(size=(n, T, S, S, 3)) * 0.3,
                           jnp.bfloat16)

    def sel(name):
        return want is None or name in want

    for n in args.clips:
        x = clips_arr(n)
        targets = jnp.asarray(np.tile(rng.integers(0, 40, n // 2), 2),
                              jnp.int32)

        if sel("fwd_eval"):
            @jax.jit
            def fwd_eval(params, bs, clips, seed):
                def it(c, i):
                    out = model.apply({"params": params, "batch_stats": bs},
                                      clips + (seed + i).astype(jnp.bfloat16)
                                      * 1e-3, train=False)
                    return c + jnp.sum(out.astype(jnp.float32)), None
                acc, _ = jax.lax.scan(it, jnp.float32(0), jnp.arange(n_iters))
                return acc

            secs = timed(fwd_eval, state.params, state.batch_stats, x)
            report(f"fwd_eval", n, secs, n_iters, 1, fpc, peak)

        if sel("fwd_train"):
            @jax.jit
            def fwd_train(params, bs, clips, seed):
                def it(carry, i):
                    acc, bs = carry
                    out, mut = model.apply(
                        {"params": params, "batch_stats": bs},
                        clips + (seed + i).astype(jnp.bfloat16) * 1e-3,
                        train=True, mutable=["batch_stats"])
                    return (acc + jnp.sum(out.astype(jnp.float32)),
                            mut["batch_stats"]), None
                (acc, _), _ = jax.lax.scan(it, (jnp.float32(0),
                                                bs), jnp.arange(n_iters))
                return acc

            secs = timed(fwd_train, state.params, state.batch_stats, x)
            report("fwd_train", n, secs, n_iters, 1, fpc, peak)

        if sel("fwd_mine"):
            @jax.jit
            def fwd_mine(params, bs, clips, tgt, seed):
                def it(carry, i):
                    acc, bs = carry
                    out, mut = model.apply(
                        {"params": params, "batch_stats": bs},
                        clips + (seed + i).astype(jnp.bfloat16) * 1e-3,
                        train=True, mutable=["batch_stats"])
                    loss, _ = online_triplet_loss(
                        out, tgt, jax.random.key(0), margin=cfg.LOSS.MARGIN,
                        dist_metric=cfg.LOSS.DIST_METRIC,
                        sampling_strategy=cfg.DATASET.SAMPLING_STRATEGY)
                    return (acc + loss, mut["batch_stats"]), None
                (acc, _), _ = jax.lax.scan(it, (jnp.float32(0), bs),
                                           jnp.arange(n_iters))
                return acc

            secs = timed(fwd_mine, state.params, state.batch_stats, x,
                         targets)
            report("fwd_mine", n, secs, n_iters, 1, fpc, peak)

        if sel("grad_nomine"):
            @jax.jit
            def grad_nomine(params, bs, clips, seed):
                def it(carry, i):
                    acc, bs = carry

                    def loss_fn(p):
                        out, mut = model.apply(
                            {"params": p, "batch_stats": bs},
                            clips + (seed + i).astype(jnp.bfloat16) * 1e-3,
                            train=True, mutable=["batch_stats"])
                        return (jnp.sum(out.astype(jnp.float32)),
                                mut["batch_stats"])

                    (l, bs2), g = jax.value_and_grad(
                        loss_fn, has_aux=True)(params)
                    gsum = sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                               for x in jax.tree_util.tree_leaves(g))
                    return (acc + l + gsum, bs2), None
                (acc, _), _ = jax.lax.scan(it, (jnp.float32(0), bs),
                                           jnp.arange(n_iters))
                return acc

            secs = timed(grad_nomine, state.params, state.batch_stats, x)
            report("grad_nomine", n, secs, n_iters, 3, fpc, peak)

        if sel("grad_mine"):
            @jax.jit
            def grad_mine(params, bs, clips, tgt, seed):
                def it(carry, i):
                    acc, bs = carry

                    def loss_fn(p):
                        out, mut = model.apply(
                            {"params": p, "batch_stats": bs},
                            clips + (seed + i).astype(jnp.bfloat16) * 1e-3,
                            train=True, mutable=["batch_stats"])
                        loss, _ = online_triplet_loss(
                            out, tgt, jax.random.key(0),
                            margin=cfg.LOSS.MARGIN,
                            dist_metric=cfg.LOSS.DIST_METRIC,
                            sampling_strategy=cfg.DATASET.SAMPLING_STRATEGY)
                        return loss, mut["batch_stats"]

                    (l, bs2), g = jax.value_and_grad(
                        loss_fn, has_aux=True)(params)
                    gsum = sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                               for x in jax.tree_util.tree_leaves(g))
                    return (acc + l + gsum, bs2), None
                (acc, _), _ = jax.lax.scan(it, (jnp.float32(0), bs),
                                           jnp.arange(n_iters))
                return acc

            secs = timed(grad_mine, state.params, state.batch_stats, x,
                         targets)
            report("grad_mine", n, secs, n_iters, 3, fpc, peak)

        if sel("full_step"):
            # the shipped step (not scanned: state donation), timed like
            # bench.py's train_step_bench
            b = n // 2
            step = make_triplet_train_step(cfg)
            st = create_train_state(jax.random.key(0), model, cfg,
                                    jnp.zeros((2, T, S, S, 3), jnp.bfloat16))
            batch = {"anchor": clips_arr(b), "positive": clips_arr(b),
                     "targets": targets}
            st, m = step(st, batch, jax.random.key(1))
            float(m["loss"])
            best = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                st, m = step(st, batch, jax.random.key(2 + i))
                float(m["loss"])
                best = min(best, time.perf_counter() - t0)
            report("full_step", n, best, 1, 3, fpc, peak)


if __name__ == "__main__":
    main()
