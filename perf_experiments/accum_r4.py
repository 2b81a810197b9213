"""Gradient accumulation (TRAIN.ACCUM_STEPS) on the real chip.

Round-4 PERF.md established: 2B=128 clips/step is the v5e-16GB training
optimum (52.8% MFU); at 2B=256 the step drops to 50.1% (BN-stat
epilogues + ~48%-MFU stage-1 grad convs + ~10% XLA emergency remat of
the 2.15 GB stage-1 activations), and 2B>=320 OOMs outright. The
accumulation step scans A microbatches inside one jit, so peak
activation memory is ONE microbatch's: effective 2B=256/512/1024 should
run at the 2B=128 rate (minus scan overhead), turning the emergency-remat
regime into pure throughput and unlocking effective batches that
previously OOM'd.

Measures the SHIPPED make_triplet_train_step at:
  A=1, 2B=128 / 256       (round-3/4 baselines, re-measured same-day)
  A=2, 2B=256  (2x128)    vs the 50.1% plain point
  A=4, 2B=512  (4x128)    vs OOM
  A=8, 2B=1024 (8x128)    vs OOM

Usage: JAX_PLATFORMS=axon python perf_experiments/accum_r4.py
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
from video_similarity_search_tpu.models import model_selector
from video_similarity_search_tpu.train import (create_train_state,
                                               make_triplet_train_step)
from video_similarity_search_tpu.utils.flops import (chip_peak_tflops,
                                                     resnet3d_flops_per_clip)

T, S = 16, 128


def run_point(accum: int, b_total: int, rng, fpc, peak, reps=3):
    """b_total anchors per optimizer step (2*b_total clips), split over
    ``accum`` microbatches."""
    cfg = get_cfg()
    cfg.MODEL.ARCH = "3dresnet"
    cfg.RESNET.MODEL_DEPTH = 18
    cfg.RESNET.NO_MAX_POOl = True
    cfg.DATASET.SAMPLING_STRATEGY = "random_semi_hard"
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TRAIN.ACCUM_STEPS = accum
    model = model_selector(cfg)
    step = make_triplet_train_step(cfg)
    st = create_train_state(jax.random.key(0), model, cfg,
                            jnp.zeros((2, T, S, S, 3), jnp.bfloat16))

    b = b_total // accum

    def clips(shape):
        return jnp.asarray(rng.normal(size=shape) * 0.3, jnp.bfloat16)

    if accum > 1:
        batch = {
            "anchor": clips((accum, b, T, S, S, 3)),
            "positive": clips((accum, b, T, S, S, 3)),
            "targets": jnp.asarray(
                np.tile(rng.integers(0, 40, (accum, b)), (1, 2)), jnp.int32),
        }
    else:
        batch = {
            "anchor": clips((b, T, S, S, 3)),
            "positive": clips((b, T, S, S, 3)),
            "targets": jnp.asarray(np.tile(rng.integers(0, 40, b), 2),
                                   jnp.int32),
        }

    try:
        st, m = step(st, batch, jax.random.key(1))
        float(m["loss"])  # compile + warm; forces any OOM now
    except Exception as e:  # noqa: BLE001 - record OOM as a data point
        print(json.dumps({"exp": f"accum{accum}", "clips": 2 * b_total,
                          "error": str(e)[:200]}), flush=True)
        return
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        st, m = step(st, batch, jax.random.key(2 + i))
        float(m["loss"])
        best = min(best, time.perf_counter() - t0)
    n_clips = 2 * b_total
    clips_s = n_clips / best
    mfu = clips_s * 3 * fpc / 1e12 / peak
    print(json.dumps({"exp": f"accum{accum}", "clips": n_clips,
                      "microbatch_clips": 2 * b,
                      "ms_per_step": round(best * 1e3, 1),
                      "clips_per_sec": round(clips_s, 1),
                      "mfu": round(mfu, 4)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=str,
                    default="1x64,1x128,2x64,2x128,4x128,8x128")
    args = ap.parse_args()

    fpc = resnet3d_flops_per_clip(depth=18, t=T, size=S, no_max_pool=True)
    peak = chip_peak_tflops(jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    for pt in args.points.split(","):
        a, b = pt.split("x")
        run_point(int(a), int(a) * int(b), rng, fpc, peak)


if __name__ == "__main__":
    main()
