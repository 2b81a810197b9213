"""Train-step variants at large batch (round-4 MFU campaign, phase 2).

The round-4 profile attributes the 50%-vs-74.7% step gap to (a) stage-1/
stem backward convolutions at ~48% MFU and (b) XLA emergency remat of the
stage-1 forward under HBM pressure (~10% of the step). Variants:

  plain      the shipped step (baseline)
  remat1     TPU.REMAT + REMAT_STAGES=1 — explicit stage-1 checkpointing
             frees ~8 GB; does removing the emergency remat + giving the
             scheduler room beat the extra recompute?
  remat1 at bigger B — 2B=320/384 become feasible; do bwd convs tile
             better with a deeper batch contraction?

Usage: JAX_PLATFORMS=axon python perf_experiments/step_variants_r4.py \
          --batch 128 --remat-stages 1
Prints one JSON line (same fields as bench.py's train entries).
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat-stages", type=str, default="")
    args = ap.parse_args()

    t, s = 16, 128
    cfg = get_cfg()
    cfg.MODEL.ARCH = "3dresnet"
    cfg.RESNET.MODEL_DEPTH = 18
    cfg.RESNET.NO_MAX_POOl = True
    cfg.DATASET.SAMPLING_STRATEGY = "random_semi_hard"
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.REMAT = args.remat or bool(args.remat_stages)
    cfg.TPU.REMAT_STAGES = args.remat_stages
    model = model_selector(cfg)
    state = create_train_state(jax.random.key(0), model, cfg,
                               jnp.zeros((2, t, s, s, 3), jnp.bfloat16))
    step = make_triplet_train_step(cfg)

    b = args.batch
    rng = np.random.default_rng(0)
    batch = {
        "anchor": jnp.asarray(rng.normal(size=(b, t, s, s, 3)) * 0.3,
                              jnp.bfloat16),
        "positive": jnp.asarray(rng.normal(size=(b, t, s, s, 3)) * 0.3,
                                jnp.bfloat16),
        "targets": jnp.asarray(np.tile(rng.integers(0, 40, b), 2),
                               jnp.int32),
    }
    state, m = step(state, batch, jax.random.key(1))
    float(m["loss"])
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.key(2 + i))
        float(m["loss"])
        best = min(best, time.perf_counter() - t0)
    fpc = resnet3d_flops_per_clip(depth=18, t=t, size=s, no_max_pool=True)
    peak = chip_peak_tflops(jax.devices()[0].device_kind)
    clips = 2 * b / best
    print(json.dumps({
        "variant": f"B={b} remat={cfg.TPU.REMAT} stages={args.remat_stages or 'all'}",
        "clips_per_sec": round(clips, 1),
        "step_ms": round(best * 1e3, 1),
        "mfu": round(clips * 3 * fpc / 1e12 / peak, 4),
        "xla_flags": os.environ.get("XLA_FLAGS", "")}), flush=True)


if __name__ == "__main__":
    main()
