"""Throughput of the non-triplet training paths (round-4 completeness).

bench.py tracks the triplet step (the reference's flagship loop); this
measures the remaining LOSS.TYPE dispatches on the real chip at the
benchmark clip shape so every training path has a recorded number:

  contrastive      NCEAverage banks, two views through R3D-18
  moco             MemoryMoCo queue (LOSS.MOCO)
  ubernce          UberNCE (S3D MoCoEncoder + momentum encoder + queue)

Each: jitted step with donated state, unique keys, scalar materialization.
Usage: JAX_PLATFORMS=axon python perf_experiments/loss_paths_r4.py [--batch 64]
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
from video_similarity_search_tpu.train import create_train_state
from video_similarity_search_tpu.train.driver import _make_step_and_state
from video_similarity_search_tpu.utils.flops import (chip_peak_tflops,
                                                     resnet3d_flops_per_clip)

T, S = 16, 128


def base_cfg(b):
    cfg = get_cfg()
    cfg.MODEL.ARCH = "3dresnet"
    cfg.RESNET.MODEL_DEPTH = 18
    cfg.RESNET.NO_MAX_POOl = True
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TRAIN.BATCH_SIZE = b
    cfg.LOSS.FEAT_DIM = 128
    return cfg


def timed_step(step, state, batch, clips_per_step, flops_mult, fpc, peak,
               name):
    import argparse as _a

    state, m = step(state, batch, jax.random.key(1))
    float(m["loss"])
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.key(2 + i))
        float(m["loss"])
        best = min(best, time.perf_counter() - t0)
    clips = clips_per_step / best
    print(json.dumps({
        "path": name, "clips_per_sec": round(clips, 1),
        "step_ms": round(best * 1e3, 1),
        "mfu_r3d18_equiv": round(clips * flops_mult * fpc / 1e12 / peak, 4),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    b = args.batch
    fpc = resnet3d_flops_per_clip(depth=18, t=T, size=S, no_max_pool=True)
    peak = chip_peak_tflops(jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    fake_args = argparse.Namespace(checkpoint_path=None, start_epoch=None,
                                   iterative_cluster=False, vector=False)

    def clips(n):
        return jnp.asarray(rng.normal(size=(n, T, S, S, 3)) * 0.3,
                           jnp.bfloat16)

    # contrastive (NCEAverage): two R3D-18 views = 2B clips/step
    cfg = base_cfg(b)
    cfg.LOSS.TYPE = "contrastive"
    cfg.LOSS.K = 1024
    step, state = _make_step_and_state(fake_args, cfg, model_selector(cfg),
                                       n_data=8192, mesh=None)
    batch = {"view1": clips(b), "view2": clips(b),
             "index": jnp.arange(b, dtype=jnp.int32)}
    timed_step(step, state, batch, 2 * b, 3, fpc, peak, "contrastive_nce")

    # contrastive + MemoryMoCo queue
    cfg = base_cfg(b)
    cfg.LOSS.TYPE = "contrastive"
    cfg.LOSS.MOCO = True
    cfg.LOSS.K = 2048
    step, state = _make_step_and_state(fake_args, cfg, model_selector(cfg),
                                       n_data=8192, mesh=None)
    timed_step(step, state, batch, 2 * b, 3, fpc, peak, "memory_moco")

    # UberNCE: S3D query+key encoders (fwd x2 + bwd on query) at 128px
    cfg = base_cfg(b)
    cfg.LOSS.TYPE = "UberNCE"
    cfg.MODEL.ARCH = "uber_nce"
    cfg.LOSS.K = 2048
    step, state = _make_step_and_state(fake_args, cfg, model_selector(cfg),
                                       n_data=8192, mesh=None)
    ubatch = {"x1": clips(b), "x2": clips(b),
              "label": jnp.asarray(rng.integers(0, 40, b), jnp.int32)}
    timed_step(step, state, ubatch, 2 * b, 3, fpc, peak,
               "ubernce_s3d (mfu col n/a: S3D flops differ)")


if __name__ == "__main__":
    main()
