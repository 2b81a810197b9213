"""Embedding-pass MFU for the non-R3D18 model families (round-4 depth).

bench.py's headline tracks R3D-18 (the reference's flagship pretrain
encoder, README.md:31-40); this records on-chip numbers for the OTHER
families the framework ships so every model has a measured operating
point, each against its own analytic FLOP count
(`utils.flops.model_flops_per_clip` — counted from the model's conv/dense
layers, validated exactly equal to the hand-derived R3D-18 formula):

  slowfast50   two-pathway SlowFast-R50 (vendored-pyslowfast parity,
               alpha=4 beta_inv=8), [slow, fast] multipathway input
  s3d / s3dg   S3D(-G) backbone + 128-d projection (the CoCLR/UberNCE
               encoder, reference models/s3d/s3dg.py)
  r3d18-iic    IIC R3D (models/r3d/r3d.py lineage)

Timing discipline (memory: axon tunnel): whole sweep inside ONE jit
(lax.scan over iters, per-step-perturbed input), unique seed per timed
call, float() materialization; run on an otherwise-idle box.

Usage: python perf_experiments/model_zoo_r4.py [--models slowfast50,s3d]
       [--batches 16,32,64,128]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from video_similarity_search_tpu.utils.flops import (chip_peak_tflops,
                                                     model_flops_per_clip)


def build(name):
    """Returns (model, example_batch_fn, is_multipathway)."""
    from video_similarity_search_tpu.models.r3d import R3DNet
    from video_similarity_search_tpu.models.s3d import S3D
    from video_similarity_search_tpu.models.slowfast import (
        SlowFast, multipathway_input)

    if name == "slowfast50":
        # flagship SlowFast shape: 32-frame 224^2 raw clip -> slow 8 / fast 32
        model = SlowFast(depth=50, alpha=4, beta_inv=8, dtype=jnp.bfloat16)

        def batch_fn(b):
            clips = jax.random.normal(jax.random.key(0),
                                      (b, 32, 224, 224, 3), jnp.bfloat16)
            return multipathway_input(clips, alpha=4)

        return model, batch_fn, True
    if name == "slowfast50-128":
        # benchmark clip shape (16x128^2) for cross-family comparison
        model = SlowFast(depth=50, alpha=4, beta_inv=8, dtype=jnp.bfloat16)

        def batch_fn(b):
            clips = jax.random.normal(jax.random.key(0),
                                      (b, 16, 128, 128, 3), jnp.bfloat16)
            return multipathway_input(clips, alpha=4)

        return model, batch_fn, True
    if name in ("s3d", "s3dg"):
        model = S3D(gating=name == "s3dg", dtype=jnp.bfloat16)

        def batch_fn(b):
            return jax.random.normal(jax.random.key(0),
                                     (b, 16, 128, 128, 3), jnp.bfloat16)

        return model, batch_fn, False
    if name == "r3d18-iic":
        model = R3DNet(layer_sizes=(2, 2, 2, 2), dtype=jnp.bfloat16)

        def batch_fn(b):
            return jax.random.normal(jax.random.key(0),
                                     (b, 16, 128, 128, 3), jnp.bfloat16)

        return model, batch_fn, False
    raise SystemExit(f"unknown model {name}")


def measure(name, batch, n_iters=8):
    model, batch_fn, multi = build(name)
    x = batch_fn(batch)
    fpc = model_flops_per_clip(model, x)
    variables = model.init(jax.random.key(1),
                           jax.tree.map(lambda a: a[:1], x), train=False)

    @jax.jit
    def embed_many(variables, clips, seed):
        def step(carry, i):
            pert = jax.tree.map(
                lambda a: a + (seed + i).astype(a.dtype) * 1e-3, clips)
            out = model.apply(variables, pert, train=False)
            return carry + jnp.sum(out.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(n_iters))
        return acc

    float(embed_many(variables, x, jnp.float32(-1)))  # compile
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        float(embed_many(variables, x, jnp.float32(rep)))
        best = min(best, time.perf_counter() - t0)
    rate = batch * n_iters / best
    peak = chip_peak_tflops(jax.devices()[0].device_kind)
    tflops = rate * fpc / 1e12
    rec = {"model": name, "batch": batch, "clips_per_sec": round(rate, 1),
           "flops_per_clip_g": round(fpc / 1e9, 2),
           "tflops_per_sec": round(tflops, 2),
           "mfu": round(tflops / peak, 4)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models",
                    default="slowfast50,slowfast50-128,s3d,s3dg,r3d18-iic")
    ap.add_argument("--batches", default="")
    args = ap.parse_args()
    defaults = {"slowfast50": "4,8,16", "slowfast50-128": "32,64,128",
                "s3d": "64,128,256", "s3dg": "128", "r3d18-iic": "128,256"}
    for name in args.models.split(","):
        batches = args.batches or defaults.get(name, "64")
        for b in batches.split(","):
            try:
                measure(name, int(b))
            except Exception as e:  # noqa: BLE001 — OOM at the sweep edge
                print(json.dumps({"model": name, "batch": int(b),
                                  "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
