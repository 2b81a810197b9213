"""Round-5: make the S3D 29%-MFU ceiling claim falsifiable (round-4
verdict item 6).

Round 4's model-zoo sweep measured S3D embedding at ~29% MFU and ARGUED
(ridge-point arithmetic) that the separable/pointwise convs are
HBM-bandwidth-bound. This script tests that claim with numbers:

1. XLA's own cost model for the compiled embed program
   (``compiled.cost_analysis()``: flops + bytes accessed) combined with
   the measured step time gives achieved TFLOP/s AND achieved HBM GB/s.
   If achieved-GB/s sits near the chip's HBM roofline (v5e: 819 GB/s)
   while MFU is low, the pass is bandwidth-bound — ceiling PROVEN.
   If neither roofline is approached, the deficit is elsewhere (layout,
   fusion, channel padding) — headroom EXISTS and the 29% write-off was
   wrong.
2. Optionally (--profile) captures an xplane trace and prints the
   per-category device-time breakdown so the bandwidth share can be
   attributed to the pointwise/narrow ops specifically.

Embedding pass at B=256 (16x128^2, the round-4 measured point), one
jitted scan, unique seeds + scalar materialization (axon timing rules);
compiles ride utils/ramp_guard.

Usage: JAX_PLATFORMS=axon python perf_experiments/s3d_bandwidth_r5.py \
           [--batch 256] [--iters 6] [--profile /tmp/s3d_prof]

Reference model: S3D as the cheap backbone
(/root/reference/models/s3d/s3dg.py:8-217).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e HBM roofline (bytes/s) — same figure the round-4 ridge argument used
HBM_PEAK_GBPS = {"TPU v5e": 819.0, "TPU v5 lite": 819.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--gating", action="store_true")
    ap.add_argument("--profile", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from video_similarity_search_tpu.models.s3d import S3D
    from video_similarity_search_tpu.utils import ramp_guard
    from video_similarity_search_tpu.utils.flops import (
        chip_peak_tflops, model_flops_per_clip)

    b, t, s = args.batch, 16, 128
    name = "s3dg" if args.gating else "s3d"
    model = S3D(gating=args.gating, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(0), (b, t, s, s, 3), jnp.bfloat16)
    fpc = model_flops_per_clip(model, x)
    variables = model.init(jax.random.key(1), x[:1], train=False)

    n_iters = args.iters

    @jax.jit
    def embed_many(variables, clips, seed):
        def step(carry, i):
            out = model.apply(
                variables, clips + (seed + i).astype(jnp.bfloat16) * 1e-3,
                train=False)
            return carry + jnp.sum(out.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(n_iters))
        return acc

    # XLA's own cost model over the WHOLE compiled program (n_iters fwds)
    lowered = embed_many.lower(variables, x, jnp.float32(0))
    compiled = ramp_guard.guarded_compile(
        f"{name}/bandwidth/b{b}/i{n_iters}", lowered.compile)
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    xla_flops = float(ca.get("flops", 0.0))
    xla_bytes = float(ca.get("bytes accessed", 0.0))

    # Execute the guarded AOT executable directly: calling embed_many()
    # here would re-trace and issue a SECOND, unguarded server-side
    # compile (the jit dispatch cache does not reuse lowered.compile()).
    float(compiled(variables, x, jnp.float32(-1)))  # warm (exec path)
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        float(compiled(variables, x, jnp.float32(rep)))
        best = min(best, time.perf_counter() - t0)

    kind = jax.devices()[0].device_kind
    peak_tf = chip_peak_tflops(kind)
    hbm_peak = next((v for k, v in HBM_PEAK_GBPS.items() if k in kind),
                    819.0)
    rate = b * n_iters / best
    achieved_tf = rate * fpc / 1e12
    achieved_gbps = xla_bytes / best / 1e9
    rec = {
        "model": name, "batch": b,
        "clips_per_sec": round(rate, 1),
        "mfu": round(achieved_tf / peak_tf, 4),
        "xla_flops_g": round(xla_flops / 1e9, 1),
        "xla_bytes_accessed_gb": round(xla_bytes / 1e9, 2),
        "achieved_hbm_gbps": round(achieved_gbps, 1),
        "hbm_peak_gbps": hbm_peak,
        "hbm_utilization": round(achieved_gbps / hbm_peak, 3),
        "verdict": ("bandwidth-bound CONFIRMED"
                    if achieved_gbps / hbm_peak > 0.7
                    else "NOT at HBM roofline - headroom exists"),
    }
    print(json.dumps(rec), flush=True)

    if args.profile:
        with jax.profiler.trace(args.profile):
            float(compiled(variables, x, jnp.float32(99)))
        print(f"xplane trace -> {args.profile}; parse with "
              "perf_experiments/profile_bwd_r4.py-style category table")


if __name__ == "__main__":
    main()
