"""Round-5: finish the SlowFast MFU campaign under the ramp guard
(round-4 verdict item 4).

Round 4 parked the B>=192 points after a server-side SlowFast compile
killed the axon relay (ROUND4.md incident). This harness re-approaches
the campaign with the parking rule ENCODED (utils/ramp_guard): at most
one never-compiled shape per invocation (VSS_RAMP_MAX_NEW overrides),
device liveness probed before every compile, known-good shapes drawn
from the persistent ledger. Re-invoke repeatedly to walk the grid:

  slowfast50-128 (16x128^2, cross-family comparison shape):
      B in {128, 160, 192, 224, 256}  — does the ResNet-style >=256-clip
      MXU packing jump appear for the two-pathway net?
  slowfast50 (32x224^2, the reference's flagship SLOWFAST_8x8_R50 shape,
      /root/reference/models/slowfast/.../SLOWFAST_8x8_R50.yaml;
      builder video_model_builder.py:598-885):
      B in {16, 32, 64}

Embedding pass (train=False), one jitted scan per shape, unique seeds +
scalar materialization (axon timing rules). Records one JSON line per
point; parked lines are explicit so a partial campaign is auditable.

Usage: JAX_PLATFORMS=axon python perf_experiments/slowfast_campaign_r5.py
       [--grid small|flagship|all] [--iters 6]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRIDS = {
    "small": [("slowfast50-128", b) for b in (128, 160, 192, 224, 256)],
    "flagship": [("slowfast50", b) for b in (16, 32, 64)],
}
GRIDS["all"] = GRIDS["small"] + GRIDS["flagship"]


def measure(name, batch, n_iters):
    import jax
    import jax.numpy as jnp

    from video_similarity_search_tpu.models.slowfast import (
        SlowFast, multipathway_input)
    from video_similarity_search_tpu.utils import ramp_guard
    from video_similarity_search_tpu.utils.flops import (
        chip_peak_tflops, model_flops_per_clip)

    t, s = (32, 224) if name == "slowfast50" else (16, 128)
    model = SlowFast(depth=50, alpha=4, beta_inv=8, dtype=jnp.bfloat16)
    clips = jax.random.normal(jax.random.key(0), (batch, t, s, s, 3),
                              jnp.bfloat16)
    x = multipathway_input(clips, alpha=4)
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

    ramp_guard.guarded_compile(
        f"{name}/embed/b{batch}/i{n_iters}",  # scan length is part of the program
        lambda: float(embed_many(variables, x, jnp.float32(-1))))
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        float(embed_many(variables, x, jnp.float32(rep)))
        best = min(best, time.perf_counter() - t0)
    rate = batch * n_iters / best
    peak = chip_peak_tflops(jax.devices()[0].device_kind)
    tflops = rate * fpc / 1e12
    return {"model": name, "batch": batch, "shape": f"{t}x{s}",
            "clips_per_sec": round(rate, 1),
            "flops_per_clip_g": round(fpc / 1e9, 2),
            "tflops_per_sec": round(tflops, 2),
            "mfu": round(tflops / peak, 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="all", choices=sorted(GRIDS))
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from video_similarity_search_tpu.utils import ramp_guard

    for name, batch in GRIDS[args.grid]:
        try:
            rec = measure(name, batch, args.iters)
        except ramp_guard.RampGuardError as e:
            print(json.dumps({"model": name, "batch": batch,
                              "parked": str(e)[:160]}), flush=True)
            continue
        except ramp_guard.DeviceDeadError as e:
            print(json.dumps({"fatal": f"device dead: {e}"[:160]}),
                  flush=True)
            return
        except Exception as e:  # noqa: BLE001 — OOM at the sweep edge
            print(json.dumps({"model": name, "batch": batch,
                              "error": str(e)[:200]}), flush=True)
            continue
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
