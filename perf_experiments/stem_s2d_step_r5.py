"""Round-5: TPU.STEM_S2D and the bf16-BN-epilogue ablation measured
INSIDE the shipped triplet train step (round-4 verdict item 3).

The round-4 profile (PERF.md attribution table) names the backward's two
deficits: the stem dW conv + its (7,7,7,3,64) layout copy (~61 ms/step —
a 3-input-channel contraction) and the stage-1 dW convs (~48% MFU). Two
shipped levers target exactly those ops but were never measured fwd+bwd:

  * ``TPU.STEM_S2D`` — space-to-depth stem: 3->12 contraction channels,
    spatial stride removed (models/resnet3d.py). Round 3 measured it
    FORWARD-only ("net neutral", PERF.md row F); its effect on the
    backward's stem dW deficit is the open question.
  * ``VSS_BN_DTYPE=bfloat16`` — runs the BN normalization arithmetic
    (hence the conv-fused f32 stat-sum epilogues, the -8.4 MFU points of
    the fwd-train row) in bf16 (models/layers._bn_compute_dtype).

Grid: B in {64, 128} x {baseline, s2d, bf16bn, s2d+bf16bn} — the shipped
``make_triplet_train_step`` (fwd+bwd+SGD+mining), one jitted scan per
variant, unique seeds + scalar materialization (axon timing rules).
Every compile rides utils/ramp_guard (one NEW shape per invocation by
default — re-invoke to step; VSS_RAMP_MAX_NEW to widen) so a wedge-prone
compile can never take out the rest of a round's chip access.

Usage: JAX_PLATFORMS=axon python perf_experiments/stem_s2d_step_r5.py \
           [--batches 64 128] [--variants baseline,s2d,...] [--iters 4]

Reference cost being optimized: the triplet hot loop
/root/reference/online_train.py:245-434 (backward included).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, S = 16, 128

VARIANTS = {
    "baseline": {"s2d": False, "bn_bf16": False},
    "s2d": {"s2d": True, "bn_bf16": False},
    "bf16bn": {"s2d": False, "bn_bf16": True},
    "s2d_bf16bn": {"s2d": True, "bn_bf16": True},
}


def run_variant(name, spec, batch, iters):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_similarity_search_tpu.config import get_cfg
    from video_similarity_search_tpu.models import model_selector
    from video_similarity_search_tpu.train import (create_train_state,
                                                   make_triplet_train_step)
    from video_similarity_search_tpu.utils import ramp_guard
    from video_similarity_search_tpu.utils.flops import (
        chip_peak_tflops, resnet3d_flops_per_clip)

    # trace-time ablation hook: must be set BEFORE the step is built
    if spec["bn_bf16"]:
        os.environ["VSS_BN_DTYPE"] = "bfloat16"
    else:
        os.environ.pop("VSS_BN_DTYPE", None)

    cfg = get_cfg()
    cfg.MODEL.ARCH = "3dresnet"
    cfg.RESNET.MODEL_DEPTH = 18
    cfg.RESNET.NO_MAX_POOl = True
    cfg.DATASET.SAMPLING_STRATEGY = "random_semi_hard"
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.STEM_S2D = spec["s2d"]
    model = model_selector(cfg)
    sample = jnp.zeros((2, T, S, S, 3), jnp.bfloat16)
    state = create_train_state(jax.random.key(0), model, cfg, sample)
    step = make_triplet_train_step(cfg)

    rng = np.random.default_rng(0)
    batch_data = {
        "anchor": jnp.asarray(
            rng.standard_normal((batch, T, S, S, 3), np.float32) * 0.3,
            jnp.bfloat16),
        "positive": jnp.asarray(
            rng.standard_normal((batch, T, S, S, 3), np.float32) * 0.3,
            jnp.bfloat16),
        "targets": jnp.asarray(np.tile(rng.integers(0, 40, batch), 2),
                               jnp.int32),
    }

    def compile_step():
        s, m = step(state, batch_data, jax.random.key(1))
        float(m["loss"])
        return s

    st = ramp_guard.guarded_compile(
        f"r3d18/step_r5/{name}/b{batch}", compile_step)
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter()
        st, m = step(st, batch_data, jax.random.key(2 + i))
        float(m["loss"])  # materialize (axon: block_until_ready unreliable)
        best = min(best, time.perf_counter() - t0)
    flops_per_clip = resnet3d_flops_per_clip(depth=18, t=T, size=S,
                                             no_max_pool=True)
    peak = chip_peak_tflops(jax.devices()[0].device_kind)
    rate = 2 * batch / best
    return {"variant": name, "batch": batch,
            "step_ms": round(best * 1e3, 1),
            "clips_per_sec": round(rate, 1),
            "mfu": round(rate * 3 * flops_per_clip / 1e12 / peak, 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--variants", default="baseline,s2d,bf16bn,s2d_bf16bn")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from video_similarity_search_tpu.utils import ramp_guard

    for batch in args.batches:
        for name in args.variants.split(","):
            try:
                rec = run_variant(name, VARIANTS[name], batch, args.iters)
            except ramp_guard.RampGuardError as e:
                print(json.dumps({"variant": name, "batch": batch,
                                  "parked": str(e)[:160]}))
                continue
            except ramp_guard.DeviceDeadError as e:
                print(json.dumps({"fatal": f"device dead: {e}"[:160]}))
                return
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
