"""Capture + parse a device profile of the 256-clip train step pieces.

Captures jax.profiler traces of (a) the train-mode forward and (b) the
full value_and_grad at 2B=256 clips on the real chip, then parses the
XPlane protos (via tensorflow.tsl's xplane_pb2) and prints the top device
ops by self-time — the op-level attribution the round-3 verdict asked for
(Weak #1: WHERE does the backward lose 65% -> 46% MFU?).

Usage: JAX_PLATFORMS=axon python perf_experiments/profile_bwd_r4.py [outdir]
Then:  python perf_experiments/profile_bwd_r4.py --parse <outdir>
"""

import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(outdir: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from perf_experiments.train_mfu_r4 import T, S, build
    from video_similarity_search_tpu.losses import online_triplet_loss

    cfg, model, state = build()
    n = 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, T, S, S, 3)) * 0.3, jnp.bfloat16)
    targets = jnp.asarray(np.tile(rng.integers(0, 40, n // 2), 2), jnp.int32)

    @jax.jit
    def fwd_train(params, bs, clips):
        out, mut = model.apply({"params": params, "batch_stats": bs},
                               clips, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def grad_mine(params, bs, clips, tgt):
        def loss_fn(p):
            out, mut = model.apply({"params": p, "batch_stats": bs},
                                   clips, train=True,
                                   mutable=["batch_stats"])
            loss, _ = online_triplet_loss(
                out, tgt, jax.random.key(0), margin=cfg.LOSS.MARGIN,
                dist_metric=cfg.LOSS.DIST_METRIC,
                sampling_strategy=cfg.DATASET.SAMPLING_STRATEGY)
            return loss
        l, g = jax.value_and_grad(loss_fn)(params)
        return l + sum(jnp.sum(jnp.abs(v).astype(jnp.float32))
                       for v in jax.tree_util.tree_leaves(g))

    # the REAL shipped step (grad + SGD + banks; donated state) — the
    # gsum-style probes above let XLA fuse abs+sum into the dW computation
    # and skip materializing gradients, which distorts the op profile
    from video_similarity_search_tpu.train import (create_train_state,
                                                   make_triplet_train_step)

    step = make_triplet_train_step(cfg)
    sstate = create_train_state(jax.random.key(0), model, cfg,
                                jnp.zeros((2, T, S, S, 3), jnp.bfloat16))
    sbatch = {"anchor": x[:n // 2], "positive": x[n // 2:],
              "targets": targets}

    state_box = [sstate]

    def run_step():
        st, m = step(state_box[0], sbatch, jax.random.key(9))
        state_box[0] = st
        return m["loss"]

    # warm (compile outside the trace)
    float(fwd_train(state.params, state.batch_stats, x))
    float(grad_mine(state.params, state.batch_stats, x, targets))
    float(run_step())

    for name, thunk in [
        ("step", run_step),
        ("fwd", lambda: fwd_train(state.params, state.batch_stats, x)),
        ("grad", lambda: grad_mine(state.params, state.batch_stats, x,
                                   targets)),
    ]:
        d = os.path.join(outdir, name)
        os.makedirs(d, exist_ok=True)
        with jax.profiler.trace(d):
            for _ in range(2):
                float(thunk())
        print(f"captured {name} -> {d}", flush=True)


def parse(outdir: str, top: int = 25) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for name in ("step", "fwd", "grad"):
        paths = glob.glob(os.path.join(outdir, name, "**", "*.xplane.pb"),
                          recursive=True)
        if not paths:
            print(f"[{name}] no xplane files under {outdir}/{name}")
            continue
        agg = defaultdict(float)
        cats = defaultdict(float)
        for p in paths:
            xs = xplane_pb2.XSpace()
            with open(p, "rb") as f:
                xs.ParseFromString(f.read())
            for plane in xs.planes:
                if "TPU" not in plane.name:
                    continue
                ev_names = plane.event_metadata
                for line in plane.lines:
                    if line.name != "XLA Ops":  # op occupancy timeline only
                        continue
                    for ev in line.events:
                        dur_us = ev.duration_ps / 1e6
                        meta = ev_names.get(ev.metadata_id)
                        nm = meta.name if meta else f"id{ev.metadata_id}"
                        agg[nm] += dur_us
                        cats[_category(nm)] += dur_us
        tot = sum(agg.values())
        print(f"\n=== {name}: XLA Ops total {tot/1e3:.1f} ms ===")
        print("categories:")
        for c, us in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"  {us/1e3:10.2f} ms  {100*us/max(tot,1e-9):5.1f}%  {c}")
        print("top ops:")
        for nm, us in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{us/1e3:10.2f} ms  {100*us/max(tot,1e-9):5.1f}%  {nm[:150]}")


def _category(nm: str) -> str:
    n = nm.lstrip("%")
    if n.startswith(("convolution", "conv")) or ".convolution" in n:
        return "convolution"
    if "conv" in n and "fusion" in n:
        return "conv fusion"
    for key in ("copy", "transpose", "reduce", "fusion", "all-reduce",
                "dynamic-update", "bitcast", "select", "broadcast"):
        if n.startswith(key) or f"_{key}" in n.split(" ")[0]:
            return key
    return n.split(" ")[0].split(".")[0].rstrip("0123456789")


if __name__ == "__main__":
    if "--parse" in sys.argv:
        parse(sys.argv[sys.argv.index("--parse") + 1])
    else:
        out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_r4"
        capture(out)
