"""Persistent XLA compile cache for the CLI entry points.

First jit compilation of the benchmark-size programs takes tens of
seconds (minutes over a remote-TPU link); a persistent on-disk cache makes
every relaunch of a driver/eval CLI start hot. Entries are keyed by HLO
hash, so the cache is always safe to share between runs.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_feature_fingerprint() -> str:
    """Short hash of this host's CPU feature flags + the installed jaxlib
    version. XLA:CPU caches AOT-compiled binaries tuned to the compiling
    machine's ISA features; loading one on a host with different features
    is a latent SIGILL (``cpu_aot_loader`` warns "could lead to execution
    errors"). The compile-feature set also carries LLVM tuning attributes
    (e.g. ``+prefer-no-scatter``) that change with the jaxlib/LLVM build,
    not just the silicon — observed in round 4 when entries compiled by a
    different jaxlib warned on an identical CPU — so the jaxlib version is
    part of the key. A mismatched host/toolchain simply gets a cold cache
    instead of a foreign binary."""
    feats = ""
    # LLVM's feature/tuning detection keys off more than the flag list —
    # two hosts with identical cpuinfo flags produced incompatible AOT
    # entries (round-5 `cpu_aot_loader` mismatch logs) — so one of each
    # identity line joins the key: model name/model/stepping, AND the
    # `bugs` line: LLVM sets tuning attrs like `+prefer-no-gather` from
    # the Downfall (GDS) mitigation state, which is invisible in
    # flags/model/stepping but surfaces in `bugs` and the vulnerability
    # sysfs file (observed round 5: same flags+model+stepping, one host
    # compiled with +prefer-no-gather, the other rejected the entry).
    model_lines = {}
    id_keys = ("model name", "model", "stepping", "bugs")
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                low = line.lower()
                if not feats and low.startswith(("flags", "features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                for key in id_keys:
                    if key not in model_lines and low.startswith(key):
                        model_lines[key] = line.strip()
                        break
                if feats and len(model_lines) >= len(id_keys):
                    break
    except OSError:
        pass
    try:
        with open("/sys/devices/system/cpu/vulnerabilities/"
                  "gather_data_sampling") as f:
            model_lines["gds"] = f"gds: {f.read().strip()}"
    except OSError:
        pass
    model = ";".join(model_lines[k] for k in sorted(model_lines))
    if feats or model:
        feats += f"|{model}"
    else:
        feats = f"{platform.machine()}:{platform.processor()}"
    try:
        import jaxlib
        feats += f"|jaxlib={jaxlib.__version__}"
    except Exception:
        pass
    return hashlib.sha256(feats.encode()).hexdigest()[:12]


def cpu_cache_dir() -> str:
    """Host-feature-keyed persistent cache dir for the CPU backend (used
    by the test suite and the multichip dryrun)."""
    return os.path.join(os.path.expanduser("~"), ".cache",
                        f"vss_xla_cpu_{host_feature_fingerprint()}")


def enable_compile_cache(path: str | None = None) -> None:
    """Idempotently point jax at a persistent compilation cache directory
    (``$VSS_COMPILE_CACHE`` > argument > ``~/.cache/vss_xla``)."""
    import jax

    path = os.environ.get("VSS_COMPILE_CACHE") or path or os.path.join(
        os.path.expanduser("~"), ".cache", "vss_xla")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:  # noqa: BLE001 — cache is an optimization only
        print(f"compile cache disabled ({e})")
