"""Persistent XLA compile cache for the CLI entry points.

First jit compilation of the benchmark-size programs takes tens of
seconds (minutes over a remote-TPU link); a persistent on-disk cache makes
every relaunch of a driver/eval CLI start hot. Entries are keyed by HLO
hash, so the cache is always safe to share between runs.
"""

from __future__ import annotations

import os


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
