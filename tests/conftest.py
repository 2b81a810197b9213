"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip collectives (pmean grad sync, cross-replica BN, all-gathered
embedding banks) are exercised without TPU hardware via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4).
"""

import os

# The sandbox presets JAX_PLATFORMS=axon (remote TPU tunnel) — force CPU for
# tests; eager per-op dispatch over the tunnel is orders of magnitude slower.
# NOTE: the axon PJRT plugin registers in sitecustomize BEFORE this file
# runs and can block on its relay socket; invoke pytest as
#   PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/
# to skip registration entirely (see .claude/skills/verify/SKILL.md).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The box has ONE core: the 8 virtual devices' collective rendezvous
# threads time-share it, and XLA's default 40s terminate timeout
# occasionally fires under load and SIGABRTs the whole process. Give the
# rendezvous generous headroom.
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags
# Persistent XLA compile cache: the suite's wall-clock on the 1-core box
# is dominated by CPU XLA compiles (~29 min cold); with the cache warm a
# full run drops severalfold. Entries are keyed by HLO hash, and the
# directory is keyed by the host's CPU feature flags — XLA:CPU AOT
# binaries are ISA-tuned, and loading one compiled on a different machine
# is a latent SIGILL (utils/compile_cache.py).
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from video_similarity_search_tpu.utils.compile_cache import cpu_cache_dir  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cpu_cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax  # noqa: E402

# The env write above is NOT enough on its own: the sandbox's
# sitecustomize imports jax at interpreter start (to register the axon
# PJRT plugin), which freezes config defaults from the ORIGINAL env —
# observed round 4 as an unprefixed `pytest tests/` run landing on
# device_count()==1 and taking 41 min for two files. config.update works
# as long as no backend is initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")


def pytest_configure(config):
    # Fail the whole run loudly rather than executing 190 tests on the
    # wrong backend (single-device CPU or the remote-TPU tunnel, where
    # mesh tests fail confusingly and everything crawls).
    n = jax.device_count()
    platform = jax.devices()[0].platform
    if platform != "cpu" or n < 8:
        raise RuntimeError(
            f"test suite needs >=8 virtual CPU devices, got {n} "
            f"{platform!r} device(s) — a backend was initialized before "
            "conftest could configure it. Invoke as: PALLAS_AXON_POOL_IPS= "
            "JAX_PLATFORMS=cpu python -m pytest tests/")
