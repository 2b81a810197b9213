"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip collectives (pmean grad sync, cross-replica BN, all-gathered
embedding banks) are exercised without TPU hardware via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
