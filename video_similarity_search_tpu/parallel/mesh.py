"""Device mesh setup and sharding helpers.

The reference's distributed runtime is process-per-GPU DDP over NCCL with a
TCP rendezvous (misc/distributed_helper.py:8-37) — one parallelism
strategy: data parallelism. The TPU-native equivalent (SURVEY.md §2.6) is a
1-D ``jax.sharding.Mesh`` over all chips with batch-sharded inputs and
replicated parameters; gradient averaging is implicit (a global mean under
jit is a psum over ICI), BN stats sync likewise. Multi-host runs call
``jax.distributed.initialize`` once per host (reference: launch_processes +
init_process_group).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None,
              mesh_shape: Optional[Sequence[int]] = None) -> Mesh:
    """1-D data mesh over all (or the given) devices.

    ``mesh_shape`` reserved for future 2-D layouts (cfg.TPU.MESH_SHAPE);
    the workload is small-CNN data-parallel (SURVEY §2.6), so 1-D is the
    right default.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if mesh_shape:
        devices = devices.reshape(tuple(mesh_shape))
        axis_names = tuple(f"axis{i}" for i in range(devices.ndim - 1)) + (
            DATA_AXIS,)
        return Mesh(devices, axis_names)
    return Mesh(devices, (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def microbatch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for gradient-accumulation batches shaped (A, b, ...):
    the scan (microbatch) axis is unsharded, the per-microbatch batch
    axis splits over the data mesh. Reshaping host-side and sharding
    axis 1 keeps every microbatch slice device-local — reshaping a
    batch-sharded (A*b, ...) array inside jit would need an all-to-all."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_batch(mesh: Mesh, batch, microbatched: bool = False):
    """Host batch -> leading axis sharded over the mesh.

    Single-host: plain device_put with a NamedSharding. Multi-host: each
    process holds its local shard of the global batch (the per-host slice
    the sharded loader produced), assembled into one global array — the
    TPU-native replacement for DistributedSampler + per-rank batches
    (reference datasets/data_loader.py:283).

    Scalar (0-d) leaves — e.g. a loader batch's ``__size__`` bookkeeping
    field — can't split over the data axis and are replicated instead.

    Validation note: the single-host path (including the 8-virtual-device
    mesh) is covered by the test suite and the driver dryrun; the
    multi-host branch executes for real in tests/test_multiprocess.py
    (2 processes x 4 virtual CPU devices, gloo collectives — the round-2
    claim that this jaxlib lacks cross-process CPU collectives was
    falsified in round 4)."""
    sh = microbatch_sharding(mesh) if microbatched else batch_sharding(mesh)
    rep = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                rep if np.ndim(x) == 0 else sh, np.asarray(x)), batch)
    return jax.tree.map(
        lambda x: jax.device_put(x, rep if np.ndim(x) == 0 else sh), batch)


def replicate(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (reference run_process, misc/distributed_helper.py:8-26).

    No-op for single-process; on a TPU pod slice jax reads the topology from
    the environment, so bare ``jax.distributed.initialize()`` suffices.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def multihost_env() -> bool:
    """True when the environment describes a multi-host TPU slice (one
    launched process per host, topology in env): TPU_WORKER_HOSTNAMES
    lists more than one worker. Single chip / single host: False."""
    import os

    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hosts.split(",") if h.strip()]) > 1


def maybe_auto_initialize() -> None:
    """Bare ``jax.distributed.initialize()`` when launched per-host on a
    multi-host TPU slice WITHOUT explicit ``--num_shards`` flags — jax
    reads coordinator/topology from the TPU environment. Without this, a
    pod-slice launch would silently run per-host-isolated copies of the
    whole job (process_count stays 1 on every host, each training on the
    full dataset). No-op on a single host.

    Deliberately does NOT probe ``jax.process_count()`` first: that would
    initialize the backend, and backend-before-``distributed.initialize``
    breaks multi-host coordination. A repeated initialize raises
    RuntimeError, which is swallowed (already initialized = done)."""
    if not multihost_env():
        return

    def _already_initialized() -> bool:
        # State check first (version-stable); jax's error TEXT is only a
        # fallback signal and may be reworded across releases.
        try:
            from jax._src import distributed as _dist
            return _dist.global_state.client is not None
        except Exception:  # noqa: BLE001 — internal layout moved
            return False

    if _already_initialized():
        return
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        # ONLY the already-initialized case is benign (explicit
        # --num_shards path ran first, possibly racing this check).
        # Anything else — unreachable coordinator, bad topology env —
        # must not be swallowed: that would silently degrade a pod-slice
        # launch into per-host isolated jobs, the exact failure this
        # function exists to prevent.
        if not (_already_initialized()
                or "only be called once" in str(e)):
            raise


def is_master_proc() -> bool:
    """Reference misc/distributed_helper.py:68-73."""
    return jax.process_index() == 0


def get_world_size() -> int:
    return jax.device_count()
