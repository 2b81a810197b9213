"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_similarity_search_tpu.parallel import (batch_sharding, make_mesh,
                                                  replicate, shard_batch)


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


def test_mesh_and_shardings():
    mesh = make_mesh(jax.devices()[:8])
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    sharded = shard_batch(mesh, {"x": x})["x"]
    assert sharded.sharding.num_devices == 8
    np.testing.assert_array_equal(np.asarray(sharded), x)


import pytest


@pytest.mark.slow  # ~5 min: full-driver dryrun; the round driver runs this
# exact entry point itself every round (MULTICHIP artifact), so default-run
# coverage is preserved outside pytest
def test_graft_dryrun_multichip():
    """The driver's multi-chip validation path must work as-is."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_global_mean_matches_single_device():
    """Loss means over a sharded batch equal the unsharded computation —
    i.e. gradient averaging semantics are implicit."""
    mesh = make_mesh(jax.devices()[:8])
    x = np.random.default_rng(0).normal(size=(16, 8)).astype(np.float32)

    @jax.jit
    def f(v):
        return jnp.mean(v ** 2)

    expect = float(f(jnp.asarray(x)))
    with mesh:
        xs = shard_batch(mesh, {"x": x})["x"]
        got = float(f(xs))
    assert abs(expect - got) < 1e-6


def test_prefetch_loader_shards_disjoint():
    """Per-host index sharding: two shards see disjoint, covering index
    sets (replaces the reference DistributedSampler,
    datasets/data_loader.py:283)."""
    import numpy as np

    from video_similarity_search_tpu.data.pipeline import PrefetchLoader

    class Ds:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            return {"i": i}

    def collate(items):
        return {"i": np.array([it["i"] for it in items])}

    seen = []
    for shard in (0, 1):
        loader = PrefetchLoader(Ds(), 2, shuffle=True, drop_last=False,
                                collate=collate, num_workers=1, seed=3,
                                shard_index=shard, num_shards=2)
        loader.set_epoch(5)
        ids = []
        for batch in loader:
            ids.extend(batch["i"][:batch["__size__"]].tolist())
        seen.append(set(ids))
    assert seen[0].isdisjoint(seen[1])
    assert seen[0] | seen[1] == set(range(20))


def test_multihost_env_predicate(monkeypatch):
    """maybe_auto_initialize's gate: TPU_WORKER_HOSTNAMES with >1 worker
    means a per-host pod-slice launch (cli/online_train.py auto-inits
    there); one worker or unset means single host (the sandbox sets
    'localhost')."""
    from video_similarity_search_tpu.parallel import multihost_env

    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert multihost_env() is False
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert multihost_env() is False
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "t1w-0,t1w-1")
    assert multihost_env() is True
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", " t1w-0 , t1w-1 , t1w-2 ")
    assert multihost_env() is True


def test_2d_mesh_trains_one_step():
    """TPU.MESH_SHAPE 2-D layout (reserved in make_mesh for e.g. a
    [hosts, chips] factorization): batch shards over the trailing 'data'
    axis, params replicate over BOTH axes, and one real triplet train
    step executes with finite loss — the gradient psum spans the whole
    mesh, so the axis-0 replicas stay bit-identical."""
    import argparse

    from video_similarity_search_tpu.config import get_cfg
    from video_similarity_search_tpu.models import model_selector
    from video_similarity_search_tpu.train.driver import _make_step_and_state

    mesh = make_mesh(jax.devices()[:8], mesh_shape=[2, 4])
    assert mesh.axis_names[-1] == "data" and mesh.devices.shape == (2, 4)

    cfg = get_cfg()
    cfg.MODEL.ARCH = "3dresnet"
    cfg.RESNET.MODEL_DEPTH = 10
    cfg.RESNET.NO_MAX_POOl = True
    cfg.RESNET.OUT_DIM = 16
    cfg.DATA.SAMPLE_DURATION = 4
    cfg.DATA.SAMPLE_SIZE = 16
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.DATASET.SAMPLING_STRATEGY = "random_semi_hard"
    args = argparse.Namespace(checkpoint_path=None, start_epoch=None,
                              iterative_cluster=False, vector=False)
    step, state = _make_step_and_state(args, cfg, model_selector(cfg),
                                       n_data=16, mesh=mesh)
    state = replicate(mesh, state)
    rng = np.random.default_rng(0)
    with mesh:
        batch = shard_batch(mesh, {
            "anchor": rng.normal(size=(8, 4, 16, 16, 3)).astype(np.float32),
            "positive": rng.normal(size=(8, 4, 16, 16, 3)).astype(np.float32),
            "targets": np.tile(rng.integers(0, 3, 8), 2).astype(np.int32),
        })
        assert batch["anchor"].sharding.num_devices == 8
        state, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8
