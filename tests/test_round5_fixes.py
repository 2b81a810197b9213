"""Regression tests for the round-4 advisor findings (ADVICE.md r4).

1. pipeline.py producer microbatch upload must NOT contiguously reshape
   non-clip leaves (the triplet 'targets' vector needs the interleaved
   per-microbatch layout driver._microbatch_leaf applies).
2. parallel.mesh.maybe_auto_initialize must only swallow the benign
   already-initialized RuntimeError — a genuine coordination failure
   re-raises instead of silently degrading to per-host isolated jobs.
3. evaluation.knn epoch-keyed caches must apply the suffix at epoch 0
   too (`if epoch` was falsy and reused a stale legacy pkl).
4. losses.combos.intra_neg_loss reference_compat flag replicates the
   reference's inverted objective (online_train.py:334-360 copy-paste
   bug) when explicitly requested.
"""

import os
import pickle

import jax
import numpy as np
import pytest


# ---- 1. producer microbatch upload excludes non-clip leaves -------------

def test_device_upload_microbatch_excludes_targets():
    from video_similarity_search_tpu.data.pipeline import PrefetchLoader

    loader = PrefetchLoader.__new__(PrefetchLoader)  # unit-test the method
    loader.upload_sharding = None
    loader.upload_microbatch = 2
    loader._upload_shape_sig = None

    b = 16
    batch = {
        # 192 KiB: over the >=64 KiB upload threshold
        "anchor": np.zeros((b, 4, 32, 32, 3), np.uint8),
        # interleaved [anchors(8192); positives(8192)] int64 = 128 KiB:
        # crosses the >=64 KiB upload threshold the advisor flagged
        "targets": np.arange(2 * 8192, dtype=np.int64),
    }
    out1 = loader._upload(dict(batch))  # first call: sig unstable
    out = loader._upload(dict(batch))   # second: stable -> uploads
    assert isinstance(out["anchor"], jax.Array)
    assert out["anchor"].shape == (2, b // 2, 4, 32, 32, 3)
    # the 1-D targets leaf stays a HOST array with its original layout so
    # the consumer's interleaved reshape (driver._microbatch_leaf) applies
    assert isinstance(out["targets"], np.ndarray)
    assert out["targets"].shape == (2 * 8192,)
    del out1


def test_microbatch_leaf_interleaves_targets():
    """The consumer layout the producer must not clobber: microbatch a
    gets [anchors_a; positives_a], not a contiguous slab."""
    from video_similarity_search_tpu.train.driver import _microbatch_leaf

    b, accum = 8, 2
    targets = np.concatenate([np.arange(b), 100 + np.arange(b)])
    out = _microbatch_leaf("targets", targets, accum)
    assert out.shape == (accum, 2 * b // accum)
    np.testing.assert_array_equal(out[0], [0, 1, 2, 3, 100, 101, 102, 103])
    np.testing.assert_array_equal(out[1], [4, 5, 6, 7, 104, 105, 106, 107])


# ---- 2. maybe_auto_initialize only swallows the benign error ------------

def test_auto_initialize_reraises_real_failures(monkeypatch):
    from video_similarity_search_tpu.parallel import mesh

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")

    def bad_init(*a, **k):
        raise RuntimeError("coordinator unreachable: connect timeout")

    monkeypatch.setattr(jax.distributed, "initialize", bad_init)
    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        mesh.maybe_auto_initialize()


def test_auto_initialize_swallows_already_initialized(monkeypatch):
    from video_similarity_search_tpu.parallel import mesh

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")

    def benign_init(*a, **k):
        raise RuntimeError("distributed.initialize should only be "
                           "called once.")

    monkeypatch.setattr(jax.distributed, "initialize", benign_init)
    mesh.maybe_auto_initialize()  # must not raise


# ---- 3. epoch-0 retrieval cache suffix ----------------------------------

def test_knn_cache_epoch0_suffixed(monkeypatch, tmp_path):
    from video_similarity_search_tpu.config import get_cfg
    from video_similarity_search_tpu.evaluation import knn

    rng = np.random.default_rng(0)
    fresh_emb = rng.normal(size=(6, 8)).astype(np.float32)
    labels = np.arange(6) % 3

    def fake_embed(state, model, cfg, loader, split, verbose):
        return fresh_emb, labels, np.arange(6)

    monkeypatch.setattr(knn, "get_embeddings_and_labels", fake_embed)

    # a STALE legacy (unsuffixed) cache from some prior run: reading it
    # at epoch 0 was the advisor's bug
    stale = {"embeddings": np.zeros((6, 8), np.float32),
             "labels": labels, "indices": np.arange(6)}
    for name in ("test_embeddings.pkl", "train_embeddings.pkl"):
        with open(tmp_path / name, "wb") as f:
            pickle.dump(stale, f)

    cfg = get_cfg()
    cfg.OUTPUT_PATH = str(tmp_path)
    knn.k_nearest_embeddings(None, None, cfg, None, None, epoch=0,
                             cache_dir=str(tmp_path))
    # epoch-0 caches are written SUFFIXED, and the stale legacy pkl was
    # not what got used (it would have produced zero embeddings)
    assert os.path.exists(tmp_path / "test_embeddings_ep0.pkl")
    assert os.path.exists(tmp_path / "train_embeddings_ep0.pkl")
    with open(tmp_path / "test_embeddings_ep0.pkl", "rb") as f:
        cached = pickle.load(f)
    np.testing.assert_allclose(
        np.asarray(cached["embeddings"], np.float32), fresh_emb)

    # the one-shot CLI path (no epoch) keeps the reference's plain names
    for name in ("test_embeddings.pkl", "train_embeddings.pkl"):
        os.remove(tmp_path / name)
    knn.k_nearest_embeddings(None, None, cfg, None, None,
                             cache_dir=str(tmp_path))
    assert os.path.exists(tmp_path / "test_embeddings.pkl")


# ---- 4. intra-neg reference-compat flag ---------------------------------

def test_intra_neg_reference_compat_inverts():
    import jax.numpy as jnp

    from video_similarity_search_tpu.losses import intra_neg_loss

    rng = np.random.default_rng(1)
    anc = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    neg = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    intended = intra_neg_loss(anc, pos, neg)
    compat = intra_neg_loss(anc, pos, neg, reference_compat=True)
    # compat mode swaps the margin-ranking roles: recompute directly
    from video_similarity_search_tpu.losses.combos import (
        INTRA_NEG_MARGIN, margin_ranking_loss, pairwise_dist)
    d_ap = pairwise_dist(anc, pos, "cosine")
    d_an = pairwise_dist(anc, neg, "cosine")
    np.testing.assert_allclose(
        float(compat),
        float(margin_ranking_loss(d_an, d_ap, INTRA_NEG_MARGIN)), rtol=1e-6)
    np.testing.assert_allclose(
        float(intended),
        float(margin_ranking_loss(d_ap, d_an, INTRA_NEG_MARGIN)), rtol=1e-6)


def test_intra_neg_compat_flag_in_config():
    from video_similarity_search_tpu.config import get_cfg

    assert get_cfg().LOSS.INTRA_NEG_REFERENCE_COMPAT is False


# ---- 5. BN compute-dtype perf-ablation hook ------------------------------

def test_bn_dtype_ablation_hook(monkeypatch):
    """VSS_BN_DTYPE=bfloat16 switches the BN normalization arithmetic to
    bf16 (the round-5 epilogue ablation); default stays f32 and is
    bit-identical to the pre-hook behavior."""
    import jax
    import jax.numpy as jnp

    from video_similarity_search_tpu.models.layers import (
        BatchNorm, _bn_compute_dtype)

    monkeypatch.delenv("VSS_BN_DTYPE", raising=False)
    assert _bn_compute_dtype() == jnp.float32
    monkeypatch.setenv("VSS_BN_DTYPE", "bfloat16")
    assert _bn_compute_dtype() == jnp.bfloat16
    monkeypatch.setenv("VSS_BN_DTYPE", "nonsense")
    assert _bn_compute_dtype() == jnp.float32

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 8)) * 3 + 1, jnp.float32)
    bn = BatchNorm(use_running_average=False, dtype=jnp.float32)
    monkeypatch.delenv("VSS_BN_DTYPE", raising=False)
    vs = bn.init(jax.random.key(0), x)
    base, _ = bn.apply(vs, x, mutable=["batch_stats"])
    assert base.dtype == jnp.float32
    monkeypatch.setenv("VSS_BN_DTYPE", "bfloat16")
    alt, _ = bn.apply(vs, x, mutable=["batch_stats"])
    # still normalized (mean~0, var~1) but with bf16 rounding: close to
    # the f32 result, not bit-identical
    np.testing.assert_allclose(np.asarray(alt, np.float32),
                               np.asarray(base), atol=0.05)
    assert not np.array_equal(np.asarray(alt, np.float32),
                              np.asarray(base))
    # running stats stay f32 params either way
    assert all(a.dtype == jnp.float32
               for a in jax.tree.leaves(vs["batch_stats"]))
