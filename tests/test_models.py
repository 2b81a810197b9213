"""Model shape/golden tests (reference analogues: models/{s3d,r3d,slowfast}/test.py
shape-check mains, made automated).

NOTE: the CI box is a single CPU core — shapes are the minimum that still
exercises every stride/pool stage.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_similarity_search_tpu.config import get_cfg
from video_similarity_search_tpu.models import (
    LinearClassifier, MoCoEncoder, R3DNet, S3D, SlowFast, TripletNet,
    generate_model, model_selector, multipathway_input,
)


def _init_apply(model, x, **kwargs):
    vars_ = model.init(jax.random.key(0), x, train=False, **kwargs)
    return model.apply(vars_, x, train=False, **kwargs), vars_


def test_resnet18_projection_shape():
    m = generate_model(18, no_max_pool=True)
    x = jnp.ones((2, 4, 16, 16, 3))
    out, vars_ = _init_apply(m, x)
    assert out.shape == (2, 128)
    # param count matches torch R3D-18 w/ projection head scale (~34.5M)
    n = sum(p.size for p in jax.tree.leaves(vars_["params"]))
    assert 33_000_000 < n < 36_000_000


def test_resnet10_shortcut_a_and_heads():
    x = jnp.ones((1, 4, 16, 16, 3))
    m = generate_model(10, shortcut_type="A", projection_head=False)
    out, _ = _init_apply(m, x)
    assert out.shape == (1, 512)  # raw pooled features

    m = generate_model(10, predict_temporal_ds=True)
    (proj, ds), _ = _init_apply(m, x)
    assert proj.shape == (1, 128) and ds.shape == (1, 4)

    m = generate_model(10, projection_head=False, classifier=True,
                       num_classes=7, dropout=0.5)
    logits, _ = _init_apply(m, x)
    assert logits.shape == (1, 7)


def test_resnet_attention():
    m = generate_model(10, attention=True)
    x = jnp.ones((1, 4, 16, 16, 3))
    out, _ = _init_apply(m, x)
    assert out.shape == (1, 128)


def test_resnet50_bottleneck():
    m = generate_model(50, projection_head=False)
    x = jnp.ones((1, 4, 16, 16, 3))
    out, _ = _init_apply(m, x)
    assert out.shape == (1, 2048)


def test_s3d_feature_map():
    m = S3D(gating=True)
    x = jnp.ones((1, 8, 32, 32, 3))
    out, _ = _init_apply(m, x)
    # T/8 x H/32 x W/32 x 1024 (reference models/s3d/s3dg.py block comments)
    assert out.shape == (1, 1, 1, 1, 1024)


def test_r3d_variants():
    x = jnp.ones((1, 4, 16, 16, 3))
    out, _ = _init_apply(R3DNet((1, 1, 1, 1)), x)
    assert out.shape == (1, 512)
    logits, _ = _init_apply(R3DNet((1, 1, 1, 1), with_classifier=True,
                                   num_classes=11), x)
    assert logits.shape == (1, 11)


def test_slowfast_representation():
    m = SlowFast(depth=18, alpha=4, beta_inv=8)
    frames = jnp.ones((1, 8, 32, 32, 3))
    x = multipathway_input(frames, alpha=4)
    assert x[0].shape == (1, 2, 32, 32, 3) and x[1].shape == (1, 8, 32, 32, 3)
    out, _ = _init_apply(m, x)
    assert out.shape == (1, 128)


def test_slowfast_classifier():
    m = SlowFast(depth=18, classifier=True, num_classes=13)
    x = multipathway_input(jnp.ones((1, 8, 32, 32, 3)), alpha=4)
    logits, _ = _init_apply(m, x)
    assert logits.shape == (1, 13)


def test_multipathway_linspace_matches_reference():
    # reference uses linspace(0, T-1, T//alpha).long() (model_utils.py:135-136)
    frames = jnp.arange(32, dtype=jnp.float32)[None, :, None, None, None]
    frames = jnp.broadcast_to(frames, (1, 32, 2, 2, 3))
    slow, fast = multipathway_input(frames, alpha=4)
    got = np.asarray(slow[0, :, 0, 0, 0]).astype(int).tolist()
    expect = np.linspace(0, 31, 8).astype(int).tolist()
    assert got == expect
    assert fast.shape[1] == 32


def test_multipathway_fast_mask():
    frames = jnp.concatenate(
        [jnp.zeros((1, 8, 4, 4, 3)), jnp.ones((1, 8, 4, 4, 1))], axis=-1
    )
    slow, fast = multipathway_input(frames, alpha=4, fast_mask=True)
    assert slow.shape[-1] == 3 and fast.shape[-1] == 3
    assert float(fast.sum()) == fast.size  # mask channel replicated


def test_moco_encoder_and_linear_classifier():
    x = jnp.ones((2, 8, 32, 32, 3))
    out, _ = _init_apply(MoCoEncoder(), x)
    assert out.shape == (2, 128)
    (logits, feat), _ = _init_apply(
        LinearClassifier(num_class=5, use_l2_norm=True, use_final_bn=True), x
    )
    assert logits.shape == (2, 5) and feat.shape == (2, 1024)


def test_tripletnet_distances():
    enc = generate_model(10)
    tnet = TripletNet(encoder=enc, dist_metric="cosine")
    x = jax.random.normal(jax.random.key(1), (2, 4, 16, 16, 3))
    y = jax.random.normal(jax.random.key(2), (2, 4, 16, 16, 3))
    vars_ = tnet.init(jax.random.key(0), x, y, x, train=False)
    dist_a, dist_b, ex, ey, ez = tnet.apply(vars_, x, y, x, train=False)
    assert dist_a.shape == (2,) and ex.shape == (2, 128)
    # distance to itself (z == x) must be ~0 in cosine
    np.testing.assert_allclose(np.asarray(dist_b), 0.0, atol=1e-5)
    assert np.all(np.asarray(dist_a) >= -1e-6)


def test_model_selector_dispatch():
    cfg = get_cfg()
    cfg.MODEL.ARCH = "3dresnet"
    m = model_selector(cfg)
    assert m.__class__.__name__ == "ResNet3D"
    cfg.MODEL.ARCH = "slowfast"
    m = model_selector(cfg)
    assert m.__class__.__name__ == "SlowFast"
    cfg.MODEL.ARCH = "info_nce"
    m = model_selector(cfg)
    assert m.__class__.__name__ == "MoCoEncoder"
    cfg.MODEL.ARCH = "nope"
    with pytest.raises(AssertionError):
        model_selector(cfg)


def test_stem_s2d_equivalence():
    """The space-to-depth stem is numerically identical to the standard
    (7,7,7)/(1,2,2) conv1 once the kernel is transformed
    (models/resnet3d.py conv1_kernel_to_s2d)."""
    import copy

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_similarity_search_tpu.models import generate_model
    from video_similarity_search_tpu.models.resnet3d import \
        conv1_kernel_to_s2d

    kw = dict(no_max_pool=True, hidden_layer=32, out_dim=8)
    base = generate_model(10, **kw)
    fast = generate_model(10, stem_s2d=True, **kw)
    x = jax.random.normal(jax.random.key(0), (2, 4, 16, 16, 3))
    variables = base.init(jax.random.key(1), x, train=False)

    v2 = copy.deepcopy(jax.device_get(variables))
    v2["params"]["conv1"]["Conv_0"]["kernel"] = conv1_kernel_to_s2d(
        jnp.asarray(v2["params"]["conv1"]["Conv_0"]["kernel"]))

    a = base.apply(variables, x, train=False)
    b = fast.apply(jax.tree.map(jnp.asarray, v2), x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                               rtol=1e-4)


def test_sub_batch_norm_matches_plain_bn_at_one_split():
    """SubBatchNorm(num_splits=1) == standard BN in train mode, and the
    aggregated running stats serve eval (reference SubBatchNorm3d,
    batchnorm_helper.py:41-120)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_similarity_search_tpu.models.layers import SubBatchNorm

    x = jax.random.normal(jax.random.key(0), (8, 2, 4, 4, 6))

    sbn = SubBatchNorm(num_splits=1)
    v = sbn.init(jax.random.key(1), x, use_running_average=False)
    y1, mut = sbn.apply(v, x, use_running_average=False,
                        mutable=["batch_stats"])

    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    vr = ref.init(jax.random.key(1), x)
    y2, _ = ref.apply(vr, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)

    # num_splits=4: per-split normalization differs from global BN but is
    # finite; eval uses the aggregated stats
    sbn4 = SubBatchNorm(num_splits=4)
    v4 = sbn4.init(jax.random.key(1), x, use_running_average=False)
    y4, mut4 = sbn4.apply(v4, x, use_running_average=False,
                          mutable=["batch_stats"])
    assert np.all(np.isfinite(np.asarray(y4)))
    assert not np.allclose(np.asarray(y4), np.asarray(y2))
    v4 = {"params": v4["params"], "batch_stats": mut4["batch_stats"]}
    ye = sbn4.apply(v4, x, use_running_average=True)
    assert np.all(np.isfinite(np.asarray(ye)))


def test_remat_same_gradients():
    """TPU.REMAT rematerializes residual blocks: identical loss and
    gradients, less activation memory (jax.checkpoint per block)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_similarity_search_tpu.models import generate_model

    kw = dict(no_max_pool=True, hidden_layer=32, out_dim=8)
    base = generate_model(10, **kw)
    rm = generate_model(10, remat=True, **kw)
    x = jax.random.normal(jax.random.key(0), (2, 4, 16, 16, 3))
    v = base.init(jax.random.key(1), x, train=True)

    def loss(model):
        def f(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    l1, g1 = jax.value_and_grad(loss(base))(v["params"])
    l2, g2 = jax.value_and_grad(loss(rm))(v["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)

    # stage-scoped remat (TPU.REMAT_STAGES): same math, stage-1-only
    # checkpointing (the ~2 GB/activation stage at 256-clip steps)
    rm1 = generate_model(10, remat=True, remat_stages=(1,), **kw)
    l3, g3 = jax.value_and_grad(loss(rm1))(v["params"])
    np.testing.assert_allclose(float(l1), float(l3), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)


def test_model_flops_counter_matches_analytic():
    """model_flops_per_clip (generic, counted from the model's own
    conv/dense layers under eval_shape) must equal the hand-derived
    resnet3d_flops_per_clip on R3D-18 — the convention bench.py's MFU
    rests on — and produce sane nonzero counts for the architectures
    with no analytic formula (SlowFast, S3D)."""
    import jax.numpy as jnp

    from video_similarity_search_tpu.models import generate_model
    from video_similarity_search_tpu.models.s3d import S3D
    from video_similarity_search_tpu.models.slowfast import (
        SlowFast, multipathway_input)
    from video_similarity_search_tpu.utils.flops import (
        model_flops_per_clip, resnet3d_flops_per_clip)

    m = generate_model(18, no_max_pool=True, projection_head=True)
    x = jnp.zeros((2, 16, 128, 128, 3), jnp.float32)
    assert model_flops_per_clip(m, x) == resnet3d_flops_per_clip()

    # eval_shape only: full-size SlowFast-50 costs no real compute here
    sf = SlowFast(depth=50)
    xs = multipathway_input(jnp.zeros((1, 32, 224, 224, 3)), alpha=4)
    sf_flops = model_flops_per_clip(sf, xs)
    assert 50e9 < sf_flops < 200e9  # ~100.6 G measured; guard the regime

    s3d = S3D()
    s3d_flops = model_flops_per_clip(s3d, jnp.zeros((1, 16, 128, 128, 3)))
    assert s3d_flops > 1e9
