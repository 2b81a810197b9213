"""Supervised-path regression tests (round-1 verdict items: degenerate
ten-crop, never-applied LR schedule)."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np


def _load_cli(name):
    path = os.path.join(os.path.dirname(__file__), "..", "cli", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, os.path.abspath(path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ten_crop_views_pairwise_distinct():
    """With a decode buffer larger than the crop (1.14x, reference
    coclr_classify.py:528-534) the 5 positions + flips give 10 DISTINCT
    views — round 1 collapsed them all to (0,0)."""
    from video_similarity_search_tpu.evaluation.classify import \
        ten_crop_views

    crop = 16
    buf = int(1.14 * crop)  # 18
    x = jax.random.normal(jax.random.key(0), (2, 4, buf, buf, 3))
    views = np.asarray(ten_crop_views(x, crop))
    assert views.shape == (10, 2, 4, crop, crop, 3)
    for i in range(10):
        for j in range(i + 1, 10):
            assert not np.allclose(views[i], views[j]), (i, j)


def test_ten_crop_degenerate_buffer_warns_by_shape():
    """Buffer == crop still works (all views equal the single center crop +
    flip) — shape contract only; the CLI passes the 1.14x buffer."""
    from video_similarity_search_tpu.evaluation.classify import \
        ten_crop_views

    x = jax.random.normal(jax.random.key(0), (1, 2, 16, 16, 3))
    views = np.asarray(ten_crop_views(x, 16))
    assert views.shape == (10, 1, 2, 16, 16, 3)


def test_classify_lr_schedule_applied_through_optimizer():
    """The optimizer's effective LR drops x0.1 at each milestone epoch and
    the update magnitude shrinks accordingly (reference
    adjust_learning_rate, coclr_classify.py:825-830)."""
    import optax

    cc = _load_cli("coclr_classify")
    spe = 4  # steps per epoch
    sch = cc.make_lr_schedule(0.1, 10, [3, 6], cosine=False,
                              steps_per_epoch=spe)
    lrs = [float(sch(e * spe)) for e in range(10)]
    np.testing.assert_allclose(lrs[:3], [0.1] * 3, rtol=1e-5)
    np.testing.assert_allclose(lrs[3:6], [0.01] * 3, rtol=1e-5)
    np.testing.assert_allclose(lrs[6:], [0.001] * 4, rtol=1e-5)

    # cosine variant matches the reference formula lr*0.5*(1+cos(pi*e/E))
    cos_sch = cc.make_lr_schedule(0.1, 10, [], cosine=True,
                                  steps_per_epoch=spe)
    expect = 0.1 * 0.5 * (1 + np.cos(np.pi * 5 / 10))
    np.testing.assert_allclose(float(cos_sch(5 * spe)), expect, rtol=1e-4)

    # the schedule actually drives sgd updates: same grad, smaller step
    # after the milestone
    tx = optax.sgd(sch)
    params = {"w": jnp.ones(3)}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones(3)}
    # advance to step 0 (epoch 0) and step 3*spe (epoch 3)
    upd0, opt_state = tx.update(grads, opt_state, params)
    for _ in range(3 * spe - 1):
        upd, opt_state = tx.update(grads, opt_state, params)
    upd_after, _ = tx.update(grads, opt_state, params)
    assert abs(float(upd0["w"][0])) > 5 * abs(float(upd_after["w"][0]))


def test_freeze_mask_groups():
    """'last' freezes the backbone; 'ft' labels it for the lr/10 group;
    'all' trains everything (reference coclr_classify.py:172-196)."""
    cc = _load_cli("coclr_classify")
    params = {"backbone": {"Conv_1a": {"conv1": {"kernel": np.zeros(1)}}},
              "final_fc": {"kernel": np.zeros(1)},
              "final_bn": {"scale": np.zeros(1)}}
    m = cc.freeze_mask(params, "last")
    assert m["backbone"]["Conv_1a"]["conv1"]["kernel"] == "freeze"
    assert m["final_fc"]["kernel"] == "train"
    m = cc.freeze_mask(params, "ft")
    assert m["backbone"]["Conv_1a"]["conv1"]["kernel"] == "backbone"
    assert m["final_fc"]["kernel"] == "train"
    m = cc.freeze_mask(params, "all")
    assert m["backbone"]["Conv_1a"]["conv1"]["kernel"] == "train"
