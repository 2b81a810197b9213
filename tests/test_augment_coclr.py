"""CoCLR clip-transform controller tests (SURVEY §2.2 'CoCLR video
augmentation': TwoClipTransform / OneClipTransform / TwoCropsTransform /
RandomRotation, reference coclr_utils/augmentation.py:334-461)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_similarity_search_tpu.data.augment import (
    center_crop_normalize, one_clip_transform, rotate_clip,
    transform_controller, two_clip_transform, two_crops_transform)


def _clips(b=4, t=2, s=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 255, (b, t, s, s, 3), dtype=np.uint8))


def test_two_clip_transform_shapes_and_independence():
    c1, c2 = _clips(seed=0), _clips(seed=1)
    v1, v2 = two_clip_transform(c1, c2, jax.random.key(0), 16, p=1.0)
    assert v1.shape == v2.shape == (4, 2, 16, 16, 3)
    # p=1 -> both base-augmented; independent keys -> different results
    assert not np.allclose(np.asarray(v1), np.asarray(v2))
    # p=0 -> both null = deterministic center-crop+normalize
    n1, _ = two_clip_transform(c1, c2, jax.random.key(1), 16, p=0.0)
    np.testing.assert_allclose(
        np.asarray(n1), np.asarray(center_crop_normalize(c1, 16)), atol=1e-6)


def test_one_clip_transform_uses_single_clip():
    c1, c2 = _clips(seed=0), _clips(seed=1)
    q, k = one_clip_transform(c1, c2, jax.random.key(0), 16)
    assert q.shape == k.shape == (4, 2, 16, 16, 3)
    # one of (q, k) is the null view of the chosen clip: it must equal the
    # center-crop of either c1 or c2 per sample
    nulls = [np.asarray(center_crop_normalize(c, 16)) for c in (c1, c2)]
    qn, kn = np.asarray(q), np.asarray(k)
    for i in range(4):
        hit = any(np.allclose(view[i], null[i], atol=1e-6)
                  for view in (qn, kn) for null in nulls)
        assert hit, f"sample {i}: neither view matches a null transform"


def test_two_crops_transform_differs():
    c = _clips()
    q, k = two_crops_transform(c, jax.random.key(0), 16)
    assert q.shape == k.shape == (4, 2, 16, 16, 3)
    assert not np.allclose(np.asarray(q), np.asarray(k))


def test_rotate_clip_consistent_per_clip():
    c = _clips().astype(jnp.float32) / 255.0
    out = rotate_clip(c, jax.random.key(0), degree=30.0, p=1.0)
    assert out.shape == c.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    # rotation changed the content
    assert not np.allclose(np.asarray(out), np.asarray(c))
    # p=0: identity
    same = rotate_clip(c, jax.random.key(0), degree=30.0, p=0.0)
    np.testing.assert_allclose(np.asarray(same), np.asarray(c), atol=1e-5)


def test_transform_controller_weighted_choice():
    calls = []
    fns = [lambda: calls.append("a") or "a", lambda: calls.append("b") or "b"]
    out = transform_controller(fns, [1.0, 0.0], jax.random.key(0))
    assert out == "a"
    out = transform_controller(fns, [0.0, 1.0], jax.random.key(0))
    assert out == "b"


def test_train_augment_clip_consistent():
    """One parameter draw per clip, broadcast over frames (reference
    spatial_transforms.py randomize_parameters): a clip of IDENTICAL
    frames must stay identical across frames after augmentation."""
    from video_similarity_search_tpu.data.augment import train_augment

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    clip = jnp.asarray(np.broadcast_to(frame, (4, 32, 32, 3)).copy())[None]
    out = np.asarray(train_augment(clip, jax.random.key(0), 16))
    for t in range(1, 4):
        np.testing.assert_allclose(out[0, t], out[0, 0], atol=1e-6)


def test_train_augment_deterministic_and_varied():
    """Same key -> identical output; different keys -> different crops."""
    from video_similarity_search_tpu.data.augment import train_augment

    rng = np.random.default_rng(1)
    clips = jnp.asarray(rng.integers(0, 255, (2, 4, 32, 32, 3),
                                     dtype=np.uint8))
    a = np.asarray(train_augment(clips, jax.random.key(5), 16))
    b = np.asarray(train_augment(clips, jax.random.key(5), 16))
    c = np.asarray(train_augment(clips, jax.random.key(6), 16))
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)
    # per-clip independence: the two clips get different parameters
    assert not np.allclose(a[0], a[1])
