"""CoCLR standalone leaf transforms (reference coclr_utils/
augmentation.py:16-230) — Padding, Scale, RandomGray channel-splitting —
numpy-oracle tests (round-2 VERDICT missing item 4)."""

import jax
import numpy as np

from video_similarity_search_tpu.data.augment import (pad_clip,
                                                      random_gray_clip,
                                                      scale_clip)


def test_pad_clip():
    x = np.random.default_rng(0).integers(
        0, 255, size=(2, 3, 8, 10, 3)).astype(np.uint8)
    out = np.asarray(pad_clip(x, 2))
    assert out.shape == (2, 3, 12, 14, 3)
    assert np.all(out[:, :, :2] == 0) and np.all(out[:, :, -2:] == 0)
    np.testing.assert_array_equal(out[:, :, 2:-2, 2:-2], x)


def test_scale_clip_short_edge():
    x = np.random.default_rng(0).integers(
        0, 255, size=(1, 2, 16, 24, 3)).astype(np.uint8)
    out = np.asarray(scale_clip(x, 8))
    # short edge 16 -> 8, aspect preserved: 24 -> 12
    assert out.shape == (1, 2, 8, 12, 3)
    # int short edge already matching -> identity (reference :33-35)
    same = np.asarray(scale_clip(x, 16))
    np.testing.assert_array_equal(same, x)
    # explicit (h, w)
    assert np.asarray(scale_clip(x, (10, 10))).shape == (1, 2, 10, 10, 3)


def test_random_gray_channel_splitting():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 255, size=(4, 6, 5, 5, 3)).astype(np.uint8)

    # consistent: whole clip either split to one channel or untouched
    out = np.asarray(random_gray_clip(x, jax.random.key(0), p=0.5,
                                      consistent=True))
    for b in range(4):
        clip, orig = out[b], x[b]
        if np.array_equal(clip, orig):
            continue
        # all three channels equal, and equal to ONE of the originals
        assert np.array_equal(clip[..., 0], clip[..., 1])
        assert np.array_equal(clip[..., 1], clip[..., 2])
        assert any(np.array_equal(clip[..., 0], orig[..., c])
                   for c in range(3))

    # per-frame (consistent=False): decisions vary within a clip at p=0.5
    out2 = np.asarray(random_gray_clip(x, jax.random.key(3), p=0.5,
                                       consistent=False))
    frame_gray = [
        np.array_equal(out2[b, t, ..., 0], out2[b, t, ..., 1])
        and np.array_equal(out2[b, t, ..., 1], out2[b, t, ..., 2])
        for b in range(4) for t in range(6)
    ]
    assert any(frame_gray) and not all(frame_gray)

    # seq_len blocks share one decision (reference :206-210)
    out3 = np.asarray(random_gray_clip(x, jax.random.key(5), p=0.5,
                                       consistent=False, seq_len=3))
    for b in range(4):
        for blk in range(2):
            f0, f1, f2 = (out3[b, 3 * blk + i] for i in range(3))
            x0, x1, x2 = (x[b, 3 * blk + i] for i in range(3))
            g = [np.array_equal(f[..., 0], f[..., 1]) and
                 not np.array_equal(f, xo)
                 for f, xo in ((f0, x0), (f1, x1), (f2, x2))]
            ident = [np.array_equal(f, xo)
                     for f, xo in ((f0, x0), (f1, x1), (f2, x2))]
            assert all(g) or all(ident)
