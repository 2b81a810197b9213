"""Native C++ batched JPEG decoder tests (native/vss_loader.cpp).

Skipped when the toolchain/libjpeg can't build the shared lib; otherwise
the lib is compiled on first use by data/native_loader.py.
"""

import os

import numpy as np
import pytest

from synthetic_data import make_synthetic_ucf
from video_similarity_search_tpu.data import native_loader


pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native loader not buildable here")


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("njpg")
    vid, _ = make_synthetic_ucf(str(root), n_frames=12, size=96)
    return os.path.join(vid, "class0", "v_class0_g00_c01")


def test_decode_frames_shapes(jpeg_dir):
    paths = [os.path.join(jpeg_dir, f"image_{i:05d}.jpg")
             for i in range(1, 9)]
    out = native_loader.decode_frames(paths, 64, eval_mode=False)
    assert out.shape == (8, 64, 64, 3) and out.dtype == np.uint8
    # eval mode: short-edge resize + center crop, same output size
    out_e = native_loader.decode_frames(paths, 48, eval_mode=True)
    assert out_e.shape == (8, 48, 48, 3)


def test_decode_matches_pil_path_closely(jpeg_dir):
    """Within a few gray levels of the PIL/cv2 pipeline (different bilinear
    corner conventions + DCT-scaled decode are expected)."""
    from video_similarity_search_tpu.data.datasets import ClipReader

    idx = list(range(1, 9))
    reader = ClipReader({}, buffer_size=64, eval_mode=False)
    native = native_loader.decode_frames(
        [os.path.join(jpeg_dir, f"image_{i:05d}.jpg") for i in idx], 64,
        eval_mode=False)
    pil = reader._buffered(reader._read(reader.loader, jpeg_dir, idx))
    diff = np.abs(native.astype(int) - pil.astype(int))
    assert diff.mean() < 3.0 and diff.max() <= 32


def test_missing_frame_raises_and_reader_falls_back(jpeg_dir, tmp_path):
    with pytest.raises(RuntimeError):
        native_loader.decode_frames([str(tmp_path / "nope.jpg")], 32, False)

    from video_similarity_search_tpu.data.datasets import ClipReader

    # indices past the end: fast path repeats the last existing frame
    reader = ClipReader({}, buffer_size=32, eval_mode=False)
    clip = reader._read_rgb_buffered(jpeg_dir, [10, 11, 12, 13, 14])
    assert clip.shape == (5, 32, 32, 3)
    # frames 13/14 don't exist -> repeated frame 12
    np.testing.assert_array_equal(clip[2], clip[3])
    np.testing.assert_array_equal(clip[2], clip[4])


def test_rrc_crop_at_image_edge_no_underflow(jpeg_dir):
    """Pins the defensive upper clamp in resize_window: a crop whose
    right/bottom edge lands at the last pixel (box->frame rescale + DCT
    ceil-rounding put it within ulps of w) must interpolate with weights
    <= 256 — an overshoot would underflow the uint16 complement into
    garbage edge pixels. The window here sits exactly on the frame
    boundary under a non-trivial box rescale."""
    paths = [os.path.join(jpeg_dir, f"image_{i:05d}.jpg")
             for i in range(1, 5)]
    # frames are 96x96; box coords in a 97x95 frame push the rescaled
    # window edge past w-1 by up to ~a pixel
    out = native_loader.decode_frames_rrc(
        paths, top=1.0, left=1.0, crop_h=96.0, crop_w=94.0, out_size=64,
        box_h=97.0, box_w=95.0)
    assert out.shape == (4, 64, 64, 3)
    full = native_loader.decode_frames(paths, 96, eval_mode=False)
    lo, hi = int(full.min()), int(full.max())
    # underflowed weights produced values far outside the source range
    assert int(out.min()) >= max(0, lo - 8)
    assert int(out.max()) <= min(255, hi + 8)
    # edge column/row specifically
    assert np.all(out[:, :, -1, :] <= min(255, hi + 8))
    assert np.all(out[:, -1, :, :] <= min(255, hi + 8))
