"""PIL-fallback DCT draft scaling (loaders.ImageLoaderPIL min_dim).

Hosts without the native C++ decoder fall back to PIL; ``min_dim`` lets
that path decode at 1/2-1/8 scale in the DCT domain (``Image.draft``) when
the consumer resizes afterwards anyway — the same scaled-decode trick
native/vss_loader.cpp uses. These tests pin (a) the scale selection,
(b) that both ClipReader fallback read paths stay within the same
tolerance of the full-resolution pipeline that the native decoder is held
to (test_native_loader.py:37-49), and (c) that RRC crop coordinates stay
correct under drafted (downscaled) decode.
"""

import os

import numpy as np
import pytest

from synthetic_data import make_synthetic_ucf
from video_similarity_search_tpu.data import native_loader
from video_similarity_search_tpu.data.datasets import ClipReader
from video_similarity_search_tpu.data.loaders import ImageLoaderPIL


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("draftjpg")
    vid, _ = make_synthetic_ucf(str(root), n_frames=12, size=128)
    return os.path.join(vid, "class0", "v_class0_g00_c01")


@pytest.fixture()
def no_native(monkeypatch):
    """Force the PIL/cv2 fallback paths regardless of toolchain."""
    monkeypatch.setattr(native_loader, "available", lambda: False)


def test_min_dim_scale_selection(jpeg_dir):
    p = os.path.join(jpeg_dir, "image_00001.jpg")
    assert ImageLoaderPIL()(p).shape == (128, 128, 3)
    # largest power-of-two downscale whose short side stays >= min_dim
    assert ImageLoaderPIL(min_dim=64)(p).shape == (64, 64, 3)
    assert ImageLoaderPIL(min_dim=33)(p).shape == (64, 64, 3)
    assert ImageLoaderPIL(min_dim=16)(p).shape == (16, 16, 3)
    # min_dim >= source: decodes at full resolution (never upscales)
    assert ImageLoaderPIL(min_dim=512)(p).shape == (128, 128, 3)


def test_buffered_fallback_drafts_within_tolerance(jpeg_dir, no_native):
    idx = list(range(1, 9))
    reader = ClipReader({}, buffer_size=32, eval_mode=False)
    got = reader._read_rgb_buffered(jpeg_dir, idx)  # drafted (128 -> 32)
    full = reader._buffered(reader._read(reader.loader, jpeg_dir, idx))
    assert got.shape == full.shape == (8, 32, 32, 3)
    diff = np.abs(got.astype(int) - full.astype(int))
    # same tolerance the native DCT-scaled decode is held to
    assert diff.mean() < 3.0 and diff.max() <= 32

    # eval mode: short-edge resize + center crop also only needs >= buffer
    reader_e = ClipReader({}, buffer_size=32, eval_mode=True)
    got_e = reader_e._read_rgb_buffered(jpeg_dir, idx)
    full_e = reader_e._buffered(reader_e._read(reader_e.loader, jpeg_dir,
                                               idx))
    assert got_e.shape == full_e.shape
    diff_e = np.abs(got_e.astype(int) - full_e.astype(int))
    assert diff_e.mean() < 3.0 and diff_e.max() <= 32


def test_rrc_fallback_draft_keeps_crop_coordinates(jpeg_dir, no_native):
    idx = list(range(1, 5))
    reader = ClipReader({}, buffer_size=64, eval_mode=False, rrc_size=32)
    box_dims = (128, 128)
    # a 96x96 window: k = 96//32 = 3 -> draft to >= ceil(128/3) = 43 -> 1/2
    box = (16.0, 24.0, 96.0, 96.0)
    got = reader._read_rgb_rrc(jpeg_dir, idx, box, box_dims)
    full = reader._crop_resize_frames(
        reader._read(reader.loader, jpeg_dir, idx), box, 32, box_dims)
    assert got.shape == full.shape == (4, 32, 32, 3)
    diff = np.abs(got.astype(int) - full.astype(int))
    # crop-then-resize over per-pixel noise aliases harder than the
    # buffered square resize (48->32 vs 96->32 interpolation footprints on
    # i.i.d.-noise synthetic frames); real video frames are far smoother
    assert diff.mean() < 6.0 and diff.max() <= 64

    # a window already near the output size: k = 1 -> full-res decode,
    # bit-identical to the undrafted fallback
    box_small = (40.0, 50.0, 40.0, 40.0)
    got_s = reader._read_rgb_rrc(jpeg_dir, idx, box_small, box_dims)
    full_s = reader._crop_resize_frames(
        reader._read(reader.loader, jpeg_dir, idx), box_small, 32, box_dims)
    np.testing.assert_array_equal(got_s, full_s)


def test_rrc_fallback_load_end_to_end(jpeg_dir, no_native):
    """Whole-load() path in host-RRC mode over the drafted fallback."""
    reader = ClipReader({}, buffer_size=64, eval_mode=False, rrc_size=32,
                        rng=np.random.default_rng(0))
    clip = reader.load({"video": jpeg_dir}, list(range(1, 9)))
    assert clip.shape == (8, 32, 32, 3) and clip.dtype == np.uint8
    assert clip.std() > 0  # not a degenerate decode
