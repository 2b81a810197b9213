"""HDF5 video / TVL1-flow loader tests (reference datasets/loader.py:58-94
VideoLoaderHDF5 / VideoLoaderFlowHDF5 — previously uncovered)."""

import io
import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from video_similarity_search_tpu.data.loaders import (  # noqa: E402
    VideoLoaderFlowHDF5, VideoLoaderHDF5)


def _jpeg_bytes(arr, mode="RGB"):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, format="JPEG")
    return np.frombuffer(buf.getvalue(), dtype=np.uint8)


@pytest.fixture
def hdf5_video(tmp_path):
    rng = np.random.default_rng(0)
    path = str(tmp_path / "video.hdf5")
    frames = [_jpeg_bytes(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8))
              for _ in range(6)]
    with h5py.File(path, "w") as f:
        dt = h5py.vlen_dtype(np.uint8)
        ds = f.create_dataset("video", (len(frames),), dtype=dt)
        for i, fr in enumerate(frames):
            ds[i] = fr
    return path


def test_hdf5_video_loader(hdf5_video):
    loader = VideoLoaderHDF5()
    frames = loader(hdf5_video, [0, 2, 5])
    assert len(frames) == 3
    assert frames[0].shape == (20, 20, 3) and frames[0].dtype == np.uint8
    # out-of-range index repeats the last frame (reference loader.py:66-70)
    frames = loader(hdf5_video, [5, 99])
    np.testing.assert_array_equal(frames[0], frames[1])


def test_hdf5_flow_loader(tmp_path):
    rng = np.random.default_rng(1)
    path = str(tmp_path / "flow.hdf5")
    dt = h5py.vlen_dtype(np.uint8)
    with h5py.File(path, "w") as f:
        for comp in ("u", "v"):
            ds = f.create_dataset(f"video_{comp}", (4,), dtype=dt)
            for i in range(4):
                ds[i] = _jpeg_bytes(
                    rng.integers(0, 255, (16, 16), dtype=np.uint8), mode="L")
    loader = VideoLoaderFlowHDF5()
    frames = loader(path, [0, 3])
    assert len(frames) == 2
    # (u, v, u) 3-channel stack (reference loader.py:74-94)
    assert frames[0].shape == (16, 16, 3)
    np.testing.assert_array_equal(frames[0][..., 0], frames[0][..., 2])
