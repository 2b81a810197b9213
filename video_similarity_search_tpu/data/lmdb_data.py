"""CoCLR-style LMDB datasets (msgpack-framed JPEG stores).

Capability parity with reference coclr_utils/lmdb_dataset.py:52-882:
UCF101 / HMDB51 / K400 x RGB / Flow x 1-clip / 2-clip / 2-stream readers
over the same LMDB files, with:

  * ``frame_sampler``: train = one random window with random downsample
    rate; test = half-overlap sliding windows, randomly keeping 10
    (reference :123-157);
  * ``double_sampler``: two independent windows (two-clip contrastive,
    :159-162);
  * val split = 30% subsample with seed 666 (:120);
  * 2-stream: RGB + flow LMDBs length-aligned (:411-568).

The ``lmdb`` wheel is not present in this sandbox image — imports are
lazy and raise a clear error at construction, not at module import.
"""

from __future__ import annotations

import io
import os
from typing import List, Optional, Sequence

import numpy as np


def _require_lmdb():
    try:
        import lmdb  # noqa: F401
        import msgpack  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "LMDB datasets need the 'lmdb' and 'msgpack' packages; this "
            "environment lacks lmdb — install it or use the frame-JPEG "
            "pipeline (data.pipeline.build_data_loader)."
        ) from e


def frame_sampler(vlen: int, num_seq: int, seq_len: int, train: bool,
                  rng: np.random.Generator,
                  downsample_candidates: Sequence[int] = (1, 2, 4),
                  test_keep: int = 10) -> np.ndarray:
    """Reference coclr_utils/lmdb_dataset.py:123-157.

    train: one random window of num_seq*seq_len frames at a random
    downsample rate (clamped to fit). test: half-overlapping windows over
    the video, randomly keeping ``test_keep`` when there are more.
    Returns (n_windows, num_seq*seq_len) frame indices.
    """
    total = num_seq * seq_len
    if train:
        ds = int(rng.choice([d for d in downsample_candidates
                             if d * total <= max(vlen, total)] or [1]))
        span = total * ds
        start = int(rng.integers(0, max(vlen - span, 0) + 1))
        idx = start + np.arange(total) * ds
        idx = np.minimum(idx, vlen - 1)
        return idx[None, :]
    # test: half-overlap sliding windows
    stride = max(total // 2, 1)
    starts = np.arange(0, max(vlen - total, 0) + 1, stride)
    if len(starts) == 0:
        starts = np.array([0])
    windows = np.stack([np.minimum(s + np.arange(total), vlen - 1)
                        for s in starts])
    if len(windows) > test_keep:
        keep = rng.choice(len(windows), size=test_keep, replace=False)
        windows = windows[np.sort(keep)]
    return windows


def double_sampler(vlen: int, num_seq: int, seq_len: int,
                   rng: np.random.Generator) -> np.ndarray:
    """Two independent train windows (reference :159-162)."""
    a = frame_sampler(vlen, num_seq, seq_len, True, rng)
    b = frame_sampler(vlen, num_seq, seq_len, True, rng)
    return np.concatenate([a, b], axis=0)


class LMDBVideoDataset:
    """Base reader over one LMDB of msgpack-encoded JPEG frame lists.

    Subclass/parameterize for UCF101LMDB, HMDB51LMDB, K400LMDB and the
    flow variants (same key scheme as the reference classes)."""

    VAL_SUBSAMPLE_SEED = 666  # reference :120
    VAL_SUBSAMPLE_FRAC = 0.3

    def __init__(self, lmdb_path: str, keys_and_labels, *,
                 mode: str = "train", num_seq: int = 1, seq_len: int = 32,
                 two_clip: bool = False, seed: int = 0):
        _require_lmdb()
        import lmdb

        self.env = lmdb.open(lmdb_path, readonly=True, lock=False,
                             readahead=False, meminit=False)
        self.mode = mode
        self.num_seq = num_seq
        self.seq_len = seq_len
        self.two_clip = two_clip
        self.rng = np.random.default_rng(seed)

        items = list(keys_and_labels)
        if mode == "val":
            val_rng = np.random.default_rng(self.VAL_SUBSAMPLE_SEED)
            n_keep = max(1, int(len(items) * self.VAL_SUBSAMPLE_FRAC))
            keep = val_rng.choice(len(items), size=n_keep, replace=False)
            items = [items[i] for i in sorted(keep)]
        self.items = items

    def __len__(self) -> int:
        return len(self.items)

    def _decode(self, key: str) -> List[np.ndarray]:
        import msgpack
        from PIL import Image

        with self.env.begin(buffers=True) as txn:
            raw = txn.get(key.encode("ascii"))
        if raw is None:
            raise KeyError(f"video key {key!r} not in LMDB")
        frames_raw = msgpack.loads(bytes(raw), raw=True)
        return [np.asarray(Image.open(io.BytesIO(fr)).convert("RGB"))
                for fr in frames_raw]

    def __getitem__(self, index: int) -> dict:
        key, label, vlen = self.items[index]
        if self.two_clip:
            windows = double_sampler(vlen, self.num_seq, self.seq_len,
                                     self.rng)
        else:
            windows = frame_sampler(vlen, self.num_seq, self.seq_len,
                                    self.mode == "train", self.rng)
        frames = self._decode(key)
        clips = np.stack([
            np.stack([frames[min(i, len(frames) - 1)] for i in win])
            for win in windows
        ])  # (n_windows, num_seq*seq_len, H, W, 3)
        return {"clips": clips, "label": label, "index": index, "vid": key}


class TwoStreamLMDBDataset:
    """RGB + flow LMDBs with aligned lengths (reference :411-568)."""

    def __init__(self, rgb: LMDBVideoDataset, flow: LMDBVideoDataset):
        _require_lmdb()
        self.rgb = rgb
        self.flow = flow
        assert len(rgb) == len(flow), "2-stream datasets must align"

    def __len__(self) -> int:
        return len(self.rgb)

    def __getitem__(self, index: int) -> dict:
        a = self.rgb[index]
        b = self.flow[index]
        return {"rgb": a["clips"], "flow": b["clips"], "label": a["label"],
                "index": index}
