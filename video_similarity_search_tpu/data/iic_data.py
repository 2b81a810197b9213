"""IIC-protocol raw-video datasets.

Capability parity with reference iic_datasets/ucf101.py:23-190 and
hmdb51.py twins: decode the whole video file, sample ``sample_num`` (10)
evenly-spaced clips per video for retrieval feature extraction, with
clip-consistent spatial transforms. The reference decodes with
skvideo.io; this environment lacks skvideo, so decoding uses OpenCV
(cv2.VideoCapture) — same frames, different library.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np


def decode_video(path: str, max_frames: Optional[int] = None) -> np.ndarray:
    """Whole-video decode -> (T, H, W, 3) uint8 RGB."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        if max_frames and len(frames) >= max_frames:
            break
    cap.release()
    if not frames:
        raise IOError(f"could not decode {path}")
    return np.stack(frames)


def parse_split_file(list_path: str, class_index_path: str
                     ) -> List[Tuple[str, int]]:
    """UCF101 official split lists: 'ApplyEyeMakeup/v_..._c01.avi 1' plus
    classInd.txt (reference iic_datasets/ucf101.py uses the same files)."""
    class_idx = {}
    with open(class_index_path) as f:
        for line in f:
            idx, name = line.strip().split()
            class_idx[name] = int(idx) - 1
    items = []
    with open(list_path) as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            rel = parts[0]
            label = class_idx[rel.split("/")[0]]
            items.append((rel, label))
    return items


class ClipRetrievalDataset:
    """``sample_num`` evenly spaced clips per video
    (reference iic_datasets/ucf101.py:120-190 UCF101ClipRetrievalDataset)."""

    def __init__(self, root_dir: str, items: List[Tuple[str, int]], *,
                 clip_len: int = 16, sample_num: int = 10,
                 sample_size: Optional[int] = None):
        self.root_dir = root_dir
        self.items = items
        self.clip_len = clip_len
        self.sample_num = sample_num
        self.sample_size = sample_size

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, index: int) -> dict:
        rel, label = self.items[index]
        video = decode_video(os.path.join(self.root_dir, rel))
        t = len(video)
        if t < self.clip_len:
            reps = int(np.ceil(self.clip_len / t))
            video = np.concatenate([video] * reps)[:self.clip_len]
            t = len(video)
        starts = np.linspace(0, t - self.clip_len, self.sample_num
                             ).astype(int)
        clips = np.stack([video[s:s + self.clip_len] for s in starts])
        if self.sample_size:
            import cv2

            resized = np.stack([
                np.stack([cv2.resize(f, (self.sample_size, self.sample_size))
                          for f in clip]) for clip in clips])
            clips = resized
        return {"clips": clips, "label": label, "index": index}
