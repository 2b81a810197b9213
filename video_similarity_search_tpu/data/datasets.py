"""Host-side dataset objects: triplet sampling and single-video eval items.

These produce fixed-shape uint8 clip arrays (T, H, W, C); all stochastic
photometric/geometric augmentation runs later on device
(:mod:`.augment`). What stays on host is what must: file IO, frame
decoding, index-domain sampling, and data-dependent view choices
(channel replacement needs to choose which files to read).

Reference parity:
  * TripletsData (datasets/triplets_dataset.py:29-208): positive = same
    video w.p. POSITIVE_SAMPLING_P else another video with the same
    label/cluster-label; third clip for relative-speed (2x positive) /
    local-local (second anchor) / intra-negative (block-shuffled anchor);
    explicit negative clip when ``negative_sampling`` (val); temporal-ds
    prediction targets.
  * construct_net_input (datasets/dataset_utils.py:22-114): channel
    extension concat, or full positive replacement by a 3x-replicated
    mask/flow view w.p. PROB_POS_CHANNEL_REPLACE (salient views rejected
    when mean < 0.01).
  * VideoDataset (datasets/video_dataset.py:14-121): one clip per video;
    'test' split expands every non-overlapping window.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .loaders import ImageLoaderPIL, VideoLoader
from .manifests import default_image_name_formatter
from .temporal import Shuffle, get_test_video_frame_indices, \
    temporal_ds_frame_indices

SALIENT_MASK_THRESHOLD = 0.01  # reference dataset_utils.py:38


def _resize_frames(frames: List[np.ndarray], size: Tuple[int, int],
                   keep_aspect_short_edge: Optional[int] = None
                   ) -> np.ndarray:
    """Resize decoded frames to a fixed buffer; (T, H, W, C) uint8."""
    import cv2

    out = []
    for f in frames:
        if f.ndim == 2:
            f = f[..., None]
        if keep_aspect_short_edge is not None:
            h, w = f.shape[:2]
            s = keep_aspect_short_edge / min(h, w)
            nh, nw = int(round(h * s)), int(round(w * s))
            r = cv2.resize(f, (nw, nh), interpolation=cv2.INTER_LINEAR)
            if r.ndim == 2:
                r = r[..., None]
            # center crop to (size)
            th, tw = size
            top = max(0, (nh - th) // 2)
            left = max(0, (nw - tw) // 2)
            r = r[top:top + th, left:left + tw]
        else:
            r = cv2.resize(f, (size[1], size[0]),
                           interpolation=cv2.INTER_LINEAR)
            if r.ndim == 2:
                r = r[..., None]
        out.append(r)
    return np.stack(out, 0)


class ClipReader:
    """Decode + buffer-resize one clip, with channel extension logic.

    ``rrc_size``: host-side RandomResizedCrop mode (``TPU.HOST_RRC``) — the
    reference's own protocol (spatial_transforms.py:171-225 runs RRC on
    dataloader workers): one crop box per clip sampled here in
    original-image coordinates and fused into the native decode, so the
    produced clip is already (T, rrc_size, rrc_size, C). 4x fewer bytes
    cross host->device than the 2x device-crop buffer, and the device
    augmentation skips its resize (``train_augment(pre_cropped=True)``)."""

    def __init__(self, channel_ext: Dict[str, Tuple[str, object]],
                 buffer_size: int, eval_mode: bool,
                 image_name_formatter=default_image_name_formatter,
                 prob_pos_channel_replace: float = 0.25,
                 rng: Optional[np.random.Generator] = None,
                 rrc_size: Optional[int] = None):
        self.loader = VideoLoader(image_name_formatter)
        self.channel_ext = channel_ext or {}
        self.buffer_size = buffer_size
        self.eval_mode = eval_mode
        self.prob_replace = prob_pos_channel_replace
        self.rng = rng or np.random.default_rng()
        self.rrc_size = None if eval_mode else rrc_size

    # -- host RandomResizedCrop ------------------------------------------
    def _sample_rrc_box(self, h: int, w: int):
        """torchvision RandomResizedCrop.get_params (reference
        spatial_transforms.py:171-225: scale 0.25-1.0, ratio 3/4-4/3,
        10 attempts then center fallback). Returns (top, left, ch, cw)
        floats in original-pixel coords."""
        import math

        area = h * w
        for _ in range(10):
            target_area = area * self.rng.uniform(0.25, 1.0)
            aspect = math.exp(self.rng.uniform(math.log(3 / 4),
                                               math.log(4 / 3)))
            cw = math.sqrt(target_area * aspect)
            ch = math.sqrt(target_area / aspect)
            if cw <= w and ch <= h:
                return (self.rng.uniform(0, h - ch),
                        self.rng.uniform(0, w - cw), ch, cw)
        # fallback: largest center crop within the ratio bounds
        in_ratio = w / h
        if in_ratio < 3 / 4:
            cw, ch = float(w), w / (3 / 4)
        elif in_ratio > 4 / 3:
            ch, cw = float(h), h * (4 / 3)
        else:
            ch, cw = float(h), float(w)
        return ((h - ch) / 2, (w - cw) / 2, ch, cw)

    def _crop_resize_frames(self, frames: List[np.ndarray], box,
                            out: int, box_dims=None) -> np.ndarray:
        """cv2 fallback for the RRC window (native path does it in-decode).

        ``box`` is in ``box_dims`` = (h, w) coordinates (the RGB frame the
        box was sampled from); frames stored at a different resolution
        (e.g. saliency masks) get the box rescaled to their own dims so
        every view crops the SAME relative window."""
        import cv2

        top, left, ch, cw = box
        res = []
        for f in frames:
            if f.ndim == 2:
                f = f[..., None]
            sy = f.shape[0] / box_dims[0] if box_dims else 1.0
            sx = f.shape[1] / box_dims[1] if box_dims else 1.0
            y0, x0 = int(round(top * sy)), int(round(left * sx))
            y1 = int(round((top + ch) * sy))
            x1 = int(round((left + cw) * sx))
            win = f[max(0, y0):max(y0 + 1, y1), max(0, x0):max(x0 + 1, x1)]
            r = cv2.resize(win, (out, out), interpolation=cv2.INTER_LINEAR)
            if r.ndim == 2:
                r = r[..., None]
            res.append(r)
        return np.stack(res, 0)

    def _native_frame_paths(self, video_path: str, frame_indices):
        """Frame paths for the native decoder, substituting the last seen
        path for missing tail frames (loop-padding); None when the FIRST
        frame is missing or any substitution fails — the caller then takes
        the PIL/cv2 path. Shared by both native read paths."""
        import os as _os

        fmt = self.loader.image_name_formatter
        paths, last = [], None
        for i in frame_indices:
            p = _os.path.join(video_path, fmt(i))
            ok = _os.path.exists(p)  # one stat per frame (hot path)
            if ok:
                last = p
            elif last is None:
                return None  # leading frame missing: use the PIL path
            paths.append(p if ok else last)
        return paths if len(paths) == len(frame_indices) else None

    def _read_rgb_rrc(self, video_path: str, frame_indices,
                      box, box_dims=None) -> np.ndarray:
        """RGB clip through the native RRC decode (crop fused into decode),
        cv2 fallback on failure."""
        from . import native_loader

        if native_loader.available():
            paths = self._native_frame_paths(video_path, frame_indices)
            if paths is not None:
                try:
                    top, left, ch, cw = box
                    bh, bw = box_dims if box_dims else (-1.0, -1.0)
                    return native_loader.decode_frames_rrc(
                        paths, top, left, ch, cw, self.rrc_size,
                        box_h=bh, box_w=bw)
                except RuntimeError:
                    pass
        # PIL fallback with DCT-draft scaling: the decoded crop window only
        # needs to stay >= rrc_size, so frames whose window is k x larger can
        # decode at 1/k scale (k in {2,4,8}); _crop_resize_frames rescales
        # the box by the actual decoded dims, so coordinates stay exact.
        min_dim = None
        if box_dims is not None:
            k = max(1, int(min(box[2], box[3]) // self.rrc_size))
            min_dim = max(self.rrc_size, -(-min(box_dims) // k))
        frames = self._read_rgb_drafted(video_path, frame_indices, min_dim)
        return self._crop_resize_frames(frames, box, self.rrc_size,
                                        box_dims)

    def _frame_dims(self, video_path: str, frame_indices):
        """Header-only size read of the first READABLE frame (PIL lazy
        open); None when no frame opens — the caller then takes the
        non-RRC fallback path instead of crashing the loader worker."""
        import os as _os

        from PIL import Image

        for i in frame_indices:
            p = _os.path.join(video_path,
                              self.loader.image_name_formatter(i))
            try:
                with Image.open(p) as im:
                    w, h = im.size
                return h, w
            except (OSError, FileNotFoundError):
                continue
        return None

    def _read_rgb_drafted(self, video_path: str, frame_indices,
                          min_dim: Optional[int]) -> List[np.ndarray]:
        """PIL read of the RGB view with a DCT-draft hint: the decoded short
        side stays >= ``min_dim`` while 2-8x-larger sources decode at
        1/2-1/8 scale in the DCT domain (loaders.ImageLoaderPIL). Callers
        resize/crop afterwards, so only decode cost changes."""
        loader = self.loader
        if min_dim:
            loader = VideoLoader(self.loader.image_name_formatter,
                                 ImageLoaderPIL(min_dim=min_dim))
        return self._read(loader, video_path, frame_indices)

    def _read(self, loader, path, frame_indices) -> List[np.ndarray]:
        frames = loader(path, frame_indices)
        if not frames:
            raise FileNotFoundError(f"no frames under {path}")
        while len(frames) < len(frame_indices):
            frames.append(frames[-1])
        return frames

    def _buffered(self, frames: List[np.ndarray]) -> np.ndarray:
        size = (self.buffer_size, self.buffer_size)
        if self.eval_mode:
            # Resize(short edge)+CenterCrop (ref data_loader.py:107-115)
            return _resize_frames(frames, size,
                                  keep_aspect_short_edge=self.buffer_size)
        return _resize_frames(frames, size)

    def _read_rgb_buffered(self, video_path: str,
                           frame_indices) -> np.ndarray:
        """RGB fast path: one GIL-free native C++ call decodes + resizes
        the whole clip (native/vss_loader.cpp); PIL/cv2 fallback when the
        native lib is unavailable or any frame fails."""
        from . import native_loader

        if native_loader.available():
            paths = self._native_frame_paths(video_path, frame_indices)
            if paths is not None:
                try:
                    return native_loader.decode_frames(
                        paths, self.buffer_size, self.eval_mode)
                except RuntimeError:
                    pass
        # PIL fallback: both train (square resize) and eval (short-edge
        # resize + center crop) only need the short side >= buffer_size.
        return self._buffered(self._read_rgb_drafted(
            video_path, frame_indices, self.buffer_size))

    def load(self, sample: dict, frame_indices: Sequence[int],
             use_channel_ext: bool = True,
             pos_channel_replace: bool = False) -> np.ndarray:
        """-> (T, S, S, C) uint8 (C = 3 + #extensions or 3; S = rrc_size
        in host-RRC mode, else buffer_size).

        ONE control path for both modes: the replacement-probability draw,
        salient-mean rejection, and channel-concat logic are shared; only
        the per-view materialization differs (host-RRC crop window vs
        plain buffer resize). In host-RRC mode the SAME relative crop
        window is applied to the RGB decode and to every extension/
        replacement view (rescaled to each view's native resolution)."""
        box = box_dims = None
        if self.rrc_size:
            box_dims = self._frame_dims(sample["video"], frame_indices)
            if box_dims is not None:
                box = self._sample_rrc_box(*box_dims)
            # box_dims None (no readable RGB frame header): degrade to a
            # full-frame resize at rrc_size so the item keeps the static
            # shape; a truly empty video still raises in _read below

        def rgb_view() -> np.ndarray:
            if box is not None:
                return self._read_rgb_rrc(sample["video"], frame_indices,
                                          box, box_dims)
            if self.rrc_size:
                return _resize_frames(
                    self._read(self.loader, sample["video"], frame_indices),
                    (self.rrc_size, self.rrc_size))
            return self._read_rgb_buffered(sample["video"], frame_indices)

        def ext_view(frames: List[np.ndarray]) -> np.ndarray:
            if box is not None:
                return self._crop_resize_frames(frames, box, self.rrc_size,
                                                box_dims)
            if self.rrc_size:
                return _resize_frames(frames,
                                      (self.rrc_size, self.rrc_size))
            return self._buffered(frames)

        clip = None
        if pos_channel_replace and self.channel_ext:
            if self.rng.random() < self.prob_replace:
                key = self.rng.choice(list(self.channel_ext))
                _, ch_loader = self.channel_ext[key]
                arr = ext_view(self._read(ch_loader, sample[key],
                                          frame_indices))
                if key != "salient" or arr.mean() / 255.0 >= \
                        SALIENT_MASK_THRESHOLD:
                    clip = np.repeat(arr[..., :1], 3, axis=-1)
        if clip is None:
            clip = rgb_view()
            if use_channel_ext and not pos_channel_replace:
                for key, (_, ch_loader) in self.channel_ext.items():
                    ext = ext_view(self._read(ch_loader, sample[key],
                                              frame_indices))
                    clip = np.concatenate([clip, ext[..., :1]], axis=-1)
        return clip


class TripletsDataset:
    """Anchor/positive(/extra/negative) item sampler (see module docstring)."""

    POSITIVE_TYPES = ("same_inst", "diff_inst")

    def __init__(self, samples: List[dict], *,
                 temporal_transforms: Dict[str, Callable],
                 reader: ClipReader,
                 target_type: str = "label",
                 positive_sampling_p: float = 1.0,
                 negative_sampling: bool = False,
                 pos_channel_replace: bool = False,
                 relative_speed_perception: bool = False,
                 local_local_contrast: bool = False,
                 intra_negative: bool = False,
                 predict_temporal_ds: bool = False,
                 sample_duration: int = 16,
                 split: str = "train",
                 seed: int = 0):
        self.samples = samples
        self.tt = temporal_transforms
        self.reader = reader
        self.target_type = target_type
        self.positive_sampling_p = positive_sampling_p
        self.negative_sampling = negative_sampling
        self.pos_channel_replace = pos_channel_replace
        self.rsp = relative_speed_perception
        self.llc = local_local_contrast
        self.intra_negative = intra_negative
        self.predict_temporal_ds = predict_temporal_ds
        self.sample_duration = sample_duration
        self.split = split
        self.rng = np.random.default_rng(seed)
        self.shuffle_tt = Shuffle()

        self.data_labels = np.array([s[target_type] for s in samples])
        self.label_to_indices = {
            label: np.where(self.data_labels == label)[0]
            for label in np.unique(self.data_labels)
        }

    def __len__(self) -> int:
        return len(self.samples)

    def set_epoch_seed(self, seed: int) -> None:
        self.rng = np.random.default_rng(seed)

    def _sample_positive(self, index: int, a_target) -> dict:
        p_type = self.rng.choice(
            self.POSITIVE_TYPES,
            p=[self.positive_sampling_p, 1 - self.positive_sampling_p])
        if p_type == "same_inst" and self.split == "train":
            return self.samples[index]
        pool = self.label_to_indices[a_target]
        p_idx = self.rng.choice(pool)
        while p_idx == index and len(pool) > 1:
            p_idx = self.rng.choice(pool)
        return self.samples[p_idx]

    def _clip(self, sample: dict, role: str, *, shuffle: bool = False,
              ds: Optional[int] = None) -> np.ndarray:
        frame_indices = list(range(1, sample["num_frames"] + 1))
        if ds is not None:
            start = int(self.rng.integers(1, sample["num_frames"] + 1))
            frame_id = temporal_ds_frame_indices(
                self.sample_duration, sample["num_frames"], start, ds)
        else:
            frame_id = self.tt[role](frame_indices)
        if shuffle:
            frame_id = self.shuffle_tt(frame_id)
        use_ext = not (self.pos_channel_replace and role == "anchor")
        replace = self.pos_channel_replace and role != "anchor" \
            and role != "negative"
        return self.reader.load(sample, frame_id, use_channel_ext=use_ext,
                                pos_channel_replace=replace)

    def __getitem__(self, index: int) -> dict:
        anchor = self.samples[index]
        a_target = anchor[self.target_type]
        positive = self._sample_positive(index, a_target)
        p_target = positive[self.target_type]

        if self.split == "train" and self.predict_temporal_ds:
            ds_label = int(self.rng.integers(1, 5))  # ref :127 randint(1,4)
            return {
                "anchor": self._clip(anchor, "anchor", ds=ds_label),
                "positive": self._clip(positive, "positive", ds=ds_label),
                "targets": (a_target, p_target),
                "ds_label": ds_label,
                "index": index,
            }

        item = {
            "anchor": self._clip(anchor, "anchor"),
            "positive": self._clip(positive, "positive"),
            "targets": (a_target, p_target),
            "index": index,
        }
        if self.rsp:
            item["extra"] = self._clip(positive, "fast_positive")
        elif self.llc:
            item["extra"] = self._clip(anchor, "anchor")
        elif self.intra_negative:
            item["extra"] = self._clip(anchor, "intra_negative", shuffle=True)

        if self.negative_sampling:
            neg_idx = int(self.rng.integers(len(self)))
            while neg_idx == index:
                neg_idx = int(self.rng.integers(len(self)))
            negative = self.samples[neg_idx]
            item["negative"] = self._clip(negative, "negative")
            item["n_target"] = negative[self.target_type]
            item["negative_index"] = neg_idx
        return item


class VideoDataset:
    """One (or all test windows of a) video per item
    (reference datasets/video_dataset.py:14-121)."""

    def __init__(self, samples: List[dict], *,
                 temporal_transform: Callable,
                 reader: ClipReader,
                 target_type: str = "label",
                 split: str = "train",
                 sample_duration: int = 16):
        self.samples = samples
        self.tt = temporal_transform
        self.reader = reader
        self.target_type = target_type
        self.split = split
        # test-split window length (cfg.DATA.SAMPLE_DURATION): the
        # temporal transform is a Compose with no .size attribute, so the
        # old hasattr fallback silently pinned 16-frame windows for every
        # non-16 SAMPLE_DURATION, diverging from the 8-frame train bank
        self.sample_duration = sample_duration

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> dict:
        sample = self.samples[index]
        target = sample[self.target_type]
        if self.split == "test":
            windows = get_test_video_frame_indices(
                sample["num_frames"],
                getattr(self.tt, "size", self.sample_duration))
            clips = np.stack([
                self.reader.load(sample, win) for win in windows
            ])  # (n_windows, T, H, W, C)
            return {"clip": clips, "target": target,
                    "path": sample["video"], "index": index}
        frame_indices = list(range(1, sample["num_frames"] + 1))
        frame_id = self.tt(frame_indices)
        return {"clip": self.reader.load(sample, frame_id),
                "target": target, "path": sample["video"], "index": index}
