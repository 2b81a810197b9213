"""Tiny synthetic frame-JPEG dataset in kenshohara layout for e2e tests."""

import json
import os

import numpy as np


def make_synthetic_ucf(root: str, n_classes: int = 3, videos_per_class: int = 4,
                       n_frames: int = 24, size: int = 48, seed: int = 0,
                       with_test: bool = False):
    """Creates <root>/jpg/<label>/<vid>/image_XXXXX.jpg + annotation.json.

    Each class has a distinct dominant color with per-frame noise, so even
    an untrained encoder can retrieve same-class videos above chance.
    ``with_test`` marks the second-to-last video per class as subset
    'test' (the kenshohara jsons used with evaluate.py --split test carry
    a test subset). Returns (vid_path, annotation_path).
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    jpg_root = os.path.join(root, "jpg")
    database = {}
    labels = [f"class{c}" for c in range(n_classes)]
    colors = rng.integers(40, 215, size=(n_classes, 3))

    for c, label in enumerate(labels):
        for v in range(videos_per_class):
            # group structure in the id: v_<label>_g<NN>_c<NN>
            vid = f"v_{label}_g{v:02d}_c01"
            subset = "training" if v < videos_per_class - 1 else "validation"
            if with_test and v == videos_per_class - 2:
                subset = "test"
            vdir = os.path.join(jpg_root, label, vid)
            os.makedirs(vdir, exist_ok=True)
            base = colors[c][None, None, :]
            for f in range(1, n_frames + 1):
                noise = rng.integers(0, 40, size=(size, size, 3))
                img = np.clip(base + noise - 20, 0, 255).astype(np.uint8)
                Image.fromarray(img).save(
                    os.path.join(vdir, f"image_{f:05d}.jpg"))
            database[vid] = {
                "subset": subset,
                "annotations": {"label": label,
                                "segment": [1, n_frames + 2]},
            }

    ann = {"labels": labels, "database": database}
    ann_path = os.path.join(root, "annotation.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return jpg_root, ann_path


def make_overlapping_ucf(root: str, n_classes: int = 4,
                         videos_per_class: int = 16, n_frames: int = 12,
                         size: int = 32, seed: int = 3,
                         val_per_class: int = 8):
    """NON-separable variant for learning-dynamics tests: class color means
    sit close together with per-video brightness offsets and heavy
    per-frame noise, so an untrained encoder's first clustering lands at a
    NON-trivial NMI (~0.3-0.6) instead of 1.0 — the regime where the SLIC
    iterative-clustering dynamic (adaptive p = 1 - NMI, reference
    online_train.py:599-667) actually has work to do.

    Returns (vid_path, annotation_path)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    jpg_root = os.path.join(root, "jpg")
    database = {}
    labels = [f"class{c}" for c in range(n_classes)]
    # close-packed means: adjacent classes differ by ~18 per channel while
    # per-video offset is +-20 and per-frame noise is +-35
    base = rng.integers(80, 130, size=(1, 3))
    colors = base + np.arange(n_classes)[:, None] * 18

    for c, label in enumerate(labels):
        for v in range(videos_per_class):
            vid = f"v_{label}_g{v:02d}_c01"
            subset = ("training" if v < videos_per_class - val_per_class
                      else "validation")
            vdir = os.path.join(jpg_root, label, vid)
            os.makedirs(vdir, exist_ok=True)
            offset = rng.integers(-20, 21, size=(1, 1, 3))
            for f in range(1, n_frames + 1):
                noise = rng.integers(-35, 36, size=(size, size, 3))
                img = np.clip(colors[c][None, None, :] + offset + noise,
                              0, 255).astype(np.uint8)
                Image.fromarray(img).save(
                    os.path.join(vdir, f"image_{f:05d}.jpg"))
            database[vid] = {
                "subset": subset,
                "annotations": {"label": label,
                                "segment": [1, n_frames + 2]},
            }

    ann = {"labels": labels, "database": database}
    ann_path = os.path.join(root, "annotation.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return jpg_root, ann_path


def add_synthetic_flow(root: str, n_frames: int = 24, size: int = 48,
                       seed: int = 1):
    """TVL1-style optical_u/optical_v grayscale frame dirs matching the
    videos of make_synthetic_ucf: <root>/flow_{u,v}/<vid>/frame%06d.jpg
    (reference layout, datasets/ucf101.py optical channel paths)."""
    import json as _json

    from PIL import Image

    rng = np.random.default_rng(seed)
    with open(os.path.join(root, "annotation.json")) as f:
        database = _json.load(f)["database"]
    roots = {}
    for comp in ("u", "v"):
        comp_root = os.path.join(root, f"flow_{comp}")
        roots[comp] = comp_root
        for vid in database:
            vdir = os.path.join(comp_root, vid)
            os.makedirs(vdir, exist_ok=True)
            for fr in range(1, n_frames + 1):
                img = rng.integers(60, 200, size=(size, size),
                                   dtype=np.uint8)
                Image.fromarray(img, mode="L").save(
                    os.path.join(vdir, f"frame{fr:06d}.jpg"))
    return roots["u"], roots["v"]
