"""Tiny synthetic frame-JPEG dataset in kenshohara layout for e2e tests."""

import json
import os

import numpy as np


def make_synthetic_ucf(root: str, n_classes: int = 3, videos_per_class: int = 4,
                       n_frames: int = 24, size: int = 48, seed: int = 0):
    """Creates <root>/jpg/<label>/<vid>/image_XXXXX.jpg + annotation.json.

    Each class has a distinct dominant color with per-frame noise, so even
    an untrained encoder can retrieve same-class videos above chance.
    Returns (vid_path, annotation_path).
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
