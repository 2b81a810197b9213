"""Decode-vs-transfer separation + producer-side upload overlap (Next #4).

Round 3 measured 20.5 clips/s e2e with HOST_RRC and attributed it to host
decode — but the decode bound (19.4 items/s loader-alone) and the tunnel
transfer bound (~23 clips/s at 25 MB/batch over the ~35 MB/s execute-path
upload) nearly coincide, so one number can't attribute. This script
measures each bound INDEPENDENTLY on the real chip + real JPEGs, then runs
the driver epoch with ``TPU.PREFETCH_DEVICE_PUT`` off/on:

  loader_alone    decode+collate rate, no device in the loop
  upload_alone    producer-side `_upload` of PRE-DECODED batches (pure
                  transfer rate through the forced-materialization path)
  e2e_off / e2e_on  one driver epoch, steady-state clips/s

With overlap the expected steady state is ~max(decode, transfer) instead
of their serial near-sum.

Usage: JAX_PLATFORMS=axon python perf_experiments/e2e_overlap_r4.py
"""

import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

B, T, S = 16, 16, 128


def build_dataset():
    from synthetic_data import make_synthetic_ucf

    tmp = tempfile.mkdtemp(prefix="e2e_r4_")
    # manifests skip videos with num_frames < 2*SAMPLE_DURATION (= 32)
    vid, ann = make_synthetic_ucf(
        os.path.join(tmp, "data"), n_classes=8, videos_per_class=22,
        n_frames=36, size=240, seed=0)
    return tmp, vid, ann


def make_cfg(vid, ann, out, device_put: bool):
    from video_similarity_search_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.ARCH = "3dresnet"
    cfg.RESNET.MODEL_DEPTH = 18
    cfg.RESNET.NO_MAX_POOl = True
    cfg.DATASET.VID_PATH = vid
    cfg.DATASET.ANNOTATION_PATH = ann
    cfg.DATASET.CHANNEL_EXTENSIONS = ""
    cfg.DATASET.POS_CHANNEL_REPLACE = False
    cfg.DATA.SAMPLE_DURATION = T
    cfg.DATA.SAMPLE_SIZE = S
    cfg.TRAIN.BATCH_SIZE = B
    cfg.TRAIN.NUM_DATA_WORKERS = 4
    cfg.TPU.HOST_RRC = True
    cfg.TPU.PREFETCH_DEVICE_PUT = device_put
    cfg.OUTPUT_PATH = out
    return cfg


def loader_and_upload_rates(vid, ann, tmp):
    import numpy as np

    from video_similarity_search_tpu.data.pipeline import build_data_loader

    cfg = make_cfg(vid, ann, tmp, False)
    loader, _ = build_data_loader("train", cfg, True, triplets=True)

    # loader alone (decode bound)
    it = iter(loader)
    next(it)  # spin-up
    n, t0 = 0, time.perf_counter()
    batches = []
    for batch in it:
        n += batch["__size__"]
        if len(batches) < 6:
            batches.append(batch)
        if n >= 64:
            break
    dt = time.perf_counter() - t0
    decode_rate = n / dt
    mb = sum(v.nbytes for v in batches[0].values()
             if isinstance(v, np.ndarray)) / 1e6
    print(json.dumps({"exp": "loader_alone", "items_per_s": round(decode_rate, 1),
                      "batch_mb": round(mb, 1)}), flush=True)

    # upload alone (transfer bound): re-upload pre-decoded batches
    loader.device_upload = True
    up = loader._upload(batches[0])  # compile touch fn + first transfer
    n_up, t0 = 0, time.perf_counter()
    for i in range(2, 8):
        b = dict(batches[i % len(batches)])
        # unique bytes per upload — defeat any content caching
        b["anchor"] = b["anchor"].copy()
        b["anchor"][0, 0, 0, 0] = i
        loader._upload(b)
        n_up += b["__size__"]
    dt = time.perf_counter() - t0
    print(json.dumps({"exp": "upload_alone", "items_per_s": round(n_up / dt, 1),
                      "mb_per_s": round(len(range(2, 8)) * mb / dt, 1)}),
          flush=True)
    return decode_rate


def run_epoch(vid, ann, device_put: bool) -> float:
    out = tempfile.mkdtemp(prefix=f"e2e_out_{int(device_put)}_")
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    r = subprocess.run(
        [sys.executable, "cli/online_train.py",
         "--cfg", "configs/resnet_ucf_itercluster_flow.yaml",
         "DATASET.VID_PATH", vid, "DATASET.ANNOTATION_PATH", ann,
         "DATASET.CHANNEL_EXTENSIONS", "",
         "DATASET.POS_CHANNEL_REPLACE", "False",
         "OUTPUT_PATH", out, "TRAIN.EPOCHS", "1",
         "TRAIN.BATCH_SIZE", str(B), "VAL.BATCH_SIZE", str(B),
         "TRAIN.NUM_DATA_WORKERS", "4",
         "TPU.HOST_RRC", "True",
         "TPU.PREFETCH_DEVICE_PUT", str(device_put),
         ], cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
    m = re.findall(r"\(([\d.]+) clips/s steady-state\)", r.stdout)
    rate = float(m[-1]) if m else -1.0
    print(json.dumps({"exp": f"e2e_{'on' if device_put else 'off'}",
                      "clips_per_s": rate, "rc": r.returncode}), flush=True)
    if r.returncode != 0:
        print(r.stdout[-1500:])
        print(r.stderr[-1500:])
    return rate


def main():
    tmp, vid, ann = build_dataset()
    print(json.dumps({"exp": "dataset", "root": vid}), flush=True)
    loader_and_upload_rates(vid, ann, tmp)
    off = run_epoch(vid, ann, False)
    on = run_epoch(vid, ann, True)
    print(json.dumps({"exp": "summary", "e2e_off": off, "e2e_on": on,
                      "speedup": round(on / off, 2) if off > 0 else None}),
          flush=True)


if __name__ == "__main__":
    main()
