"""Round-5: host JPEG decode throughput — region decode vs full decode.

The native loader is the framework's per-step host bottleneck on real
TPU-VM hosts (PERF.md "decode vs transfer separated": transfer binds
only on this sandbox's tunnel; on PCIe hosts decode binds and scales
with cores). Round 5 adds REGION decoding: jpeg_crop_scanline restricts
columns to the sampling window (iMCU-aligned), jpeg_skip_scanlines
skips the rows above it, and decode aborts after the window's last row —
so a RandomResizedCrop pays post-entropy work only for the pixels it
resamples.

This is a host-only benchmark (no device): UCF-native 320x240 q87
JPEGs, T=16 clips, three protocols x {old, new} decoder (the old source
is taken from git history and compiled side-by-side, so the comparison
is same-host same-flags):

    plain  full-frame resize to 256 (train path without HOST_RRC)
    eval   short-edge resize + center crop 256 (embed/eval path)
    rrc    RandomResizedCrop window -> 128 (TPU.HOST_RRC train path),
           reference crop distribution (scale 0.25-1 of area)

Usage: python perf_experiments/decode_bench_r5.py [--frames 480]
       [--old-rev <rev>]   (default: the last rev before the region
                            decoder, auto-detected)
"""

import argparse
import ctypes
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_REL = "video_similarity_search_tpu/native/vss_loader.cpp"


def make_jpegs(root, n, h=240, w=320, quality=87, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    paths = []
    base = rng.integers(0, 255, size=(h, w, 3))
    for i in range(n):
        noise = rng.integers(-25, 26, size=(h, w, 3))
        img = np.clip(base + noise, 0, 255).astype(np.uint8)
        p = os.path.join(root, f"f{i:05d}.jpg")
        Image.fromarray(img).save(p, quality=quality)
        paths.append(p)
    return paths


def build(src_path, out_so):
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-march=native",
           "-o", out_so, src_path, "-ljpeg", "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)
    return out_so


def bind(so):
    lib = ctypes.CDLL(so)
    lib.vss_decode_frames.restype = ctypes.c_int
    lib.vss_decode_frames.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
    lib.vss_decode_frames_rrc.restype = ctypes.c_int
    lib.vss_decode_frames_rrc.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
    return lib


def c_paths(paths):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def bench(lib, paths, protocol, out_size, reps=3, seed=1):
    """frames/s, best of reps; rrc uses reference-distribution crops
    (scale 0.25-1 of area, ratio 3/4-4/3), clip-consistent per 16."""
    rng = np.random.default_rng(seed)
    n = len(paths)
    arr = c_paths(paths)
    out = np.empty((n, out_size, out_size, 3), np.uint8)
    optr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    best = float("inf")
    h, w = 240.0, 320.0
    for _ in range(reps):
        t0 = time.perf_counter()
        if protocol == "rrc":
            for i in range(0, n, 16):
                m = min(16, n - i)
                for _try in range(10):
                    area = rng.uniform(0.25, 1.0) * h * w
                    ratio = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
                    cw = np.sqrt(area * ratio)
                    ch = np.sqrt(area / ratio)
                    if cw <= w and ch <= h:
                        break
                else:
                    ch, cw = h, h
                top = rng.uniform(0, h - ch)
                left = rng.uniform(0, w - cw)
                sub = (ctypes.c_char_p * m)()
                sub[:] = [paths[i + j].encode() for j in range(m)]
                so = out[i:i + m]
                rc = lib.vss_decode_frames_rrc(
                    sub, m, top, left, ch, cw, h, w, out_size,
                    so.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), 1)
                assert rc == 0, rc
        else:
            rc = lib.vss_decode_frames(arr, n, out_size,
                                       1 if protocol == "eval" else 0,
                                       optr, 1)
            assert rc == 0, rc
        best = min(best, time.perf_counter() - t0)
    return n / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=480)
    ap.add_argument("--old-rev", default="")
    args = ap.parse_args()

    old_rev = args.old_rev
    if not old_rev:
        # last revision that still shipped the full-frame decoder
        log = subprocess.run(
            ["git", "log", "--format=%H", "-S", "jpeg_crop_scanline",
             "--", SRC_REL], cwd=REPO, capture_output=True, text=True)
        first_region_rev = log.stdout.split()[-1] if log.stdout.split() \
            else "HEAD"
        old_rev = f"{first_region_rev}~1"

    tmp = tempfile.mkdtemp(prefix="decode_bench_")
    paths = make_jpegs(tmp, args.frames)

    libs = {}
    new_src = os.path.join(REPO, SRC_REL)
    libs["new"] = bind(build(new_src, os.path.join(tmp, "new.so")))
    show = subprocess.run(["git", "show", f"{old_rev}:{SRC_REL}"],
                          cwd=REPO, capture_output=True, text=True)
    if show.returncode == 0:
        old_src = os.path.join(tmp, "old.cpp")
        with open(old_src, "w") as f:
            f.write(show.stdout)
        libs["old"] = bind(build(old_src, os.path.join(tmp, "old.so")))
    else:
        print(f"note: old rev {old_rev} not found; new-only run")

    results = {}
    for proto, size in (("plain", 256), ("eval", 256), ("rrc", 128)):
        for name, lib in libs.items():
            fps = bench(lib, paths, proto, size)
            results[f"{proto}_{name}_fps"] = round(fps, 1)
        if "old" in libs:
            results[f"{proto}_speedup"] = round(
                results[f"{proto}_new_fps"] / results[f"{proto}_old_fps"],
                3)
    # numeric parity old vs new on a fixed RRC window and on eval
    if "old" in libs:
        for proto, size, wargs in (
                ("rrc", 128, (30.0, 40.0, 150.0, 200.0, 240.0, 320.0)),
                ("eval", 256, None)):
            a = np.empty((8, size, size, 3), np.uint8)
            b = np.empty((8, size, size, 3), np.uint8)
            sub = c_paths(paths[:8])
            for name, dst in (("new", a), ("old", b)):
                ptr = dst.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
                if proto == "rrc":
                    rc = libs[name].vss_decode_frames_rrc(
                        sub, 8, *wargs, size, ptr, 1)
                else:
                    rc = libs[name].vss_decode_frames(sub, 8, size, 1,
                                                      ptr, 1)
                assert rc == 0
            diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
            results[f"{proto}_parity_maxdiff"] = int(diff.max())
            results[f"{proto}_parity_meandiff"] = round(float(diff.mean()),
                                                        4)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
