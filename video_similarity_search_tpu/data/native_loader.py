"""ctypes binding for the native C++ batched JPEG clip decoder.

Builds ``native/vss_loader.cpp`` on first use (g++ -O3 -shared, links
libjpeg) and exposes :func:`decode_frames`. The native path is optional:
:func:`available` gates every call site and the PIL/cv2 pipeline remains
the fallback (and the only path for HDF5/flow/mask channels). Disable with
``VSS_NATIVE_LOADER=0``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "vss_loader.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libvss_loader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


_ABI_VERSION = 4  # must match vss_loader_version() in vss_loader.cpp


def _build() -> bool:
    # Build to a temp path and rename over _LIB: the rename swaps the
    # directory entry to a NEW inode, so a stale .so that is still
    # dlopen'd in this process keeps its (old-inode) mapping intact —
    # writing _LIB in place would truncate the mapped file and leave the
    # old CDLL handle backed by inconsistent pages.
    tmp = _LIB + f".build.{os.getpid()}"
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp,
            _SRC, "-ljpeg", "-lpthread"]
    # -march=native vectorizes the fixed-point resize; the .so is always
    # (re)built on the host that runs it, so native tuning is safe — but
    # fall back to the portable build if the toolchain rejects it (or the
    # tuned compile times out on a loaded host)
    for cmd in ([*base[:2], "-march=native", *base[2:]], base):
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=180)
        except (OSError, subprocess.TimeoutExpired):
            continue
        if proc.returncode == 0 and os.path.exists(tmp):
            os.replace(tmp, _LIB)
            return True
    try:
        os.unlink(tmp)
    except OSError:
        pass
    return False


def _bind(lib: ctypes.CDLL) -> Optional[ctypes.CDLL]:
    """Resolve + type the C entry points; None for a stale/foreign .so
    (missing symbol or ABI-version mismatch — e.g. a round-2 build whose
    mtime survived a timestamp-preserving copy)."""
    try:
        if lib.vss_loader_version() != _ABI_VERSION:
            return None
        lib.vss_decode_frames.restype = ctypes.c_int
        lib.vss_decode_frames.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ]
        lib.vss_decode_frames_rrc.restype = ctypes.c_int
        lib.vss_decode_frames_rrc.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ]
    except AttributeError:
        return None
    return lib


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("VSS_NATIVE_LOADER", "1") == "0":
            return None
        try:
            if not os.path.exists(_LIB) or (
                    os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                if not _build():
                    return None
            _lib = _bind(ctypes.CDLL(_LIB))
            if _lib is None and _build():  # stale ABI: rebuild once
                _lib = _bind(ctypes.CDLL(_LIB))
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def decode_frames(paths: List[str], out_size: int, eval_mode: bool,
                  n_threads: int = 4) -> np.ndarray:
    """Decode JPEG ``paths`` -> (T, out_size, out_size, 3) uint8.

    Raises ``RuntimeError`` on any decode failure (caller falls back to
    the PIL path).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, out_size, out_size, 3), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.vss_decode_frames(
        c_paths, n, out_size, int(eval_mode),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), n_threads)
    if rc != 0:
        raise RuntimeError(f"native decode failed for {paths[-rc - 1]!r}")
    return out


def decode_frames_rrc(paths: List[str], top: float, left: float,
                      crop_h: float, crop_w: float, out_size: int,
                      box_h: float = -1.0, box_w: float = -1.0,
                      n_threads: int = 4) -> np.ndarray:
    """Decode JPEG ``paths`` with a clip-consistent RandomResizedCrop
    window -> (T, out_size, out_size, 3) uint8.

    The window coordinates live in the ``(box_h, box_w)`` frame the box
    was sampled from (pass -1 when they are already in each frame's own
    pixel coordinates); the decoder rescales the box per frame, so clips
    whose frames are stored at mixed resolutions crop the SAME relative
    window as the cv2 fallback. One GIL-free C call per clip: the
    crop+resize happens inside the decode (DCT-scaled when the window
    allows), so the host never materializes the full-size frame buffer —
    4x fewer output bytes than decoding to the 2x train buffer and
    cropping on device."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, out_size, out_size, 3), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.vss_decode_frames_rrc(
        c_paths, n, float(top), float(left), float(crop_h), float(crop_w),
        float(box_h), float(box_w), out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), n_threads)
    if rc != 0:
        raise RuntimeError(f"native rrc decode failed for {paths[-rc - 1]!r}")
    return out
