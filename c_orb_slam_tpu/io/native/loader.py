"""ctypes wrapper for the native image loader, with build-on-first-use.

The reference links OpenCV for imread (reference: Examples/*/*.cc); here a
small C++ library (image_loader.cc: libpng/libjpeg/PNM decode + ordered
multithreaded prefetch) is compiled once with g++ and cached. PIL is the
pure-Python fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _build_dir() -> str:
    d = os.environ.get(
        "C_ORB_SLAM_TPU_NATIVE_DIR",
        os.path.expanduser("~/.cache/c_orb_slam_tpu_native"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> Optional[str]:
    src = os.path.join(_HERE, "image_loader.cc")
    out = os.path.join(_build_dir(), "libcosl_image.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        src, "-o", out, "-lpng", "-ljpeg", "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except Exception:
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    with _LIB_LOCK:
        if _LIB is not None or _LIB_TRIED:
            return _LIB
        _LIB_TRIED = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.cosl_decode_gray.restype = ctypes.c_int
        lib.cosl_decode_gray.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.cosl_prefetch_create.restype = ctypes.c_void_p
        lib.cosl_prefetch_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.cosl_prefetch_next.restype = ctypes.c_int
        lib.cosl_prefetch_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.cosl_prefetch_destroy.restype = None
        lib.cosl_prefetch_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def _decode_pil(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if img.mode not in ("L", "F", "I", "I;16"):
        img = img.convert("L")
    arr = np.asarray(img, dtype=np.float32)
    if arr.max() > 255.0:  # 16-bit gray
        arr = arr * (255.0 / 65535.0)
    return arr


def decode_gray(path: str, max_pixels: int = 1 << 24) -> np.ndarray:
    """Decode an image file to (H, W) float32 grayscale in [0, 255]."""
    lib = _get_lib()
    if lib is None:
        return _decode_pil(path)
    buf = np.empty(max_pixels, np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.cosl_decode_gray(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_pixels, ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        return _decode_pil(path)
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()


class Prefetcher:
    """Ordered lookahead decoder over a list of image paths.

    Iterating yields (index, (H, W) float32 gray) in order while C++ worker
    threads decode up to `ahead` frames in advance. Falls back to a
    synchronous PIL loop without the native library.
    """

    def __init__(self, paths: Sequence[str], n_threads: int = 3, ahead: int = 12,
                 max_pixels: int = 1 << 24):
        self.paths = [str(p) for p in paths]
        self.max_pixels = max_pixels
        self._lib = _get_lib()
        self._handle = None
        self._fallback_idx = 0
        if self._lib is not None and self.paths:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._paths_arr = arr  # keep alive
            self._handle = self._lib.cosl_prefetch_create(
                arr, len(self.paths), n_threads, ahead
            )

    def __iter__(self):
        return self

    def __next__(self):
        if self._handle is not None:
            buf = np.empty(self.max_pixels, np.float32)
            w = ctypes.c_int()
            h = ctypes.c_int()
            rc = self._lib.cosl_prefetch_next(
                self._handle,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.max_pixels, ctypes.byref(w), ctypes.byref(h),
            )
            if rc == -1:
                raise StopIteration
            if rc == -2:
                raise IOError("native decode failed mid-sequence")
            return rc, buf[: w.value * h.value].reshape(h.value, w.value).copy()
        if self._fallback_idx >= len(self.paths):
            raise StopIteration
        i = self._fallback_idx
        self._fallback_idx += 1
        return i, _decode_pil(self.paths[i])

    def close(self):
        if self._handle is not None:
            self._lib.cosl_prefetch_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
