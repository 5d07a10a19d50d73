"""Native (C++) IO runtime: image decode + ordered prefetch.

Build-on-first-use via g++; falls back to PIL when the toolchain or image
libraries are unavailable (loader.py)."""

from c_orb_slam_tpu.io.native.loader import (  # noqa: F401
    Prefetcher,
    decode_gray,
    native_available,
)
