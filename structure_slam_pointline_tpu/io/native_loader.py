"""ctypes bindings for the native C++ data-loading runtime (native/sspl_io.cc).

The native side owns PNG/PNM decoding and an N-slot, multi-threaded
prefetch ring so frame decode overlaps the device pipeline — the
TPU-native equivalent of the reference driver's synchronous cv::imread
loop (Examples/Structure-SLAM.cc:50-90). Falls back to PIL when the
shared library is absent (it is built on demand with `make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsspl_io.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sspl_load_image.restype = ctypes.c_int
    lib.sspl_load_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.sspl_prefetch_start.restype = ctypes.c_void_p
    lib.sspl_prefetch_start.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.sspl_prefetch_next.restype = ctypes.c_int
    lib.sspl_prefetch_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.sspl_prefetch_stop.restype = None
    lib.sspl_prefetch_stop.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


MAX_PIXELS = 4096 * 3072


def load_image(path: str) -> np.ndarray:
    """float32 [H, W] grayscale in [0, 255] via the native decoder
    (PIL fallback)."""
    lib = get_lib()
    if lib is None:
        from structure_slam_pointline_tpu.io.datasets import load_image_grayscale

        return load_image_grayscale(path)
    buf = np.empty(MAX_PIXELS, np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.sspl_load_image(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        MAX_PIXELS, ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()


class PrefetchingLoader:
    """Background-threaded, order-preserving frame stream."""

    def __init__(self, paths: List[str], n_threads: int = 2, ring: int = 8):
        self.paths = paths
        self._lib = get_lib()
        self._handle = None
        self._idx = 0
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
            self._paths_keepalive = arr
            self._handle = self._lib.sspl_prefetch_start(arr, len(paths), n_threads, ring)

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray]]:
        if self._handle is None:  # PIL fallback, synchronous
            from structure_slam_pointline_tpu.io.datasets import load_image_grayscale

            for i, p in enumerate(self.paths):
                yield i, load_image_grayscale(p)
            return
        buf = np.empty(MAX_PIXELS, np.float32)
        w = ctypes.c_int()
        h = ctypes.c_int()
        while True:
            rc = self._lib.sspl_prefetch_next(
                self._handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                MAX_PIXELS, ctypes.byref(w), ctypes.byref(h),
            )
            if rc == -1:
                break
            if rc == -2:
                raise IOError(f"native decode failed at frame {self._idx}")
            yield rc, buf[: w.value * h.value].reshape(h.value, w.value).copy()
            self._idx += 1

    def close(self) -> None:
        if self._handle is not None and self._lib is not None:
            self._lib.sspl_prefetch_stop(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


__all__ = ["get_lib", "load_image", "PrefetchingLoader"]
