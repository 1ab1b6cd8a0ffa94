"""ctypes bindings + build for the native C++ data-loading core.

The reference's runtime-native layer is CUDA (the MSDA op) plus torch's
C++ DataLoader workers; here the device-side op is Pallas and THIS module
is the host-side native runtime: libjpeg/libpng decode, bilinear resize,
normalize+pad, and a threaded prefetch loader (dataloader.cpp).

Gated: `available()` is False if the toolchain/libs are missing; callers
fall back to the cv2 path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dataloader.cpp")
_SO = os.path.join(_DIR, "libsdt_dataloader.so")
_lib = None
_lock = threading.Lock()


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _SO, "-ljpeg", "-lpng", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        stale = not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        if stale:
            if not _build():
                _lib = False
                return _lib
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _lib = False
            return _lib
        lib.sdt_decode_jpeg.restype = ctypes.c_int
        lib.sdt_decode_png.restype = ctypes.c_int
        lib.sdt_loader_create.restype = ctypes.c_void_p
        lib.sdt_loader_create.argtypes = [ctypes.c_int, ctypes.c_long]
        lib.sdt_loader_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int]
        lib.sdt_loader_next.restype = ctypes.c_int
        lib.sdt_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.sdt_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return bool(_load())


MAX_PIXELS = 4096 * 4096


_decode_buf = threading.local()


def decode_image(data: bytes) -> Optional[np.ndarray]:
    """Decode JPEG/PNG bytes -> (H, W, 3) uint8 RGB, or None on failure."""
    lib = _load()
    if not lib:
        return None
    # reusable per-thread output buffer: a fresh 48 MiB np.empty per
    # decode was pure allocator churn on the hot path
    out = getattr(_decode_buf, "buf", None)
    if out is None:
        out = np.empty(MAX_PIXELS * 3, np.uint8)
        _decode_buf.buf = out
    h = ctypes.c_int()
    w = ctypes.c_int()
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    rc = lib.sdt_decode_jpeg(buf, len(data),
                             out.ctypes.data_as(ctypes.POINTER(
                                 ctypes.c_uint8)),
                             MAX_PIXELS, ctypes.byref(h), ctypes.byref(w))
    if rc:
        rc = lib.sdt_decode_png(buf, len(data),
                                out.ctypes.data_as(ctypes.POINTER(
                                    ctypes.c_uint8)),
                                MAX_PIXELS, ctypes.byref(h),
                                ctypes.byref(w))
    if rc:
        return None
    return out[:h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def resize_bilinear(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    assert lib, "native loader unavailable"
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((dh, dw, 3), np.uint8)
    lib.sdt_resize_bilinear(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw)
    return out


def normalize_pad(img: np.ndarray, bucket: Tuple[int, int],
                  mean: Sequence[float], std: Sequence[float]
                  ) -> np.ndarray:
    lib = _load()
    assert lib, "native loader unavailable"
    img = np.ascontiguousarray(img, np.uint8)
    bh, bw = bucket
    out = np.empty((bh, bw, 3), np.float32)
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    lib.sdt_normalize_pad(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), bh, bw,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


class PrefetchLoader:
    """Threaded read+decode+resize prefetcher over image paths."""

    def __init__(self, n_threads: int = 4, max_pixels: int = MAX_PIXELS):
        lib = _load()
        assert lib, "native loader unavailable"
        self._lib = lib
        self._max_pixels = max_pixels
        self._handle = lib.sdt_loader_create(n_threads, max_pixels)
        self._buf = np.empty(max_pixels * 3, np.uint8)

    def submit(self, index: int, path: str, target_hw=None):
        th, tw = target_hw if target_hw else (0, 0)
        self._lib.sdt_loader_submit(self._handle, index,
                                    path.encode(), th, tw)

    def next(self):
        """Blocks; returns (index, (H, W, 3) uint8) or (index, None)."""
        idx = ctypes.c_long()
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = self._lib.sdt_loader_next(
            self._handle, ctypes.byref(idx),
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(h), ctypes.byref(w))
        if rc:
            return int(idx.value), None
        img = self._buf[:h.value * w.value * 3].reshape(
            h.value, w.value, 3).copy()
        return int(idx.value), img

    def close(self):
        if self._handle:
            self._lib.sdt_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
