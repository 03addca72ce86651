"""ctypes bindings for the native C++ frame loader (``native/loader.cpp``).

The native layer provides a zlib-only PNG decoder and a multi-threaded
prefetching loader so host-side decode overlaps device compute.  The shared
library is built on demand with ``make`` (g++ + zlib, both baked into the
image); when unavailable, callers fall back to ``tum.load_grayscale_png``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libnmloader.so")
_lock = threading.Lock()
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.nm_png_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.nm_png_info.restype = ctypes.c_int
        lib.nm_png_read_gray.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.nm_png_read_gray.restype = ctypes.c_int
        lib.nm_png_read_raw16.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint16),
        ]
        lib.nm_png_read_raw16.restype = ctypes.c_int
        lib.nm_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.nm_loader_create.restype = ctypes.c_void_p
        lib.nm_loader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.nm_loader_next.restype = ctypes.c_int
        lib.nm_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.nm_loader_destroy.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def png_info(path: str):
    """(width, height, channels, bitdepth) of a PNG, or None on failure."""
    lib = load_library()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    b = ctypes.c_int()
    if lib.nm_png_info(path.encode(), w, h, c, b) != 0:
        return None
    return w.value, h.value, c.value, b.value


def read_gray(path: str) -> np.ndarray:
    """Decode a PNG to float32 grayscale (reference 0.21/0.72/0.07 weights)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    info = png_info(path)
    if info is None:
        raise ValueError(f"bad PNG: {path}")
    w, h, _, _ = info
    out = np.empty((h, w), np.float32)
    rc = lib.nm_png_read_gray(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    if rc != 0:
        raise ValueError(f"decode failed: {path}")
    return out


def read_depth16(path: str) -> np.ndarray:
    """Decode a 16-bit grayscale PNG (TUM depth maps) to uint16 (H, W)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    info = png_info(path)
    if info is None:
        raise ValueError(f"bad PNG: {path}")
    w, h, c, b = info
    if c != 1 or b != 16:
        raise ValueError(f"not 16-bit grayscale: {path}")
    out = np.empty((h, w), np.uint16)
    rc = lib.nm_png_read_raw16(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
    )
    if rc != 0:
        raise ValueError(f"decode failed: {path}")
    return out


class PrefetchLoader:
    """Multi-threaded native frame prefetcher over a path list.

    Iterates float32 grayscale frames in order while worker threads decode
    ahead — the host-side analogue of the reference's stream overlap."""

    def __init__(self, paths, threads: int = 4):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.nm_loader_create(arr, len(self._paths), threads)
        info = png_info(paths[0]) if paths else None
        self._shape = (info[1], info[0]) if info else (0, 0)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        h, w = self._shape
        # Flat buffer: the native side writes hi*wi floats contiguously, so
        # the reshape must use the RETURNED dims (a strided (h, w) view
        # would scramble rows of any frame smaller than the first).
        out = np.empty(h * w, np.float32)
        wi = ctypes.c_int()
        hi = ctypes.c_int()
        rc = self._lib.nm_loader_next(
            self._handle,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.size,
            wi,
            hi,
        )
        if rc == -1:
            raise StopIteration
        if rc == -2:
            raise ValueError("decode failed in prefetch loader")
        if rc == -3:
            raise ValueError("frame larger than first frame; use uniform sizes")
        return out[: hi.value * wi.value].reshape(hi.value, wi.value)

    def close(self):
        if self._handle:
            self._lib.nm_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
