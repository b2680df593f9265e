"""ctypes bindings to the native (C++) frame decoder.

Builds native/frame_decode.cpp on first use (g++, libpng/libjpeg/zlib) and
caches the shared object next to the source. Every entry point degrades
gracefully: `available()` is False when the toolchain or libraries are
missing and callers fall back to the PIL path.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_REPO = Path(__file__).resolve().parents[2]
_SRC = _REPO / "native" / "frame_decode.cpp"
_SO = _REPO / "native" / "_frame_decode.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO),
        "-lpng", "-ljpeg", "-lz",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        print(f"[native] frame decoder build failed ({e}); "
              "falling back to PIL decode")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError as e:
            print(f"[native] load failed: {e}")
            return None
        fp = ctypes.POINTER(ctypes.c_float)
        lib.fd_decode_rgb.argtypes = [ctypes.c_char_p, fp, ctypes.c_int,
                                      ctypes.c_int]
        lib.fd_decode_rgb.restype = ctypes.c_int
        lib.fd_decode_depth16.argtypes = [ctypes.c_char_p, fp, ctypes.c_int,
                                          ctypes.c_int, ctypes.c_float]
        lib.fd_decode_depth16.restype = ctypes.c_int
        ip = ctypes.POINTER(ctypes.c_int)
        lib.fd_probe.argtypes = [ctypes.c_char_p, ip, ip, ip, ip]
        lib.fd_probe.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def probe(path: str):
    """(w, h, channels, bit_depth) or None."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    b = ctypes.c_int()
    rc = lib.fd_probe(str(path).encode(), ctypes.byref(w), ctypes.byref(h),
                      ctypes.byref(c), ctypes.byref(b))
    if rc != 0:
        return None
    return w.value, h.value, c.value, b.value


def decode_rgb(path: str, h: int, w: int) -> Optional[np.ndarray]:
    """(3, h, w) float32 in [0,1], or None on any failure."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((3, h, w), np.float32)
    rc = lib.fd_decode_rgb(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
    )
    return out if rc == 0 else None


def decode_depth(path: str, h: int, w: int, scale: float) -> Optional[np.ndarray]:
    """(h, w) float32 depth in meters (PNG value / scale), or None."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((h, w), np.float32)
    rc = lib.fd_decode_depth16(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        ctypes.c_float(scale),
    )
    return out if rc == 0 else None
