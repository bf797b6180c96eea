"""Native (C++) components: threaded image decode + prefetch.

The shared library is built on demand with g++ (libjpeg/libpng); if the
toolchain or libraries are unavailable the framework transparently falls back
to the Python/cv2 path (``fosvos_tpu.data.loader``).
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).parent
_SO = _DIR / 'libfastloader.so'
_lib = None
_build_error: Optional[str] = None


def build(force: bool = False) -> bool:
    """Compile libfastloader.so. Returns True on success. Rebuilds
    automatically when the source is newer than the library."""
    global _build_error
    if _SO.exists() and not force:
        src = _DIR / 'fastloader.cpp'
        if _SO.stat().st_mtime >= src.stat().st_mtime:
            return True
    cmd = ['g++', '-O2', '-shared', '-fPIC', '-std=c++17',
           str(_DIR / 'fastloader.cpp'), '-o', str(_SO),
           '-ljpeg', '-lpng', '-lpthread']
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        _build_error = str(e)
        return False
    if proc.returncode != 0:
        _build_error = proc.stderr
        return False
    return True


def load_library() -> Optional[ctypes.CDLL]:
    """Build (if needed) and dlopen the native library; None on failure."""
    global _lib
    if _lib is not None:
        return _lib
    if not build():
        return None
    lib = ctypes.CDLL(str(_SO))
    lib.fl_create.restype = ctypes.c_void_p
    lib.fl_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float]
    lib.fl_create_mode.restype = ctypes.c_void_p
    lib.fl_create_mode.argtypes = lib.fl_create.argtypes + [ctypes.c_int]
    lib.fl_next.restype = ctypes.c_int
    lib.fl_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float),
                            ctypes.POINTER(ctypes.c_float),
                            ctypes.c_int, ctypes.c_int]
    lib.fl_next_raw.restype = ctypes.c_int
    lib.fl_next_raw.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_uint8),
                                ctypes.POINTER(ctypes.c_uint8),
                                ctypes.c_int, ctypes.c_int]
    lib.fl_destroy.argtypes = [ctypes.c_void_p]
    lib.fl_probe_size.restype = ctypes.c_int
    lib.fl_probe_size.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
    lib.fl_write_masks.restype = ctypes.c_int
    lib.fl_write_masks.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib


def build_error() -> Optional[str]:
    return _build_error


def write_masks(paths, masks, n_threads: int = 0) -> Optional[int]:
    """Threaded PNG encode+write of (n, h, w) uint8 masks to ``paths``.

    Returns the number written, or None when the native library is
    unavailable (callers fall back to cv2). Encoding matches cv2.imwrite's
    default (grayscale 8-bit, compression level 1).
    """
    import numpy as np
    lib = load_library()
    if lib is None:
        return None
    arr = np.ascontiguousarray(masks, dtype=np.uint8)
    n, h, w = arr.shape
    if n == 0:
        return 0
    c_paths = (ctypes.c_char_p * n)(
        *[str(p).encode() for p in paths])
    return lib.fl_write_masks(
        c_paths, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, n_threads)
