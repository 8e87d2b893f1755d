"""Native host runtime (C, loaded via ctypes).

Builds runtime/native.c on first use (cc -O3 -shared -lz) and exposes the
tone-map / PNG-encode / progressive-accumulate entry points. Falls back to
None when no compiler is available; utils/image.py then uses its pure-Python
implementations with identical pixel math.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native.c")
_SO = os.path.join(_DIR, "_native.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["cc", "-O3", "-march=native", "-fPIC", "-shared", _SRC, "-o", _SO, "-lz", "-lm"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load():
    """Return the ctypes library, building it if needed; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.kajo_tonemap.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.kajo_encode_png.restype = ctypes.c_int64
    lib.kajo_encode_png.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.kajo_accumulate.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def tonemap(radiance: np.ndarray) -> np.ndarray | None:
    """Native clamp+gamma+pack; None if the native lib is unavailable."""
    lib = load()
    if lib is None:
        return None
    rgba = np.ascontiguousarray(radiance, np.float32)
    n = rgba.size // 4
    out = np.empty(rgba.shape[:-1] + (4,), np.uint8)
    lib.kajo_tonemap(_fptr(rgba), n, _u8ptr(out))
    return out


def encode_png(rgba8: np.ndarray) -> bytes | None:
    lib = load()
    if lib is None:
        return None
    h, w, _ = rgba8.shape
    rgba8 = np.ascontiguousarray(rgba8)
    cap = rgba8.size + (rgba8.size >> 1) + 4096
    out = np.empty(cap, np.uint8)
    size = lib.kajo_encode_png(_u8ptr(rgba8), w, h, _u8ptr(out), cap)
    if size < 0:
        return None
    return out[:size].tobytes()


def accumulate(total: np.ndarray, pass_img: np.ndarray, passes: int) -> np.ndarray | None:
    """total += pass_img in place; returns the tone-mapped display or None."""
    lib = load()
    if lib is None:
        return None
    assert total.dtype == np.float32 and total.flags["C_CONTIGUOUS"]
    pass_c = np.ascontiguousarray(pass_img, np.float32)
    n = total.size // 4
    display = np.empty(total.shape[:-1] + (4,), np.uint8)
    lib.kajo_accumulate(_fptr(total), _fptr(pass_c), n, 1.0 / passes, _u8ptr(display))
    return display
