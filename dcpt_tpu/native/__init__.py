"""Native host-runtime kernels (C++, ctypes-loaded) for the data path.

Compiled on first use with g++ (cached next to the source); every entry point
has a numpy fallback so the framework works without a toolchain.  See
``pack_kernels.cpp`` for rationale — this is the TPU framework's analog of the
reference's native layer, relocated from device compute (CUDA) to the host
data path where TPU systems actually need native code.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pack_kernels.cpp")
_LIB_PATH = os.path.join(_HERE, "libpack_kernels.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB_PATH)) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.u8_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        lib.f32_normalize.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.f32_to_u8_bgr.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        _lib = lib
    except Exception:  # noqa: BLE001 — toolchain missing: numpy fallback
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def u8_to_f32(img: np.ndarray, swap_rb: bool = True, out: np.ndarray | None = None) -> np.ndarray:
    """uint8 HWC → float32 HWC in [0,1], optional BGR↔RGB swap, one fused pass."""
    assert img.dtype == np.uint8 and img.ndim == 3
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    if out is None:
        out = np.empty((h, w, c), np.float32)
    lib = _load()
    if lib is None:
        tmp = img[:, :, ::-1] if (swap_rb and c == 3) else img
        np.multiply(tmp, np.float32(1 / 255), out=out, casting="unsafe")
        return out
    lib.u8_to_f32(img.ctypes.data, out.ctypes.data, h, w, c, int(swap_rb))
    return out


def f32_normalize(img: np.ndarray, mean, std, out: np.ndarray | None = None) -> np.ndarray:
    """(img − mean) / std over HWC float32, fused."""
    assert img.dtype == np.float32 and img.ndim == 3
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    mean = np.ascontiguousarray(np.broadcast_to(np.asarray(mean, np.float32), (c,)))
    inv_std = np.ascontiguousarray(1.0 / np.broadcast_to(np.asarray(std, np.float32), (c,)))
    if out is None:
        out = np.empty_like(img)
    lib = _load()
    if lib is None:
        np.multiply(img - mean, inv_std, out=out)
        return out
    lib.f32_normalize(img.ctypes.data, out.ctypes.data, h, w, c, mean.ctypes.data, inv_std.ctypes.data)
    return out


def f32_to_u8_bgr(img: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
    """float32 [0,1] HWC RGB → uint8 HWC BGR (image-save hot path), fused."""
    assert img.dtype == np.float32 and img.ndim == 3
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    if out is None:
        out = np.empty((h, w, c), np.uint8)
    lib = _load()
    if lib is None:
        tmp = np.clip(img[:, :, ::-1] if c == 3 else img, 0, 1)
        out[:] = (tmp * 255.0 + 0.5).astype(np.uint8)
        return out
    lib.f32_to_u8_bgr(img.ctypes.data, out.ctypes.data, h, w, c)
    return out
