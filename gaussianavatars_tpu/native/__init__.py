"""Native (C++) runtime components.

`imgio`: libpng/libjpeg image decoding + CHW float compositing with the
GIL released — the data-loader equivalent of the reference's native
(CUDA/C++) runtime pieces, built for host-thread parallelism feeding the
TPU. The loader falls back to PIL transparently when the shared library
is missing and cannot be built (no compiler).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libimgio.so")
_LOCK = threading.Lock()
_LIB = [None]   # [None]=untried, [False]=unavailable, [ctypes lib]=ready


def _load():
    with _LOCK:
        if _LIB[0] is None:
            lib = None
            try:
                if not os.path.exists(_LIB_PATH):
                    subprocess.run(
                        ["make", "-C", _DIR, "-s"],
                        check=True, capture_output=True, timeout=120,
                    )
                lib = ctypes.CDLL(_LIB_PATH)
                lib.imgio_probe.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int)]
                lib.imgio_probe.restype = ctypes.c_int
                lib.imgio_decode.argtypes = [ctypes.c_char_p,
                                             ctypes.c_void_p]
                lib.imgio_decode.restype = ctypes.c_int
                lib.imgio_to_chw_f32.argtypes = [
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
                lib.imgio_to_chw_f32.restype = None
            except Exception:
                lib = False
            _LIB[0] = lib
    return _LIB[0]


def available() -> bool:
    return bool(_load())


def decode(path: str):
    """Decode PNG/JPEG -> (uint8 [H, W, C] array) or None on fallback."""
    lib = _load()
    if not lib:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    p = path.encode()
    if lib.imgio_probe(p, ctypes.byref(w), ctypes.byref(h),
                       ctypes.byref(c)):
        return None
    out = np.empty((h.value, w.value, c.value), np.uint8)
    if lib.imgio_decode(p, out.ctypes.data_as(ctypes.c_void_p)):
        return None
    return out


def to_chw_f32(img_u8: np.ndarray, bg: np.ndarray) -> np.ndarray:
    """uint8 [H, W, C] + bg [3] -> composited float32 [3, H, W]."""
    lib = _load()
    h, w, c = img_u8.shape
    if not lib:
        arr = img_u8.astype(np.float32) / 255.0
        if c == 1:
            arr = arr.repeat(3, axis=-1)
        if arr.shape[-1] == 4 or arr.shape[-1] == 2:
            rgb = arr[..., :-1] if arr.shape[-1] == 4 else \
                arr[..., :1].repeat(3, axis=-1)
            alpha = arr[..., -1:]
            arr = rgb * alpha + bg[None, None, :] * (1.0 - alpha)
        return np.transpose(arr[..., :3], (2, 0, 1)).copy()
    img_u8 = np.ascontiguousarray(img_u8)
    bg32 = np.ascontiguousarray(bg, np.float32)
    out = np.empty((3, h, w), np.float32)
    lib.imgio_to_chw_f32(
        img_u8.ctypes.data_as(ctypes.c_void_p), h, w, c,
        bg32.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p))
    return out
