"""Build + ctypes bindings for the native host-IO library.

Compiles pcfm/native/ply_io.cpp to a shared object on first use (g++ -O3,
cached next to the source; analogous to the reference's
torch.utils.cpp_extension.load JIT build, functional/backend.py:6-23) and
exposes numpy-friendly wrappers.  All callers fall back to numpy when the
toolchain or library is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ply_io.cpp")
_LIB_PATH = os.path.join(_HERE, "libpcfm_io.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.isfile(_LIB_PATH) and \
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.pcfm_ply_parse_ascii.restype = ctypes.c_int64
            lib.pcfm_ply_parse_ascii.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
            lib.pcfm_subsample_gather.restype = None
            lib.pcfm_subsample_gather.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def parse_ascii_rows(body: bytes, ncols: int,
                     max_rows: int) -> Optional[np.ndarray]:
    """Parse whitespace rows of `ncols` floats from a PLY body.  Returns
    (rows, ncols) float32, or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((max_rows, ncols), np.float32)
    n = lib.pcfm_ply_parse_ascii(
        body, len(body), ncols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_rows)
    return out[:n]


def subsample_gather(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """out[k] = src[idx[k]] with threads; numpy fallback."""
    lib = get_lib()
    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    if lib is None:
        return src[idx]
    out = np.empty((idx.shape[0], src.shape[1]), np.float32)
    lib.pcfm_subsample_gather(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        src.shape[0], src.shape[1],
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        idx.shape[0], out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
