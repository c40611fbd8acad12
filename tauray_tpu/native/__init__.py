"""ctypes loader for the native host-runtime accelerators.

The reference keeps its host runtime in C++ (reference: src/*.cc); this
package is the TPU build's equivalent: `tauray_native.cpp` holds the
host-side hot loops (EXR PIZ Huffman decode, Morton ordering for the
cluster-tracer build), compiled on first import with the system g++ and
loaded via ctypes. Callers fall back to the pure-Python implementations
when the toolchain or the library is unavailable, so the native module
is an accelerator, never a requirement.

Set TAURAY_NATIVE=0 to force the Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "tauray_native.cpp")
_LIB = os.path.join(_DIR, "libtauray_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        res = subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB + ".tmp"],
            capture_output=True, timeout=120)
        if res.returncode != 0:
            return False
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Returns the loaded library, building it if needed; None if the
    native path is unavailable or disabled."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("TAURAY_NATIVE", "1") == "0":
        return None
    try:
        stale = (not os.path.exists(_LIB) or
                 os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
        if stale and not _build():
            return None
        lib = ctypes.CDLL(_LIB)
        lib.tr_huf_decode.restype = ctypes.c_int64
        lib.tr_huf_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64]
        lib.tr_morton_order.restype = None
        lib.tr_morton_order.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def huf_decode(data: bytes, nbits: int, hcode: np.ndarray, rlc: int,
               n_out: int) -> Optional[np.ndarray]:
    """Native ImfHuf decode; returns None when unavailable (caller falls
    back to io/exr._huf_decode). Raises ValueError on malformed input."""
    lib = get_lib()
    if lib is None:
        return None
    hc = np.ascontiguousarray(hcode, dtype=np.int64)
    out = np.zeros(n_out, dtype=np.uint16)
    rc = lib.tr_huf_decode(
        data, nbits, hc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        0, hc.size - 1, rlc,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), n_out)
    if rc != 0:
        raise ValueError(f"EXR: native Huffman decode failed ({rc})")
    return out


def morton_order(centroids: np.ndarray,
                 valid: np.ndarray) -> Optional[np.ndarray]:
    """Native Morton-order argsort of (N, 3) float32 centroids with
    invalid entries last; None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    c = np.ascontiguousarray(centroids, dtype=np.float32)
    v = np.ascontiguousarray(valid, dtype=np.uint8)
    out = np.zeros(c.shape[0], dtype=np.int64)
    lib.tr_morton_order(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        c.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out
