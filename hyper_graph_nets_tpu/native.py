"""Loader for the native host-side kernels (native/hgn_native.c).

Compiles the C library on first use with the system compiler (cached next to
the package) and binds it via ctypes — no pybind11 dependency.  Every entry
point has a pure-numpy fallback, so the framework works without a toolchain;
call ``available()`` to check which path is active.
"""
from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "hgn_native.c",
)
_LIB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native_build")
_LIB = os.path.join(_LIB_DIR, "libhgn_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> Optional[str]:
    cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("clang")
    if cc is None or not os.path.exists(_SRC):
        return None
    os.makedirs(_LIB_DIR, exist_ok=True)
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    tmp = _LIB + f".tmp{os.getpid()}"
    cmd = [cc, "-O3", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return _LIB
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _compile()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.hgn_crc32c.restype = ctypes.c_uint32
        lib.hgn_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.hgn_csr_degrees.restype = ctypes.c_int32
        lib.hgn_csr_degrees.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.hgn_csr_fill.restype = None
        lib.hgn_csr_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def crc32c(data: bytes) -> Optional[int]:
    """Native CRC32C, or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    return int(lib.hgn_crc32c(data, len(data)))


def csr_from_receivers(
    receivers: np.ndarray,
    num_nodes: int,
    mask: Optional[np.ndarray] = None,
    min_degree: Optional[int] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native [N, d_max] neighbor matrix, or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    receivers = np.ascontiguousarray(receivers, np.int32)
    mask_arr = None if mask is None else np.ascontiguousarray(mask, np.float32)
    mask_ptr = 0 if mask_arr is None else mask_arr.ctypes.data
    degrees = np.zeros(num_nodes, np.int32)
    d_max = int(
        lib.hgn_csr_degrees(
            receivers.ctypes.data, len(receivers), mask_ptr, num_nodes,
            degrees.ctypes.data,
        )
    )
    d_max = max(d_max, 1)
    if min_degree is not None:
        d_max = max(d_max, min_degree)
    gather_idx = np.zeros((num_nodes, d_max), np.int32)
    gather_valid = np.zeros((num_nodes, d_max), np.float32)
    cursor = np.zeros(num_nodes, np.int32)
    lib.hgn_csr_fill(
        receivers.ctypes.data, len(receivers), mask_ptr, num_nodes, d_max,
        gather_idx.ctypes.data, gather_valid.ctypes.data, cursor.ctypes.data,
    )
    return gather_idx, gather_valid
