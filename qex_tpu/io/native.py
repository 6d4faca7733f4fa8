"""ctypes binding for the native DML-checksum codec.

Builds qex_tpu/io/native/dml_crc.cpp on first use (g++, no external
deps) and falls back to the pure-Python zlib path when a compiler is
unavailable.  This is the framework's native-code I/O runtime analog of
the QIO C library the reference links against (SURVEY.md §2.12).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native", "dml_crc.cpp")
_SO = os.path.join(_DIR, "native", "libdmlcrc.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            lib.dml_checksum.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
                ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32)]
            lib.site_crc32.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint32)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def dml_checksum_native(site_bytes: np.ndarray, rank0: int = 0):
    """(suma, sumb) of (V, bytes_per_site) uint8 payload, or None when
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(site_bytes, dtype=np.uint8)
    out = (ctypes.c_uint32 * 2)()
    lib.dml_checksum(data.ctypes.data_as(ctypes.c_void_p),
                     ctypes.c_uint64(data.shape[0]),
                     ctypes.c_uint64(data.shape[1]),
                     ctypes.c_uint64(rank0), out)
    return int(out[0]), int(out[1])
