"""Native (C++) components: build + ctypes bindings.

The MPS tokenizer/parser (mps_parser.cpp) is the framework's host-side IO
hot path for Netlib-scale inputs.  It is compiled lazily with g++ into a
shared library cached next to the source; every consumer must handle
``load_mps_lib() is None`` (no toolchain) by falling back to the pure-Python
parser — identical semantics by construction, since the C++ side only
tokenizes and the semantic post-processing lives in ipx/problem/mps.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mps_parser.cpp")
_LIB = os.path.join(_DIR, "_ipx_mps.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def load_mps_lib():
    """Return the ctypes-bound parser library, building it on first use.
    Returns None when no C++ toolchain is available."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                        < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.ipx_mps_parse.restype = ctypes.c_void_p
        lib.ipx_mps_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                      ctypes.c_char_p, ctypes.c_int64]
        lib.ipx_mps_counts.restype = None
        lib.ipx_mps_counts.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_int64)]
        lib.ipx_mps_name.restype = ctypes.c_char_p
        lib.ipx_mps_name.argtypes = [ctypes.c_void_p]
        lib.ipx_mps_obj_rhs.restype = ctypes.c_double
        lib.ipx_mps_obj_rhs.argtypes = [ctypes.c_void_p]
        lib.ipx_mps_fill.restype = None
        lib.ipx_mps_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 12
        lib.ipx_mps_free.restype = None
        lib.ipx_mps_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib
