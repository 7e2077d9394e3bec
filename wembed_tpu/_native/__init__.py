"""Native host extension loader.

Compiles labelprop.cpp into a shared library on first use (g++ -O3) and
binds it via ctypes.  Falls back to ``None`` if no compiler is available —
callers must keep a pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "labelprop.cpp")
_LOCK = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _so_path() -> str:
    return os.path.join(_HERE, "libwembed_native.so")


def _build() -> str | None:
    so = _so_path()
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", so],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return so
    except Exception:
        return None


def get_lib() -> ctypes.CDLL | None:
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _LOCK:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.wembed_label_propagation.argtypes = [
            ctypes.c_int64, i64p, i32p, f64p, i32p,
            ctypes.c_int32, ctypes.c_int32, i32p,
        ]
        lib.wembed_label_propagation.restype = None
        lib.wembed_aggressive_propagation.argtypes = [
            ctypes.c_int64, i64p, i32p, f64p, i32p, ctypes.c_int64, i32p,
        ]
        lib.wembed_aggressive_propagation.restype = None
        lib.wembed_parse_edge_list.argtypes = [
            ctypes.c_char_p, ctypes.c_char, i64p, ctypes.c_int64,
        ]
        lib.wembed_parse_edge_list.restype = ctypes.c_int64
        _lib = lib
        return _lib
