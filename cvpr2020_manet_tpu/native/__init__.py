"""Native (C++) host-side kernels, loaded via ctypes.

Lazy build-on-first-import with g++; everything degrades gracefully to the
pure-Python implementations when no compiler is available (`lib()` returns
None and callers fall back). The .so is cached next to the source and
rebuilt when metrics.cpp is newer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "metrics.cpp")
_SO = os.path.join(_DIR, "libivosmetrics.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           _SRC, "-o", _SO + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def lib():
    """ctypes handle to the native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        needs_build = (not os.path.exists(_SO)
                       or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        if needs_build and not _build():
            return None
        try:
            handle = ctypes.CDLL(_SO)
        except OSError:
            return None
        handle.batched_f_measure.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
        handle.batched_jaccard_obj.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
        _lib = handle
        return _lib
