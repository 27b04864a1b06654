"""Lazy cc build + ctypes loader for the native host kernels."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "librtwa_native.so")
_SRC = os.path.join(_HERE, "dtw.c")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.warning("native build failed (%s); using Python fallbacks", e)
        return False


def get_lib() -> ctypes.CDLL | None:
    """The native library, building it on first use; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src_mtime = os.path.getmtime(_SRC)
        if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < src_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.rtwa_dtw.restype = ctypes.c_int64
            lib.rtwa_dtw.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ]
            lib.rtwa_median_filter.restype = None
            lib.rtwa_median_filter.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
            ]
            _lib = lib
        except OSError as e:
            logger.warning("failed to load native lib: %s", e)
        return _lib
