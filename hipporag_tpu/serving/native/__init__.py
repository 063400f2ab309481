"""ctypes binding for the native HTTP front-end (libhttp_frontend.so).

Builds the shared library on first use (``make`` in this directory);
returns ``None`` if the toolchain is unavailable so callers can fall
back to the stdlib front-end. Same build/lock discipline as
``hipporag_tpu/graph/native``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

from ...utils.logging import get_logger

logger = get_logger(__name__)

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_THIS_DIR, "libhttp_frontend.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def load() -> Optional[ctypes.CDLL]:
    """Build (if stale) and load the front-end library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # A file lock serializes concurrent builders — without it one process
    # can CDLL a partially written .so (same hazard as graph_core).
    try:
        from filelock import FileLock

        lock = FileLock(_LIB_PATH + ".lock")
    except Exception:  # noqa: BLE001 — filelock genuinely unavailable
        import contextlib

        lock = contextlib.nullcontext()
    try:
        with lock:
            subprocess.run(
                ["make", "-s", "libhttp_frontend.so"],
                cwd=_THIS_DIR,
                check=True,
                capture_output=True,
                timeout=120,
            )
    except Exception as e:  # noqa: BLE001 — fall back to stdlib front-end
        if not os.path.exists(_LIB_PATH):
            logger.warning("native http front-end build failed (%s)", e)
            return None
        logger.warning(
            "native http front-end rebuild failed (%s); using existing library", e
        )
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.warning("native http front-end load failed (%s)", e)
        return None

    lib.hf_start.restype = ctypes.c_void_p
    lib.hf_start.argtypes = [
        ctypes.c_char_p,  # host
        ctypes.c_int,  # port
        ctypes.c_int,  # backlog
        ctypes.c_long,  # max_body (large paths)
        ctypes.c_long,  # max_small_body (every other path)
        ctypes.c_char_p,  # comma-separated large-body paths
        ctypes.POINTER(ctypes.c_int),  # out: bound port
        ctypes.c_char_p,  # out: error buffer
        ctypes.c_int,  # error buffer len
    ]
    lib.hf_next.restype = ctypes.c_int
    lib.hf_next.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.hf_respond.restype = ctypes.c_int
    lib.hf_respond.argtypes = [
        ctypes.c_void_p,
        ctypes.c_uint64,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_long,
    ]
    lib.hf_stop.restype = None
    lib.hf_stop.argtypes = [ctypes.c_void_p]
    lib.hf_destroy.restype = None
    lib.hf_destroy.argtypes = [ctypes.c_void_p]
    lib.hf_counters.restype = None
    lib.hf_counters.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_uint64)
    ] * 4
    _lib = lib
    return _lib
