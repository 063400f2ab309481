"""ctypes binding for the native graph core (libgraph_core.so).

Builds the shared library on first use (``make`` in this directory) and
falls back to the pure-NumPy path transparently if the toolchain is
unavailable. See graph_core.cpp for what it replaces.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from ...utils.logging import get_logger

logger = get_logger(__name__)

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_THIS_DIR, "libgraph_core.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-s", "libgraph_core.so"],
                cwd=_THIS_DIR,
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as e:  # noqa: BLE001 — fall back to numpy
            logger.warning("native graph core build failed (%s); using NumPy path", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.warning("native graph core load failed (%s); using NumPy path", e)
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

    lib.coo_compile.restype = ctypes.c_int64
    lib.coo_compile.argtypes = [
        i32p, i32p, f32p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.ppr_serial.restype = ctypes.c_int32
    lib.ppr_serial.argtypes = [
        i32p, i32p, f32p, ctypes.c_int64,
        f64p, ctypes.c_int32,
        f64p, ctypes.c_double, ctypes.c_int32, ctypes.c_double,
        f64p,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def coo_compile(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    num_nodes: int,
    normalize: bool = False,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Symmetrize + dedup + dst-major sort (+ optional normalization).

    Returns (src, dst, w, strength) or None if the native lib is absent.
    """
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    w = np.ascontiguousarray(w, np.float32)
    n = lib.coo_compile(src, dst, w, len(src), num_nodes, int(normalize), None, None, None, None)
    src_out = np.empty(n, np.int32)
    dst_out = np.empty(n, np.int32)
    w_out = np.empty(n, np.float32)
    strength = np.zeros(num_nodes, np.float64)
    lib.coo_compile(
        src,
        dst,
        w,
        len(src),
        num_nodes,
        int(normalize),
        src_out.ctypes.data_as(ctypes.c_void_p),
        dst_out.ctypes.data_as(ctypes.c_void_p),
        w_out.ctypes.data_as(ctypes.c_void_p),
        strength.ctypes.data_as(ctypes.c_void_p),
    )
    return src_out, dst_out, w_out, strength


def ppr_serial(
    src: np.ndarray,
    dst: np.ndarray,
    w_norm: np.ndarray,
    dangling: np.ndarray,
    num_nodes: int,
    reset: np.ndarray,
    damping: float = 0.5,
    max_iters: int = 200,
    tol: float = 1e-12,
) -> Optional[Tuple[np.ndarray, int]]:
    """Exact serial PPR (host verifier). Returns (ranks, iterations) or None."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros(num_nodes, np.float64)
    iters = lib.ppr_serial(
        np.ascontiguousarray(src, np.int32),
        np.ascontiguousarray(dst, np.int32),
        np.ascontiguousarray(w_norm, np.float32),
        len(src),
        np.ascontiguousarray(dangling, np.float64),
        num_nodes,
        np.ascontiguousarray(reset, np.float64),
        damping,
        max_iters,
        tol,
        out,
    )
    return out, int(iters)
