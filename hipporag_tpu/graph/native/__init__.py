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
    # always invoke make: the Makefile dependency makes it a no-op when the
    # .so is fresh, and rebuilds stale libraries after source updates.
    # A file lock serializes concurrent builders (e.g. the bench's
    # subprocess-isolated probe racing the main process) — without it one
    # process can CDLL a partially written .so.
    try:
        from filelock import FileLock

        lock = FileLock(_LIB_PATH + ".lock")
    except Exception:  # noqa: BLE001 — filelock genuinely unavailable
        import contextlib

        lock = contextlib.nullcontext()
    try:
        with lock:
            subprocess.run(
                ["make", "-s", "libgraph_core.so"],
                cwd=_THIS_DIR,
                check=True,
                capture_output=True,
                timeout=120,
            )
    except Exception as e:  # noqa: BLE001 — fall back to numpy
        if not os.path.exists(_LIB_PATH):
            logger.warning("native graph core build failed (%s); using NumPy path", e)
            return None
        logger.warning("native graph core rebuild failed (%s); using existing library", e)
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
    # each input entry creates at most two directed keys (a->b and b->a),
    # so 2*len(src) bounds the output — allocate once and slice instead of
    # paying the full symmetrize+dedup accumulation twice (the sizing call
    # used to redo all the work it threw away)
    cap = 2 * len(src)
    src_out = np.empty(cap, np.int32)
    dst_out = np.empty(cap, np.int32)
    w_out = np.empty(cap, np.float32)
    strength = np.zeros(num_nodes, np.float64)
    n = lib.coo_compile(
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
    return src_out[:n].copy(), dst_out[:n].copy(), w_out[:n].copy(), strength


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


def ell_pack(
    src: np.ndarray,
    dst_sorted: np.ndarray,
    w_norm: np.ndarray,
    node_cap: int,
    widths,
    hub_width: int,
    row_multiple: int,
):
    """Native bucketed-ELL packing; returns the arrays ell_from_coo needs
    or None when the native library is unavailable.

    Returns (bucket_idx_list, bucket_wgt_list, hub_idx, hub_wgt, hub_seg,
    n_hub_cap, local_inv).
    """
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "ell_pack"):
        return None
    if lib.ell_pack.restype is None or not getattr(lib, "_ell_sig", False):
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.ell_pack.restype = ctypes.c_int32
        lib.ell_pack.argtypes = [
            i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int32,
            i32p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib._ell_sig = True

    src = np.ascontiguousarray(src, np.int32)
    dst_sorted = np.ascontiguousarray(dst_sorted, np.int32)
    w_norm = np.ascontiguousarray(w_norm, np.float32)
    widths_arr = np.ascontiguousarray(widths, np.int32)
    n_widths = len(widths_arr)

    bucket_rows = np.zeros(n_widths, np.int64)
    hub_rows = np.zeros(1, np.int64)
    hub_count = np.zeros(1, np.int64)
    rc0 = lib.ell_pack(
        src, dst_sorted, w_norm, len(src), node_cap,
        widths_arr, n_widths, hub_width,
        bucket_rows.ctypes.data_as(ctypes.c_void_p),
        hub_rows.ctypes.data_as(ctypes.c_void_p),
        hub_count.ctypes.data_as(ctypes.c_void_p),
        None, 0, 0, None, None, None, None, None, None,
    )
    if rc0 != 0:
        return None

    def cap(n):
        return ((n + row_multiple - 1) // row_multiple) * row_multiple if n else 0

    bucket_caps = np.asarray([cap(int(r)) for r in bucket_rows], np.int64)
    hub_row_cap = cap(int(hub_rows[0]))
    n_hub = int(hub_count[0])
    n_hub_cap = ((n_hub + 127) // 128) * 128 if n_hub else 0

    total_elems = int(sum(c * w for c, w in zip(bucket_caps, widths_arr)))
    idx_flat = np.zeros(total_elems, np.int32)
    wgt_flat = np.zeros(total_elems, np.float32)
    hub_idx = np.zeros((hub_row_cap, hub_width), np.int32)
    hub_wgt = np.zeros((hub_row_cap, hub_width), np.float32)
    hub_seg = np.full(hub_row_cap, n_hub_cap, np.int32)
    local_inv = np.zeros(node_cap, np.int32)

    rc = lib.ell_pack(
        src, dst_sorted, w_norm, len(src), node_cap,
        widths_arr, n_widths, hub_width,
        bucket_rows.ctypes.data_as(ctypes.c_void_p),
        hub_rows.ctypes.data_as(ctypes.c_void_p),
        hub_count.ctypes.data_as(ctypes.c_void_p),
        bucket_caps.ctypes.data_as(ctypes.c_void_p),
        hub_row_cap, n_hub_cap,
        idx_flat.ctypes.data_as(ctypes.c_void_p),
        wgt_flat.ctypes.data_as(ctypes.c_void_p),
        hub_idx.ctypes.data_as(ctypes.c_void_p),
        hub_wgt.ctypes.data_as(ctypes.c_void_p),
        hub_seg.ctypes.data_as(ctypes.c_void_p),
        local_inv.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None

    bucket_idx, bucket_wgt = [], []
    off = 0
    for c, w in zip(bucket_caps, widths_arr):
        n_el = int(c) * int(w)
        bucket_idx.append(idx_flat[off : off + n_el].reshape(int(c), int(w)))
        bucket_wgt.append(wgt_flat[off : off + n_el].reshape(int(c), int(w)))
        off += n_el
    return bucket_idx, bucket_wgt, hub_idx, hub_wgt, hub_seg, n_hub_cap, local_inv
