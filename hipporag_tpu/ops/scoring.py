"""Batched dense scoring ops (XLA-jitted, MXU-shaped).

Replaces the reference's per-query NumPy dot products
(HippoRAG.py:1459-1461, 1496-1501) with batched [B, D] x [D, N] matmuls that
XLA tiles onto the MXU. Inputs may be bfloat16; accumulation is float32.

All ops are shape-polymorphic only through re-jit; callers keep embedding
matrices padded to stable capacities (see graph/csr.py) to amortize
compilation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def min_max_normalize(scores: Array, axis: int = -1, where=None) -> Array:
    """Row-wise min-max scaling to [0, 1]; constant rows map to all-ones.

    Matches the reference normalization (utils/misc_utils.py:130-139) applied
    per query. ``where`` optionally masks out padded columns (they return 0).
    """
    if where is not None:
        lo = jnp.min(jnp.where(where, scores, jnp.inf), axis=axis, keepdims=True)
        hi = jnp.max(jnp.where(where, scores, -jnp.inf), axis=axis, keepdims=True)
    else:
        lo = jnp.min(scores, axis=axis, keepdims=True)
        hi = jnp.max(scores, axis=axis, keepdims=True)
    rng = hi - lo
    out = jnp.where(rng == 0, jnp.ones_like(scores), (scores - lo) / jnp.where(rng == 0, 1.0, rng))
    if where is not None:
        out = jnp.where(where, out, 0.0)
    return out


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def batched_scores(
    queries: Array, keys: Array, compute_dtype: str = "float32"
) -> Array:
    """[B, D] x [N, D] -> [B, N] similarity scores (f32 accumulation)."""
    dtype = jnp.dtype(compute_dtype)
    # HIGHEST keeps f32 inputs exactly f32 (XLA's default may down-convert);
    # the fast path is explicit bf16 inputs, which stay on the MXU bf16 pipe.
    return jax.lax.dot_general(
        queries.astype(dtype),
        keys.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def batched_normalized_scores(
    queries: Array, keys: Array, valid_n: Array, compute_dtype: str = "float32"
) -> Array:
    """Scores + per-row min-max normalization over the first ``valid_n`` keys.

    ``valid_n`` is a scalar int array: keys beyond it are padding and receive
    score 0 (reference computes min-max over real facts only).
    """
    raw = batched_scores(queries, keys, compute_dtype)
    n = raw.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    mask = col < valid_n
    return min_max_normalize(raw, where=mask)


@functools.partial(jax.jit, static_argnames=("k",))
def batched_topk(scores: Array, k: int):
    """Per-row top-k (values, indices) of a [B, N] score matrix."""
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "k"))
def score_and_topk(
    queries: Array, keys: Array, valid_n: Array, k: int, compute_dtype: str = "float32"
):
    """Fused normalized scoring + top-k used by fact retrieval."""
    scores = batched_normalized_scores(queries, keys, valid_n, compute_dtype)
    values, indices = jax.lax.top_k(scores, k)
    return scores, values, indices


# Above this [B, N] score-matrix footprint the streamed Pallas path is
# used: XLA's direct matmul+top_k is faster while the matrix fits in HBM,
# but its materialization dominates memory at corpus scale. Measured on
# v5e (r4 bench, f32 scores): XLA wins at 0.12 GiB (14.1 vs 33.8 ms) and
# still at 2.44 GiB (88.3 vs 97.9 ms); Pallas wins at 4.88 GiB (85 vs
# 131 ms) and is the only survivor where XLA OOMs. 3 GiB sits between the
# measured points with HBM headroom next to the embedding matrices.
_PALLAS_SCORE_BYTES = 3 << 30


def pallas_topk_route(b: int, n: int, backend: str | None = None) -> bool:
    """Pure routing decision for :func:`fact_topk` (host logic, no device).

    True -> the streamed Pallas two-pass kernel; False -> XLA matmul+top_k.
    Pinned by tests/test_pallas.py against the measured v5e size grid so a
    threshold regression can't silently route the 2.4x-slower Pallas path
    at small sizes (or OOM XLA at capacity sizes).
    """
    if backend is None:
        backend = jax.default_backend()
    return backend == "tpu" and b * n * 4 > _PALLAS_SCORE_BYTES


def fact_topk(
    queries: Array,
    keys: Array,
    valid_n,
    k: int,
    compute_dtype: str = "float32",
    use_pallas: bool | None = None,
):
    """Top-k normalized fact scores: (norm_vals [B,k], idx [B,k]).

    Routing: the XLA matmul+top_k path is compute-optimal on TPU while the
    [B, N] score matrix fits comfortably in HBM; past ~2 GB the Pallas
    two-pass kernel (ops/fused_topk.py) streams key tiles and keeps only
    per-tile maxima, trading ~2x kernel time for O(B*n_tiles) memory.
    Padded/absent keys yield norm value 0.
    """
    b = queries.shape[0]
    n = keys.shape[0]
    if use_pallas is None:
        use_pallas = pallas_topk_route(b, n)
    if use_pallas:
        from .fused_topk import fused_score_topk

        norm, _raw, idx = fused_score_topk(queries, keys, valid_n, k)
        return norm, idx
    _scores, values, indices = score_and_topk(
        queries, keys, jnp.asarray(valid_n, jnp.int32), k, compute_dtype
    )
    return values, indices


# f32 represents every integer below 2^24 exactly; all single-chip fact /
# passage counts sit far below it. Callers gate on this before packing.
PACK_IDX_LIMIT = 1 << 24


@jax.jit
def pack_vals_idx(vals: Array, idx: Array) -> Array:
    """Pack paired (f32 values [B, k], int32 indices [B, k]) into ONE
    [B, 2k] f32 buffer for a single device->host transfer.

    Serving latency over a tunneled backend is round-trip-bound: each
    device->host buffer transfer pays the link latency, so downloading
    values and indices separately doubles the cost of every stage that
    needs both on host (candidate fetch before the LLM rerank, final
    document ranking).

    The indices ride as exact float VALUES (``astype``), not bit
    patterns: int32->f32 ``bitcast_convert_type`` is NOT safe on TPU —
    index bit patterns are denormal floats, and XLA may lower the
    concatenate through vector registers that flush denormals to zero
    (measured on v5e: a standalone bitcast round-trips bit-exact, but the
    same bitcast fused into this pack corrupted every index and collapsed
    retrieval quality). Exact for idx < 2^24 (``PACK_IDX_LIMIT``); callers
    fall back to separate transfers above that.
    """
    return jnp.concatenate([vals, idx.astype(jnp.float32)], axis=1)


def unpack_vals_idx(packed: "np.ndarray", k: int):
    """Host-side inverse of ``pack_vals_idx``: (vals f32 [B, k], idx int32
    [B, k]). ``packed`` must be a host numpy array (already transferred)."""
    import numpy as np

    packed = np.ascontiguousarray(packed)
    vals = packed[:, :k]
    idx = packed[:, k:].astype(np.int32)
    return vals, idx
