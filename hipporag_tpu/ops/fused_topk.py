"""Pallas TPU kernel: fused dense scoring + streaming top-k + min/max.

The retrieval hot path (reference HippoRAG.py:1427-1465) computes a full
query-by-fact score matrix, min-max-normalizes it, and takes the top-k
rows. At corpus scale the [B, N] score matrix is the HBM-bandwidth
bottleneck: N is millions of facts while only k << N scores survive.

This kernel streams key tiles through VMEM and keeps ONLY the running
top-k (values + indices) and running row min/max in on-chip scratch, so
the [B, N] matrix never exists in HBM:

    grid over N/tile_n key tiles, sequential on one core:
      S   = Q @ K_tile^T            (MXU, f32 accumulation)
      m/M = running row min/max     (VPU, masked to the valid prefix)
      top = merge(top, topk(S))     (k-step iterative extraction, VPU)

Min-max normalization of the surviving values then needs only the [B, 1]
row extrema, matching ``ops.scoring.min_max_normalize`` semantics
(constant rows -> 1.0, padded columns -> 0).

The kernel requires static shapes: callers pad N to a multiple of the
tile and D to a multiple of 128 (see ``fused_score_topk``). Designed for
small k (link_top_k ~ 5..32); the synonymy kNN (k up to 2047) keeps the
XLA streaming path in ops/knn.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_KPAD = 128  # lane-aligned running top-k scratch width


def _make_kernel(k: int, tile_n: int, precision: str = "highest"):
    def kernel(valid_n_ref, q_ref, kt_ref, vals_ref, idx_ref, mm_ref,
               vals_s, idx_s, mn_s, mx_s):
        j = pl.program_id(0)
        n_tiles = pl.num_programs(0)
        b = vals_s.shape[0]

        @pl.when(j == 0)
        def _init():
            vals_s[:] = jnp.full((b, _KPAD), -jnp.inf, jnp.float32)
            idx_s[:] = jnp.zeros((b, _KPAD), jnp.int32)
            mn_s[:] = jnp.full(mn_s.shape, jnp.inf, jnp.float32)
            mx_s[:] = jnp.full(mx_s.shape, -jnp.inf, jnp.float32)

        s = jax.lax.dot_general(
            q_ref[:],
            kt_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # [B, TILE_N]
        col = j * tile_n + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = col < valid_n_ref[0]

        tile_min = jnp.min(jnp.where(valid, s, jnp.inf), axis=1, keepdims=True)
        tile_max = jnp.max(jnp.where(valid, s, -jnp.inf), axis=1, keepdims=True)
        mn_s[:] = jnp.minimum(mn_s[:], tile_min)
        mx_s[:] = jnp.maximum(mx_s[:], tile_max)

        # Merge only when some row of this tile can displace a running
        # top-k entry — after the first few tiles almost every tile skips,
        # so the steady-state cost per tile is the matmul + two reductions
        # and the kernel stays DMA-bound.
        kth = vals_s[:, k - 1 : k]  # running lists are sorted descending
        need_merge = jnp.any(tile_max > kth)

        @pl.when(need_merge)
        def _merge():
            # k-step max extraction over the lane-aligned concat
            # [B, _KPAD + TILE_N]; ties pick the lowest index (lax.top_k
            # semantics; running entries hold earlier = smaller indices).
            s_masked = jnp.where(valid, s, -jnp.inf)
            cand_vals = jnp.concatenate([vals_s[:], s_masked], axis=1)
            cand_idx = jnp.concatenate([idx_s[:], col], axis=1)
            kcol = jax.lax.broadcasted_iota(jnp.int32, (b, _KPAD), 1)
            new_vals = jnp.full((b, _KPAD), -jnp.inf, jnp.float32)
            new_idx = jnp.zeros((b, _KPAD), jnp.int32)
            for i in range(k):
                m = jnp.max(cand_vals, axis=1, keepdims=True)  # [B, 1]
                is_m = cand_vals == m
                pick = jnp.min(
                    jnp.where(is_m, cand_idx, 2**31 - 1), axis=1, keepdims=True
                )
                new_vals = jnp.where(kcol == i, m, new_vals)
                new_idx = jnp.where(kcol == i, pick, new_idx)
                cand_vals = jnp.where(cand_idx == pick, -jnp.inf, cand_vals)
            vals_s[:] = new_vals
            idx_s[:] = new_idx

        @pl.when(j == n_tiles - 1)
        def _emit():
            vals_ref[:] = vals_s[:]
            idx_ref[:] = idx_s[:]
            ccol = jax.lax.broadcasted_iota(jnp.int32, mm_ref.shape, 1)
            mm_ref[:] = jnp.where(ccol == 0, mn_s[:], mx_s[:])

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret", "precision"))
def _fused_topk_call(
    queries: Array, keys: Array, valid_n: Array, k: int, tile_n: int,
    interpret: bool = False, precision: str = "highest",
):
    b, d = queries.shape
    n = keys.shape[0]
    n_tiles = n // tile_n
    kernel = _make_kernel(k, tile_n, precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda j, *_: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, _KPAD), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, _KPAD), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 128), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, _KPAD), jnp.float32),
            pltpu.VMEM((b, _KPAD), jnp.int32),
            pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
        ],
    )
    vals, idx, mm = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, _KPAD), jnp.float32),
            jax.ShapeDtypeStruct((b, _KPAD), jnp.int32),
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * keys.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(valid_n.reshape(1).astype(jnp.int32), queries, keys)
    return vals[:, :k], idx[:, :k], mm[:, 0:1], mm[:, 1:2]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_score_topk(
    queries: Array,
    keys: Array,
    valid_n,
    k: int,
    tile_n: int = 512,
    interpret: bool = False,
    precision: str = "highest",
):
    """Normalized top-k without materializing the [B, N] score matrix.

    Args:
      queries: [B, D] query embeddings.
      keys: [N, D] key embeddings (rows >= valid_n are padding).
      valid_n: scalar int — number of real key rows.
      k: static top-k (small; <= 64 recommended).
      tile_n: key-tile rows (auto-shrunk to divide N).

    Returns:
      (norm_vals [B, k], raw_vals [B, k], idx [B, k] int32). Rows where
      fewer than k keys are valid carry -inf raw values and norm value 0.
    """
    b, d = queries.shape
    n = keys.shape[0]
    k = min(k, n)
    if k > _KPAD:
        raise ValueError(f"fused kernel supports k <= {_KPAD}; use ops.knn for large k")

    d_pad = _round_up(d, 128)
    b_pad = _round_up(max(b, 8), 8)
    while n % tile_n != 0 and tile_n > 128:
        tile_n //= 2
    n_pad = _round_up(n, tile_n)
    if d_pad != d or n_pad != n:
        keys = jnp.pad(keys, ((0, n_pad - n), (0, d_pad - d)))
    if d_pad != d or b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, d_pad - d)))

    vals, idx, mn, mx = _fused_topk_call(
        queries, keys, jnp.asarray(valid_n), k, tile_n,
        interpret=interpret, precision=precision,
    )
    vals, idx, mn, mx = vals[:b], idx[:b], mn[:b], mx[:b]
    rng = mx - mn
    finite = vals > -jnp.inf
    norm = jnp.where(
        rng == 0, jnp.ones_like(vals), (vals - mn) / jnp.where(rng == 0, 1.0, rng)
    )
    norm = jnp.where(finite, norm, 0.0)
    return norm, vals, idx
