"""Pallas TPU kernels: fused dense scoring + exact hierarchical top-k.

The retrieval hot path (reference HippoRAG.py:1427-1465) computes a full
query-by-fact score matrix, min-max-normalizes it, and takes the top-k
rows. At corpus scale the [B, N] score matrix is the HBM *memory*
bottleneck: N is millions of facts while only k << N scores survive.

Measured on v5e: XLA's direct matmul+top_k is ~2x faster than this
kernel while [B, N] fits in HBM (the matmul is compute-bound at these
shapes, so avoiding the materialization does not buy wall-clock). This
path exists for the regime where the score matrix does NOT fit —
ops/scoring.fact_topk routes here automatically past ~2 GB. Keep
B*k*tile_n well under N, or the refinement gather exceeds the corpus.

Two-pass exact algorithm, both passes DMA-bound:

  Pass A (``_make_scan_kernel``): stream key tiles through VMEM; per
  tile compute S = Q @ K_tile^T on the MXU and keep ONLY the per-tile
  row max and the running row min/max on-chip. The [B, N] matrix
  never exists in HBM. No sorting, no merging — ~3 VPU reductions per
  tile, so the pass runs at the speed the keys stream in.

  Refinement: the true top-k values of a row must live in its top-k
  tiles by max (if a tile's max is below the k-th largest tile max,
  every value in it is below k values elsewhere). lax.top_k over the
  small [B, n_tiles] max matrix picks those tiles.

  Pass B (``_refine_xla``): gather each row's selected tiles and re-dot
  them in XLA (one gather + einsum over B*k tiles — a few percent of the
  corpus). A final lax.top_k over the [B, k*tile] candidates yields the
  exact top-k.

Min-max normalization needs only the [B, 1] row extrema from pass A,
matching ``ops.scoring.min_max_normalize`` semantics (constant rows ->
1.0, padded columns -> 0).

Tie-breaking: within a tile the lower index wins (as lax.top_k); across
tiles with exactly tied maxes the candidate order follows tile rank, so
global tie order can differ from a flat lax.top_k — irrelevant for real
(float) scores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


# ----------------------------------------------------------------------
# Pass A: streamed matmul + per-tile max/argmax + row min/max
# ----------------------------------------------------------------------
def _make_scan_kernel(tile_n: int, precision: str):
    def kernel(valid_n_ref, q_ref, kt_ref, tmax_ref, mm_ref, mn_s, mx_s):
        j = pl.program_id(0)
        n_tiles = pl.num_programs(0)
        b = q_ref.shape[0]

        @pl.when(j == 0)
        def _init():
            mn_s[:] = jnp.full(mn_s.shape, jnp.inf, jnp.float32)
            mx_s[:] = jnp.full(mx_s.shape, -jnp.inf, jnp.float32)

        # tmax output is blocked (B, 128) and revisited for 128 consecutive
        # grid steps: pallas keeps the live block in VMEM and flushes it
        # when the block index changes, so the per-step update below only
        # touches a [B, 128] window.
        @pl.when(j % 128 == 0)
        def _init_block():
            tmax_ref[:] = jnp.full(tmax_ref.shape, -jnp.inf, jnp.float32)

        s = jax.lax.dot_general(
            q_ref[:], kt_ref[:],
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

        lane = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 1)
        tmax_ref[:] = jnp.where(lane == j % 128, tile_max, tmax_ref[:])

        @pl.when(j == n_tiles - 1)
        def _emit():
            ccol = jax.lax.broadcasted_iota(jnp.int32, mm_ref.shape, 1)
            mm_ref[:] = jnp.where(ccol == 0, mn_s[:], mx_s[:])

    return kernel


@functools.partial(
    jax.jit, static_argnames=("tile_n", "nt_pad", "interpret", "precision")
)
def _scan_call(queries, keys, valid_n, tile_n, nt_pad, interpret, precision):
    b, d = queries.shape
    n = keys.shape[0]
    n_tiles = n // tile_n
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda j, *_: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, 128), lambda j, *_: (0, j // 128), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 128), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_scan_kernel(tile_n, precision),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, nt_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * keys.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(valid_n.reshape(1).astype(jnp.int32), queries, keys)


# ----------------------------------------------------------------------
# Pass B: re-dot each row against its selected tiles only
# ----------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("tile_n", "precision"))
def _refine_xla(queries, keys, tile_sel, tile_n, precision):
    """Gather each row's selected key tiles and re-dot (XLA).

    Traffic is B*k*tile_n*D key bytes — a few percent of the corpus —
    and XLA pipelines the gather+einsum well.
    """
    n, d = keys.shape
    kt3 = keys.reshape(n // tile_n, tile_n, d)
    g = kt3[tile_sel]  # [B, kt, tile_n, D]
    return jnp.einsum(
        "bd,bktd->bkt", queries, g,
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "interpret", "precision")
)
def fused_score_topk(
    queries: Array,
    keys: Array,
    valid_n,
    k: int,
    tile_n: int = 512,
    interpret: bool = False,
    precision: str = "highest",
):
    """Exact normalized top-k without materializing the [B, N] scores.

    Args:
      queries: [B, D] query embeddings.
      keys: [N, D] key embeddings (rows >= valid_n are padding).
      valid_n: scalar int — number of real key rows.
      k: static top-k (k*tile_n candidate refinement; keep k modest).
      tile_n: key-tile rows (auto-adjusted to divide N and bound VMEM).

    Returns:
      (norm_vals [B, k], raw_vals [B, k], idx [B, k] int32). Rows with
      fewer than k valid keys carry -inf raw values and norm value 0.
    """
    b, d = queries.shape
    n = keys.shape[0]
    k = min(k, n)

    d_pad = _round_up(d, 128)
    b_pad = _round_up(max(b, 8), 8)
    while n % tile_n != 0 and tile_n > 128:
        tile_n //= 2
    n_pad = _round_up(n, tile_n)
    n_tiles = n_pad // tile_n
    nt_pad = _round_up(n_tiles, 128)

    if d_pad != d or n_pad != n:
        keys = jnp.pad(keys, ((0, n_pad - n), (0, d_pad - d)))
    if d_pad != d or b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, d_pad - d)))
    valid_n = jnp.asarray(valid_n)

    tmax, mm = _scan_call(
        queries, keys, valid_n, tile_n, nt_pad, interpret, precision
    )
    mn, mx = mm[:b, 0:1], mm[:b, 1:2]

    # select each row's top-k tiles by max (invalid tiles carry -inf)
    kt = min(k, n_tiles)
    _tile_vals, tile_sel = jax.lax.top_k(tmax[:, :n_tiles], kt)  # [B_pad, kt]

    cand = _refine_xla(queries, keys, tile_sel, tile_n, precision)  # [B_pad, kt, tile_n]
    cand = cand.reshape(b_pad, kt * tile_n)
    col = jax.lax.broadcasted_iota(jnp.int32, (b_pad, kt, tile_n), 2)
    cidx = (tile_sel[:, :, None] * tile_n + col).reshape(b_pad, kt * tile_n)
    cand = jnp.where(cidx < valid_n, cand, -jnp.inf)

    vals, pos = jax.lax.top_k(cand, k)  # [B_pad, k]
    idx = jnp.take_along_axis(cidx, pos, axis=1)

    vals, idx = vals[:b], idx[:b]
    rng = mx - mn
    finite = vals > -jnp.inf
    norm = jnp.where(
        rng == 0, jnp.ones_like(vals), (vals - mn) / jnp.where(rng == 0, 1.0, rng)
    )
    norm = jnp.where(finite, norm, 0.0)
    idx = jnp.where(finite, idx, 0)
    return norm, vals, idx
