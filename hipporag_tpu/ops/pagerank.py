"""Batched Personalized PageRank on TPU.

Replaces igraph's C++ ``prpack`` solver (reference: HippoRAG.py:1736-1743,
one serial solve per query) with a *batched* power iteration: all queries'
reset vectors advance together through one sparse transition operator, so
the whole query batch costs one SpMV sequence instead of Q solver calls.

Semantics match ``igraph.personalized_pagerank(damping, directed=False,
weights, reset, implementation='prpack')``:

- The graph is weighted and undirected. A random step from node ``u`` moves
  to neighbor ``v`` with probability ``w(u,v) / strength(u)``.
- With probability ``1 - damping`` (and from zero-strength dangling nodes,
  with their full mass) the walker teleports to the reset distribution.
- The reset vector is L1-normalized; NaN/negative entries are zeroed by the
  caller (HippoRAG.py:1733).

Fixed point: ``p = (1-d) r + d (T p + (dangling . p) r)``.

The SpMV is expressed as gather + ``segment_sum`` over a COO edge list
sorted by destination — XLA lowers this to efficient TPU sorted-segment
reductions — with the batch dimension as the trailing (lane) axis:
``p_T[N, B]`` gathered to ``[E, B]`` then segment-summed back to ``[N, B]``.
Padded edges carry weight 0 and padded nodes have zero reset, so padding is
a numerical no-op.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class COOGraph(NamedTuple):
    """Device-resident normalized transition operator in COO form.

    Attributes:
      src: [E] int32 source node per directed edge (padded with 0).
      dst: [E] int32 destination node per directed edge, sorted ascending.
      w_norm: [E] float32 ``w(src,dst)/strength(src)`` (0 for padding).
      dangling: [N] float32 mask, 1.0 where strength == 0 (real nodes only).
      num_nodes: [] int32 count of real (unpadded) nodes.
    """

    src: Array
    dst: Array
    w_norm: Array
    dangling: Array
    num_nodes: Array


def _spmv_T(graph: COOGraph, p_T: Array, gather_dtype=None, edge_chunks: int = 1) -> Array:
    """y_T[N, B] = T @ p for all batch columns: y[dst] += w_norm * p[src].

    ``gather_dtype=bfloat16`` halves the dominant HBM traffic (the [E, B]
    gathered probability rows) at ~3-decimal-digit score precision —
    accumulation stays float32. PPR outputs feed a ranking, so bf16 is
    usually safe; f32 is the default for exact reference parity.

    ``edge_chunks > 1`` streams the edge list through a ``lax.scan`` so the
    gathered [E, B] intermediate never exists at once — peak memory drops
    to [E/chunks, B], which is what lets a 100M-edge graph with a
    128-query batch fit in one chip's HBM. Chunks are contiguous slices of
    the dst-sorted edge list, so per-chunk sorted segment sums stay valid
    and partial results just add.
    """
    p_g = p_T.astype(gather_dtype) if gather_dtype is not None else p_T
    w = graph.w_norm
    n = p_T.shape[0]
    if edge_chunks <= 1:
        gathered = p_g[graph.src] * w[:, None].astype(p_g.dtype)  # [E, B]
        return jax.ops.segment_sum(
            gathered.astype(jnp.float32), graph.dst,
            num_segments=n, indices_are_sorted=True,
        )

    e = graph.src.shape[0]
    per = -(-e // edge_chunks)
    pad = per * edge_chunks - e
    # padded edges carry weight 0 and point at the last (padding) node
    src_c = jnp.pad(graph.src, (0, pad)).reshape(edge_chunks, per)
    dst_c = jnp.pad(graph.dst, (0, pad), constant_values=n - 1).reshape(
        edge_chunks, per
    )
    w_c = jnp.pad(w, (0, pad)).reshape(edge_chunks, per)

    def body(y, args):
        s, d, wc = args
        g = p_g[s] * wc[:, None].astype(p_g.dtype)
        y = y + jax.ops.segment_sum(
            g.astype(jnp.float32), d, num_segments=n, indices_are_sorted=True
        )
        return y, None

    y, _ = jax.lax.scan(
        body, jnp.zeros_like(p_T), (src_c, dst_c, w_c)
    )
    return y


@functools.partial(
    jax.jit, static_argnames=("max_iters", "compute_dtype", "edge_chunks")
)
def batched_ppr(
    graph: COOGraph,
    reset: Array,
    damping: float | Array = 0.5,
    max_iters: int = 64,
    tol: float | Array = 1.0e-8,
    compute_dtype: str | None = None,
    edge_chunks: int = 1,
) -> Array:
    """Run PPR for a batch of reset vectors.

    Args:
      graph: COOGraph with N (padded) nodes.
      reset: [B, N] nonnegative seed weights (not necessarily normalized).
      damping: continuation probability d.
      max_iters: static iteration cap (d=0.5 converges ~2^-k).
      tol: early-exit L-inf threshold on the batched residual.

    Returns:
      [B, N] stationary probabilities (rows sum to ~1 over real nodes).
    """
    reset = jnp.maximum(reset, 0.0)
    reset = jnp.where(jnp.isnan(reset), 0.0, reset)
    row_sum = jnp.sum(reset, axis=1, keepdims=True)
    # Zero reset rows fall back to uniform over real nodes (igraph uses the
    # uniform distribution when no reset is given; an all-zero reset row is
    # degenerate either way and never produced by the orchestrator).
    n_real = jnp.maximum(graph.num_nodes, 1).astype(reset.dtype)
    node_ids = jax.lax.broadcasted_iota(jnp.int32, (1, reset.shape[1]), 1)
    uniform = jnp.where(node_ids < graph.num_nodes, 1.0 / n_real, 0.0)
    r = jnp.where(row_sum > 0, reset / jnp.where(row_sum > 0, row_sum, 1.0), uniform)

    r_T = r.T  # [N, B]
    d = jnp.asarray(damping, dtype=r_T.dtype)

    gather_dtype = (
        jnp.dtype(compute_dtype)
        if compute_dtype not in (None, "float32")
        else None
    )

    def _solve(r_T, _unused):
        """Full while-loop solve for one [N, b<=tile] column block (the
        second argument exists only to fit tile_columns' signature)."""

        def cond(state):
            _, err_prev2, err_prev, err, it = state
            return jnp.logical_and(
                jnp.logical_and(err > tol, it < max_iters),
                jnp.logical_not(_stalled2(err, err_prev, err_prev2, tol, d)),
            )

        def body(state):
            p_T, _, err_prev, err, it = state
            y_T = _spmv_T(graph, p_T, gather_dtype, edge_chunks)
            dangling_mass = jnp.sum(
                p_T * graph.dangling[:, None], axis=0, keepdims=True
            )
            p_next = (1.0 - d) * r_T + d * (y_T + dangling_mass * r_T)
            err_next = jnp.max(jnp.abs(p_next - p_T))
            return p_next, err_prev, err, err_next, it + 1

        inf = jnp.asarray(jnp.inf, r_T.dtype)
        p_T, _, _, _, _ = jax.lax.while_loop(
            cond, body, (r_T, inf, inf, inf, 0)
        )
        return p_T, _unused

    # the COO gather has the same >128-lane latency cliff as the ELL form;
    # solve 128-wide column tiles sequentially with per-tile early exit
    p_T, _ = tile_columns(
        _solve, r_T, jnp.zeros((1, r_T.shape[1]), r_T.dtype)
    )
    return p_T.T


def ppr_numpy_reference(
    num_nodes: int,
    edges,  # iterable of (u, v, w) undirected entries, already symmetric-expanded
    reset,  # [B, N]
    damping: float = 0.5,
    iters: int = 200,
):
    """Trusted dense NumPy implementation for parity tests (host-side).

    Builds the dense symmetric adjacency, normalizes rows, and iterates the
    same fixed point. Used to validate the TPU kernel in the absence of
    igraph in this environment; the semantics documented above are those of
    igraph/prpack for weighted undirected graphs.
    """
    import numpy as np

    A = np.zeros((num_nodes, num_nodes), dtype=np.float64)
    for u, v, w in edges:
        A[u, v] += w
    strength = A.sum(axis=1)
    dangling = (strength == 0).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        T = np.where(strength[:, None] > 0, A / np.maximum(strength, 1e-300)[:, None], 0.0)

    reset = np.asarray(reset, dtype=np.float64)
    reset = np.where(np.isnan(reset) | (reset < 0), 0.0, reset)
    rs = reset.sum(axis=1, keepdims=True)
    r = np.where(rs > 0, reset / np.where(rs > 0, rs, 1.0), 1.0 / num_nodes)

    p = r.copy()
    for _ in range(iters):
        y = p @ T  # y[b, v] = sum_u p[b, u] T[u, v]
        dm = (p * dangling).sum(axis=1, keepdims=True)
        p = (1 - damping) * r + damping * (y + dm * r)
    return p




def normalize_symmetric_coo(src, dst, w, num_nodes: int, node_cap: int):
    """Host-side directed-COO → symmetric normalized transition operator.

    Symmetrizes (each directed entry contributes both directions),
    dst-sorts, divides by source strength, and derives the dangling mask —
    the exact recipe GraphBuilder + compile_device_graph apply, shared so
    benchmarks/tools don't hand-roll divergent copies. Returns
    (src [E2] i32, dst [E2] i32 sorted, w_norm [E2] f32,
    dangling [node_cap] f32).
    """
    import numpy as np

    s2 = np.concatenate([src, dst]).astype(np.int64)
    d2 = np.concatenate([dst, src]).astype(np.int64)
    w2 = np.concatenate([w, w]).astype(np.float64)
    order = np.argsort(d2, kind="stable")
    s2, d2, w2 = s2[order], d2[order], w2[order]
    strength = np.zeros(num_nodes, dtype=np.float64)
    np.add.at(strength, s2, w2)
    w_norm = (w2 / np.maximum(strength[s2], 1e-300)).astype(np.float32)
    dangling = np.zeros(node_cap, dtype=np.float32)
    dangling[:num_nodes] = strength == 0
    return s2.astype(np.int32), d2.astype(np.int32), w_norm, dangling


def validate_symmetric_operator(src, dst, dangling, node_cap: int, who: str):
    """Reject directed operators before slot-space ELL packing.

    Slot-space iteration requires the SYMMETRIZED transition operator
    (what GraphBuilder.symmetric_coo produces): a node with out-edges but
    zero in-degree has no slot, so its rank mass would silently never
    propagate, and a dangling node with in-edges would break the scalar
    dm recurrence. Both sets are empty for symmetric operators; reject
    directed input loudly instead of returning wrong ranks (the COO
    batched_ppr handles directed operators). Shared by the single-chip
    (ell_from_coo) and sharded (parallel/sharded.shard_graph_ell)
    converters. ``src``/``dst`` must already exclude padding entries.
    """
    import numpy as np

    indeg_chk = np.zeros(node_cap, dtype=np.int64)
    np.add.at(indeg_chk, dst, 1)
    if len(src) and np.any(indeg_chk[src] == 0):
        raise ValueError(
            f"{who}: operator has source nodes with zero in-degree "
            "(directed input?). The slot-space ELL solver requires the "
            "symmetrized transition; use ppr_format='coo' / batched_ppr "
            "for directed operators."
        )
    dang_chk = np.asarray(dangling)
    if dang_chk.size and np.any(
        (dang_chk > 0) & (indeg_chk[: len(dang_chk)] > 0)
    ):
        raise ValueError(
            f"{who}: dangling nodes with incoming edges require the COO "
            "solver (batched_ppr); the ELL dangling recurrence assumes a "
            "symmetric operator where dangling == isolated."
        )


def pack_ell_rows(src, w_norm, indeg, starts, nodes, row_width: int):
    """Vectorized ELL row fill: [len(nodes), row_width] (idx, wgt) numpy.

    ``src``/``w_norm`` are the dst-sorted edge arrays; ``indeg``/``starts``
    give each destination node's edge range. Shared by the single-device
    and sharded converters.
    """
    import numpy as np

    nb = len(nodes)
    idx = np.zeros((nb, row_width), dtype=np.int32)
    wgt = np.zeros((nb, row_width), dtype=np.float32)
    if nb == 0:
        return idx, wgt
    lens = indeg[nodes]
    total = int(lens.sum())
    within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    src_pos = np.repeat(starts[nodes], lens) + within
    flat = np.repeat(np.arange(nb) * row_width, lens) + within
    idx.reshape(-1)[flat] = src[src_pos]
    wgt.reshape(-1)[flat] = w_norm[src_pos]
    return idx, wgt


def pack_hub_chunks(src, w_norm, indeg, starts, hub_nodes, hub_width: int):
    """Ragged hub chunk rows: ceil(deg/W) rows per hub, no cross-hub pad.

    Returns (hub_idx [R, W], hub_wgt [R, W], hub_seg [R]) numpy arrays;
    hub_seg holds the owning hub's rank (0..len(hub_nodes)-1), ascending.
    """
    import numpy as np

    if len(hub_nodes) == 0:
        return (
            np.zeros((0, hub_width), dtype=np.int32),
            np.zeros((0, hub_width), dtype=np.float32),
            np.zeros(0, dtype=np.int32),
        )
    deg = indeg[hub_nodes]
    chunks_per = (-(-deg // hub_width)).astype(np.int64)
    R = int(chunks_per.sum())
    hub_seg = np.repeat(np.arange(len(hub_nodes), dtype=np.int32), chunks_per)
    ci = np.arange(R) - np.repeat(np.cumsum(chunks_per) - chunks_per, chunks_per)
    chunk_lens = np.minimum(deg[hub_seg] - ci * hub_width, hub_width)
    chunk_starts = starts[hub_nodes][hub_seg] + ci * hub_width
    hub_idx = np.zeros((R, hub_width), dtype=np.int32)
    hub_wgt = np.zeros((R, hub_width), dtype=np.float32)
    total = int(chunk_lens.sum())
    within = np.arange(total) - np.repeat(
        np.cumsum(chunk_lens) - chunk_lens, chunk_lens
    )
    src_pos = np.repeat(chunk_starts, chunk_lens) + within
    flat = np.repeat(np.arange(R) * hub_width, chunk_lens) + within
    hub_idx.reshape(-1)[flat] = src[src_pos]
    hub_wgt.reshape(-1)[flat] = w_norm[src_pos]
    return hub_idx, hub_wgt, hub_seg


# ======================================================================
# Scatter-free bucketed-ELL SpMV
# ======================================================================
class ELLGraph(NamedTuple):
    """Transition operator in bucketed ELLPACK form, iterated in SLOT space.

    ``jax.ops.segment_sum`` over a COO edge list lowers to scatter-style
    updates, which leave a lot of TPU bandwidth on the table. Here rows
    with similar in-degree are grouped into buckets padded to a fixed
    width W: each bucket's SpMV row block is then a dense gather +
    weighted sum — no scatter anywhere. Hub nodes (in-degree > hub width)
    are packed as ragged chunk rows of width W_hub — ceil(deg/W_hub) rows
    per hub, no cross-hub padding — reduced densely per row and combined
    with one tiny sorted segment-sum over the chunk rows.

    The PPR gather is per-row latency-bound on TPU (~20 ns per gathered
    [B]-row, independent of row bytes — measured v5e), so the layout is
    tuned to minimize GATHERED ROW COUNT:

    - **Slot space**: ``bucket_idx``/``hub_idx`` store *slot* ids — rows in
      the concatenated bucket/hub output layout — not natural node ids.
      The power iteration runs entirely in slot space, so the per-iteration
      [N, B]-row reorder gather through ``local_inv`` disappears; natural
      order is restored once at the end. Zero-in-degree nodes share the
      single guaranteed-zero slot; their PPR values follow the scalar
      recurrence c_{k+1} = (1-d) + d·c_k·R_d (see batched_ppr_ell), which
      also replaces the per-iteration [N, B] dangling-mass reduction.
    - **Fine-grained widths + small row capacity multiples**: ELL padding
      entries are gathered like real ones, so width padding is kept small
      (default widths cover every small degree) and row counts round to
      128 rather than 1024.

    Bucket/hub row counts are padded to capacity multiples so incremental
    graph growth reuses compiled executables.
    """

    bucket_idx: tuple  # per bucket: [nbcap_i, W_i] int32 SLOT ids (pad rows 0)
    bucket_wgt: tuple  # per bucket: [nbcap_i, W_i] float32 (0 = padding)
    hub_idx: Array  # [Rcap, W_hub] int32 SLOT ids
    hub_wgt: Array  # [Rcap, W_hub] float32
    hub_seg: Array  # [Rcap] int32 — owning hub slot; pad rows -> n_hub_cap
    hub_zero: Array  # [n_hub_cap] float32 zeros (static shape carrier)
    local_inv: Array  # [N_pad] int32: node -> slot in concat(parts)
    slot_to_node: Array  # [S] int32: slot -> node (junk/zero slots -> N_pad)
    dangling: Array  # [N_pad] float32 (natural order)
    num_nodes: Array  # [] int32 real node count


# Default bucket widths: exact widths for the small degrees that dominate
# KG mass, then ~25%-step geometric growth. Every padding entry costs a
# full gathered row, so tight widths buy back most of the 9-55% row
# overhead the old power-of-two widths (2..256) paid.
DEFAULT_BUCKET_WIDTHS = tuple(range(1, 17)) + (
    20, 24, 28, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
)


def ell_caps(graph: ELLGraph) -> dict:
    """Extract the shape capacities of an ELLGraph, to be passed back into
    ``ell_from_coo(min_caps=...)`` on the next incremental rebuild so the
    compiled executables (whose shapes embed these caps) are reused."""
    return {
        "bucket_rows": tuple(int(i.shape[0]) for i in graph.bucket_idx),
        "hub_rows": int(graph.hub_idx.shape[0]),
        "n_hub_cap": int(graph.hub_zero.shape[0]),
    }


def _apply_min_caps(b_idx, b_wgt, hub_idx, hub_wgt, hub_seg, n_hub_cap,
                    local_inv, min_caps):
    """Grow the packed ELL parts to at least the previous build's caps.

    Shape stickiness is what makes incremental indexing recompile-free:
    without it, any bucket whose row count crosses a row_multiple boundary
    changes the ELLGraph pytree shapes and forces a fresh XLA compile of
    every consumer. Growth pads rows with weight-0 entries (free in the
    solve: they gather slot 0 with weight 0) and shifts the slot layout
    (local_inv / hub_seg) to the new block offsets.
    """
    import numpy as np

    old_caps = [int(a.shape[0]) for a in b_idx]
    want = list(min_caps.get("bucket_rows", ()))
    if len(want) != len(old_caps):
        return b_idx, b_wgt, hub_idx, hub_wgt, hub_seg, n_hub_cap, local_inv
    new_caps = [max(c, m) for c, m in zip(old_caps, want)]
    old_r = int(hub_idx.shape[0])
    new_r = max(old_r, int(min_caps.get("hub_rows", 0)))
    old_nh, new_nh = int(n_hub_cap), max(int(n_hub_cap), int(min_caps.get("n_hub_cap", 0)))
    if new_caps == old_caps and new_r == old_r and new_nh == old_nh:
        return b_idx, b_wgt, hub_idx, hub_wgt, hub_seg, n_hub_cap, local_inv

    b_idx = [
        np.pad(a, ((0, nc - oc), (0, 0)))
        for a, oc, nc in zip(b_idx, old_caps, new_caps)
    ]
    b_wgt = [
        np.pad(a, ((0, nc - oc), (0, 0)))
        for a, oc, nc in zip(b_wgt, old_caps, new_caps)
    ]
    hub_idx = np.pad(hub_idx, ((0, new_r - old_r), (0, 0)))
    hub_wgt = np.pad(hub_wgt, ((0, new_r - old_r), (0, 0)))
    hub_seg = np.pad(
        np.asarray(hub_seg), (0, new_r - old_r), constant_values=old_nh
    )
    # pad hub rows point at the discard segment, whose id is the hub cap
    hub_seg = np.where(hub_seg == old_nh, new_nh, hub_seg).astype(np.int32)

    old_bases = np.cumsum([0] + old_caps)
    new_bases = np.cumsum([0] + new_caps)
    old_zero = int(old_bases[-1]) + old_nh
    new_zero = int(new_bases[-1]) + new_nh
    li = np.asarray(local_inv)
    # block of each slot: bucket i for s in [old_bases[i], old_bases[i+1]),
    # the hub block (index nb) for anything at or past sum(old_caps)
    block = np.searchsorted(old_bases[1:], li, side="right")
    shift = np.concatenate(
        [new_bases[:-1] - old_bases[:-1], [new_bases[-1] - old_bases[-1]]]
    )
    out = li + shift[np.minimum(block, len(old_caps))]
    out[li == old_zero] = new_zero  # zero-row marker moves with the layout
    return b_idx, b_wgt, hub_idx, hub_wgt, hub_seg, new_nh, out.astype(np.int32)


def ell_from_coo(
    src,
    dst,
    w_norm,
    dangling,
    num_nodes: int,
    node_cap: int,
    bucket_widths=DEFAULT_BUCKET_WIDTHS,
    hub_width: int = 512,
    row_multiple: int = 128,
    min_caps: dict | None = None,
) -> ELLGraph:
    """Host-side conversion from dst-sorted COO (numpy) to ELLGraph.

    Padded COO entries (w_norm == 0) are dropped. Per-bucket idx/wgt
    arrays are padded to the bucket width with weight-0 entries, and row
    counts round up to ``row_multiple`` so small incremental graph growth
    keeps array shapes (and therefore compiled executables) stable;
    ``min_caps`` (from ``ell_caps`` of the previous build) additionally
    pins every cap to at least its previous value, making incremental
    rebuilds recompile-free even across row_multiple boundaries.
    """
    import numpy as np

    src = np.asarray(src)
    dst = np.asarray(dst)
    w_norm = np.asarray(w_norm, dtype=np.float32)
    real = w_norm != 0
    src, dst, w_norm = src[real], dst[real], w_norm[real]
    widths = sorted(bucket_widths)

    validate_symmetric_operator(src, dst, dangling, node_cap, "ell_from_coo")

    # native C++ packing when available (graph/native/graph_core.cpp);
    # identical layout to the numpy fallback below
    from ..graph import native as _native

    def _build(b_idx, b_wgt, hub_idx, hub_wgt, hub_seg, n_hub_cap, local_inv):
        if min_caps:
            (b_idx, b_wgt, hub_idx, hub_wgt, hub_seg, n_hub_cap,
             local_inv) = _apply_min_caps(
                list(b_idx), list(b_wgt), np.asarray(hub_idx),
                np.asarray(hub_wgt), np.asarray(hub_seg), n_hub_cap,
                np.asarray(local_inv), min_caps,
            )
        local_inv = np.asarray(local_inv)
        caps = [i.shape[0] for i in b_idx]
        zero_row = sum(caps) + n_hub_cap
        n_slots = zero_row + 1
        # slot -> node inverse (zero/junk slots -> node_cap = appended zero row)
        slot_to_node = np.full(n_slots, node_cap, dtype=np.int32)
        nodes = np.arange(node_cap, dtype=np.int32)
        live = local_inv != zero_row
        slot_to_node[local_inv[live]] = nodes[live]
        # remap gather indices from natural node ids to slot ids so the
        # iteration never leaves slot space
        b_idx = [local_inv[i] for i in b_idx]
        hub_idx = local_inv[np.asarray(hub_idx)]
        dang = np.zeros(node_cap, dtype=np.float32)
        dang[: len(dangling)] = dangling
        return ELLGraph(
            bucket_idx=tuple(jnp.asarray(i) for i in b_idx),
            bucket_wgt=tuple(jnp.asarray(w) for w in b_wgt),
            hub_idx=jnp.asarray(hub_idx),
            hub_wgt=jnp.asarray(hub_wgt),
            hub_seg=jnp.asarray(hub_seg),
            hub_zero=jnp.zeros(n_hub_cap, jnp.float32),
            local_inv=jnp.asarray(local_inv),
            slot_to_node=jnp.asarray(slot_to_node),
            dangling=jnp.asarray(dang),
            num_nodes=jnp.asarray(num_nodes, jnp.int32),
        )

    packed = _native.ell_pack(
        src, dst, w_norm, node_cap, widths, hub_width, row_multiple
    )
    if packed is not None:
        return _build(*packed)

    indeg = np.zeros(node_cap, dtype=np.int64)
    np.add.at(indeg, dst, 1)
    # dst-sorted: row ranges via cumsum
    starts = np.zeros(node_cap + 1, dtype=np.int64)
    np.cumsum(indeg, out=starts[1:])

    prev = 0
    bucket_node_arrays = []
    for wd in widths:
        bucket_node_arrays.append(
            np.nonzero((indeg > prev) & (indeg <= wd))[0].astype(np.int32)
        )
        prev = wd
    hub_nodes = np.nonzero(indeg > widths[-1])[0].astype(np.int32)

    def _cap(n: int) -> int:
        return ((n + row_multiple - 1) // row_multiple) * row_multiple if n else 0

    bucket_idx, bucket_wgt = [], []
    for nodes, wd in zip(bucket_node_arrays, widths):
        idx, wgt = pack_ell_rows(src, w_norm, indeg, starts, nodes, wd)
        cap = _cap(len(nodes))
        if cap > len(nodes):
            idx = np.pad(idx, ((0, cap - len(nodes)), (0, 0)))
            wgt = np.pad(wgt, ((0, cap - len(nodes)), (0, 0)))
        bucket_idx.append(idx)
        bucket_wgt.append(wgt)

    # hubs: ragged chunk rows [R, W_hub] + per-row hub id
    n_hub = len(hub_nodes)
    hub_idx, hub_wgt, hub_seg = pack_hub_chunks(
        src, w_norm, indeg, starts, hub_nodes, hub_width
    )

    # hub row capacity + hub slot capacity
    r_cap = _cap(hub_idx.shape[0]) if hub_idx.shape[0] else 0
    n_hub_cap = ((n_hub + 127) // 128) * 128 if n_hub else 0
    if r_cap > hub_idx.shape[0]:
        pad = r_cap - hub_idx.shape[0]
        hub_idx = np.pad(hub_idx, ((0, pad), (0, 0)))
        hub_wgt = np.pad(hub_wgt, ((0, pad), (0, 0)))
        hub_seg = np.pad(hub_seg, (0, pad), constant_values=n_hub_cap)

    # local_inv: node -> row in concat(parts); layout = bucket row blocks,
    # hub slots, then one guaranteed-zero row (zero-in-degree + padding)
    caps = [i.shape[0] for i in bucket_idx]
    zero_row = sum(caps) + n_hub_cap
    local_inv = np.full(node_cap, zero_row, dtype=np.int32)
    base = 0
    for nodes, cap in zip(bucket_node_arrays, caps):
        local_inv[nodes] = base + np.arange(len(nodes), dtype=np.int32)
        base += cap
    local_inv[hub_nodes] = base + np.arange(n_hub, dtype=np.int32)

    return _build(bucket_idx, bucket_wgt, hub_idx, hub_wgt, hub_seg,
                  n_hub_cap, local_inv)


# Per-bucket gathered-intermediate budget: XLA materializes the
# [rows, W, B] einsum input, so buckets past the budget are reduced in
# WIDTH blocks (wc columns gathered + accumulated at a time, O(nb*wc*B)
# temp) instead of one shot. Width blocking replaced the earlier
# lax.map ROW chunking after the gather-partition probe
# (scripts/gather_partition_probe.py) measured row chunks at ~3.4x the
# unchunked per-row cost — inline-unrolled row chunks equally slow, so
# the penalty is the chunked gather structure itself — while
# column-split gathers run AT the unchunked floor (6.2 vs 6.5 ns/row,
# v5e). The old row chunking survives only as the fallback when width
# blocking would need pathologically many blocks.
_ELL_GATHER_BYTES = int(os.environ.get("HIPPO_ELL_GATHER_BYTES", 2 << 30))
# Max unrolled width blocks per bucket before falling back to row
# chunking: bounds traced-op count (compile time) when one bucket's row
# count alone exceeds the budget many times over.
_ELL_MAX_WIDTH_BLOCKS = int(os.environ.get("HIPPO_ELL_MAX_WIDTH_BLOCKS", 64))


def _bucket_plan(nb: int, w: int, b: int, itemsize: int):
    """The single branch decision shared by ``_bucket_reduce`` (execution)
    and ``bucket_reduce_plan`` (reporting): returns ``("oneshot", None)``,
    ``("width", wc)`` with block width wc, or ``("rowchunk", chunk)`` with
    row-chunk size chunk. The width path is only legal when at least one
    whole column fits the budget — when even an [nb, 1, B] gather exceeds
    it, only splitting nb (row chunks) actually bounds the temp."""
    if nb * w * b * itemsize <= _ELL_GATHER_BYTES or nb < 2:
        return "oneshot", None
    wc = _ELL_GATHER_BYTES // (nb * b * itemsize)
    if wc >= 1 and -(-w // wc) <= _ELL_MAX_WIDTH_BLOCKS:
        return "width", wc
    chunk = max(1, _ELL_GATHER_BYTES // (w * b * itemsize))
    return "rowchunk", chunk


def _bucket_reduce(p_g: Array, idx: Array, wgt: Array) -> Array:
    """[nb, W] rows -> [nb, B]; width-blocked when the gather would be huge."""
    nb, w = idx.shape
    b = p_g.shape[1]
    itemsize = jnp.dtype(p_g.dtype).itemsize

    def reduce_rows(i, g):
        return jnp.einsum(
            "nwb,nw->nb", p_g[i], g.astype(p_g.dtype),
            preferred_element_type=jnp.float32,
        )

    path, param = _bucket_plan(nb, w, b, itemsize)
    if path == "oneshot":
        return reduce_rows(idx, wgt)

    if path == "width":
        wc = param
        out = reduce_rows(idx[:, :wc], wgt[:, :wc])
        for j in range(wc, w, wc):
            out = out + reduce_rows(idx[:, j:j + wc], wgt[:, j:j + wc])
        return out

    chunk = param
    n_chunks = -(-nb // chunk)
    pad = n_chunks * chunk - nb
    idx_c = jnp.pad(idx, ((0, pad), (0, 0))).reshape(n_chunks, chunk, w)
    wgt_c = jnp.pad(wgt, ((0, pad), (0, 0))).reshape(n_chunks, chunk, w)
    out = jax.lax.map(lambda args: reduce_rows(*args), (idx_c, wgt_c))
    return out.reshape(n_chunks * chunk, -1)[:nb]


def _spmv_ell(graph: ELLGraph, p_slot: Array, gather_dtype=None) -> Array:
    """y_slot[S, B] = T @ p in SLOT space: per-bucket gather + reduce.

    Both input and output live in the concatenated bucket/hub slot layout,
    so no reorder gather is needed inside the iteration (the bucket parts
    concatenate directly into the next state). Junk capacity rows have all
    weights 0 and produce 0.

    ``gather_dtype=bfloat16`` halves the gathered-row traffic (float32
    accumulation in the reduce); per-row latency dominates on v5e though,
    so f32 is the default.
    """
    p_g = p_slot.astype(gather_dtype) if gather_dtype is not None else p_slot
    parts = []
    for idx, wgt in zip(graph.bucket_idx, graph.bucket_wgt):
        parts.append(_bucket_reduce(p_g, idx, wgt))
    n_hub_cap = graph.hub_zero.shape[0]
    if graph.hub_idx.shape[0]:
        partial = _bucket_reduce(p_g, graph.hub_idx, graph.hub_wgt)  # [Rcap, B]
        parts.append(
            jax.ops.segment_sum(
                partial,
                graph.hub_seg,
                num_segments=n_hub_cap + 1,
                indices_are_sorted=True,
            )[:n_hub_cap]
        )
    parts.append(jnp.zeros((1, p_slot.shape[1]), jnp.float32))
    return jnp.concatenate(parts, axis=0)


def _stalled(err: Array, err_prev: Array, tol, damping) -> Array:
    """True when the residual has hit its floating-point floor.

    Power iteration in f32 plateaus around 1e-8·scale; a tol just below the
    floor would otherwise silently run every iteration to max_iters (a ~5x
    latency cliff observed on the 200k-node bench graph, where the floor sat
    at 1.5e-8 against tol=1e-8). Declared stalled when the residual stopped
    improving while already within 100x of tol — at that point further
    iterations cannot change the answer.

    The non-improvement factor is max(0.995, (1+d)/2), NOT a loose 0.9:
    slow geometric regimes legitimately contract by ~d per iteration and
    must keep iterating to tol (in exact arithmetic the residual contracts
    by at least ~d per step, so a ratio above (1+d)/2 > d signals the
    floor, at ANY damping — including d >= 0.995, where the fixed 0.995
    factor alone would misread geometric progress as a stall); at the f32
    floor the ratio sits at ~1.0 and still exits within a couple of
    iterations. Pinned by test_ppr_slow_damping_reaches_tol (d = 0.95 and
    d = 0.996). Only used for the monotone power iteration — Chebyshev
    residuals are legitimately non-monotone, so its loop runs to tol or
    max_iters instead.
    """
    d = jnp.asarray(damping, err.dtype)
    factor = jnp.maximum(0.995, 0.5 * (1.0 + d))
    return jnp.logical_and(err >= factor * err_prev, err < tol * 100.0)


def _stalled2(
    err: Array, err_prev: Array, err_prev2: Array, tol, damping
) -> Array:
    """Two-consecutive-stall detector (what the solver loops actually use).

    The ~damping-per-iteration contraction argument behind ``_stalled``
    holds in L1 for stochastic operators but is not a hard bound in
    max-norm (and the exit is also wired into the directed-operator COO
    solver), so a single transient ratio >= (1+d)/2 inside the 100x-tol
    window could end iteration with the residual up to 100x tol. Requiring
    the stall condition on two CONSECUTIVE iterations filters transients:
    at the genuine f32 floor the ratio sits at ~1.0 every iteration, so
    the exit still fires within one extra step.
    """
    return jnp.logical_and(
        _stalled(err, err_prev, tol, damping),
        _stalled(err_prev, err_prev2, tol, damping),
    )


def ell_gathered_rows_per_iter(graph: ELLGraph) -> int:
    """Gathered [B]-lane rows per PPR iteration over this ELL operator
    (every ELL entry — including width/row_multiple padding — costs one
    gathered row; the measured v5e cost is ~4-8 ns/row, descriptor-bound).
    Used by the bench's roofline accounting (SURVEY.md §6)."""
    rows = sum(int(i.shape[0]) * int(i.shape[1]) for i in graph.bucket_idx)
    rows += int(graph.hub_idx.shape[0]) * int(graph.hub_idx.shape[1])
    return rows


def ell_hbm_estimate(graph: ELLGraph, batch: int) -> dict:
    """Device-memory model for a ``batched_ppr_ell`` solve — capacity
    planning for big graphs (what batch fits this chip?). Byte breakdown:

    - ``operator``: the resident ELL arrays (bucket/hub idx+wgt, maps).
    - ``states``: live [S, B]-f32 loop buffers. The while-loop body holds
      the carried state, its successor, the SpMV output, and the resident
      reset vector simultaneously (4×); one extra covers XLA transients
      around the concat/permute boundaries (measured-conservative 5×).
    - ``gather_temp``: the largest per-bucket gathered intermediate under
      the active budget/plan (``_bucket_plan``).
    - ``io``: the natural-order reset upload + result ([B, N_pad] each).

    An ESTIMATE, not an allocator readout — compare against
    ``device.memory_stats()['peak_bytes_in_use']`` where available
    (scripts/capacity_10m.py prints both).
    """
    f32 = 4
    op_bytes = sum(
        i.size * i.dtype.itemsize + w.size * w.dtype.itemsize
        for i, w in zip(graph.bucket_idx, graph.bucket_wgt)
    )
    op_bytes += (
        graph.hub_idx.size * graph.hub_idx.dtype.itemsize
        + graph.hub_wgt.size * graph.hub_wgt.dtype.itemsize
        + graph.hub_seg.size * graph.hub_seg.dtype.itemsize
        + graph.local_inv.size * 4 + graph.slot_to_node.size * 4
        + graph.dangling.size * 4
    )
    n_slots = int(graph.slot_to_node.shape[0])
    b_tile = min(batch, _PPR_BATCH_TILE)
    states = 5 * n_slots * b_tile * f32

    temp = 0
    parts = list(zip(graph.bucket_idx, graph.bucket_wgt))
    if graph.hub_idx.shape[0]:
        parts.append((graph.hub_idx, graph.hub_wgt))
    for idx, _ in parts:
        nb, w = int(idx.shape[0]), int(idx.shape[1])
        path, param = _bucket_plan(nb, w, b_tile, f32)
        if path == "oneshot":
            temp = max(temp, nb * w * b_tile * f32)
        elif path == "width":
            temp = max(temp, nb * param * b_tile * f32)
        else:
            temp = max(temp, param * w * b_tile * f32)

    n_pad = int(graph.local_inv.shape[0])
    io = 2 * batch * n_pad * f32
    total = op_bytes + states + temp + io
    return {
        "operator_bytes": op_bytes,
        "state_bytes": states,
        "gather_temp_bytes": temp,
        "io_bytes": io,
        "total_bytes": total,
        "total_gib": round(total / 2**30, 2),
    }


def bucket_reduce_plan(graph: ELLGraph, batch: int, itemsize: int = 4):
    """Which reduce path each bucket takes at this batch size — provenance
    for capacity probes ("oneshot" / "width×k" / "rowchunk×k"). Shares
    ``_bucket_plan`` with the execution path, so it cannot drift. The
    per-tile batch is what reaches the reduce, so callers should pass
    ``min(batch, _PPR_BATCH_TILE)``; pass ``itemsize=2`` when running
    ``compute_dtype="bfloat16"`` gathers."""
    plan = []
    parts = list(zip(graph.bucket_idx, graph.bucket_wgt))
    if graph.hub_idx.shape[0]:
        parts.append((graph.hub_idx, graph.hub_wgt))
    for idx, _ in parts:
        nb, w = int(idx.shape[0]), int(idx.shape[1])
        path, param = _bucket_plan(nb, w, batch, itemsize)
        if path == "oneshot":
            plan.append(f"[{nb}x{w}] oneshot")
        elif path == "width":
            plan.append(f"[{nb}x{w}] width x{-(-w // param)}")
        else:
            plan.append(f"[{nb}x{w}] rowchunk x{-(-nb // param)}")
    return plan


# Batch-axis tile for the ELL solve. XLA's ELL gather hits a latency
# cliff once the trailing (lane) axis exceeds one 128-lane tile: on v5e
# the 200k-node bench graph costs 16.8 ms/iter at B<=128 but 60 ms/iter
# at B=192..256 (3.6x for 1.5-2x the work). Solving 128-wide column
# tiles sequentially via lax.map keeps each gather in the fast layout
# (42 ms/iter at B=256) and gives every tile its own early-exit loop, so
# one slow-converging query only delays its own tile.
_PPR_BATCH_TILE = 128


def tile_columns(solve_fn, r_slot: Array, rdm: Array):
    """Run ``solve_fn(r_slot, rdm) -> tuple of [*, b] arrays`` in
    sequential _PPR_BATCH_TILE-wide column tiles when the batch axis
    exceeds one 128-lane tile (see _PPR_BATCH_TILE). Shared by the
    single-chip and sharded halo solvers so the padding/layout
    conventions can't diverge. ``solve_fn`` may return any number of
    outputs as long as each has the batch as its trailing axis.

    Padded columns have r = 0 and stay identically 0, contributing
    nothing to their tile's residual. Safe under collectives inside
    ``solve_fn``: every participant runs the same tile count in lockstep.
    """
    b = r_slot.shape[1]
    if b <= _PPR_BATCH_TILE:
        return solve_fn(r_slot, rdm)
    tile = _PPR_BATCH_TILE
    n_tiles = -(-b // tile)
    pad = n_tiles * tile - b

    def _tile(col):
        s = col.shape[0]
        return jnp.moveaxis(
            jnp.pad(col, ((0, 0), (0, pad))).reshape(s, n_tiles, tile), 1, 0
        )

    def _untile(out):
        s = out.shape[1]
        return jnp.moveaxis(out, 0, 1).reshape(s, n_tiles * tile)[:, :b]

    outs = jax.lax.map(
        lambda args: solve_fn(*args), (_tile(r_slot), _tile(rdm))
    )
    return tuple(_untile(o) for o in outs)


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "compute_dtype", "accel", "return_iters"),
)
def batched_ppr_ell(
    graph: ELLGraph,
    reset: Array,
    damping: float | Array = 0.5,
    max_iters: int = 64,
    tol: float | Array = 1.0e-8,
    compute_dtype: str | None = None,
    accel: str = "power",
    return_iters: bool = False,
) -> Array:
    """batched_ppr over the scatter-free ELL operator (same semantics).

    With ``return_iters=True`` returns ``(p, iters)`` where ``iters`` is
    the per-query iteration count actually executed ([B] int32; columns in
    the same 128-lane tile share a while-loop and therefore a count) — the
    bench uses it for roofline math (gathered rows = ELL entries x iters).

    The iteration runs in slot space (see ELLGraph): reset is permuted in
    once, the result permuted out once. Zero-in-degree nodes are carried by
    the scalar coefficient c: their iterates are p_k[v] = c_k·r[v] with
    c_{k+1} = (1-d) + d·dm_k and dm_k = c_k·R_d (R_d = reset mass on
    dangling nodes), which is exact because such nodes receive no graph
    mass — this removes both their rows and the per-iteration [N, B]
    dangling reduction from the loop.

    ``accel="chebyshev"`` runs the Chebyshev semi-iteration for the affine
    fixed point x = d*M(x) + (1-d)r (spectral radius of d*M is <= d since
    T is similar to a symmetric stochastic matrix): asymptotic convergence
    factor (1-sqrt(1-d^2))/d ~ 0.27 vs d = 0.5 per power step at the
    default damping — same fixed point. In practice it only wins when the
    graph's spectral radius is close to d (weak teleport / chain-like
    graphs); on heavy-tailed KGs the power iteration converges faster
    than the d^k worst case and stays the default.
    """
    reset = jnp.maximum(reset, 0.0)
    reset = jnp.where(jnp.isnan(reset), 0.0, reset)
    row_sum = jnp.sum(reset, axis=1, keepdims=True)
    n_real = jnp.maximum(graph.num_nodes, 1).astype(reset.dtype)
    node_ids = jax.lax.broadcasted_iota(jnp.int32, (1, reset.shape[1]), 1)
    uniform = jnp.where(node_ids < graph.num_nodes, 1.0 / n_real, 0.0)
    r = jnp.where(row_sum > 0, reset / jnp.where(row_sum > 0, row_sum, 1.0), uniform)

    r_T = r.T  # [N, B] natural order
    d = jnp.asarray(damping, dtype=r_T.dtype)

    # move into slot space: one [S]-row gather (junk slots read the appended
    # zero row), plus the dangling reset mass per batch column
    r_ext = jnp.concatenate([r_T, jnp.zeros((1, r_T.shape[1]), r_T.dtype)], axis=0)
    r_slot = r_ext[graph.slot_to_node]  # [S, B]
    reset_dangling_mass = jnp.sum(
        r_T * graph.dangling[:, None], axis=0, keepdims=True
    )  # [1, B]

    gather_dtype = (
        jnp.dtype(compute_dtype)
        if compute_dtype not in (None, "float32")
        else None
    )

    def _solve(r_slot, reset_dangling_mass):
        """Full while-loop solve for one [S, b<=tile] column block."""

        def step(p_slot, c):
            """One affine application in slot space + the zero-row coeff."""
            y = _spmv_ell(graph, p_slot, gather_dtype)
            dm = c * reset_dangling_mass
            p_next = (1.0 - d) * r_slot + d * (y + dm * r_slot)
            c_next = (1.0 - d) + d * dm
            return p_next, c_next

        one = jnp.ones((1, r_slot.shape[1]), r_slot.dtype)

        if accel == "chebyshev":
            rho2 = d * d

            def cond_c(state):
                # no stall exit here: Chebyshev residuals are legitimately
                # non-monotone mid-convergence, so a ratio-based floor
                # detector would misfire inside the 100x-tol window
                _, _, _, _, _, _, err, it = state
                return jnp.logical_and(err > tol, it < max_iters)

            def body_c(state):
                x_prev, c_prev, x, c, omega, _, err, it = state
                sx, sc = step(x, c)
                x_next = omega * (sx - x_prev) + x_prev
                c_next = omega * (sc - c_prev) + c_prev
                err_next = jnp.maximum(
                    jnp.max(jnp.abs(x_next - x)), jnp.max(jnp.abs(c_next - c))
                )
                omega_next = 1.0 / (1.0 - rho2 / 4.0 * omega)
                return x, c, x_next, c_next, omega_next, err, err_next, it + 1

            x0, c0 = r_slot, one
            x1, c1 = step(x0, c0)
            omega1 = 1.0 / (1.0 - rho2 / 2.0)
            inf = jnp.asarray(jnp.inf, r_slot.dtype)
            _, _, p_slot, c, _, _, _, it = jax.lax.while_loop(
                cond_c,
                body_c,
                (x0, c0, x1, c1, jnp.asarray(omega1, r_slot.dtype), inf, inf, 1),
            )
        else:

            def cond(state):
                _, _, err_prev2, err_prev, err, it = state
                return jnp.logical_and(
                    jnp.logical_and(err > tol, it < max_iters),
                    jnp.logical_not(
                        _stalled2(err, err_prev, err_prev2, tol, d)
                    ),
                )

            def body(state):
                p_slot, c, _, err_prev, err, it = state
                p_next, c_next = step(p_slot, c)
                err_next = jnp.maximum(
                    jnp.max(jnp.abs(p_next - p_slot)), jnp.max(jnp.abs(c_next - c))
                )
                return p_next, c_next, err_prev, err, err_next, it + 1

            inf = jnp.asarray(jnp.inf, r_slot.dtype)
            p_slot, c, _, _, _, it = jax.lax.while_loop(
                cond, body, (r_slot, one, inf, inf, inf, 0)
            )
        it_row = jnp.full((1, r_slot.shape[1]), it, jnp.int32)
        return p_slot, c, it_row

    p_slot, c, it_row = tile_columns(_solve, r_slot, reset_dangling_mass)

    # back to natural order: slots for live nodes, c·r for zero-in-degree
    zero_row = graph.slot_to_node.shape[0] - 1
    p_T = jnp.where(
        (graph.local_inv == zero_row)[:, None],
        c * r_T,
        p_slot[graph.local_inv],
    )
    if return_iters:
        return p_T.T, it_row[0]
    return p_T.T
