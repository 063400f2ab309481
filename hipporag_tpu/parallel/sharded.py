"""Mesh-sharded retrieval kernels (shard_map + XLA collectives).

Scales the single-chip pipeline (models/retrieval.py) across a
("dp", "corpus") mesh:

- **Sharded scoring**: fact/passage embedding rows live corpus-sharded;
  each device scores its shard, min-max statistics are reduced with
  pmin/pmax over the corpus axis, and per-shard top-k candidates are
  merged with an all_gather + final top_k (distributed partial top-k).
- **Sharded PPR**: graph nodes are range-partitioned over the corpus axis;
  edges are partitioned by destination shard. Each power-iteration step
  all-gathers the rank vector over ICI, computes the local destination
  segment-sum, and psum-reduces dangling mass — the halo exchange for
  blocked sparse matvec called out in SURVEY.md §2b.

Query batches are sharded over ``dp``; no collective crosses the dp axis.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.pagerank import (
    COOGraph, _bucket_reduce, _stalled2, pack_ell_rows, pack_hub_chunks,
    tile_columns, validate_symmetric_operator,
)
from ..utils.logging import get_logger
from .mesh import CORPUS_AXIS, DP_AXIS

logger = get_logger(__name__)

Array = jax.Array


class ShardedGraph(NamedTuple):
    """Graph partitioned by destination-node shard.

    All arrays carry a leading shard axis of size C (the corpus axis):
      src:       [C, Es] global source ids
      dst_local: [C, Es] destination ids local to the shard
      w_norm:    [C, Es]
      dangling:  [C, Ns] per-shard dangling mask
      num_nodes: [] total real node count
      shard_nodes: Ns (python int; nodes per shard, padded)
    """

    src: Array
    dst_local: Array
    w_norm: Array
    dangling: Array
    num_nodes: Array
    shard_nodes: int


def shard_graph(graph: COOGraph, num_shards: int) -> ShardedGraph:
    """Partition a (host, numpy) COOGraph by destination shard."""
    src = np.asarray(graph.src)
    dst = np.asarray(graph.dst)
    w = np.asarray(graph.w_norm)
    dangling = np.asarray(graph.dangling)
    n_pad = dangling.shape[0]
    ns = -(-n_pad // num_shards)
    ns = ((ns + 127) // 128) * 128  # lane-aligned shard width

    per_shard = []
    for s in range(num_shards):
        lo, hi = s * ns, (s + 1) * ns
        mask = (dst >= lo) & (dst < hi) & (w != 0)
        per_shard.append((src[mask], dst[mask] - lo, w[mask]))
    es = max(1, max(len(x[0]) for x in per_shard))
    es = ((es + 1023) // 1024) * 1024

    src_a = np.zeros((num_shards, es), dtype=np.int32)
    dst_a = np.full((num_shards, es), ns - 1, dtype=np.int32)
    w_a = np.zeros((num_shards, es), dtype=np.float32)
    dang_a = np.zeros((num_shards, ns), dtype=np.float32)
    for s, (ss, dd, ww) in enumerate(per_shard):
        order = np.argsort(dd, kind="stable")
        src_a[s, : len(ss)] = ss[order]
        dst_a[s, : len(ss)] = dd[order]
        w_a[s, : len(ss)] = ww[order]
        lo, hi = s * ns, min((s + 1) * ns, n_pad)
        if hi > lo:
            dang_a[s, : hi - lo] = dangling[lo:hi]

    return ShardedGraph(
        src=src_a,
        dst_local=dst_a,
        w_norm=w_a,
        dangling=dang_a,
        num_nodes=np.asarray(graph.num_nodes, dtype=np.int32),
        shard_nodes=ns,
    )


def put_sharded_graph(mesh, sg: ShardedGraph) -> ShardedGraph:
    """Place the per-shard arrays on their corpus-axis devices."""
    shard0 = NamedSharding(mesh, P(CORPUS_AXIS))
    return ShardedGraph(
        src=jax.device_put(sg.src, shard0),
        dst_local=jax.device_put(sg.dst_local, shard0),
        w_norm=jax.device_put(sg.w_norm, shard0),
        dangling=jax.device_put(sg.dangling, shard0),
        num_nodes=jax.device_put(sg.num_nodes, NamedSharding(mesh, P())),
        shard_nodes=sg.shard_nodes,
    )


# ---------------------------------------------------------------------------
# Sharded batched PPR
# ---------------------------------------------------------------------------

def make_sharded_ppr(mesh, max_iters: int = 64, damping: float = 0.5, tol: float = 1e-8):
    """Build a jitted sharded PPR: reset [B, N_total] -> ranks [B, N_total].

    N_total must equal C * shard_nodes (caller pads); reset enters sharded
    (dp over rows, corpus over cols) and the result comes back the same way.
    """

    def ppr_shard(src, dst_local, w_norm, dangling, num_nodes, reset):
        # shapes inside: src [1, Es], dangling [1, Ns], reset [B/dp, Ns]
        src = src[0]
        dst_local = dst_local[0]
        w_norm = w_norm[0]
        dangling = dangling[0]
        ns = reset.shape[1]

        reset = jnp.maximum(jnp.nan_to_num(reset, nan=0.0), 0.0)
        local_sum = jnp.sum(reset, axis=1, keepdims=True)
        total = jax.lax.psum(local_sum, CORPUS_AXIS)
        # zero-reset rows: uniform over real nodes (see ops/pagerank.py)
        shard_idx = jax.lax.axis_index(CORPUS_AXIS)
        node_ids = shard_idx * ns + jax.lax.broadcasted_iota(jnp.int32, (1, ns), 1)
        n_real = jnp.maximum(num_nodes, 1).astype(reset.dtype)
        uniform = jnp.where(node_ids < num_nodes, 1.0 / n_real, 0.0)
        r = jnp.where(total > 0, reset / jnp.where(total > 0, total, 1.0), uniform)

        d = jnp.asarray(damping, r.dtype)
        # transposed layout [Ns, b]: the per-iteration gather's trailing
        # axis is the batch, so the shared tile_columns scaffold keeps it
        # within one 128-lane tile (same cliff all other solvers tile
        # around), and each tile gets its own early-exit loop
        r_T = r.T

        def _solve(r_t, _unused):
            def body(state):
                p_t, _, err_prev, err, it = state
                p_full = jax.lax.all_gather(
                    p_t, CORPUS_AXIS, axis=0, tiled=True
                )  # [N, b]
                gathered = p_full[src] * w_norm[:, None]  # [Es, b]
                y = jax.ops.segment_sum(
                    gathered, dst_local, num_segments=ns, indices_are_sorted=True
                )  # [Ns, b]
                dm_local = jnp.sum(p_t * dangling[:, None], axis=0, keepdims=True)
                dm = jax.lax.psum(dm_local, CORPUS_AXIS)
                p_next = (1.0 - d) * r_t + d * (y + dm * r_t)
                err_next = jax.lax.pmax(
                    jnp.max(jnp.abs(p_next - p_t)), CORPUS_AXIS
                )
                return p_next, err_prev, err, err_next, it + 1

            def cond(state):
                _, err_prev2, err_prev, err, it = state
                return jnp.logical_and(
                    jnp.logical_and(err > tol, it < max_iters),
                    jnp.logical_not(
                        _stalled2(err, err_prev, err_prev2, tol, d)
                    ),
                )

            inf = jnp.asarray(jnp.inf, r_t.dtype)
            p_t, _, _, _, _ = jax.lax.while_loop(
                cond, body, (r_t, inf, inf, inf, 0)
            )
            return p_t, _unused

        p_T, _ = tile_columns(
            _solve, r_T, jnp.zeros((1, r_T.shape[1]), r_T.dtype)
        )
        return p_T.T

    mapped = shard_map(
        ppr_shard,
        mesh=mesh,
        in_specs=(
            P(CORPUS_AXIS, None),  # src
            P(CORPUS_AXIS, None),  # dst_local
            P(CORPUS_AXIS, None),  # w_norm
            P(CORPUS_AXIS, None),  # dangling
            P(),  # num_nodes
            P(DP_AXIS, CORPUS_AXIS),  # reset
        ),
        out_specs=P(DP_AXIS, CORPUS_AXIS),
        check_vma=False,
    )

    @jax.jit
    def run(sg: ShardedGraph, reset: Array) -> Array:
        return mapped(sg.src, sg.dst_local, sg.w_norm, sg.dangling, sg.num_nodes, reset)

    return run


# ---------------------------------------------------------------------------
# Sharded scoring + distributed top-k
# ---------------------------------------------------------------------------

def _norm_scores_shard(q, keys, valid_n, dtype):
    """Per-shard matmul + DISTRIBUTED min-max normalization: the single
    copy of the normalization semantics (must match
    ops/scoring.min_max_normalize and the reference's per-query min-max,
    HippoRAG.py:1459-1461 — incl. the rng==0 constant-row convention).
    Shared by the top-k scorer and the DPR norm-scores path so fact
    scoring and passage seeding can never disagree on the same mesh.
    Returns (norm [B/dp, Nk/c] with invalid cols 0, valid mask, base)."""
    nk = keys.shape[0]
    shard_idx = jax.lax.axis_index(CORPUS_AXIS)
    base = shard_idx * nk
    raw = jax.lax.dot_general(
        q.astype(dtype),
        keys.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    col = base + jax.lax.broadcasted_iota(jnp.int32, raw.shape, 1)
    valid = col < valid_n
    # global min-max over real columns
    lo = jax.lax.pmin(
        jnp.min(jnp.where(valid, raw, jnp.inf), axis=1, keepdims=True),
        CORPUS_AXIS,
    )
    hi = jax.lax.pmax(
        jnp.max(jnp.where(valid, raw, -jnp.inf), axis=1, keepdims=True),
        CORPUS_AXIS,
    )
    rng = hi - lo
    norm = jnp.where(rng == 0, 1.0, (raw - lo) / jnp.where(rng == 0, 1.0, rng))
    return jnp.where(valid, norm, 0.0), valid, base


def make_sharded_score_topk(mesh, k: int, compute_dtype: str = "float32"):
    """Build a jitted sharded scorer.

    queries [B, D] (dp-sharded rows) x keys [N, D] (corpus-sharded rows) ->
    (normalized scores [B, N] dp/corpus-sharded, topk values [B, k], topk
    global indices [B, k], both dp-sharded and corpus-replicated).
    """
    dtype = jnp.dtype(compute_dtype)

    def score_shard(q, keys, valid_n):
        # q [B/dp, D]; keys [Nk/c, D]
        nk = keys.shape[0]
        norm, valid, base = _norm_scores_shard(q, keys, valid_n, dtype)

        # local top-k then all-gather + merge
        k_local = min(k, nk)
        vals_l, idx_l = jax.lax.top_k(jnp.where(valid, norm, -jnp.inf), k_local)
        gidx_l = idx_l + base
        vals_all = jax.lax.all_gather(vals_l, CORPUS_AXIS, axis=1, tiled=True)
        gidx_all = jax.lax.all_gather(gidx_l, CORPUS_AXIS, axis=1, tiled=True)
        # the merged candidate pool can be smaller than k on tiny shards
        k_merge = min(k, vals_all.shape[1])
        vals, merge_idx = jax.lax.top_k(vals_all, k_merge)
        gidx = jnp.take_along_axis(gidx_all, merge_idx, axis=1)
        return norm, vals, gidx

    mapped = shard_map(
        score_shard,
        mesh=mesh,
        in_specs=(P(DP_AXIS, None), P(CORPUS_AXIS, None), P()),
        out_specs=(P(DP_AXIS, CORPUS_AXIS), P(DP_AXIS), P(DP_AXIS)),
        check_vma=False,
    )

    @jax.jit
    def run(queries: Array, keys: Array, valid_n: Array):
        return mapped(queries, keys, valid_n)

    return run


# ---------------------------------------------------------------------------
# Sharded scatter-free (bucketed-ELL) PPR
# ---------------------------------------------------------------------------

class ShardedELLGraph(NamedTuple):
    """Destination-sharded bucketed-ELL operator with HALO EXCHANGE.

    Every array carries a leading shard axis C. The graph must be the
    symmetric (undirected) transition operator — the builder guarantees it;
    dst-partitioning then means each shard computes the full in-mass of its
    own nodes, so shard-local zero-in-degree equals global isolation.

    Unlike the round-1 design — which all-gathered the whole rank vector
    every iteration, O(B·N_total) ICI bytes per device — each shard now
    exchanges only the *boundary* rank rows its edges actually reference
    (SURVEY.md §2b "ICI halo exchange"):

    - ``send_ids[t, s]`` holds the slot ids (in owner t's slot space) of the
      rows t must ship to shard s each iteration, padded to the static halo
      capacity H = max cut over all (t, s) pairs.
    - Per iteration: one [C, H, B] gather + ``all_to_all`` over the corpus
      axis, then the local SpMV reads from q = [own slots ; halo blocks].
      ICI bytes/iteration/device = C·H·B·4 — scaling with the edge cut,
      not with N_total.

    The per-shard layout mirrors ops/pagerank.ELLGraph slot space: bucket
    and hub gather indices are q-space ids, the iteration state is the
    concatenated bucket/hub output, zero-in-degree nodes ride the shared
    scalar coefficient recurrence, and natural local order is restored once
    at the end through ``local_inv``.
    """

    bucket_idx: tuple  # per bucket: [C, nb_i, W_i] int32 q-space ids
    bucket_wgt: tuple  # per bucket: [C, nb_i, W_i] float32
    hub_idx: Array  # [C, R, W_hub] int32 q-space ids
    hub_wgt: Array  # [C, R, W_hub] float32
    hub_seg: Array  # [C, R] int32 (local hub row; padded rows -> n_hub slot)
    local_inv: Array  # [C, Ns] int32: local node -> slot
    slot_to_node: Array  # [C, S] int32: slot -> local node (junk -> Ns)
    send_ids: Array  # [C, C, H] int32: slot ids owner c ships to each peer
    dangling: Array  # [C, Ns]
    num_nodes: Array  # [] int32
    shard_nodes: int
    n_hub: int  # static hub slot count (max across shards)
    n_slots: int  # static per-shard slot count S (incl. zero row)
    halo_width: int  # static H: halo rows exchanged per (owner, peer) pair


def shard_graph_ell(
    graph: COOGraph,
    num_shards: int,
    bucket_widths=(1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 128, 256),
    hub_width: int = 512,
) -> ShardedELLGraph:
    """Partition a host COOGraph into per-shard halo-ELL structures (numpy).

    Logs the halo-exchange comm volume so the cut-vs-N_total scaling is
    visible: bytes/iter/device = C·H·B·4 (vs Ns·C·B·4 for the old
    all_gather design).
    """
    src = np.asarray(graph.src)
    dst = np.asarray(graph.dst)
    w = np.asarray(graph.w_norm)
    dangling = np.asarray(graph.dangling)
    n_pad = dangling.shape[0]
    real_e = w != 0
    validate_symmetric_operator(
        src[real_e], dst[real_e], dangling, n_pad, "shard_graph_ell"
    )
    ns = -(-n_pad // num_shards)
    ns = ((ns + 127) // 128) * 128
    widths = sorted(bucket_widths)

    # ---- pass 1: halo lists. halo[s][t] = sorted unique global src ids
    # owned by t that appear in shard s's edges (t != s).
    owner_all = np.minimum(src // ns, num_shards - 1)
    halo: list[list[np.ndarray]] = []
    per_shard_edges = []
    for s in range(num_shards):
        lo, hi = s * ns, (s + 1) * ns
        mask = (dst >= lo) & (dst < hi) & (w != 0)
        ss, dd, ww = src[mask], (dst[mask] - lo).astype(np.int64), w[mask]
        order = np.argsort(dd, kind="stable")
        ss, dd, ww = ss[order], dd[order], ww[order]
        per_shard_edges.append((ss, dd, ww))
        owners = owner_all[mask][order]
        lists = []
        for t in range(num_shards):
            if t == s:
                lists.append(np.zeros(0, dtype=np.int64))
            else:
                lists.append(np.unique(ss[owners == t]))
        halo.append(lists)

    cut = sum(len(l) for ls in halo for l in ls)
    h_cap = max((len(l) for ls in halo for l in ls), default=0)
    h_cap = max(8, ((h_cap + 7) // 8) * 8)  # sublane-aligned halo rows
    logger.info(
        "halo exchange: C=%d, H=%d, cut=%d boundary rows; "
        "ICI bytes/iter/device = C*H*B*4 = %d*B vs all_gather %d*B",
        num_shards, h_cap, cut,
        num_shards * h_cap * 4, ns * num_shards * 4,
    )

    shards = []
    for s in range(num_shards):
        ss, dd, ww = per_shard_edges[s]
        indeg = np.zeros(ns, dtype=np.int64)
        np.add.at(indeg, dd, 1)
        starts = np.zeros(ns + 1, dtype=np.int64)
        np.cumsum(indeg, out=starts[1:])

        prev = 0
        b_nodes, b_idx, b_wgt = [], [], []
        for wd in widths:
            nodes = np.nonzero((indeg > prev) & (indeg <= wd))[0].astype(np.int32)
            prev = wd
            i_, w_ = pack_ell_rows(ss, ww, indeg, starts, nodes, wd)
            b_nodes.append(nodes)
            b_idx.append(i_)
            b_wgt.append(w_)
        hub_nodes = np.nonzero(indeg > widths[-1])[0].astype(np.int32)
        hidx, hwgt, hseg = pack_hub_chunks(ss, ww, indeg, starts, hub_nodes, hub_width)
        shards.append((b_nodes, b_idx, b_wgt, hub_nodes, hidx, hwgt, hseg))

    # pad per-bucket row counts / hub rows / hub count to the max over shards
    nb_max = [max(len(sh[0][i]) for sh in shards) for i in range(len(widths))]
    r_max = max(1, max(sh[4].shape[0] for sh in shards))
    nhub_max = max(1, max(len(sh[3]) for sh in shards))

    bucket_idx = tuple(
        np.zeros((num_shards, nb_max[i], widths[i]), dtype=np.int32)
        for i in range(len(widths))
    )
    bucket_wgt = tuple(
        np.zeros((num_shards, nb_max[i], widths[i]), dtype=np.float32)
        for i in range(len(widths))
    )
    hub_idx = np.zeros((num_shards, r_max, hub_width), dtype=np.int32)
    hub_wgt = np.zeros((num_shards, r_max, hub_width), dtype=np.float32)
    hub_seg = np.full((num_shards, r_max), nhub_max, dtype=np.int32)
    local_inv = np.zeros((num_shards, ns), dtype=np.int32)
    dang = np.zeros((num_shards, ns), dtype=np.float32)

    # concat(parts) layout per shard: bucket rows..., hub slots, one zero row
    zero_row = sum(nb_max) + nhub_max
    n_slots = zero_row + 1
    slot_to_node = np.full((num_shards, n_slots), ns, dtype=np.int32)
    send_ids = np.full((num_shards, num_shards, h_cap), zero_row, dtype=np.int32)

    for s, (b_nodes, b_idx, b_wgt, hub_nodes, hidx, hwgt, hseg) in enumerate(shards):
        local_inv[s, :] = zero_row
        base = 0
        for i in range(len(widths)):
            nb = len(b_nodes[i])
            bucket_idx[i][s, :nb] = b_idx[i]
            bucket_wgt[i][s, :nb] = b_wgt[i]
            local_inv[s, b_nodes[i]] = base + np.arange(nb)
            base += nb_max[i]
        hub_idx[s, : hidx.shape[0]] = hidx
        hub_wgt[s, : hwgt.shape[0]] = hwgt
        hub_seg[s, : len(hseg)] = hseg
        local_inv[s, hub_nodes] = base + np.arange(len(hub_nodes))
        live = local_inv[s] != zero_row
        slot_to_node[s, local_inv[s, live]] = np.nonzero(live)[0].astype(np.int32)
        lo, hi = s * ns, min((s + 1) * ns, n_pad)
        if hi > lo:
            dang[s, : hi - lo] = dangling[lo:hi]

    # owner t -> peer s send lists, as slot ids in t's slot space
    for t in range(num_shards):
        for s in range(num_shards):
            ids = halo[s][t]  # global ids owned by t needed by s
            if len(ids):
                send_ids[t, s, : len(ids)] = local_inv[t, ids - t * ns]

    # remap each shard's gather indices from GLOBAL node ids to q space:
    # q = [own slots (S rows) ; halo block per owner (C x H rows)]
    def to_q(s: int, g_idx: np.ndarray) -> np.ndarray:
        out = np.full(g_idx.shape, zero_row, dtype=np.int32)  # pad -> zero slot
        owner = np.minimum(g_idx // ns, num_shards - 1)
        own = owner == s
        out[own] = local_inv[s, g_idx[own] - s * ns]
        for t in range(num_shards):
            if t == s:
                continue
            m = owner == t
            if not m.any():
                continue
            pos = np.searchsorted(halo[s][t], g_idx[m])
            out[m] = n_slots + t * h_cap + pos
        return out

    for s, (b_nodes, b_idx, b_wgt, hub_nodes, hidx, hwgt, hseg) in enumerate(shards):
        base = 0
        for i in range(len(widths)):
            nb = len(b_nodes[i])
            if nb:
                # padding entries inside rows have weight 0; their index is
                # remapped like a real one (bounded by to_q's zero fallback)
                real = b_wgt[i] != 0
                q_idx = np.full(b_idx[i].shape, zero_row, dtype=np.int32)
                q_idx[real] = to_q(s, b_idx[i][real])
                bucket_idx[i][s, :nb] = q_idx
            base += nb_max[i]
        if hidx.shape[0]:
            real = hwgt != 0
            q_idx = np.full(hidx.shape, zero_row, dtype=np.int32)
            q_idx[real] = to_q(s, hidx[real])
            hub_idx[s, : hidx.shape[0]] = q_idx

    return ShardedELLGraph(
        bucket_idx=bucket_idx,
        bucket_wgt=bucket_wgt,
        hub_idx=hub_idx,
        hub_wgt=hub_wgt,
        hub_seg=hub_seg,
        local_inv=local_inv,
        slot_to_node=slot_to_node,
        send_ids=send_ids,
        dangling=dang,
        num_nodes=np.asarray(graph.num_nodes, dtype=np.int32),
        shard_nodes=ns,
        n_hub=nhub_max,
        n_slots=n_slots,
        halo_width=h_cap,
    )


def put_sharded_ell(mesh, sg: ShardedELLGraph) -> ShardedELLGraph:
    shard0 = NamedSharding(mesh, P(CORPUS_AXIS))
    rep = NamedSharding(mesh, P())

    def place(x):
        return jax.device_put(jnp.asarray(x), shard0)

    return ShardedELLGraph(
        bucket_idx=tuple(place(x) for x in sg.bucket_idx),
        bucket_wgt=tuple(place(x) for x in sg.bucket_wgt),
        hub_idx=place(sg.hub_idx),
        hub_wgt=place(sg.hub_wgt),
        hub_seg=place(sg.hub_seg),
        local_inv=place(sg.local_inv),
        slot_to_node=place(sg.slot_to_node),
        send_ids=place(sg.send_ids),
        dangling=place(sg.dangling),
        num_nodes=jax.device_put(jnp.asarray(sg.num_nodes), rep),
        shard_nodes=sg.shard_nodes,
        n_hub=sg.n_hub,
        n_slots=sg.n_slots,
        halo_width=sg.halo_width,
    )


def sharded_ell_counters(sg: ShardedELLGraph, batch: int, dp: int = 1) -> dict:
    """Per-device WORK counters for one sharded PPR iteration — the
    numbers a scaling claim must be backed by (VERDICT r3 #3/#6: wall
    clock on an oversubscribed virtual CPU mesh says nothing; rows
    gathered and ICI bytes per device do).

    - ``rows_gathered_per_iter_device``: every ELL entry (including
      width/row padding) costs one gathered [B/dp]-lane row per iteration
      on its shard — the descriptor-rate-bound quantity on TPU.
    - ``halo_ici_bytes_per_iter_device``: the [C, H, B/dp] all_to_all
      block each device ships per iteration (C·H·(B/dp)·4).
    - ``allgather_ici_bytes_per_iter_device``: what the naive design
      would ship ((C-1)·Ns·(B/dp)·4) — the comparison point.
    """
    b_lane = max(1, batch // max(dp, 1))
    c = int(sg.send_ids.shape[0])
    rows = sum(int(i.shape[1]) * int(i.shape[2]) for i in sg.bucket_idx)
    rows += int(sg.hub_idx.shape[1]) * int(sg.hub_idx.shape[2])
    real_entries = sum(
        int(np.count_nonzero(np.asarray(w))) for w in sg.bucket_wgt
    ) + int(np.count_nonzero(np.asarray(sg.hub_wgt)))
    return {
        "num_shards": c,
        "shard_nodes": int(sg.shard_nodes),
        "n_slots": int(sg.n_slots),
        "halo_rows_per_peer": int(sg.halo_width),
        "halo_frac_of_shard": round(sg.halo_width / sg.shard_nodes, 4),
        "rows_gathered_per_iter_device": rows,
        "real_entries_per_device": real_entries // max(c, 1),
        "ell_padding_overhead": round(rows * c / max(real_entries, 1), 3),
        "halo_ici_bytes_per_iter_device": c * sg.halo_width * b_lane * 4,
        "allgather_ici_bytes_per_iter_device": (c - 1)
        * int(sg.shard_nodes)
        * b_lane
        * 4,
    }


def sharded_ell_hbm_estimate(
    batch: int,
    num_shards: int,
    shard_nodes: int,
    n_slots: int,
    halo_width: int,
    entries_per_device: int,
    dp: int = 1,
    gather_budget_bytes: int | None = None,
) -> dict:
    """Per-DEVICE memory model for a sharded halo-ELL PPR solve — the
    pod-capacity planner (BASELINE.md's 10M-node/100M-edge stretch row).

    Takes plain structural integers (not a built graph) so pod-scale
    configs can be checked without materializing the 100M-entry operator
    on the host. Byte breakdown, mirroring ops/pagerank.ell_hbm_estimate
    but per shard:

    - ``operator``: the shard's ELL entries (idx int32 + wgt f32 = 8 B
      per padded entry) plus the maps (local_inv, slot_to_node, send_ids,
      dangling).
    - ``states``: live [Sq, B/dp]-f32 loop buffers, where Sq = n_slots +
      C·H (own slots plus the received halo blocks). Same 5x accounting
      as the single-chip model (carried state, successor, SpMV output,
      reset, transients).
    - ``halo_buffers``: the [C, H, B/dp] send + receive all_to_all blocks.
    - ``gather_temp``: bounded by the active gather budget (the bucket
      reduce width-blocks anything larger — ops/pagerank._bucket_plan).
    - ``io``: natural-order reset upload + result, [B/dp, Ns] each.
    """
    from ..ops.pagerank import _ELL_GATHER_BYTES, _PPR_BATCH_TILE

    if gather_budget_bytes is None:
        gather_budget_bytes = _ELL_GATHER_BYTES
    b_lane = max(1, batch // max(dp, 1))
    b_tile = min(b_lane, _PPR_BATCH_TILE)
    sq = n_slots + num_shards * halo_width
    operator = entries_per_device * 8 + (shard_nodes * 2 + n_slots) * 4
    operator += num_shards * halo_width * 4  # send_ids row
    states = 5 * sq * b_tile * 4
    halo_buffers = 2 * num_shards * halo_width * b_tile * 4
    gather_temp = min(gather_budget_bytes, entries_per_device * b_tile * 4)
    io = 2 * b_lane * shard_nodes * 4
    total = operator + states + halo_buffers + gather_temp + io
    return {
        "operator_bytes": operator,
        "states_bytes": states,
        "halo_buffer_bytes": halo_buffers,
        "gather_temp_bytes": gather_temp,
        "io_bytes": io,
        "total_bytes": total,
        "total_gib": round(total / 2**30, 3),
        "batch": batch,
        "b_tile": b_tile,
    }


def make_sharded_ppr_ell(
    mesh, max_iters: int = 64, damping: float = 0.5, tol: float = 1e-8,
    n_hub: int | None = None,
):
    """Sharded scatter-free halo-exchange PPR: reset [B, N_total] -> ranks.

    Per iteration each shard gathers its boundary rows into a [C, H, B]
    send buffer, swaps them with ``all_to_all`` over the corpus axis (ICI
    bytes scale with the edge cut, not N_total), reduces its ELL row
    blocks densely from q = [own slots ; halo], and advances the shared
    zero-row coefficient by the scalar dangling recurrence (see
    ops/pagerank.batched_ppr_ell). Early exit is stall-aware. Jitted
    programs are cached per padded-shape signature, so the returned
    callable survives re-sharding after incremental indexing without
    recompiling when shapes are unchanged. ``n_hub`` is taken from the
    graph (parameter kept for API compatibility).
    """
    del n_hub  # derived from sg (static NamedTuple fields)
    num_shards = 1
    for axis, size in zip(mesh.axis_names, mesh.devices.shape):
        if axis == CORPUS_AXIS:
            num_shards = size

    def make_ppr_shard(n_hub, n_slots, h_cap):
     def ppr_shard(b_idx, b_wgt, hub_idx, hub_wgt, hub_seg, local_inv,
                  slot_to_node, send_ids, dangling, num_nodes, reset):
        b_idx = tuple(x[0] for x in b_idx)
        b_wgt = tuple(x[0] for x in b_wgt)
        hub_idx, hub_wgt, hub_seg = hub_idx[0], hub_wgt[0], hub_seg[0]
        local_inv, dangling = local_inv[0], dangling[0]
        slot_to_node, send_ids = slot_to_node[0], send_ids[0]
        ns = reset.shape[1]
        zero_row = n_slots - 1

        reset = jnp.maximum(jnp.nan_to_num(reset, nan=0.0), 0.0)
        local_sum = jnp.sum(reset, axis=1, keepdims=True)
        total = jax.lax.psum(local_sum, CORPUS_AXIS)
        shard_idx = jax.lax.axis_index(CORPUS_AXIS)
        node_ids = shard_idx * ns + jax.lax.broadcasted_iota(jnp.int32, (1, ns), 1)
        n_real = jnp.maximum(num_nodes, 1).astype(reset.dtype)
        uniform = jnp.where(node_ids < num_nodes, 1.0 / n_real, 0.0)
        r = jnp.where(total > 0, reset / jnp.where(total > 0, total, 1.0), uniform)
        d = jnp.asarray(damping, r.dtype)

        # slot space: one [S]-row gather in, scalar dangling mass
        r_T = r.T  # [Ns, B/dp]
        r_ext = jnp.concatenate([r_T, jnp.zeros((1, r_T.shape[1]), r_T.dtype)], axis=0)
        r_slot = r_ext[slot_to_node]  # [S, B/dp]
        rdm_local = jnp.sum(r_T * dangling[:, None], axis=0, keepdims=True)
        reset_dangling_mass = jax.lax.psum(rdm_local, CORPUS_AXIS)  # [1, B/dp]

        def _solve(r_slot, reset_dangling_mass):
            """Full while-loop solve for one [S, b<=tile] column block.

            Safe under lax.map across shards: every shard runs the same
            tile count in lockstep, and the while-loop trip count is
            shard-uniform (err is pmax-reduced), so the per-iteration
            all_to_all sequences line up."""

            def body(state):
                p_slot, c, _, err_prev, err, it = state
                # ---- halo exchange: ship boundary rows over ICI ----
                send = p_slot[send_ids]  # [C, H, b]
                if num_shards > 1:
                    recv = jax.lax.all_to_all(
                        send, CORPUS_AXIS, split_axis=0, concat_axis=0,
                        tiled=True,
                    )
                else:
                    recv = send
                q = jnp.concatenate(
                    [p_slot, recv.reshape(num_shards * h_cap, -1)], axis=0
                )
                # budget-aware per-bucket reduce (shared with the
                # single-chip solver): at pod scale a shard's biggest
                # bucket alone can gather a multi-GB [nb, W, B]
                # intermediate, so over-budget buckets accumulate in
                # width blocks instead of one shot
                parts = [
                    _bucket_reduce(q, i, g) for i, g in zip(b_idx, b_wgt)
                ]
                hub_partial = _bucket_reduce(q, hub_idx, hub_wgt)
                parts.append(
                    jax.ops.segment_sum(
                        hub_partial, hub_seg, num_segments=n_hub + 1,
                        indices_are_sorted=True,
                    )[:n_hub]
                )
                parts.append(jnp.zeros((1, q.shape[1]), q.dtype))
                y = jnp.concatenate(parts, axis=0)  # [S, b] slot order
                dm = c * reset_dangling_mass
                p_next = (1.0 - d) * r_slot + d * (y + dm * r_slot)
                c_next = (1.0 - d) + d * dm
                err_next = jnp.maximum(
                    jnp.max(jnp.abs(p_next - p_slot)),
                    jnp.max(jnp.abs(c_next - c)),
                )
                err_next = jax.lax.pmax(err_next, CORPUS_AXIS)
                return p_next, c_next, err_prev, err, err_next, it + 1

            def cond(state):
                _, _, err_prev2, err_prev, err, it = state
                return jnp.logical_and(
                    jnp.logical_and(err > tol, it < max_iters),
                    jnp.logical_not(
                        _stalled2(err, err_prev, err_prev2, tol, d)
                    ),
                )

            one = jnp.ones((1, r_slot.shape[1]), r_slot.dtype)
            inf = jnp.asarray(jnp.inf, r_slot.dtype)
            p_slot, c, _, _, _, _ = jax.lax.while_loop(
                cond, body, (r_slot, one, inf, inf, inf, 0)
            )
            return p_slot, c

        # solve 128-lane column tiles sequentially past one lane tile —
        # the same XLA gather latency cliff batched_ppr_ell tiles around;
        # shared scaffold (ops/pagerank.tile_columns), per-tile early exit.
        p_slot, c = tile_columns(_solve, r_slot, reset_dangling_mass)
        p_T = jnp.where(
            (local_inv == zero_row)[:, None], c * r_T, p_slot[local_inv]
        )
        return p_T.T
     return ppr_shard

    _jitted = {}

    def run(sg: ShardedELLGraph, reset: Array) -> Array:
        n_buckets = len(sg.bucket_idx)
        key = (n_buckets, sg.n_hub, sg.n_slots, sg.halo_width)
        fn = _jitted.get(key)
        if fn is None:
            ppr_shard = make_ppr_shard(sg.n_hub, sg.n_slots, sg.halo_width)
            spec_sharded = P(CORPUS_AXIS, None, None)
            mapped = shard_map(
                ppr_shard,
                mesh=mesh,
                in_specs=(
                    (spec_sharded,) * n_buckets,
                    (spec_sharded,) * n_buckets,
                    spec_sharded,
                    spec_sharded,
                    P(CORPUS_AXIS, None),
                    P(CORPUS_AXIS, None),
                    P(CORPUS_AXIS, None),
                    spec_sharded,
                    P(CORPUS_AXIS, None),
                    P(),
                    P(DP_AXIS, CORPUS_AXIS),
                ),
                out_specs=P(DP_AXIS, CORPUS_AXIS),
                check_vma=False,
            )
            fn = _jitted[key] = jax.jit(mapped)
        return fn(
            sg.bucket_idx, sg.bucket_wgt, sg.hub_idx, sg.hub_wgt, sg.hub_seg,
            sg.local_inv, sg.slot_to_node, sg.send_ids, sg.dangling,
            sg.num_nodes, reset,
        )

    return run


def make_sharded_norm_scores(mesh, compute_dtype: str = "float32"):
    """Sharded normalized scoring WITHOUT the distributed top-k stage.

    The sharded analog of ops/scoring.batched_normalized_scores — used for
    DPR passage seeding where the full [B, P] normalized matrix is needed
    and a top-k merge would be wasted collective traffic.
    """
    dtype = jnp.dtype(compute_dtype)

    def score_shard(q, keys, valid_n):
        norm, _, _ = _norm_scores_shard(q, keys, valid_n, dtype)
        return norm

    mapped = shard_map(
        score_shard,
        mesh=mesh,
        in_specs=(P(DP_AXIS, None), P(CORPUS_AXIS, None), P()),
        out_specs=P(DP_AXIS, CORPUS_AXIS),
        check_vma=False,
    )
    return jax.jit(mapped)
