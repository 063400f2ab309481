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

from ..ops.pagerank import COOGraph
from .mesh import CORPUS_AXIS, DP_AXIS

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

        def body(state):
            p, _, it = state
            p_full = jax.lax.all_gather(p, CORPUS_AXIS, axis=1, tiled=True)  # [B/dp, N]
            gathered = p_full.T[src] * w_norm[:, None]  # [Es, B/dp]
            y = jax.ops.segment_sum(
                gathered, dst_local, num_segments=ns, indices_are_sorted=True
            ).T  # [B/dp, Ns]
            dm_local = jnp.sum(p * dangling[None, :], axis=1, keepdims=True)
            dm = jax.lax.psum(dm_local, CORPUS_AXIS)
            p_next = (1.0 - d) * r + d * (y + dm * r)
            err_local = jnp.max(jnp.abs(p_next - p))
            err = jax.lax.pmax(err_local, CORPUS_AXIS)
            return p_next, err, it + 1

        def cond(state):
            _, err, it = state
            return jnp.logical_and(err > tol, it < max_iters)

        p, _, _ = jax.lax.while_loop(cond, body, (r, jnp.asarray(jnp.inf, r.dtype), 0))
        return p

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
        lo_l = jnp.min(jnp.where(valid, raw, jnp.inf), axis=1, keepdims=True)
        hi_l = jnp.max(jnp.where(valid, raw, -jnp.inf), axis=1, keepdims=True)
        lo = jax.lax.pmin(lo_l, CORPUS_AXIS)
        hi = jax.lax.pmax(hi_l, CORPUS_AXIS)
        rng = hi - lo
        norm = jnp.where(rng == 0, 1.0, (raw - lo) / jnp.where(rng == 0, 1.0, rng))
        norm = jnp.where(valid, norm, 0.0)

        # local top-k then all-gather + merge
        k_local = min(k, nk)
        vals_l, idx_l = jax.lax.top_k(jnp.where(valid, norm, -jnp.inf), k_local)
        gidx_l = idx_l + base
        vals_all = jax.lax.all_gather(vals_l, CORPUS_AXIS, axis=1, tiled=True)
        gidx_all = jax.lax.all_gather(gidx_l, CORPUS_AXIS, axis=1, tiled=True)
        vals, merge_idx = jax.lax.top_k(vals_all, k)
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
