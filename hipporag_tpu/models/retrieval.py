"""Flagship model: batched graph retrieval pipeline.

The reference processes queries one at a time through Python
(HippoRAG.py:459-480: fact scoring → seed-weight construction → igraph PPR).
Here the whole query batch advances through ONE jitted function operating on
[B, ...] arrays: seed construction is scatter-based, PPR is the batched
power iteration from ops/pagerank.py, and the final passage ranking comes
out as a [B, P] score matrix. This is the structural TPU win called out in
SURVEY.md §3 ("batching step 3's reset vectors").

Score semantics are kept exactly (HippoRAG.py:1544-1656):
- each top fact contributes ``fact_score / |chunks containing endpoint|`` to
  both endpoint phrases; per-phrase weights are averaged over the number of
  contributions;
- only the ``link_top_k`` highest phrases keep weight (ties broken by lower
  node index, like the reference's stable sort over insertion order);
- passage seeds are min-max-normalized DPR scores × passage_node_weight;
- queries with no surviving facts fall back to pure DPR ranking
  (HippoRAG.py:467-469).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.pagerank import COOGraph, ELLGraph, batched_ppr, batched_ppr_ell
from ..ops.scoring import min_max_normalize

Array = jax.Array


class RetrievalIndex(NamedTuple):
    """Device-resident retrieval state (all padded to stable capacities).

    fact_* arrays are aligned with the fact-embedding matrix rows; node ids
    refer to the padded graph. Invalid/padded entries carry node id = N_pad-1
    and mask 0.
    """

    graph: COOGraph  # or ELLGraph (scatter-free SpMV; dispatched by type)
    fact_subj_node: Array  # [F_pad] int32
    fact_obj_node: Array  # [F_pad] int32
    node_chunk_counts: Array  # [N_pad] float32 (>=0; divisor clamped to 1)
    passage_node_ids: Array  # [P_pad] int32
    num_facts: Array  # [] int32
    num_passages: Array  # [] int32


def _phrase_seed_weights(
    sel_scores: Array,  # [B, K]
    top_fact_idx: Array,  # [B, K]
    top_fact_mask: Array,  # [B, K]
    fact_subj_node: Array,  # [F_cap]
    fact_obj_node: Array,  # [F_cap]
    node_chunk_counts: Array,  # [N_cap]
    num_nodes: Array,  # [] int32
    link_top_k: int,
):
    """Phrase half of the seed construction (ref HippoRAG.py:1583-1623):
    each selected fact contributes score / |chunks containing endpoint| to
    both endpoints, per-phrase weights average over contributions, and only
    the top-``link_top_k`` phrases keep weight. The SINGLE device copy —
    shared by graph_search_batch and the sharded backend's
    build_reset_batch so the score semantics (pinned by
    tests/test_graph_search_semantics.py) cannot diverge. Returns
    (kept [B, N_cap], rows [B, 1])."""
    b, _ = top_fact_idx.shape
    n_cap = node_chunk_counts.shape[0]
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]

    subj = fact_subj_node[top_fact_idx]
    obj = fact_obj_node[top_fact_idx]
    endpoints = jnp.concatenate([subj, obj], axis=1)  # [B, 2K]
    ep_scores = jnp.concatenate([sel_scores, sel_scores], axis=1)
    ep_mask = jnp.concatenate([top_fact_mask, top_fact_mask], axis=1)
    # also mask endpoints that point at the padding node
    ep_valid = ep_mask * (endpoints < num_nodes)

    divisor = jnp.maximum(node_chunk_counts[endpoints], 1.0)
    contrib = ep_scores / divisor * ep_valid

    # route masked endpoints to the padding slot so they never touch a real node
    pad_slot = jnp.int32(n_cap - 1)
    safe_endpoints = jnp.where(ep_valid > 0, endpoints, pad_slot)

    zeros = jnp.zeros((b, n_cap), dtype=jnp.float32)
    weight_sum = zeros.at[rows, safe_endpoints].add(contrib)
    occurs = zeros.at[rows, safe_endpoints].add(ep_valid)
    phrase_weights = jnp.where(occurs > 0, weight_sum / jnp.maximum(occurs, 1.0), 0.0)
    phrase_weights = phrase_weights.at[:, pad_slot].set(0.0)

    # keep only the top-`link_top_k` phrases per query (ref get_top_k_weights)
    top_vals, top_idx = jax.lax.top_k(phrase_weights, link_top_k)
    kept = jnp.zeros_like(phrase_weights).at[rows, top_idx].set(
        jnp.where(top_vals > 0, top_vals, 0.0)
    )
    return kept, rows


@functools.partial(
    jax.jit,
    static_argnames=("link_top_k", "ppr_max_iters", "ppr_dtype", "ppr_edge_chunks"),
)
def graph_search_batch(
    index: RetrievalIndex,
    sel_scores: Array,  # [B, K] normalized scores of the selected facts
    top_fact_idx: Array,  # [B, K] post-rerank fact rows (any value where mask=0)
    top_fact_mask: Array,  # [B, K] float32 1.0 = real selected fact
    dpr_scores: Array,  # [B, P_pad] raw passage similarity scores
    link_top_k: int = 5,
    passage_node_weight: float = 0.05,
    damping: float = 0.5,
    ppr_max_iters: int = 64,
    ppr_tol: float = 1.0e-8,
    ppr_dtype: str = "float32",
    ppr_edge_chunks: int = 1,
) -> Array:
    """Return [B, P_pad] final document scores (padded cols = -inf).

    ``sel_scores`` is row-aligned with ``top_fact_idx`` — only the scores
    of the surviving facts are needed, so the fused Pallas scoring path
    (ops/fused_topk.py) can feed this without ever materializing the full
    [B, F] fact-score matrix.
    """
    b, k = top_fact_idx.shape
    p_pad = index.passage_node_ids.shape[0]

    kept, rows = _phrase_seed_weights(
        sel_scores, top_fact_idx, top_fact_mask,
        index.fact_subj_node, index.fact_obj_node, index.node_chunk_counts,
        index.graph.num_nodes, link_top_k,
    )

    # ------------------------------------------------------------------
    # Passage seed weights from dense retrieval.
    # ------------------------------------------------------------------
    pcol = jax.lax.broadcasted_iota(jnp.int32, (1, p_pad), 1)
    p_valid = pcol < index.num_passages
    dpr_norm = min_max_normalize(dpr_scores, where=p_valid)
    passage_weights = jnp.zeros_like(kept).at[
        rows, index.passage_node_ids[None, :].repeat(b, axis=0)
    ].add(dpr_norm * passage_node_weight * p_valid)

    reset = kept + passage_weights

    # ------------------------------------------------------------------
    # Batched PPR and passage extraction.
    # ------------------------------------------------------------------
    if isinstance(index.graph, ELLGraph):
        ppr = batched_ppr_ell(
            index.graph, reset, damping=damping, max_iters=ppr_max_iters,
            tol=ppr_tol, compute_dtype=ppr_dtype,
        )
    else:
        ppr = batched_ppr(
            index.graph, reset, damping=damping, max_iters=ppr_max_iters,
            tol=ppr_tol, compute_dtype=ppr_dtype, edge_chunks=ppr_edge_chunks,
        )
    ppr_doc_scores = ppr[:, index.passage_node_ids]  # [B, P_pad]

    # DPR fallback for queries whose fact set is empty after reranking.
    has_facts = jnp.sum(top_fact_mask, axis=1, keepdims=True) > 0
    doc_scores = jnp.where(has_facts, ppr_doc_scores, dpr_norm)
    return jnp.where(p_valid, doc_scores, -jnp.inf)


@jax.jit
def rank_documents(doc_scores: Array):
    """Descending argsort of [B, P] scores -> (sorted_idx, sorted_scores)."""
    order = jnp.argsort(-doc_scores, axis=1)
    return order, jnp.take_along_axis(doc_scores, order, axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def rank_documents_topk(doc_scores: Array, k: int):
    """Top-k of [B, P] scores -> (idx [B, k], vals [B, k]).

    The serving path only consumes the top ``num_to_retrieve`` documents;
    transferring [B, k] instead of the full sorted [B, P] pair cuts
    device->host bytes ~P/k-fold (the full matrix is 6+ MB per bucket at
    corpus scale — painful over a tunneled backend). Padded/invalid
    columns carry -inf and surface as -inf values for host filtering.
    """
    vals, idx = jax.lax.top_k(doc_scores, min(k, doc_scores.shape[1]))
    return idx, vals


@functools.partial(jax.jit, static_argnames=("n_total", "link_top_k"))
def build_reset_batch(
    sel_scores: Array,  # [B, K]
    top_fact_idx: Array,  # [B, K]
    top_fact_mask: Array,  # [B, K]
    dpr_norm: Array,  # [B, P] already min-max normalized over real passages
    fact_subj_node: Array,  # [F_cap]
    fact_obj_node: Array,  # [F_cap]
    node_chunk_counts: Array,  # [N_cap]
    passage_node_ids: Array,  # [P] real passage node ids
    num_nodes: Array,  # [] int32
    n_total: int,
    link_top_k: int = 5,
    passage_node_weight: float = 0.05,
):
    """Device-side PPR seed construction (the seed half of
    graph_search_batch), emitting a [B, n_total] reset matrix sized for a
    sharded node space. Used by the mesh backend so multi-GB reset
    matrices never stage through host memory (parallel/seeds.py is the
    host twin for small graphs and tests)."""
    b, k = top_fact_idx.shape
    n_cap = node_chunk_counts.shape[0]

    kept, rows = _phrase_seed_weights(
        sel_scores, top_fact_idx, top_fact_mask,
        fact_subj_node, fact_obj_node, node_chunk_counts,
        num_nodes, link_top_k,
    )

    passage_weights = jnp.zeros_like(kept).at[
        rows, passage_node_ids[None, :].repeat(b, axis=0)
    ].add(dpr_norm * passage_node_weight)

    reset = kept + passage_weights
    if n_total > n_cap:
        reset = jnp.pad(reset, ((0, 0), (0, n_total - n_cap)))
    return reset[:, :n_total]
