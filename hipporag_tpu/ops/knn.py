"""Tiled cosine kNN on TPU (synonymy-edge construction).

Replaces the reference's torch matmul+top-k loop (utils/embed_utils.py:6-94)
with a jitted streaming top-k: keys are processed in chunks under
``lax.scan`` while a running [B, k] top-k is merged per chunk, so the full
[Nq, Nk] score matrix never materializes in HBM.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("k", "key_chunk"))
def streaming_topk_scores(
    queries: Array,  # [B, D] (L2-normalized)
    keys: Array,  # [Nk, D] (L2-normalized; may include zero-padding rows)
    valid_k: Array,  # [] int32 — number of real key rows
    k: int,
    key_chunk: int = 8192,
) -> Tuple[Array, Array]:
    """Return per-query (scores [B, k], indices [B, k]) of the top-k keys."""
    nk = keys.shape[0]
    key_chunk = min(key_chunk, nk)
    num_chunks = -(-nk // key_chunk)
    pad = num_chunks * key_chunk - nk
    keys_padded = jnp.pad(keys, ((0, pad), (0, 0)))
    chunks = keys_padded.reshape(num_chunks, key_chunk, -1)

    b = queries.shape[0]
    k = min(k, nk)
    init = (
        jnp.full((b, k), -jnp.inf, dtype=jnp.float32),
        jnp.zeros((b, k), dtype=jnp.int32),
    )

    def body(carry, args):
        chunk, chunk_idx = args
        vals, idxs = carry
        scores = jax.lax.dot_general(
            queries,
            chunk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, C]
        base = chunk_idx * key_chunk
        col = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < valid_k, scores, -jnp.inf)
        cat_vals = jnp.concatenate([vals, scores], axis=1)
        cat_idx = jnp.concatenate([idxs, col], axis=1)
        new_vals, merge_idx = jax.lax.top_k(cat_vals, k)
        new_idx = jnp.take_along_axis(cat_idx, merge_idx, axis=1)
        return (new_vals, new_idx), None

    (vals, idxs), _ = jax.lax.scan(
        body, init, (chunks, jnp.arange(num_chunks, dtype=jnp.int32))
    )
    return vals, idxs


def retrieve_knn(
    query_ids: List[str],
    key_ids: List[str],
    query_vecs: np.ndarray,
    key_vecs: np.ndarray,
    k: int = 2047,
    query_batch_size: int = 1000,
    key_batch_size: int = 10000,
) -> Dict[str, Tuple[List[str], List[float]]]:
    """Host wrapper with the reference's interface (embed_utils.py:6-94).

    Returns {query_id: ([neighbor key ids best-first], [cosine scores])}.
    """
    if len(key_ids) == 0 or len(query_ids) == 0:
        return {qid: ([], []) for qid in query_ids}

    queries = np.ascontiguousarray(query_vecs, dtype=np.float32)
    keys = np.ascontiguousarray(key_vecs, dtype=np.float32)
    k = min(k, len(key_ids))

    keys_dev = jax.device_put(keys)
    valid_k = jnp.asarray(len(key_ids), dtype=jnp.int32)

    results: Dict[str, Tuple[List[str], List[float]]] = {}
    for start in range(0, len(query_ids), query_batch_size):
        q = jax.device_put(queries[start : start + query_batch_size])
        vals, idxs = streaming_topk_scores(
            q, keys_dev, valid_k, k, key_chunk=key_batch_size
        )
        vals = np.asarray(vals)
        idxs = np.asarray(idxs)
        for row, qid in enumerate(query_ids[start : start + query_batch_size]):
            results[qid] = (
                [key_ids[j] for j in idxs[row]],
                [float(v) for v in vals[row]],
            )
    return results
