"""Property test: graph_search_batch seed/score semantics vs an
independent NumPy re-derivation of the reference algorithm
(HippoRAG.py:1544-1656 — phrase weights from selected facts divided by
entity chunk counts, averaged per phrase, top-link_top_k filter, DPR
passage seeds x passage_node_weight, PPR, DPR fallback for factless
queries)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hipporag_tpu.graph.csr import round_up
from hipporag_tpu.models.retrieval import RetrievalIndex, graph_search_batch
from hipporag_tpu.ops.pagerank import COOGraph


def _build_random_index(rng, n_entities=40, n_passages=10, n_facts=30):
    n_nodes = n_entities + n_passages
    node_cap = round_up(n_nodes + 1, 128)
    pad_slot = node_cap - 1

    # random undirected weighted edges among all nodes
    edges = {}
    for _ in range(150):
        a, b = rng.integers(0, n_nodes, 2)
        if a == b:
            continue
        edges[(min(a, b), max(a, b))] = float(rng.uniform(0.2, 2.0))
    s, d, w = [], [], []
    for (a, b), wt in edges.items():
        s += [a, b]
        d += [b, a]
        w += [wt, wt]
    s, d, w = np.asarray(s), np.asarray(d), np.asarray(w, np.float64)
    order = np.argsort(d, kind="stable")
    s, d, w = s[order], d[order], w[order]
    strength = np.zeros(n_nodes)
    np.add.at(strength, s, w)

    edge_cap = round_up(len(s), 1024)
    sp = np.zeros(edge_cap, np.int32)
    dp = np.full(edge_cap, pad_slot, np.int32)
    wp = np.zeros(edge_cap, np.float32)
    sp[: len(s)] = s
    dp[: len(s)] = d
    wp[: len(s)] = (w / strength[s]).astype(np.float32)
    dang = np.zeros(node_cap, np.float32)
    dang[:n_nodes] = strength == 0

    graph = COOGraph(
        src=jnp.asarray(sp), dst=jnp.asarray(dp), w_norm=jnp.asarray(wp),
        dangling=jnp.asarray(dang), num_nodes=jnp.asarray(n_nodes, jnp.int32),
    )

    fact_cap = round_up(n_facts, 128)
    passage_cap = round_up(n_passages, 128)
    fact_subj = np.full(fact_cap, pad_slot, np.int32)
    fact_obj = np.full(fact_cap, pad_slot, np.int32)
    fact_subj[:n_facts] = rng.integers(0, n_entities, n_facts)
    fact_obj[:n_facts] = rng.integers(0, n_entities, n_facts)

    passage_node_ids = np.full(passage_cap, pad_slot, np.int32)
    passage_node_ids[:n_passages] = np.arange(n_entities, n_nodes)
    chunk_counts = np.zeros(node_cap, np.float32)
    chunk_counts[:n_entities] = rng.integers(1, 5, n_entities)

    index = RetrievalIndex(
        graph=graph,
        fact_subj_node=jnp.asarray(fact_subj),
        fact_obj_node=jnp.asarray(fact_obj),
        node_chunk_counts=jnp.asarray(chunk_counts),
        passage_node_ids=jnp.asarray(passage_node_ids),
        num_facts=jnp.asarray(n_facts, jnp.int32),
        num_passages=jnp.asarray(n_passages, jnp.int32),
    )
    host = dict(
        s=s, d=d, w=w, strength=strength, n_nodes=n_nodes, node_cap=node_cap,
        fact_subj=fact_subj, fact_obj=fact_obj, chunk_counts=chunk_counts,
        passage_node_ids=passage_node_ids, n_passages=n_passages,
        n_entities=n_entities, n_facts=n_facts,
    )
    return index, host


def _reference_doc_scores(host, sel_scores, top_idx, top_mask, dpr, link_top_k,
                          passage_node_weight=0.05, damping=0.5, iters=200):
    """Independent NumPy derivation of the reference per-query algorithm."""
    n_nodes = host["n_nodes"]
    b = sel_scores.shape[0]
    out = np.zeros((b, host["n_passages"]))

    # dense transition for PPR
    A = np.zeros((n_nodes, n_nodes))
    for si, di, wi in zip(host["s"], host["d"], host["w"]):
        A[si, di] = wi  # already symmetric-expanded entries
    strength = A.sum(axis=1)
    dangling = (strength == 0).astype(float)
    T = np.divide(A, np.maximum(strength[:, None], 1e-300),
                  where=strength[:, None] > 0)

    for q in range(b):
        # phrase weights (ref 1583-1618)
        weight_sum = np.zeros(n_nodes)
        occurs = np.zeros(n_nodes)
        for j in range(top_idx.shape[1]):
            if top_mask[q, j] == 0:
                continue
            score = sel_scores[q, j]
            for node in (host["fact_subj"][top_idx[q, j]], host["fact_obj"][top_idx[q, j]]):
                if node >= n_nodes:
                    continue
                weight_sum[node] += score / max(host["chunk_counts"][node], 1.0)
                occurs[node] += 1
        phrase = np.divide(weight_sum, occurs, where=occurs > 0,
                           out=np.zeros(n_nodes))
        # top-link_top_k phrases (ties -> lower index, like lax.top_k)
        order = np.argsort(-phrase, kind="stable")[:link_top_k]
        kept = np.zeros(n_nodes)
        kept[order] = np.where(phrase[order] > 0, phrase[order], 0.0)

        # normalized DPR passage seeds (ref 1626-1638)
        dq = dpr[q, : host["n_passages"]]
        rng_ = dq.max() - dq.min()
        dqn = np.ones_like(dq) if rng_ == 0 else (dq - dq.min()) / rng_
        reset = kept.copy()
        reset[host["passage_node_ids"][: host["n_passages"]]] += (
            dqn * passage_node_weight
        )

        if top_mask[q].sum() == 0:
            out[q] = dqn  # DPR fallback (ref 467-469)
            continue

        r = reset / reset.sum()
        p = r.copy()
        for _ in range(iters):
            y = p @ T
            dm = float(p @ dangling)
            p = (1 - damping) * r + damping * (y + dm * r)
        out[q] = p[host["passage_node_ids"][: host["n_passages"]]]
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_graph_search_matches_reference_semantics(seed):
    rng = np.random.default_rng(seed)
    index, host = _build_random_index(rng)
    b, k = 4, 5
    top_idx = rng.integers(0, host["n_facts"], (b, k)).astype(np.int32)
    top_mask = (rng.uniform(size=(b, k)) > 0.3).astype(np.float32)
    top_mask[1] = 0.0  # one query with no facts -> DPR fallback
    sel_scores = rng.uniform(0.1, 1.0, (b, k)).astype(np.float32) * top_mask
    dpr = rng.standard_normal((b, index.passage_node_ids.shape[0])).astype(np.float32)

    got = np.asarray(
        graph_search_batch(
            index,
            jnp.asarray(sel_scores),
            jnp.asarray(top_idx),
            jnp.asarray(top_mask),
            jnp.asarray(dpr),
            link_top_k=k,
            ppr_max_iters=128,
            ppr_tol=1e-10,
        )
    )[:, : host["n_passages"]]

    want = _reference_doc_scores(host, sel_scores, top_idx, top_mask, dpr, k)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-6)
