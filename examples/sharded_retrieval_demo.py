"""Multi-chip retrieval pipeline demo on a device mesh.

Composes the sharded building blocks end-to-end the way a multi-chip
deployment would: corpus-sharded fact scoring with distributed top-k,
host-side recognition-memory reranking, seed construction, and
scatter-free sharded PPR — collectives ride the corpus (ICI) axis.

Runs anywhere: on a TPU slice it uses the real chips; elsewhere set
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to simulate 8 devices. Run: python examples/sharded_retrieval_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _shared  # noqa: F401 — repo path + HIPPO_PLATFORM override (this
# was the one example that imported jax directly, so on a box whose site
# config force-registers its own backend it silently ran on the tunneled
# TPU — and hung for the length of a degraded-link episode)

import jax
import jax.numpy as jnp
import numpy as np

from hipporag_tpu.graph.csr import round_up
from hipporag_tpu.ops.pagerank import COOGraph
from hipporag_tpu.parallel import (
    make_mesh,
    make_sharded_ppr_ell,
    make_sharded_score_topk,
    put_sharded_ell,
    shard_graph_ell,
)

devices = jax.devices()
n_dev = len(devices)
dp = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
corpus_axis = n_dev // dp
mesh = make_mesh((dp, corpus_axis), devices=devices)
print(f"mesh: dp={dp} x corpus={corpus_axis} over {n_dev} {devices[0].platform} devices")

# synthetic KG + fact embeddings
rng = np.random.default_rng(0)
n_nodes, n_facts, dim, b, k = 4000, 2048, 256, 16, 5
node_cap = round_up(n_nodes + 1, 128)
src = rng.integers(0, n_nodes, 40000)
dst = rng.integers(0, n_nodes, 40000)
keep = src != dst
src, dst, w = src[keep], dst[keep], rng.uniform(0.2, 2.0, keep.sum())
s2 = np.concatenate([src, dst]); d2 = np.concatenate([dst, src])
w2 = np.concatenate([w, w])
o = np.argsort(d2, kind="stable"); s2, d2, w2 = s2[o], d2[o], w2[o]
strength = np.zeros(n_nodes); np.add.at(strength, s2, w2)
wp = (w2 / strength[s2]).astype(np.float32)
dang = np.zeros(node_cap, np.float32); dang[:n_nodes] = strength == 0
coo = COOGraph(src=s2.astype(np.int32), dst=d2.astype(np.int32), w_norm=wp,
               dangling=dang, num_nodes=np.asarray(n_nodes, np.int32))

fact_emb = rng.standard_normal((round_up(n_facts, corpus_axis), dim)).astype(np.float32)
queries = rng.standard_normal((b, dim)).astype(np.float32)

# 1. corpus-sharded scoring + distributed top-k
score = make_sharded_score_topk(mesh, k=k)
_, vals, idx = score(jnp.asarray(queries), jnp.asarray(fact_emb),
                     jnp.asarray(n_facts, jnp.int32))
print("sharded top-k:", np.asarray(idx)[0])

# 2. (recognition-memory LLM rerank would filter the candidates here)

# 3. seed construction + sharded scatter-free PPR
sge = shard_graph_ell(coo, num_shards=corpus_axis)
n_total = corpus_axis * sge.shard_nodes
reset = np.zeros((b, n_total), np.float32)
for i in range(b):
    reset[i, rng.integers(0, n_nodes, k)] = np.asarray(vals)[i]
ppr = make_sharded_ppr_ell(mesh, max_iters=64, n_hub=sge.n_hub)
ranks = ppr(put_sharded_ell(mesh, sge), jnp.asarray(reset))
top_nodes = np.asarray(jnp.argsort(-ranks[:, :n_nodes], axis=1))[:, :5]
print("per-query top graph nodes:\n", top_nodes[:4])
print("row sums:", np.asarray(jnp.sum(ranks, axis=1))[:4])
