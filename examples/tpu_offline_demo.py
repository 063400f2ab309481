"""Fully offline demo on the TPU-native stack: deterministic mock LLM for
OpenIE/rerank/QA + the pure-JAX encoder for embeddings. Everything —
encoder forward, fact scoring, kNN, batched PPR — runs as jitted XLA
programs on the local accelerator (TPU if present, else CPU).

Run: python examples/tpu_offline_demo.py
"""

from _shared import all_queries, corpus

from hipporag_tpu import BaseConfig, HippoRAG

config = BaseConfig(
    save_dir="outputs/tpu_offline_demo",
    llm_name="mock",
    embedding_model_name="jax/random-128x2",
    embedding_model_dtype="float32",
)
rag = HippoRAG(global_config=config)
rag.index(corpus)
print(rag.get_graph_info())
solutions, _, _ = rag.rag_qa(all_queries)
for s in solutions:
    print(f"Q: {s.question}\nA: {s.answer}\n   top-1: {s.docs[0]}")
