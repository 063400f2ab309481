"""Index + QA against a local OpenAI-compatible server (e.g. vLLM serve)
(reference: examples/local_demo.py; server setup README workflow).

Start e.g.:  vllm serve meta-llama/Llama-3.3-70B-Instruct --port 6578
"""

from _shared import all_queries, corpus

from hipporag_tpu import BaseConfig, HippoRAG

config = BaseConfig(
    save_dir="outputs/local_demo",
    llm_name="meta-llama/Llama-3.3-70B-Instruct",
    llm_base_url="http://localhost:6578/v1",
    embedding_model_name="VLLM/nvidia/NV-Embed-v2",
    embedding_base_url="http://localhost:6579/v1",
)
rag = HippoRAG(global_config=config)
rag.index(corpus)
solutions, _, _ = rag.rag_qa(all_queries)
for s in solutions:
    print(f"Q: {s.question}\nA: {s.answer}\n")
