"""Index + QA against OpenAI endpoints (reference: examples/openai_demo.py).

Requires OPENAI_API_KEY. Run: python examples/openai_demo.py
"""

from _shared import all_queries, corpus

from hipporag_tpu import BaseConfig, HippoRAG

config = BaseConfig(
    save_dir="outputs/openai_demo",
    llm_name="gpt-4o-mini",
    embedding_model_name="text-embedding-3-small",
)
rag = HippoRAG(global_config=config)
rag.index(corpus)
solutions, _, _ = rag.rag_qa(all_queries)
for s in solutions:
    print(f"Q: {s.question}\nA: {s.answer}\n")
