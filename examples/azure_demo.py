"""Index + QA against Azure OpenAI deployments (reference: examples/azure_demo.py).

Requires AZURE_OPENAI_API_KEY plus endpoint URLs below.
"""

from _shared import all_queries, corpus

from hipporag_tpu import BaseConfig, HippoRAG

config = BaseConfig(
    save_dir="outputs/azure_demo",
    llm_name="gpt-4o-mini",  # your chat deployment name
    embedding_model_name="text-embedding-3-small",  # your embedding deployment
    azure_endpoint="https://YOUR-RESOURCE.openai.azure.com",
    azure_embedding_endpoint="https://YOUR-RESOURCE.openai.azure.com",
)
rag = HippoRAG(global_config=config)
rag.index(corpus)
solutions, _, _ = rag.rag_qa(all_queries)
for s in solutions:
    print(f"Q: {s.question}\nA: {s.answer}\n")
