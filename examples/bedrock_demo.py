"""Index + QA via AWS Bedrock (reference: examples/bedrock_demo.py).

Requires AWS credentials (boto3) and model access in your region.
"""

from _shared import all_queries, corpus

from hipporag_tpu import BaseConfig, HippoRAG

config = BaseConfig(
    save_dir="outputs/bedrock_demo",
    llm_name="bedrock/us.anthropic.claude-3-5-haiku-20241022-v1:0",
    embedding_model_name="bedrock/cohere.embed-english-v3",
)
rag = HippoRAG(global_config=config)
rag.index(corpus)
solutions, _, _ = rag.rag_qa(all_queries)
for s in solutions:
    print(f"Q: {s.question}\nA: {s.answer}\n")
