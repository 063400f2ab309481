"""Live integration: lifecycle with a local HF Transformers causal LM and
sentence-transformers embedder — fully offline once models are cached
(reference workflow: tests/integration/run_transformers.py).

Run: python tests/integration/run_transformers.py [hf_model] [st_model]
"""

import sys

from _shared import run_lifecycle

if __name__ == "__main__":
    llm = sys.argv[1] if len(sys.argv) > 1 else "Qwen/Qwen2.5-0.5B-Instruct"
    embed = sys.argv[2] if len(sys.argv) > 2 else "st/sentence-transformers/all-MiniLM-L6-v2"
    sys.exit(
        run_lifecycle(
            llm_name=f"Transformers/{llm}",
            embedding_model_name=embed,
        )
    )
