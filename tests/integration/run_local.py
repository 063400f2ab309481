"""Live integration: lifecycle against a local OpenAI-compatible server
(reference workflow: vllm serve at localhost:6578).

Run: python tests/integration/run_local.py [llm_name]
"""

import sys

from _shared import run_lifecycle

if __name__ == "__main__":
    llm = sys.argv[1] if len(sys.argv) > 1 else "meta-llama/Llama-3.3-70B-Instruct"
    sys.exit(
        run_lifecycle(
            llm_name=llm,
            llm_base_url="http://localhost:6578/v1",
            embedding_model_name="VLLM/nvidia/NV-Embed-v2",
            embedding_base_url="http://localhost:6579/v1",
        )
    )
