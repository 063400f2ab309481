"""Live integration: lifecycle against Azure OpenAI deployments
(reference workflow: tests/integration/run_azure.py — needs
AZURE_OPENAI_API_KEY + endpoint env/args).

Run: python tests/integration/run_azure.py <azure_endpoint> [llm_deploy] [embed_deploy]
"""

import sys

from _shared import run_lifecycle

if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    endpoint = sys.argv[1]
    llm = sys.argv[2] if len(sys.argv) > 2 else "gpt-4o-mini"
    embed = sys.argv[3] if len(sys.argv) > 3 else "text-embedding-3-small"
    sys.exit(
        run_lifecycle(
            llm_name=llm,
            azure_endpoint=endpoint,
            embedding_model_name=embed,
            azure_embedding_endpoint=endpoint,
        )
    )
