"""Live integration: full lifecycle against OpenAI (needs OPENAI_API_KEY).

Run: python tests/integration/run_openai.py
"""

import sys

from _shared import run_lifecycle

if __name__ == "__main__":
    sys.exit(
        run_lifecycle(
            llm_name="gpt-4o-mini",
            embedding_model_name="text-embedding-3-small",
        )
    )
