"""Offline integration: the same lifecycle on deterministic mocks — a
smoke check that needs no services and runs anywhere.

Run: JAX_PLATFORMS=cpu python tests/integration/run_offline.py
"""

import sys

from _shared import run_lifecycle

if __name__ == "__main__":
    sys.exit(run_lifecycle(llm_name="mock", embedding_model_name="mock"))
