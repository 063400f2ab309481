"""Shared sample data for the provider demos (reference: examples/_shared.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor HIPPO_PLATFORM=cpu|tpu|<backend> before first jax use: some site
# configs force-register their own backend and overwrite the JAX_PLATFORMS
# env var, so (like main.py --platform) the override must go through
# jax.config instead.
if os.environ.get("HIPPO_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["HIPPO_PLATFORM"])

from hipporag_tpu.utils.sample_data import all_queries, corpus  # noqa: E402,F401
