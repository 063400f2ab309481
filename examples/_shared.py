"""Shared sample data for the provider demos (reference: examples/_shared.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hipporag_tpu.utils.sample_data import all_queries, corpus  # noqa: E402,F401
